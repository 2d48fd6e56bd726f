#!/usr/bin/env python
"""Round-3 scale-up study: the round-2 heavies under replicated data.

Targets (VERDICT r2 item 7): text_chunk_dedup, corpus_shard_assignment,
corpus_pack_sequences, vector_ann_pq_topk, dedup_incremental_newbatch —
the operators with driver-touching steps (prefix-sum offsets, codebook
train, index build) whose CONSTANTS must stay flat while the distributed
part scales linearly.

Method (same as the round-1 §9 study): key-shifted R× replication of the
tables these queries touch (documents, embeddings) into /tmp; each doc
replica gets a one-token suffix so replicas are near-dups rather than
exact dups (keeps dedup candidate structure realistic instead of
degenerate). Queries run unchanged via the registry against the replica
dir; wall time is best-of-2 after a session warm-up.

Run: python scripts/scaleup_study.py  [factors: default 1 8 32]
     [query names: default TARGETS]  — args mix freely; ints are
     factors, anything else is a registry query name.

Round-3 extension: events replication (key-shifted event_id/user_id,
ts jittered per replica so window orderings stay non-degenerate) for
the event-analytics targets, and the IVFADC composition whose driver
constants (centroid collect, residual codebook train, probe table)
must stay bounded while encode/scan scale out.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cognitive_score_bigdata_spark.queries import load_registry  # noqa: E402
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = "/tmp/csb_scaleup"
TARGETS = [
    "text_chunk_dedup",
    "corpus_shard_assignment",
    "corpus_pack_sequences",
    "vector_ann_pq_topk",
    "dedup_incremental_newbatch",
]


def build_replica(spark, factor: int) -> str:
    out = f"{OUT_ROOT}/r{factor}"
    if os.path.exists(out):
        return out
    os.makedirs(out, exist_ok=True)
    reps = spark.range(factor).select(F.col("id").alias("__r"))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__r") * n_docs)
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" zrep"), F.col("__r").cast("string")),
        )
        .drop("__r")
        .repartition(max(4, factor))
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("__r") * n_vec)
        .drop("__r")
        .repartition(max(4, factor))
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )

    # events: key-shift ids, offset user_id into fresh key space per
    # replica (keeps per-user history length constant — the realistic
    # growth mode: more users, not deeper histories), jitter ts by the
    # replica index so orderings aren't 32-way ties
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_ev = ev.agg(F.max("event_id")).first()[0] + 1
    n_usr = ev.agg(F.max("user_id")).first()[0] + 1
    # ts arrives as a nano-epoch LONG (nanosAsLong sessions) or as a
    # timestamp (already-converted files) — jitter by __r µs either way
    from pyspark.sql import types as T

    if isinstance(ev.schema["ts"].dataType, T.LongType):
        jittered = F.col("ts") + (F.col("__r") * 1000).cast("long")
    else:
        jittered = F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp")) + F.col("__r")
        ).cast(ev.schema["ts"].dataType)
    (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("__r") * n_ev)
        .withColumn("user_id", F.col("user_id") + F.col("__r") * n_usr)
        .withColumn("ts", jittered)
        .drop("__r")
        .repartition(max(4, factor))
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )

    # orders + lineitem: key-shift orderkey AND partkey per replica, so
    # replicas are disjoint subgraphs/baskets — the realistic growth
    # mode for the graph/basket operators (catalog and order book both
    # grow; a pure orderkey shift would only inflate supports while
    # freezing the co-purchase graph, understating join/wedge work)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
    (
        orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__r") * n_ord)
        .drop("__r")
        .repartition(max(4, factor))
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    # one modulus for BOTH tables so replica r's lineitem still joins
    # replica r's part catalog (round 4: part added for the linkage /
    # basket-dimension queries)
    n_part = (
        max(
            li.agg(F.max("l_partkey")).first()[0],
            part.agg(F.max("p_partkey")).first()[0],
        )
        + 1
    )
    (
        li.crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__r") * n_ord)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("__r") * n_part)
        .drop("__r")
        .repartition(max(4, factor))
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    (
        part.crossJoin(reps)
        .withColumn("p_partkey", F.col("p_partkey") + F.col("__r") * n_part)
        .drop("__r")
        .repartition(max(4, factor))
        .write.mode("overwrite")
        .parquet(f"{out}/part.parquet")
    )
    # remaining dims (customer/supplier/nation/region): copy unscaled so
    # any registry query resolves its tables against the replica dir
    for t in ("customer", "supplier", "nation", "region"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{SF_DIR}/{t}.parquet", dst)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 32]
    names = [a for a in sys.argv[1:] if not a.isdigit()]
    targets = names or TARGETS
    spark = get_spark("csb-scaleup")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()

    # warm the JVM + Arrow worker pool (same reasoning as bench.py)
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    results: dict[str, dict[int, float]] = {t: {} for t in targets}
    for factor in factors:
        d = build_replica(spark, factor)
        for name in targets:
            best = float("inf")
            for _ in range(2):
                spark._jvm.System.gc()  # noqa: SLF001
                t0 = time.perf_counter()
                # r10: noop sink, not count() — count() let Catalyst
                # prune unused window/projection expressions out of
                # the timed plan (see bench.py docstring)
                registry[name].fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            results[name][factor] = round(best, 2)
            print(f"  {name} @ {factor}x: {results[name][factor]}s", flush=True)

    print("\n| query | " + " | ".join(f"{f}x" for f in factors) + " | slope |")
    print("|---|" + "---|" * (len(factors) + 1))
    for name in targets:
        r = results[name]
        lo, hi = factors[0], factors[-1]
        slope = (r[hi] / r[lo]) / (hi / lo) if r[lo] else float("nan")
        cells = " | ".join(str(r[f]) for f in factors)
        print(f"| {name} | {cells} | {slope:.2f} (1.0=linear) |")

    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
