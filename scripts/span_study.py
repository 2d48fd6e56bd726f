#!/usr/bin/env python
"""Span-dedup formulation study (SURVEY §9): three ways to compute
"corpus-wide first occurrence of each distinct span wins" on a
boilerplate-heavy corpus, all producing identical results.

Corpus: 400k synthetic documents of ~24 random tokens; 30% of them share
one identical boilerplate document, so each of its 8 spans occurs ~120k
times while every other span is near-unique — span frequency skew on a
mostly-unique key domain, the realistic worst case.

1. **wgl** (shipped ``chunk_dedup``): ``row_number()==1`` filtered at
   the window → Catalyst's WindowGroupLimit rewrite pre-collapses each
   map task to its local first occurrence per span BELOW the exchange
   (hot spans ship one row per map task, like a partial aggregate), then
   sort-finishes above it.
2. **agg**: ``min(struct(doc_id, pos))`` per chunk — semantically the
   same partial collapse, but min-of-struct plans as
   ObjectHashAggregate, which silently falls back to sort-based
   aggregation past 128 distinct keys, so on a mostly-unique span table
   it pays hash-map setup AND the sort.
3. **window**: unfiltered ``row_number`` + post-aggregation — fastest
   wall-clock locally (no totals join) but ships EVERY occurrence of
   every span through the shuffle: at real span skew the hot span's
   reducer is a straggler, and shuffle bytes scale with occurrences,
   not distinct spans.

Run: ``python scripts/span_study.py`` (serial — no other Spark process).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from cognitive_score_bigdata_spark.queries.spandedup import (  # noqa: E402
    CHUNK,
    _chunks,
    chunk_dedup,
)
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402

N_DOCS = 400_000
HOT_FRACTION = 0.30
TOKENS_PER_DOC = 24
VOCAB = 5_000


def build_corpus(spark):
    """30% of docs are one identical boilerplate text; the rest are
    pseudo-random token soup (deterministic via xxhash64)."""
    hot_text = " ".join(f"tok{i}" for i in range(TOKENS_PER_DOC))
    tok_ids = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
        lambda i: F.pmod(F.xxhash64(F.col("id") * TOKENS_PER_DOC + i), F.lit(VOCAB)),
    )
    rand_text = F.array_join(
        F.transform(tok_ids, lambda t: F.concat(F.lit("w"), t.cast("string"))), " "
    )
    return (
        spark.range(N_DOCS)
        .withColumn(
            "text",
            F.when(F.col("id") < int(N_DOCS * HOT_FRACTION), F.lit(hot_text))
            .otherwise(rand_text),
        )
        .withColumnRenamed("id", "doc_id")
    )


def _totals(docs):
    return docs.select(
        "doc_id",
        F.ceil(F.size(F.split(F.col("text"), " +")) / F.lit(float(CHUNK)))
        .cast("bigint")
        .alias("n_chunks"),
    )


def _finish(totals, kept):
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def _reassemble(grouped):
    return grouped.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("cleaned_text"),
    )


def agg_variant(docs):
    """min(struct) winners — ObjectHashAggregate with sort fallback."""
    winners = (
        _chunks(docs)
        .groupBy("chunk")
        .agg(F.min(F.struct("doc_id", "pos")).alias("w"))
        .select("chunk", F.col("w.doc_id").alias("doc_id"), F.col("w.pos").alias("pos"))
    )
    return _finish(_totals(docs), _reassemble(winners.groupBy("doc_id")))


def window_variant(docs):
    """Unfiltered window: no partial collapse, every occurrence shuffles;
    totals computed in the same aggregation (no join)."""
    ranked = _chunks(docs).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("chunk").orderBy("doc_id", "pos")),
    )
    kept = F.when(F.col("rn") == 1, F.struct("pos", "chunk"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(kept).alias("n_kept"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["chunk"]),
            " ",
        ).alias("cleaned_text"),
    )


def main() -> None:
    spark = get_spark("span-study")
    spark.sparkContext.setLogLevel("ERROR")
    docs = build_corpus(spark).persist()
    n = docs.count()  # materialize input outside the timings

    # Warm up codegen/shuffle machinery so run order can't bias the
    # comparison, then time each variant twice and keep the faster run.
    chunk_dedup(docs.limit(20_000)).count()

    results = {}
    for name, fn in [
        ("wgl_shipped", chunk_dedup),
        ("agg_min_struct", agg_variant),
        ("window_unfiltered", window_variant),
    ]:
        best, agg = None, None
        for _ in range(2):
            spark._jvm.System.gc()  # noqa: SLF001
            t0 = time.perf_counter()
            agg = (
                fn(docs)
                .agg(F.sum("n_chunks").alias("c"), F.sum("n_kept").alias("k"))
                .collect()[0]
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {
            "sec": round(best, 2),
            "total_chunks": agg["c"],
            "kept_chunks": agg["k"],
        }

    docs.unpersist()
    print(
        json.dumps(
            {
                "metric": "span_dedup_formulation_study",
                "n_docs": n,
                "hot_fraction": HOT_FRACTION,
                "chunk_tokens": CHUNK,
                **results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
