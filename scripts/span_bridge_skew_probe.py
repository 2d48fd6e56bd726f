#!/usr/bin/env python
"""Round-9 probe: the span bridge's winner stage under a planted hot
chunk — window form vs map-side-combinable min-struct form.

The bridge needs, per chunk, BOTH the winner's verdict and the count of
non-winner occurrences. A ``row_number + first_value`` window cannot
take Spark's WindowGroupLimit rewrite (the rewrite keeps only rank<=k
rows; the bridge consumes the rank>1 rows), so every occurrence of a
hot boilerplate chunk ships to ONE reducer and sorts there — the same
single-task hot-family failure §9f measured for uncapped LSH buckets.
The shipped form replaces the window with two map-side-combinable
aggregates (min-struct winner + per-(chunk, source) counts) joined on
chunk: partial aggregation collapses the hot chunk to one row per map
task per key BEFORE the exchange, and the join sees |sources| rows per
chunk, not |occurrences|.

Method: corpus of 20k near-unique one-chunk docs + ONE boilerplate doc
text repeated H times across 20 sources; both formulations run over
the same parquet fixture (output verified identical each run); wall
time is best-of-2 warm.

Run: python scripts/span_bridge_skew_probe.py [H ...] (default
10000 100000 400000)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from cognitive_score_bigdata_spark.queries import load_registry  # noqa: E402
from cognitive_score_bigdata_spark.queries.round8 import (  # noqa: E402
    with_compliance_verdict,
)
from cognitive_score_bigdata_spark.queries.spandedup import (  # noqa: E402
    _chunks,
)
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402

OUT_ROOT = "/tmp/csb_span_bridge_skew"


def build_fixture(spark, h: int) -> str:
    out = f"{OUT_ROOT}/h{h}"
    if os.path.exists(out):
        return out
    os.makedirs(out, exist_ok=True)
    base = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias(
            "source"
        ),
        F.concat(
            F.lit("uniq"), F.col("id"), F.lit(" tok"), F.col("id"),
            F.lit(" tail"), F.col("id"),
        ).alias("text"),
    )
    hot = spark.range(h).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias(
            "source"
        ),
        F.lit("boiler plate chunk").alias("text"),
    )
    base.unionByName(hot).coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def window_form(spark, sf_dir: str):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tagged = _chunks(
        with_compliance_verdict(docs), carry=("source", "verdict")
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    win = tagged.select(
        "source",
        "chunk",
        F.row_number().over(w).alias("rn"),
        F.first("verdict").over(w).alias("win_verdict"),
    )
    return (
        win.filter(F.col("rn") > 1)
        .groupBy("source", "win_verdict")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_stripped"),
            F.countDistinct("chunk").cast("bigint").alias("n_chunks"),
        )
    )


def agg_form(spark, sf_dir: str):
    # the shipped implementation, on the fixture dir
    return load_registry()["curation_compliance_span_bridge"].fn(
        spark, sf_dir
    )


def main() -> None:
    hs = [int(a) for a in sys.argv[1:]] or [10_000, 100_000, 400_000]
    spark = get_spark("span-bridge-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("| H | window (s) | min-struct agg (s) |")
    print("|---|---|---|")
    for h in hs:
        sf_dir = build_fixture(spark, h)
        results = {}
        times = {}
        for name, fn in (("window", window_form), ("agg", agg_form)):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                rows = {tuple(r) for r in fn(spark, sf_dir).collect()}
                best = min(best, time.perf_counter() - t0)
            results[name] = rows
            times[name] = best
        assert results["window"] == results["agg"], f"divergence at H={h}"
        print(
            f"| {h} | {times['window']:.2f} | {times['agg']:.2f} |",
            flush=True,
        )
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
