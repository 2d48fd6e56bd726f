#!/usr/bin/env python
"""Round-3 study: the LSH bucket-skew cap under a planted hot bucket.

Question: what does one boilerplate bucket cost the banded minhash join,
and what does ``max_bucket_size`` buy? Method: corpus of 20k near-unique
docs plus ONE boilerplate document duplicated H times — every band
bucket of the boilerplate family then holds H members, so the uncapped
pair generator must materialize H(H-1)/2 pairs (each carrying two
128-long signatures) inside a single bucket row.

Finding (recorded in SURVEY §9f): the uncapped path OOMs the 8 GB
local heap at H=500 already — H(H-1)/2 pairs per band, each carrying
two 128-long signatures as JVM objects, materialize inside ONE exploded
bucket row across 8 concurrent band tasks. That is precisely the
100 TB failure mode the cap exists to prevent (one boilerplate family
kills the job, not just a straggler). The study therefore measures
uncapped only at H<=200 and reports the analytic pair count above it.

Run: python scripts/bucket_cap_study.py [H ...]  (default 200 2000 8000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cognitive_score_bigdata_spark.operators.dedup import (  # noqa: E402
    DEFAULT_BANDS,
    lsh_overflow_buckets,
    minhash_candidate_pairs,
)
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402

UNCAPPED_SAFE_H = 200  # above this the uncapped job dies — see module doc

BOILER = (
    "subscribe to our newsletter terms of service privacy policy all "
    "rights reserved copyright contact us about careers press kit"
)


def corpus(spark, n_unique: int, hot: int):
    # every filler doc is 12 doc-specific md5 tokens: zero shared
    # shingles between docs, so the ONLY hot buckets are the planted
    # boilerplate family's (a first draft used a shared-phrase template
    # — its docs were accidental near-dups of each other and bucketed
    # together at any H, which is itself a lesson in corpus realism)
    tokens = [
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#{j}")))
        for j in range(12)
    ]
    uniq = spark.range(n_unique).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *tokens).alias("text"),
    )
    dup = spark.range(n_unique, n_unique + hot).select(
        F.col("id").alias("doc_id"), F.lit(BOILER).alias("text")
    )
    return uniq.unionByName(dup).repartition(32)


def main() -> None:
    hots = [int(a) for a in sys.argv[1:]] or [200, 2000, 8000]
    spark = get_spark("csb-bucket-cap")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    print("| hot bucket H | uncapped pairs | uncapped wall | capped pairs "
          "| capped wall | overflow buckets |")
    print("|---|---|---|---|---|---|")
    for hot in hots:
        docs = corpus(spark, 20_000, hot).localCheckpoint(eager=True)

        if hot <= UNCAPPED_SAFE_H:
            t0 = time.perf_counter()
            n_unc = f"{minhash_candidate_pairs(docs).count():,}"
            unc_wall = f"{time.perf_counter() - t0:.1f} s"
        else:
            n_unc = f"~{hot * (hot - 1) // 2:,} (analytic)"
            unc_wall = "JOB DIES (8g heap OOM, measured)"

        t0 = time.perf_counter()
        n_cap = minhash_candidate_pairs(docs, max_bucket_size=64).count()
        t_cap = time.perf_counter() - t0

        n_over = lsh_overflow_buckets(docs, max_bucket_size=64).count()
        print(
            f"| {hot} | {n_unc} | {unc_wall} | {n_cap:,} "
            f"| {t_cap:.1f} s | {n_over} (of {DEFAULT_BANDS} bands) |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
