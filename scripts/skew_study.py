#!/usr/bin/env python
"""Skew-join evidence study (SURVEY §9): one hot key owning ~30% of the
fact rows, joined to a replicable per-user dimension.

Three measured configurations:

1. plain sort-merge join, AQE skew handling ON (default session) — shows
   Spark's runtime skew-split absorbing the hot key;
2. plain sort-merge join, AQE skew handling OFF — the degenerate
   one-reducer-gets-everything baseline;
3. ``operators.skew.salted_join`` with AQE skew handling OFF — the
   explicit mitigation for joins AQE can't observe.

Run: ``python scripts/skew_study.py`` (serial — no other Spark process).
Prints one JSON line with the three timings and the AQE skew evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cognitive_score_bigdata_spark.operators.skew import salted_join  # noqa: E402
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402

N_ROWS = 40_000_000
HOT_FRACTION = 0.30
N_USERS = 50_000


def build_tables(spark):
    """Fact: N_ROWS events, one user owning HOT_FRACTION of them.
    Dim: per-user attributes, too big to broadcast at a realistic ratio
    (forced non-broadcast here via threshold=-1 so the join shuffles)."""
    fact = (
        spark.range(N_ROWS)
        .withColumn(
            "user_id",
            F.when(
                F.col("id") < int(N_ROWS * HOT_FRACTION), F.lit(0)
            ).otherwise(F.pmod(F.xxhash64("id"), F.lit(N_USERS))),
        )
        .withColumn("value", (F.col("id") % 1000).cast("double"))
    )
    dim = (
        spark.range(N_USERS)
        .withColumnRenamed("id", "user_id")
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(7)))
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_study/fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_study/dim")


def timed_join(spark, salted: bool, skew_handling: bool) -> tuple[float, str]:
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.enabled", str(skew_handling).lower()
    )
    # AQE's skew trigger (256 MB partition, 5× median) is sized for real
    # clusters; scale it to this study's data so the mechanism is
    # observable locally — at 100 TB the DEFAULTS fire the same way.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    # forbid broadcast so the skewed shuffle join is actually exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact = spark.read.parquet("/tmp/skew_study/fact")
    dim = spark.read.parquet("/tmp/skew_study/dim")
    spark._jvm.System.gc()  # noqa: SLF001
    t0 = time.perf_counter()
    if salted:
        joined = salted_join(fact, dim, on="user_id", unique_col="id", n_salts=32)
    else:
        joined = fact.join(dim, "user_id")
    out = joined.groupBy("segment").agg(F.sum("value").alias("v"))
    # collect() executes THIS DataFrame's queryExecution, so the plan we
    # read afterwards is the final adaptive plan (count() would spawn a
    # separate execution and the inspected plan would never have run)
    out.collect()
    elapsed = round(time.perf_counter() - t0, 2)
    plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return elapsed, plan


def reduce_balance(spark, salted: bool) -> dict:
    """Rows per reduce partition for the fact side of the join shuffle —
    the direct witness of what salting fixes: the hot key's reducer."""
    fact = spark.read.parquet("/tmp/skew_study/fact")
    keys = ["user_id", "__salt"] if salted else ["user_id"]
    if salted:
        fact = fact.withColumn(
            "__salt", F.pmod(F.xxhash64("id"), F.lit(32)).cast("int")
        )
    sizes = (
        fact.repartition(32, *[F.col(k) for k in keys])
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.5)").alias("med"),
        )
        .collect()[0]
    )
    return {"max_rows": sizes["mx"], "median_rows": sizes["med"]}


def main() -> None:
    spark = get_spark("skew-study")
    spark.sparkContext.setLogLevel("ERROR")
    build_tables(spark)

    # untimed warm-up so the first timed config doesn't absorb scan/codegen
    # first-run costs the others skip
    timed_join(spark, salted=False, skew_handling=True)

    t_aqe, plan_aqe = timed_join(spark, salted=False, skew_handling=True)
    t_plain, _ = timed_join(spark, salted=False, skew_handling=False)
    t_salted, plan_salted = timed_join(spark, salted=True, skew_handling=False)

    print(
        json.dumps(
            {
                "rows": N_ROWS,
                "hot_fraction": HOT_FRACTION,
                "aqe_skew_split_sec": t_aqe,
                "aqe_skew_evidence": "skew=true" in plan_aqe
                and "AQEShuffleRead skewed" in plan_aqe,
                "plain_smj_sec": t_plain,
                "salted_join_sec": t_salted,
                "salt_in_partitioning": "__salt" in plan_salted,
                "balance_unsalted": reduce_balance(spark, salted=False),
                "balance_salted": reduce_balance(spark, salted=True),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
