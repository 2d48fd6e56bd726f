"""Seeded synthetic event-stream generation (reference simulators).

Spark-native rebuild of ``scripts/gen_wearables.py`` (tracking events)
and ``scripts/gen_score_requests.py`` (manual-entry/predict events):
``spark.range`` + seeded ``rand`` produce the same field distributions
(ranges documented in FIXTURES.md §A4) as distributed DataFrames, and a
writer drops them as JSON micro-batch files for the streaming pipeline.

Determinism: every random column derives from ``F.rand(seed + salt)``,
so a given (seed, n, users) triple always yields the same corpus —
unlike the reference's wall-clock-driven generators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _pick(col_rand, values: list):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.floor(col_rand * len(values)) + 1).cast("int"))


def gen_tracking_events(
    spark: SparkSession,
    n: int = 100,
    n_users: int = 5,
    seed: int = 42,
    base_ts: float = 1_700_000_000.0,
) -> DataFrame:
    """tracking_v1 shape (gen_wearables.py:41-51): steps 0-15,
    distance 0-0.05, heart_rate 65-130, calories 1-8, epoch-string ts."""
    df = spark.range(n)
    r = lambda s: F.rand(seed + s)  # noqa: E731
    user = F.concat(F.lit("user-"), (F.col("id") % n_users).cast("string"))
    return df.select(
        user.alias("user_id"),
        F.concat(F.lit("dev_"), F.substring(user, 1, 8)).alias("device_id"),
        F.lit("tracking_v1").alias("schema"),
        F.lit(False).alias("cognitive_predict"),
        F.floor(r(1) * 16).cast("int").alias("steps"),
        F.round(r(2) * 0.05, 3).alias("distance"),
        (65 + F.floor(r(3) * 66)).cast("int").alias("heart_rate"),
        (1 + F.floor(r(4) * 8)).cast("int").alias("calories"),
        (F.lit(base_ts) + F.col("id") * 2.0).cast("string").alias("timestamp"),
        F.concat(F.lit("trk-"), F.col("id").cast("string")).alias("event_id"),
    )


def gen_manual_entry_events(
    spark: SparkSession,
    n: int = 20,
    n_users: int = 5,
    seed: int = 43,
    base_ts: float = 1_700_000_000.0,
) -> DataFrame:
    """manual_entry_v1 shape (gen_score_requests.py:35-47): sleep 4-9,
    stress 1-10, caffeine {0,100,200}, screen 1-12."""
    df = spark.range(n)
    r = lambda s: F.rand(seed + s)  # noqa: E731
    user = F.concat(F.lit("user-"), (F.col("id") % n_users).cast("string"))
    return df.select(
        user.alias("user_id"),
        F.concat(F.lit("phone_"), F.substring(user, 1, 8)).alias("device_id"),
        F.lit("manual_entry_v1").alias("schema"),
        F.lit(True).alias("cognitive_predict"),
        F.round(4.0 + r(1) * 5.0, 1).alias("sleep_duration"),
        (1 + F.floor(r(2) * 10)).cast("int").alias("stress_level"),
        _pick(r(3), [0, 100, 200]).cast("int").alias("caffeine_intake"),
        F.round(1.0 + r(4) * 11.0, 1).alias("screen_time"),
        (F.lit(base_ts) + F.col("id") * 7.0 + 1.0)
        .cast("string")
        .alias("timestamp"),
        F.concat(F.lit("man-"), F.col("id").cast("string")).alias("event_id"),
    )


def write_event_files(
    events: DataFrame, drop_dir: str, files: int = 4
) -> None:
    """Drop events as JSON files (the micro-batch unit of the file
    source; ≤10-record batches mirror hot_path_processor.tf:83)."""
    events.repartition(files).write.mode("append").json(drop_dir)
