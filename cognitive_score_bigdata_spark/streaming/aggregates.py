"""Incrementally-maintained aggregate table (streaming materialized view).

The latest-state upsert (``pipeline.upsert_latest_state``) maintains a
point-in-time snapshot per key; this module maintains a RUNNING AGGREGATE
(per-user daily event counts / value sums) under the same constraint: no
transactional MERGE on plain parquet, at-least-once micro-batch replays.

Design — partials, not in-place updates:

- each micro-batch writes its PARTIAL aggregates (one row per key per
  epoch) into an ``__epoch=N/``-partitioned table with dynamic partition
  OVERWRITE, so a replayed epoch rewrites its own partition instead of
  double-counting (the same idempotence contract as the raw-lake write);
- the queryable view is ``SUM over partials`` — counts and sums are
  associative, so partial rows merge to exactly the batch-global answer
  (this is Catalyst's partial/final aggregation, externalized across
  time);
- ``compact_aggregate_partials`` folds all epochs into one, keeping the
  partials table O(keys) instead of O(keys x epochs) — run it on the
  maintenance cadence, never in the hot path.

At scale the partials table is partitioned by epoch (small, prunable)
and the view's final aggregation shuffles keys once — identical shape to
a batch groupBy, amortized across arrivals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.streaming.pipeline import (
    enrich,
    read_event_stream,
)


def _batch_partials(batch: DataFrame) -> DataFrame:
    """Per-(user, day) partial aggregate of one micro-batch."""
    return (
        batch.filter(F.col("user_id").isNotNull())
        .withColumn("day", F.to_date("ts"))
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("steps"), F.lit(0))).alias("sum_steps"),
        )
    )


def run_aggregate_maintenance(
    spark: SparkSession,
    input_dir: str,
    partials_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream events → enrich → write per-epoch partial aggregates."""

    def write_partials(batch: DataFrame, epoch_id: int) -> None:
        (
            _batch_partials(batch)
            .withColumn("__epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(partials_dir)
        )

    stream = enrich(read_event_stream(spark, input_dir))
    writer = stream.writeStream.foreachBatch(write_partials).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_aggregate_view(spark: SparkSession, partials_dir: str) -> DataFrame:
    """The materialized view: fold partials to (user_id, day, n_events,
    sum_steps). Associative aggregates make this exactly the answer a
    batch groupBy over all events would give."""
    return (
        spark.read.parquet(partials_dir)
        .groupBy("user_id", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_steps").alias("sum_steps"),
        )
    )


def compact_aggregate_partials(
    spark: SparkSession, partials_dir: str, out_dir: str
) -> None:
    """Fold every epoch into a single ``__epoch=-1`` generation at
    ``out_dir`` (a NEW path — same no-in-place safety rule as
    ``compact_small_files``). Keeps the partials table O(keys)."""
    (
        read_aggregate_view(spark, partials_dir)
        .withColumn("__epoch", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__epoch")
        .parquet(out_dir)
    )
