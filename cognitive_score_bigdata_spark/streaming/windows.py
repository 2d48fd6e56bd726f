"""Time-window aggregations (SURVEY §2.9 T6).

The reference keeps only point states ("aggregates" = latest snapshot);
a real analytics surface needs tumbling / sliding / session windows over
the event stream. These helpers work on both batch and streaming
DataFrames (``F.window``/``F.session_window`` are engine-agnostic), so
the oracle-checked batch queries in queries/windows_time.py exercise the
exact same expressions the streaming job runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def tumbling(
    df: DataFrame, ts: str, duration: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    w = F.window(F.col(ts), duration)
    return (
        df.groupBy(w, *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding(
    df: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    w = F.window(F.col(ts), duration, slide)
    return (
        df.groupBy(w, *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def windowed_event_counts(
    events: DataFrame,
    ts: str = "ts",
    duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming tumbling count with a watermark (T5+T6 combined).

    In append output mode a window is emitted only once the watermark
    passes its end; events arriving later than the watermark are dropped
    from state entirely — the bounded-state guarantee that lets this run
    forever on an unbounded stream.
    """
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), duration))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


def session(
    df: DataFrame, ts: str, gap: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    w = F.session_window(F.col(ts), gap)
    return (
        df.groupBy(w, *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )
