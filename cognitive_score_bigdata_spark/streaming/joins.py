"""Stream-stream interval join: attach the wearable reading to each
score request, both arriving as live streams.

The reference does this as a point lookup against materialized state
(``src/backend/main.py:87-93``: fetch latest DynamoDB snapshot, merge
into the request dict) — a stream-to-table join. The genuinely streaming
formulation joins the two event streams directly: each ``manual_entry_v1``
(score request) picks up ``tracking_v1`` readings for the same user from
the preceding interval. Spark runs this as a watermarked stream-stream
join: both sides buffer rows in state, the event-time bound
(``t.ts BETWEEN m.ts - interval AND m.ts``) lets the engine evict state
once the watermark passes, and left-outer rows (requests with no recent
reading — the reference's "default item" case, ``main.py:62-65``) emit
exactly when the watermark proves no match can arrive.

State size is O(users × interval × rate), independent of stream length —
the property that makes this run indefinitely at cluster scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join_readings(
    tracking: DataFrame,
    manual: DataFrame,
    lag: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Left-outer stream-stream join of score requests to the wearable
    readings in the preceding ``lag`` per user.

    Both inputs must carry an event-time ``ts`` column and ``user_id``.
    Output: one row per (request, qualifying reading) pair, request
    columns prefixed ``m_``, reading columns ``t_``; unmatched requests
    surface with null reading columns once the watermark passes.
    """
    t = (
        tracking.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("t_user_id"),
            F.col("ts").alias("t_ts"),
            F.col("heart_rate").alias("t_heart_rate"),
            F.col("steps").alias("t_steps"),
            F.col("calories").alias("t_calories"),
        )
    )
    m = (
        manual.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("m_user_id"),
            F.col("ts").alias("m_ts"),
            F.col("event_id").alias("m_event_id"),
            F.col("sleep_duration").alias("m_sleep_duration"),
            F.col("stress_level").alias("m_stress_level"),
        )
    )
    cond = (
        (F.col("t_user_id") == F.col("m_user_id"))
        & (F.col("t_ts") >= F.expr(f"m_ts - INTERVAL {lag}"))
        & (F.col("t_ts") <= F.col("m_ts"))
    )
    return m.join(t, cond, "leftOuter").select(
        "m_user_id",
        "m_event_id",
        "m_ts",
        "m_sleep_duration",
        "m_stress_level",
        "t_ts",
        "t_heart_rate",
        "t_steps",
        "t_calories",
    )
