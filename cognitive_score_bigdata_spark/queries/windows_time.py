"""Time-window aggregations over the event stream (SURVEY §2.9 T6) as
oracle-checked batch queries. These run the exact expressions the
streaming job uses (streaming/windows.py): ``F.window`` /
``F.session_window`` are identical in batch and streaming plans, so
checking them here checks the streaming semantics too (minus watermark
mechanics, covered in tests/test_streaming.py).

Oracle formulations: tumbling = ``time_bucket``; sliding = union of the
two slide-offset buckets each event belongs to; session = the classic
lag-gap-mark + running-sum session id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import dsum, sql_dsum
from cognitive_score_bigdata_spark.streaming.windows import (
    session,
    sliding,
    tumbling,
)


@register(
    "window_tumbling_hourly",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="T6 tumbling window (1h) per event_type — same expression the "
    "streaming job aggregates with",
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    ).select("window_start", "window_end", "event_type", "n_events", "sum_value")


@register(
    "window_sliding_10m_5m",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts)
               - k.k * INTERVAL '5 minutes' AS window_start,
             value
      FROM events, (VALUES (0), (1)) k(k)
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM assigned
    GROUP BY 1, 2
    """,
    doc="T6 sliding window (10m window, 5m slide): every event lands in "
    "two windows; Spark's F.window(duration, slide) vs explicit bucket "
    "arithmetic in the oracle",
)
def window_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding(
        ev,
        "ts",
        "10 minutes",
        "5 minutes",
        [],
        [F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    ).select("window_start", "window_end", "n_events", "sum_value")


@register(
    "window_session_30m",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM sess
    GROUP BY user_id, sid
    """,
    doc="T6 session window (30m gap) per user: F.session_window vs the "
    "lag-gap/running-sum sessionization in the oracle; session_end is "
    "last event + gap (Spark semantics)",
)
def window_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")],
    ).select("user_id", "session_start", "session_end", "n_events", "sum_value")
