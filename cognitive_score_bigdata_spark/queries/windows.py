"""Window-function operators (SURVEY §2.5-2.6): latest-per-key (W1),
top-k recent (W2/O1), ranking/analytic functions, frame-spec rolling
aggregates, ntile.

Every ordering carries a unique tiebreaker (event_id / orderkey) so
results are deterministic under both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.joins import latest_per_key
from cognitive_score_bigdata_spark.queries import register


@register(
    "window_latest_per_key",
    oracle="""
    SELECT user_id, ts, event_type, value FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
    doc="W1 latest row per key — the DynamoDB Limit=1/ScanIndexForward="
    "False read (main.py:55-65) as a window",
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return latest_per_key(events, "user_id", "ts", tiebreak="event_id").select(
        "user_id", "ts", "event_type", "value"
    )


@register(
    "window_topk_recent",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 50
    """,
    doc="W2/O1 top-N most recent (main.py:149) — Spark plans "
    "TakeOrderedAndProject, no full sort",
)
def window_topk_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
    )


@register(
    "window_rank_analytic",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(value) OVER w AS first_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    doc="ranking + analytic window functions over the per-user event "
    "series (§2.5 library extension of W1)",
)
def window_rank_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
    )


@register(
    "window_rolling_avg",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
             / COUNT(value) OVER w AS rolling_avg_3,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS rolling_sum_3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    doc="frame-spec rolling aggregate (rowsBetween) over per-user series "
    "— §2.5 rolling-mean extension; exact decimal accumulator",
)
def window_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-2, Window.currentRow)
    )
    rolling_sum = F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double")
    rolling_cnt = F.count("value").over(w)
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (rolling_sum / rolling_cnt).alias("rolling_avg_3"),
        rolling_sum.alias("rolling_sum_3"),
    )


@register(
    "window_ntile",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC)
                AS BIGINT) AS price_quartile
    FROM orders
    """,
    doc="ntile bucketing (§2.5 library extension)",
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
    )
