"""Set operations (SURVEY §2.7): union all, union-by-name with missing
columns (the two event shapes sharing one stream — gen_wearables.py vs
gen_score_requests.py), intersect, except.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register


@register(
    "setop_union_all",
    oracle="""
    SELECT event_id, user_id, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, value FROM events WHERE event_type = 'view'
    """,
    doc="UNION ALL (§2.7 library)",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "value"
    )
    b = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "value"
    )
    return a.unionAll(b)


@register(
    "setop_union_by_name",
    oracle="""
    SELECT event_id, user_id, value, CAST(NULL AS VARCHAR) AS event_type
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), event_type
    FROM events WHERE event_type = 'error'
    """,
    doc="union by name with missing columns — the tracking_v1 / "
    "manual_entry_v1 shared-stream shape (§2.7)",
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "value"
    )
    b = ev.filter(F.col("event_type") == "error").select("event_id", "event_type")
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "setop_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    doc="INTERSECT (distinct semantics, §2.7 library)",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "setop_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'view' AND value > 90
    """,
    doc="EXCEPT (distinct semantics, §2.7 library): users with a "
    "high-value purchase but no high-value view (every user has every "
    "event type in this data, so the value cut keeps it non-trivial)",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 90)
    ).select("user_id")
    b = ev.filter(
        (F.col("event_type") == "view") & (F.col("value") > 90)
    ).select("user_id")
    return a.subtract(b)
