"""Remaining window/join/agg breadth: nth_value and offset/default lag,
explicit cross join, null-safe equality join, order-canonical collect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register


@register(
    "window_nth_lag_default",
    oracle="""
    SELECT event_id, user_id, ts, value,
           nth_value(value, 3) OVER w AS third_value,
           lag(value, 2, CAST(-1 AS DOUBLE)) OVER w AS lag2_or_neg1,
           last_value(value) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS running_last
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    doc="nth_value / offset lag with default / running last_value "
    "(§2.5 analytic completeness)",
)
def window_nth_lag_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.nth_value("value", 3).over(w).alias("third_value"),
        F.lag("value", 2, -1.0).over(w).alias("lag2_or_neg1"),
        F.last("value").over(wr).alias("running_last"),
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    doc="explicit cross join (small × small; §2.3 completeness)",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation)


@register(
    "join_null_safe",
    oracle="""
    WITH a AS (SELECT event_id, NULLIF(user_id % 10, 5) AS k, value
               FROM events WHERE event_type = 'click'),
         b AS (SELECT NULLIF(n_nationkey % 10, 5) AS k,
                      n_name FROM nation)
    SELECT a.event_id, a.k, a.value, b.n_name
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    doc="null-safe equality join (<=> / IS NOT DISTINCT FROM): null keys "
    "match each other instead of vanishing — the FK-with-missing-parent "
    "audit shape",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            F.nullif(F.col("user_id") % 10, F.lit(5)).alias("k"),
            "value",
        )
    )
    b = load_table(spark, sf_dir, "nation").select(
        F.nullif(F.col("n_nationkey") % 10, F.lit(5)).cast("bigint").alias("k"),
        "n_name",
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        "event_id", a["k"].alias("k"), "value", "n_name"
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT event_type,
           CAST(to_json(list_sort(list(DISTINCT user_id))) AS VARCHAR)
             AS user_ids,
           CAST(len(list(DISTINCT user_id)) AS BIGINT) AS n_users
    FROM events
    WHERE user_id < 20
    GROUP BY event_type
    """,
    doc="collect-to-array aggregation, canonicalized by sorting then "
    "JSON-serializing (collect order is nondeterministic in any "
    "distributed engine — sort makes it comparable; JSON string keeps "
    "every output column scalar-hashable for the compare edge)",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .groupBy("event_type")
        .agg(
            F.to_json(F.sort_array(F.collect_set("user_id"))).alias("user_ids"),
            F.size(F.collect_set("user_id")).cast("bigint").alias("n_users"),
        )
    )
