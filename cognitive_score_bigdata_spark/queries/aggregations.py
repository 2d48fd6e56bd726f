"""Aggregation operators (SURVEY §2.4): filtered count, avg, grouped
multi-aggregate (TPC-H Q1 shape), last-per-key via max_by (A3), distinct
and approx-distinct, rollup/cube/grouping sets, manual variance.

All double sums/avgs route through the exact DECIMAL accumulator
(`_helpers`) so the DuckDB oracle hash matches bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table, register_views
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)


@register(
    "agg_filtered_count",
    oracle="""
    SELECT COUNT(CASE WHEN value < 50 THEN 1 END) AS critical_cnt,
           COUNT(*) AS total_cnt,
           {avg}
    FROM events
    """.format(avg=sql_davg("value", "avg_value")),
    doc="A1 filtered COUNT + A2 AVG (main.py:154-155)",
)
def agg_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").agg(
        F.count(F.when(F.col("value") < 50, 1)).alias("critical_cnt"),
        F.count(F.lit(1)).alias("total_cnt"),
        davg("value", "avg_value"),
    )


@register(
    "agg_group_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="grouped multi-aggregate, TPC-H Q1 shape — partial aggregation "
    "(map-side combine) halves the shuffle; A2 generalization",
)
def agg_group_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_latest_per_key",
    oracle="""
    SELECT user_id,
           arg_max(value, ts) AS last_value,
           arg_max(event_type, ts) AS last_event_type,
           MAX(ts) AS last_ts,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
    doc="A3 last-per-key as aggregate (stream_processor.py:19-40), "
    "event-time max_by instead of the reference's arrival-order overwrite",
)
def agg_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max_by("value", "ts").alias("last_value"),
            F.max_by("event_type", "ts").alias("last_event_type"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="distinct aggregate (library completeness, §2.4 note)",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "agg_approx_distinct",
    oracle=None,  # HLL sketch values are engine-specific; rows-only check
    doc="approx_count_distinct (HLL) — the 100 TB path for cardinality; "
    "exactness checked separately in tests against countDistinct",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        )
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy aggregate (§2.4 library extension)",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE aggregate (§2.4 library extension)",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT event_type, user_id, COUNT(*) AS cnt, {sql_dsum('value', 'sum_value')}
    FROM events GROUP BY GROUPING SETS ((event_type), (user_id), ())
    """,
    doc="GROUPING SETS aggregate (§2.4 library extension)",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type, user_id, COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY GROUPING SETS ((event_type), (user_id), ())
        """
    )


@register(
    "agg_variance_manual",
    oracle=f"""
    SELECT event_type,
           {sql_dsum('value', 'sum_v')},
           {sql_dsum('value * value', 'sum_v2')},
           COUNT(value) AS n,
           (CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
            - CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
              * CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value))
           / (COUNT(value) - 1) AS var_value
    FROM events GROUP BY event_type
    """,
    doc="variance via exact decimal moments — deterministic across "
    "engines where built-in stddev/var (Welford merge order) is not",
)
def agg_variance_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.col("value")
    sum_v = F.sum(v.cast("decimal(28,6)")).cast("double")
    sum_v2 = F.sum((v * v).cast("decimal(28,6)")).cast("double")
    n = F.count(v)
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            sum_v.alias("sum_v"),
            sum_v2.alias("sum_v2"),
            n.alias("n"),
            ((sum_v2 - sum_v * sum_v / n) / (n - F.lit(1))).alias("var_value"),
        )
    )
