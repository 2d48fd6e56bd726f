"""Projection / filter / derived-column operators (SURVEY §2.2).

P1 projection, P2 comparison predicate, P3 null filter, P5 conditional
derived column, P6 rename, P7 default-on-missing, P8 casts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register


@register(
    "proj_filter_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity < 10
    """,
    doc="P1 column projection + P2 comparison predicate "
    "(main.py:140-145,154) — filter and pruning push to the parquet scan",
)
def proj_filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "proj_derived_status",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN value < 50 THEN 'Critical' ELSE 'Normal' END AS status,
           CAST(FLOOR(value) AS BIGINT) AS value_int,
           COALESCE(value, CAST(0 AS DOUBLE)) AS value_filled
    FROM events WHERE user_id IS NOT NULL
    """,
    doc="P3 null filter + P5 case-when status (main.py:106) + P7 coalesce "
    "default (main.py:63-65) + P8 cast (stream_processor.py:37-39)",
)
def proj_derived_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.when(F.col("value") < 50, "Critical")
            .otherwise("Normal")
            .alias("status"),
            F.floor("value").cast("bigint").alias("value_int"),
            F.coalesce("value", F.lit(0.0)).alias("value_filled"),
        )
    )


@register(
    "proj_rename_cast",
    oracle="""
    SELECT l_orderkey AS order_key,
           CAST(l_linenumber AS VARCHAR) AS line_no_str,
           CAST(l_linenumber AS BIGINT) AS line_no_big,
           l_returnflag AS return_flag
    FROM lineitem
    """,
    doc="P6 column rename (db_loader.py:64,152 hearth_rate→heart_rate "
    "path) + P8 widening/string casts",
)
def proj_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .withColumnRenamed("l_orderkey", "order_key")
        .select(
            "order_key",
            F.col("l_linenumber").cast("string").alias("line_no_str"),
            F.col("l_linenumber").cast("bigint").alias("line_no_big"),
            F.col("l_returnflag").alias("return_flag"),
        )
    )
