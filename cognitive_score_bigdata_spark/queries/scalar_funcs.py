"""Scalar-function surface (SURVEY §2.8, F1-F12) exercised end-to-end.

Engine-portability notes baked in here:
- DuckDB ``CAST(double AS BIGINT)`` rounds, Spark truncates → always go
  through an explicit ``FLOOR``.
- DuckDB ``regexp_replace`` is first-match unless given the ``'g'`` flag;
  Spark is always global.
- ``round()`` on doubles is avoided entirely (Spark rounds the shortest
  decimal rendering, DuckDB the binary value — they disagree on ties).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT event_id,
           substring(event_type, 1, 3) AS et3,
           upper(event_type) AS et_upper,
           CAST(length(event_type) AS BIGINT) AS et_len,
           'u_' || CAST(user_id AS VARCHAR) AS uid_tag,
           CASE WHEN event_type LIKE '%ck%' THEN 1 ELSE 0 END AS has_ck
    FROM events
    """,
    doc="F7 string slice/format: substring, upper, length, concat, LIKE "
    "(gen_wearables.py:43, ingestion.py:34)",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.substring("event_type", 1, 3).alias("et3"),
        F.upper("event_type").alias("et_upper"),
        F.length("event_type").cast("bigint").alias("et_len"),
        F.concat(F.lit("u_"), F.col("user_id").cast("string")).alias("uid_tag"),
        F.when(F.col("event_type").like("%ck%"), 1)
        .otherwise(0)
        .cast("int")
        .alias("has_ck"),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
    doc="F5 JSON parse — schema-on-read over the event props blob "
    "(ingestion.py:19, stream_processor.py:26)",
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
    )


@register(
    "scalar_datetime",
    oracle="""
    SELECT event_id, ts,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(day(ts) AS BIGINT) AS d,
           CAST(hour(ts) AS BIGINT) AS h,
           date_trunc('day', ts) AS ts_day,
           strftime(ts, '%Y-%m-%d') AS ts_str,
           CAST(FLOOR(date_part('epoch', ts)) AS BIGINT) AS epoch_s,
           CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
             AS days_since
    FROM events
    """,
    doc="F1/F3/F10/F11/F12 datetime surface: extract fields, truncate, "
    "format, epoch seconds, day arithmetic",
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
        F.date_trunc("DAY", F.col("ts")).cast("timestamp_ntz").alias("ts_day"),
        F.date_format("ts", "yyyy-MM-dd").alias("ts_str"),
        F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")))
        .cast("bigint")
        .alias("epoch_s"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount > 0.05 THEN 'HIGH'
                WHEN l_discount > 0.02 THEN 'MID'
                ELSE 'LOW' END AS disc_band,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           CASE WHEN l_quantity >= 25 THEN l_extendedprice ELSE NULL END
             AS big_price
    FROM lineitem
    """,
    doc="P5/P7 conditional surface: multi-branch CASE, NULLIF, "
    "conditional nulling (main.py:106,166)",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") > 0.05, "HIGH")
        .when(F.col("l_discount") > 0.02, "MID")
        .otherwise("LOW")
        .alias("disc_band"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.when(F.col("l_quantity") >= 25, F.col("l_extendedprice")).alias(
            "big_price"
        ),
    )


@register(
    "scalar_base64",
    oracle="""
    SELECT event_id,
           to_base64(encode(event_type)) AS et_b64,
           decode(from_base64(to_base64(encode(event_type)))) AS et_roundtrip
    FROM events
    """,
    doc="F4/S6 base64 encode/decode — the stream-record decode path "
    "(stream_processor.py:25) as batch expressions",
)
def scalar_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.base64(F.col("event_type").cast("binary")).alias("et_b64"),
        F.unbase64(F.base64(F.col("event_type").cast("binary")))
        .cast("string")
        .alias("et_roundtrip"),
    )


@register(
    "scalar_hash_md5",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5
    FROM documents
    """,
    doc="F2-adjacent deterministic fingerprint: md5 is the only hash both "
    "engines agree on; basis of the exact-dedup operator",
)
def scalar_hash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_md5")
    )
