"""Subquery shapes and remaining relational surface: scalar subquery,
IN-subquery, SELECT DISTINCT, array-function scalar surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import davg, sql_davg


@register(
    "subquery_scalar_avg_diff",
    oracle=f"""
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT {sql_davg('o_totalprice', 'a')} FROM orders)
             AS diff_from_avg
    FROM orders
    """,
    doc="scalar subquery: per-row deviation from a global aggregate — "
    "planned as broadcast of a 1-row aggregate (no per-row re-eval)",
)
def subquery_scalar_avg_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    avg_df = orders.agg(davg("o_totalprice", "a"))
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("o_totalprice") - F.col("a")).alias("diff_from_avg"),
        )
    )


@register(
    "subquery_in_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'MACHINERY')
    """,
    doc="IN-subquery as left-semi join against a filtered dimension",
)
def subquery_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    machinery = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    return orders.join(
        F.broadcast(machinery),
        orders.o_custkey == machinery.c_custkey,
        "left_semi",
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "proj_distinct",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="SELECT DISTINCT projection (hash aggregate, partial combine)",
)
def proj_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).distinct()


_ARR6 = (
    "array_to_string(list_transform({expr}, "
    "x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), ',')"
)


@register(
    "scalar_array_funcs",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           {_ARR6.format(expr="CAST(embedding[2:4] AS DOUBLE[])")}
             AS middle_slice,
           {_ARR6.format(expr="list_sort(CAST(embedding[1:3] AS DOUBLE[]))")}
             AS sorted_head,
           {_ARR6.format(expr="list_reverse(CAST(embedding[1:3] AS DOUBLE[]))")}
             AS reversed_head
    FROM embeddings
    WHERE vec_id < 100
    """,
    doc="array scalar surface: size, element_at, slice, sort_array, "
    "reverse — the ops the stringified-ID-array ETL path (F6/J4) builds "
    "on. Array outputs are serialized to DECIMAL(18,6)-formatted joined "
    "strings on both engines: exact (float32-derived values never sit on "
    "a rounding tie), and keeps every output column scalar-hashable for "
    "the driver's pandas canonicalizer, which cannot sort list dtype",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    dbl = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    s6 = lambda c: F.concat_ws(  # noqa: E731
        ",", F.transform(c, lambda x: x.cast("decimal(18,6)").cast("string"))
    )
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("first_component"),
            s6(dbl(F.slice("embedding", 2, 3))).alias("middle_slice"),
            s6(F.sort_array(dbl(F.slice("embedding", 1, 3)))).alias("sorted_head"),
            s6(F.reverse(dbl(F.slice("embedding", 1, 3)))).alias("reversed_head"),
        )
    )
