"""Join operators (SURVEY §2.3): J1 inner/broadcast, J2 composite left,
semi/anti (P4 integrity filter), full outer, as-of (J2's stated intent),
explode-based ownership join (J4/U4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.joins import asof_join
from cognitive_score_bigdata_spark.queries import register


@register(
    "join_inner_broadcast",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="J1 inner equi-join, small dim broadcast (main.py:146)",
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment")


@register(
    "join_left_composite",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, l.l_quantity, l.l_extendedprice
    FROM orders o
    LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_linenumber = 3
    """,
    doc="J2 left outer join on composite condition (main.py:147-148)",
)
def join_left_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem,
        (lineitem.l_orderkey == orders.o_orderkey)
        & (lineitem.l_linenumber == 3),
        "left",
    ).select("o_orderkey", "o_orderdate", "l_quantity", "l_extendedprice")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 300000)
    """,
    doc="P4 existence filter as left-semi join (db_loader.py:121-129)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1997-06-01'
                        AND o.o_orderdate < TIMESTAMP '1997-07-01')
    """,
    doc="anti join: customers with no June-1997 order (library "
    "completeness, §2.3; every customer has SOME order in this data, so "
    "the window keeps the result non-trivial)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_full_outer",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_nationkey, n.n_name
    FROM supplier s FULL OUTER JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    doc="full outer join (library completeness, §2.3)",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return supplier.join(
        nation, supplier.s_nationkey == nation.n_nationkey, "full_outer"
    ).select("s_suppkey", "s_name", "n_nationkey", "n_name")


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS click_ts, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="as-of join — the reference J2's stated intent ('heart rate at "
    "score time', main.py:147-148) as a first-class operator; union-tag "
    "single-shuffle implementation in operators/joins.py",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
    ).select("event_id", "user_id", "ts", "value", "click_ts", "click_value")


@register(
    "join_explode_ownership",
    oracle="""
    SELECT vec_id, label, UNNEST(embedding) AS component
    FROM embeddings
    """,
    doc="J4/U4 array-explode ownership pattern (db_loader.py:85-112): "
    "parent array → one row per child, parent attrs attached",
)
def join_explode_ownership(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", F.explode("embedding").alias("component"))
