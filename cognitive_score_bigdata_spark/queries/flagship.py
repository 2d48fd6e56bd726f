"""Flagship dashboard query — the reference's `/api/dashboard/stats`.

Reference shape (``src/backend/main.py:139-155``): 3-table join (inner on
the dimension, left on a composite key), null-defaulting, threshold
status, top-50 by recency, plus two scalar aggregates (critical count,
average score). Re-expressed on the driver testdata star schema:
orders⋈customer (broadcast dim) left-⋈ lineitem on a composite key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import davg, sql_davg

_CRITICAL = 50000.0


@register(
    "flagship_dashboard",
    oracle=f"""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice, o.o_orderdate,
           COALESCE(l.l_quantity, CAST(0 AS DOUBLE)) AS first_line_qty,
           CASE WHEN o.o_totalprice < {_CRITICAL} THEN 'Critical' ELSE 'Normal' END AS status
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_linenumber = 1
    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
    LIMIT 50
    """,
    doc="Dashboard recent-checks: J1 broadcast inner + J2 composite left "
    "+ P5 status + P7 coalesce + O1 top-50 (main.py:139-151)",
)
def flagship_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
            "inner",
        )
        .join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_linenumber == 1),
            "left",
        )
        .select(
            "o_orderkey",
            "c_name",
            "o_totalprice",
            "o_orderdate",
            F.coalesce("l_quantity", F.lit(0.0)).alias("first_line_qty"),
            F.when(F.col("o_totalprice") < _CRITICAL, "Critical")
            .otherwise("Normal")
            .alias("status"),
        )
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(50)
    )


@register(
    "flagship_stats",
    oracle=f"""
    SELECT COUNT(CASE WHEN o_totalprice < {_CRITICAL} THEN 1 END) AS critical_alerts,
           {sql_davg('o_totalprice', 'avg_price')},
           CAST(FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                      / COUNT(o_totalprice)) AS BIGINT) AS avg_price_int,
           COUNT(*) AS total_orders
    FROM orders
    """,
    doc="Dashboard scalar aggregates: A1 filtered count + A2 avg "
    "(main.py:154-155)",
)
def flagship_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    avg_expr = F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast(
        "double"
    ) / F.count(F.col("o_totalprice"))
    return orders.agg(
        F.count(F.when(F.col("o_totalprice") < _CRITICAL, 1)).alias(
            "critical_alerts"
        ),
        davg("o_totalprice", "avg_price"),
        # the reference truncates the dashboard average at the edge
        # (main.py:172: int(avg))
        F.floor(avg_expr).cast("bigint").alias("avg_price_int"),
        F.count(F.lit(1)).alias("total_orders"),
    )
