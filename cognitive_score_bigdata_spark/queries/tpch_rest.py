"""The last four TPC-H query shapes (Q2/Q16/Q20/Q21), completing all 22.

The testdata star schema has no ``partsupp`` table, so the part↔supplier
association is derived from ``lineitem`` (which parts a supplier actually
shipped) — the JOIN/subquery structure of each original query is kept
intact, which is what these shapes exercise:

- Q2: correlated MIN subquery (cheapest supplier per part in a region)
- Q16: grouped COUNT(DISTINCT) with a NOT-IN supplier exclusion
- Q20: nested semi-joins against a correlated half-of-total threshold
- Q21: multi-EXISTS/NOT-EXISTS self-joins on the fact table

Scale posture: dims broadcast; the per-(part,supp) aggregate is one
shuffle reused by the correlated-min join; EXISTS/NOT EXISTS compile to
left-semi/left-anti joins, never row-at-a-time subquery execution.

Registered after the driver's current 50-entry window (round-2 module;
rotate forward next round).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import bigint, dsum, sql_dsum


@register(
    "analytics_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), regional AS (
      SELECT c.l_partkey, c.l_suppkey, c.cost,
             s.s_name, s.s_acctbal, n.n_name
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
    )
    SELECT p.p_partkey, g.s_name, g.n_name, g.s_acctbal, g.cost
    FROM regional g
    JOIN part p ON p.p_partkey = g.l_partkey AND p.p_size = 15
    WHERE g.cost = (SELECT MIN(g2.cost) FROM regional g2
                    WHERE g2.l_partkey = g.l_partkey)
    ORDER BY g.s_acctbal DESC, g.n_name, g.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: correlated MIN subquery — cheapest regional "
    "supplier per part, resolved as one (part,supp) aggregate reused on "
    "both sides of a min-equality self-join; dims broadcast; "
    "TakeOrderedAndProject caps the output (reference dashboard ORDER "
    "BY..LIMIT idiom, src/backend/main.py:139-155)",
)
def analytics_q2_min_cost_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)

    cost = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    regional = (
        cost.join(
            F.broadcast(
                supplier.join(
                    F.broadcast(
                        nation.join(
                            F.broadcast(region),
                            nation.n_regionkey == region.r_regionkey,
                        )
                    ),
                    supplier.s_nationkey == nation.n_nationkey,
                )
            ),
            cost.l_suppkey == supplier.s_suppkey,
        )
        .select("l_partkey", "l_suppkey", "cost", "s_name", "s_acctbal", "n_name")
    )
    min_cost = regional.groupBy("l_partkey").agg(
        F.min("cost").alias("__min_cost")
    )
    return (
        regional.join(min_cost, "l_partkey")
        .filter(F.col("cost") == F.col("__min_cost"))
        .join(F.broadcast(part), regional.l_partkey == part.p_partkey)
        .select("p_partkey", "s_name", "n_name", "s_acctbal", "cost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


@register(
    "analytics_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_size IN (5, 15, 25, 35, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
    doc="TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute "
    "group, with a NOT-IN exclusion compiled to a broadcast left-anti "
    "join (negative-balance suppliers stand in for the complaints list)",
)
def analytics_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_size").isin(5, 15, 25, 35, 45))
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(
            F.broadcast(excluded),
            lineitem.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(bigint(F.count_distinct(F.col("l_suppkey"))).alias("supplier_cnt"))
    )


@register(
    "analytics_q20_dominant_supplier",
    oracle=f"""
    WITH per_ps AS (
      SELECT l.l_partkey, l.l_suppkey,
             {sql_dsum('l.l_quantity', 'qty')}
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
        AND l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%re%')
      GROUP BY l.l_partkey, l.l_suppkey
    ), per_part AS (
      SELECT l_partkey, {sql_dsum('qty', 'total_qty')}
      FROM per_ps GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT ps.l_suppkey FROM per_ps ps JOIN per_part pp
        ON pp.l_partkey = ps.l_partkey
      WHERE ps.qty > 0.3 * pp.total_qty)
    """,
    doc="TPC-H Q20 shape: nested IN subqueries against a correlated "
    "share-of-total threshold — suppliers who shipped >30% of a part's "
    "1997 volume (partsupp availqty stands in as shipped volume); the "
    "(part,supp) aggregate is reused for the per-part total, one shuffle "
    "each, semi-join back to the supplier dim",
)
def analytics_q20_dominant_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part_keys = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%re%")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    per_ps = (
        lineitem.join(
            F.broadcast(part_keys),
            lineitem.l_partkey == part_keys.p_partkey,
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "qty"))
    )
    per_part = per_ps.groupBy("l_partkey").agg(dsum("qty", "total_qty"))
    dominant = (
        per_ps.join(per_part, "l_partkey")
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .select("l_suppkey")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supplier.join(dominant, supplier.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
        .distinct()
    )


@register(
    "analytics_q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape: suppliers solely responsible for late "
    "multi-supplier orders — EXISTS (another supplier in the order) as a "
    "left-semi join and NOT EXISTS (another LATE supplier) as a "
    "left-anti join on the fact table, broadcast supplier dim, "
    "TakeOrderedAndProject output",
)
def analytics_q21_waiting_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    lineitem = load_table(spark, sf_dir, "lineitem")

    late = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    solely_late = (
        late.join(
            l2,
            (late.l_orderkey == l2.o2) & (late.l_suppkey != l2.s2),
            "left_semi",
        ).join(
            l3,
            (late.l_orderkey == l3.o3) & (late.l_suppkey != l3.s3),
            "left_anti",
        )
    )
    return (
        solely_late.join(
            F.broadcast(supplier),
            solely_late.l_suppkey == supplier.s_suppkey,
        )
        .groupBy("s_name")
        .agg(bigint(F.count(F.lit(1))).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )
