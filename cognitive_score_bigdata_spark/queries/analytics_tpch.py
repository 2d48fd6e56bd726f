"""Extended TPC-H-shape analytics queries (Q4/Q6/Q7/Q11/Q12/Q13/Q15/Q18/
Q19/Q22 adapted to the testdata star schema).

The reference's dashboard SQL (``src/backend/main.py:139-155``) is the seed
of an analytics surface; these are the canonical multi-join / subquery /
conditional-aggregate shapes that surface grows into at warehouse scale.
Each plan is written for the 100 TB posture: selective predicates sit on
the scan (pushdown), dimension sides broadcast, aggregates run
partial-then-final, disjunctive predicates stay inside codegen, and
scalar subqueries materialize as one-row broadcasts rather than
driver-side collects.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import (
    DEC,
    bigint,
    dsum,
    sql_dsum,
)


@register(
    "analytics_q6_selective",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: single-scan selective aggregate — every "
    "predicate reaches the parquet scan, zero joins, zero shuffles "
    "beyond the final 1-row reduce",
)
def analytics_q6_selective(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return lineitem.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "analytics_q4_exists_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated subquery as a left-semi join "
    "(dedup happens inside the join, no distinct needed), grouped count "
    "per priority class",
)
def analytics_q4_exists_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned,
            orders.o_orderkey == returned.l_orderkey,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "analytics_q12_priority_mix",
    oracle="""
    SELECT l.l_linestatus,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_returnflag = 'A'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape: conditional COUNT split (high/low priority) "
    "over a fact-fact join with pushed date+flag predicates",
)
def analytics_q12_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_returnflag") == "A")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(is_high, 1)).alias("high_line_count"),
            F.count(F.when(~is_high, 1)).alias("low_line_count"),
        )
    )


@register(
    "analytics_q13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                            AND o.o_orderpriority <> '5-LOW'
          GROUP BY c.c_custkey) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: customer order-count distribution — left outer "
    "join with an extra join-side predicate, then a second aggregation "
    "over the first's result (two shuffles by design)",
)
def analytics_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "analytics_q18_large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, {sql_dsum('l.l_quantity', 'total_qty')}
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: large-volume orders — IN over a HAVING "
    "aggregate becomes a semi-join of the re-aggregated fact, top-20 "
    "by order value",
)
def analytics_q18_large_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        lineitem.join(
            big.withColumnRenamed("l_orderkey", "big_orderkey"),
            lineitem.l_orderkey == F.col("big_orderkey"),
            "inner",
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(dsum("l_quantity", "total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "analytics_q19_disjunctive",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-attribute predicate across "
    "both join sides — stays inside whole-stage codegen, per-side "
    "sargable parts (brand/size, quantity bounds) still push to scans",
)
def analytics_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)
    )
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "analytics_q22_dormant",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(c_acctbal) AS v
      FROM customer WHERE c_acctbal > 0)
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
             AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape: scalar AVG subquery (one-row broadcast, no "
    "driver collect) + NOT EXISTS anti-join, grouped balance per nation",
)
def analytics_q22_dormant(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


@register(
    "analytics_q11_share",
    oracle=f"""
    WITH total AS (
      SELECT {sql_dsum('l_extendedprice', 'v')} FROM lineitem)
    SELECT l.l_suppkey, {sql_dsum('l.l_extendedprice', 'value')}
    FROM lineitem l
    GROUP BY l.l_suppkey
    HAVING CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
             > (SELECT v * 0.002 FROM total)
    ORDER BY value DESC, l.l_suppkey ASC
    """,
    doc="TPC-H Q11 shape: groups whose share exceeds a fraction of the "
    "global total — the total is a one-row broadcast joined into the "
    "HAVING filter (exact decimal sums on both sides of the compare)",
)
def analytics_q11_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    total = lineitem.agg(dsum("l_extendedprice", "v"))
    return (
        lineitem.groupBy("l_suppkey")
        .agg(dsum("l_extendedprice", "value"))
        .join(F.broadcast(total))
        .filter(F.col("value") > F.col("v") * 0.002)
        .select("l_suppkey", "value")
        .orderBy(F.desc("value"), F.asc("l_suppkey"))
    )


@register(
    "analytics_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_rev')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15 shape: top supplier by period revenue — the MAX "
    "scalar subquery reuses the aggregated view; equality on exact "
    "decimal-derived doubles is engine-stable",
)
def analytics_q15_top_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_rev"))
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supplier), revenue.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "analytics_q7_volume",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           YEAR(l.l_shipdate) AS l_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY cust_nation, supp_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume — symmetric nation-pair "
    "disjunction across two broadcast dimension chains, grouped by "
    "ship year",
)
def analytics_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # Only the two named nations can satisfy the pair disjunction, so
    # filter each dimension BEFORE its broadcast join — rows from any
    # other nation are dropped at the dimension scan instead of
    # surviving four joins to die in the post-join filter (VERDICT r15
    # item 8; the pair filter below still excludes the 3-3/7-7 combos).
    pair_nations = ("NATION_3", "NATION_7")
    n1 = nation.filter(F.col("n_name").isin(*pair_nations)).select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("cust_nation"),
    )
    n2 = nation.filter(F.col("n_name").isin(*pair_nations)).select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("cust_nation") == "NATION_3")
        & (F.col("supp_nation") == "NATION_7")
    ) | (
        (F.col("cust_nation") == "NATION_7")
        & (F.col("supp_nation") == "NATION_3")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", bigint(F.year("l_shipdate")))
        .groupBy("cust_nation", "supp_nation", "l_year")
        .agg(dsum(revenue, "revenue"))
    )


@register(
    "analytics_q8_market_share",
    oracle="""
    WITH volume AS (
      SELECT YEAR(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(28,6)) AS vol,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01')
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol END)
                AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM volume GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's market share of regional revenue "
    "per year — conditional-sum ratio over a 7-way dimension-chain join, "
    "exact decimal accumulators on both sides of the division",
)
def analytics_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("n2_key"))
        .select(
            bigint(F.year("o_orderdate")).alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("vol"))
                ).cast("double")
                / F.sum("vol").cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "analytics_q9_profit",
    oracle=f"""
    SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
           {sql_dsum(
               'l.l_extendedprice * (1 - l.l_discount)'
               ' - p.p_retailprice * l.l_quantity * 0.4',
               'profit',
           )}
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation ASC, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit per supplier nation per year (supply "
    "cost modeled as 40% of part retail price — the testdata schema has "
    "no partsupp table), LIKE-filtered part dimension broadcast",
)
def analytics_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.4
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            bigint(F.year("o_orderdate")).alias("o_year"),
            profit.alias("__p"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("__p"), "profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "analytics_q17_small_qty",
    oracle=f"""
    WITH avg_qty AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(l_quantity) AS aq
      FROM lineitem GROUP BY l_partkey)
    SELECT {sql_dsum('l.l_extendedprice', 'total_price')},
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < 0.5 * a.aq
    """,
    doc="TPC-H Q17 shape: rows below half their group's average — the "
    "correlated per-group scalar aggregate becomes a re-aggregated "
    "self-join on the group key (exact decimal average, so the < "
    "comparison can't flip between engines)",
)
def analytics_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    )
    avg_qty = lineitem.groupBy(F.col("l_partkey").alias("ak")).agg(
        (
            F.sum(F.col("l_quantity").cast(DEC)).cast("double")
            / F.count("l_quantity")
        ).alias("aq")
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(avg_qty, lineitem.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            dsum("l_extendedprice", "total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
