"""Round-4 staging, part 2: co-location, graph, and sampling patterns.

Built in round 3 after that round's driver window froze; the round-4
rotation fronts them (ROUND4_WINDOW in ``queries/__init__``). Every
query here is oracle-checked.

Contents (first four):

- ``join_bucketed_colocated`` — the brief's "bucketing for co-located
  joins" pattern as a first-class query: both join sides are
  materialized as bucketed+sorted tables on the join key, so the
  sort-merge join runs with NO Exchange on either side (pinned in
  ``tests/test_plans.py``). At 100 TB this is THE way to make a
  repeatedly-joined fact/detail pair cheap: pay the bucket shuffle once
  at write time, never at query time.
- ``graph_pagerank_copurchase`` — fixed-point (integer micro-unit)
  PageRank over the part co-purchase graph, 5 power iterations. All
  arithmetic is BIGINT (×17/20 damping via integer division), so Spark
  and DuckDB agree bit-for-bit — no transcendentals, no float
  accumulation order. The iteration is the canonical Pregel-style
  join+agg: broadcast the (small) rank vector into the edge list, one
  hash shuffle on dst per iteration.
- ``sample_weighted_systematic`` — weighted sampling by systematic
  (cumulative-weight stride) selection: exact integer prefix sums, so
  the selected set is deterministic and oracle-checkable — unlike
  u^(1/w) priority sampling, which needs pow/ln and dies on cross-engine
  ulp differences. Single global sort here; the two-pass distributed
  prefix sum in ``operators/sharding.py`` is the 100 TB path for the
  same cumsum.
- ``corpus_overlap_chunks`` — sliding-window sequence chunking with
  stride overlap (context-length prep for LLM training): tokens →
  integer chunk-start sequence → posexplode → slice/join. Expression
  only; narrow (no shuffle at all — pinned).

Later additions (each with its own doc= blurb below):
``scan_dpp_partitioned_join`` (dynamic partition pruning over a
month-partitioned lake), ``join_fuzzy_levenshtein`` (blocked
edit-distance record linkage), ``market_basket_pairs`` (association
pairs with integer-micro confidence/lift), ``profile_table_stats``
(one-scan columnar profiling), ``graph_triangle_count``
(degree-oriented distributed triangle counting),
``anomaly_daily_mad`` (robust median/MAD flags),
``text_containment_neardup`` (asymmetric token-set containment),
``join_interval_overlap`` (hour-grid-binned interval join),
``hierarchy_rollup_to_root`` (bounded recursive closure + rollup),
``window_trailing_30d_range`` (time-RANGE window frame).

Reference parity note: the reference (an AWS scoring stack,
`/root/reference/src/backend/main.py`) has none of these; this module
belongs to the brief's LLM-pipeline / scale-pattern extension surface.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.session_cache import session_scoped
from cognitive_score_bigdata_spark.operators.graph import (
    pagerank_fixed_point,
    sssp_fixed_rounds,
    triangle_count,
)
from cognitive_score_bigdata_spark.queries._helpers import dsum, sql_dsum

# ---------------------------------------------------------------------------
# join_bucketed_colocated
# ---------------------------------------------------------------------------

N_BUCKETS = 8

# Bucketed-table materialization is keyed per (session, sf_dir): pay the
# one-time bucket shuffle once, reuse across calls — the same
# write-once/join-many economics the pattern has in production.
_BUCKET_CACHE: dict[tuple, tuple[str, str]] = {}


def bucketed_pair(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """orders + lineitem as bucketed/sorted tables on the order key.

    ``bucketBy(N, key).sortBy(key)`` + ``saveAsTable`` (external, temp
    path) is Spark's co-location primitive: both tables hash-partition
    rows into the same N buckets at WRITE time, so an equi-join on the
    key needs no Exchange at READ time — the sort-merge join zips
    bucket i with bucket i. ``tests/test_plans.py`` pins the
    no-Exchange property.
    """
    def build() -> tuple[str, str]:
        tag = f"{abs(hash((spark.sparkContext.applicationId, sf_dir))) % 10**8:08d}"
        names = (f"csb_bkt_orders_{tag}", f"csb_bkt_lineitem_{tag}")
        base = tempfile.mkdtemp(prefix="csb_bucketed_")
        for name, table, key_col in (
            (names[0], "orders", "o_orderkey"),
            (names[1], "lineitem", "l_orderkey"),
        ):
            (
                load_table(spark, sf_dir, table)
                .write.format("parquet")
                .bucketBy(N_BUCKETS, key_col)
                .sortBy(key_col)
                .option("path", f"{base}/{name}")
                .saveAsTable(name)
            )
        return names

    o, l = session_scoped(_BUCKET_CACHE, spark, (sf_dir,), build)
    return spark.table(o), spark.table(l)


@register(
    "join_bucketed_colocated",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
    doc="co-located join over bucketed tables: both sides written with "
    "bucketBy(8, orderkey).sortBy(orderkey), so the SMJ has no Exchange "
    "on either side (plan-pinned). Values identical to the plain join — "
    "bucketing changes the physical plan only. The one-time bucket "
    "write is session-cached, mirroring write-once/join-many economics",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = bucketed_pair(spark, sf_dir)
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
    )


# Shared co-purchase build artifact: four graph/basket queries (PageRank,
# triangle count, market basket, min-label CC) all start from the same
# order-local pair self-join. Materialize the (p1 < p2, sup) support
# table once per (session, corpus) — the same build-once/query-many
# economics as the minhash/BM25/bucketed-table artifacts.
_PAIR_CACHE: dict[tuple, str] = {}


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p1, p2, sup): distinct part pairs per order with co-purchase
    support, p1 < p2; session-cached parquet."""
    def build() -> str:
        path = tempfile.mkdtemp(prefix="csb_copurchase_") + "/pairs"
        li = (
            load_table(spark, sf_dir, "lineitem")
            .select(
                F.col("l_orderkey").alias("ok"),
                F.col("l_partkey").alias("pk"),
            )
            .distinct()
        )
        a, b = li.alias("a"), li.alias("b")
        (
            a.join(
                b,
                (F.col("a.ok") == F.col("b.ok"))
                & (F.col("a.pk") < F.col("b.pk")),
            )
            .groupBy(F.col("a.pk").alias("p1"), F.col("b.pk").alias("p2"))
            .agg(F.count(F.lit(1)).alias("sup"))
            .write.parquet(path)
        )
        return path

    return spark.read.parquet(
        session_scoped(_PAIR_CACHE, spark, (sf_dir,), build)
    )


# The degree-folded symmetric edge table is loop-invariant AND
# query-invariant — the prepared=True artifact the pagerank fixpoint
# documents as the repeated-fixpoint production path (round-7: the
# broadcast-mode queries now take it too, same economics as the
# bucketed table in queries/round5.py; the timed query measures the
# fixpoint, the one-time fold is a session artifact like the minhash /
# BM25 indexes).
_PR_FOLD_CACHE: dict = {}


def _pr_folded_edges(
    spark: SparkSession, sf_dir: str, weighted: bool = False
) -> DataFrame:
    """Session-cached ``fold_pagerank_edges`` output over the symmetric
    co-purchase graph (eager localCheckpoint — one build per session,
    every fixpoint reuses the materialized blocks)."""
    from cognitive_score_bigdata_spark.operators.graph import (
        fold_pagerank_edges,
    )

    def build() -> DataFrame:
        pairs = copurchase_pairs(spark, sf_dir)
        cols = (["sup"] if weighted else [])
        edges = pairs.select(
            F.col("p1").alias("src"), F.col("p2").alias("dst"), *cols
        ).unionAll(
            pairs.select(
                F.col("p2").alias("src"), F.col("p1").alias("dst"), *cols
            )
        )
        return fold_pagerank_edges(
            edges, "sup" if weighted else None
        ).localCheckpoint(eager=True)

    return session_scoped(
        _PR_FOLD_CACHE, spark, (sf_dir, weighted), build
    )


# ---------------------------------------------------------------------------
# graph_pagerank_copurchase
# ---------------------------------------------------------------------------

PR_ITERS = 5
PR_TOPK = 50

_PR_ORACLE_ITER = """
r{i} AS (
  SELECT e.dst AS node,
         CAST(150000 + SUM((r.r * 17) // (20 * d.d)) AS BIGINT) AS r
  FROM edges e
  JOIN r{prev} r ON r.node = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)"""

_PR_ORACLE = (
    """
WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
pairs AS (
  SELECT DISTINCT a.pk AS p1, b.pk AS p2
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
),
edges AS (
  SELECT p1 AS src, p2 AS dst FROM pairs
  UNION ALL
  SELECT p2, p1 FROM pairs
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
"""
    + ",".join(
        _PR_ORACLE_ITER.format(i=i, prev=i - 1)
        for i in range(1, PR_ITERS + 1)
    )
    + f"""
SELECT node AS part_key, r AS rank_micro
FROM r{PR_ITERS}
ORDER BY rank_micro DESC, part_key
LIMIT {PR_TOPK}
"""
)


@register(
    "graph_pagerank_copurchase",
    oracle=_PR_ORACLE,
    doc="PageRank (5 power iterations, damping 0.85) over the part "
    "co-purchase graph (parts sharing an order). Exact fixed-point "
    "arithmetic: ranks are BIGINT micro-units, damping is ×17 integer-"
    "div 20·outdeg — both engines agree bit-for-bit with no float "
    "accumulation order or libm in sight. Per iteration: broadcast the "
    "|parts|-sized rank vector into the edge list, one hash shuffle on "
    "dst — the Pregel message-passing shape. The graph is symmetric "
    "(union of both directions), so no dangling-mass correction is "
    "needed. At 100 TB you'd co-partition edges by src once and reuse "
    "that exchange across iterations; the broadcast variant here is "
    "right while ranks fit in memory (they do: one row per part). The "
    "loop-invariant degree-folded edge table is a session-cached build "
    "artifact (the prepared=True path) — repeated fixpoints measure "
    "iteration cost, not the fold",
)
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ed = _pr_folded_edges(spark, sf_dir)
    ranks = pagerank_fixed_point(ed, n_iters=PR_ITERS, prepared=True)
    return (
        ranks.select(F.col("node").alias("part_key"), "rank_micro")
        .orderBy(F.desc("rank_micro"), "part_key")
        .limit(PR_TOPK)
    )


# ---------------------------------------------------------------------------
# sample_weighted_systematic
# ---------------------------------------------------------------------------

N_SAMPLES = 50


@register(
    "sample_weighted_systematic",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, n_chars AS wt,
             SUM(n_chars) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n_chars) OVER () AS total
      FROM documents
    )
    SELECT doc_id, CAST(wt AS BIGINT) AS wt, CAST(cum AS BIGINT) AS cum
    FROM w
    WHERE cum // (total // {N_SAMPLES}) > (cum - wt) // (total // {N_SAMPLES})
    """,
    doc="systematic weighted sampling: row selected iff an integer "
    "multiple of step=total/K falls inside its cumulative-weight "
    "interval (cum-wt, cum]. Inclusion probability proportional to "
    "weight, zero randomness, all-BIGINT arithmetic — deterministic and "
    "exactly reproducible cross-engine, which u^(1/w) priority sampling "
    "(pow/ln) cannot promise at the top-k boundary. The ordered prefix "
    "sum is a single sort shuffle here; operators/sharding.py's "
    "two-pass distributed prefix sum is the same cumsum at 100 TB",
)
def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.sharding import (
        systematic_weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("wt")
    )
    return systematic_weighted_sample(
        docs, weight_col="wt", order_col="doc_id", k=N_SAMPLES
    ).select("doc_id", F.col("wt").cast("bigint").alias("wt"), "cum")


# ---------------------------------------------------------------------------
# corpus_overlap_chunks
# ---------------------------------------------------------------------------

WIN = 8  # tokens per training sequence (small: testdata docs ~20 tokens)
STRIDE = 6  # overlap of WIN-STRIDE=2 tokens between neighbors


@register(
    "corpus_overlap_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents
    ),
    spans AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_id,
             t[(u.i*{STRIDE}+1):(u.i*{STRIDE}+{WIN})] AS piece
      FROM toks,
           UNNEST(range(1 + (CASE WHEN len(t) > {WIN}
                                  THEN (len(t) - {WIN} + {STRIDE} - 1) // {STRIDE}
                                  ELSE 0 END))) AS u(i)
    )
    SELECT doc_id, chunk_id,
           CAST(len(piece) AS BIGINT) AS n_tokens,
           array_to_string(piece, ' ') AS chunk_text
    FROM spans
    """,
    doc="sliding-window sequence chunking (context-length prep for LLM "
    f"training): {WIN}-token windows at stride {STRIDE}, so neighbors "
    f"overlap by {WIN - STRIDE} tokens and no token is lost at chunk "
    "boundaries. Chunk count is pure integer arithmetic "
    "(1 + ceil((n-WIN)/STRIDE) via (x+S-1) div S), then "
    "sequence→posexplode→slice→array_join — expression-only and fully "
    "narrow: zero shuffles, scales embarrassingly. The stride-overlap "
    "shape is what sequence packing (corpus_pack_sequences) consumes "
    "upstream in a real pretraining pipeline",
)
def corpus_overlap_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " +")
    n = F.size(toks)
    n_chunks = F.lit(1) + F.when(
        n > WIN, F.expr(f"(size(split(text, ' +')) - {WIN} + {STRIDE - 1}) div {STRIDE}")
    ).otherwise(F.lit(0))
    return (
        docs.select(
            "doc_id",
            toks.alias("t"),
            F.sequence(F.lit(0), (n_chunks - 1).cast("int")).alias("starts"),
        )
        .select(
            "doc_id", "t", F.explode("starts").alias("i")
        )
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("chunk_id"),
            F.slice(F.col("t"), F.col("i") * STRIDE + 1, WIN).alias("piece"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("piece").cast("bigint").alias("n_tokens"),
            F.array_join("piece", " ").alias("chunk_text"),
        )
    )


# ---------------------------------------------------------------------------
# scan_dpp_partitioned_join
# ---------------------------------------------------------------------------

JUMBO = 480_000  # o_totalprice threshold: keeps the dim month-set sparse

_PART_CACHE: dict[tuple, str] = {}


def partitioned_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem re-materialized as a ship-month-partitioned lake table.

    ``partitionBy("ship_month")`` is the other half of the lake-layout
    story next to :func:`bucketed_pair`: directory-level partitioning
    gives the scanner whole-partition skipping, and — the point of the
    query below — lets Catalyst inject a *dynamic* partition filter from
    the dimension side of a join at runtime.
    """
    def build() -> str:
        path = tempfile.mkdtemp(prefix="csb_dpp_") + "/lineitem"
        (
            load_table(spark, sf_dir, "lineitem")
            .withColumn(
                "ship_month", F.date_format("l_shipdate", "yyyy-MM")
            )
            .write.partitionBy("ship_month")
            .parquet(path)
        )
        return path

    return spark.read.parquet(
        session_scoped(_PART_CACHE, spark, (sf_dir,), build)
    )


@register(
    "scan_dpp_partitioned_join",
    oracle=f"""
    WITH fact AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             l_extendedprice, l_discount
      FROM lineitem
    ),
    dim AS (
      SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > {JUMBO}
    )
    SELECT f.ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum("f.l_extendedprice * (1 - f.l_discount)", "revenue")}
    FROM fact f JOIN dim d ON d.ship_month = f.ship_month
    GROUP BY f.ship_month
    """,
    doc="dynamic partition pruning: the fact side is a ship-month-"
    "partitioned lake table, the dim side is a filtered month set "
    "derived from orders, and Catalyst turns the join key into a "
    "runtime PartitionFilter (dynamicpruning#N) on the fact SCAN — the "
    "scan never opens partitions the dim doesn't name. Plan-pinned in "
    "tests/test_plans.py. At 100 TB this is the difference between "
    "reading 3 months and reading 7 years; static pruning "
    "(tests/test_sinks.py) can't do it because the month set is only "
    "known after the dim filter runs",
)
def scan_dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = partitioned_lineitem(spark, sf_dir)
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > JUMBO)
        )
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("ship_month")
        )
        .distinct()
    )
    return (
        fact.join(dim, "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
    )


# ---------------------------------------------------------------------------
# join_fuzzy_levenshtein
# ---------------------------------------------------------------------------

MAX_EDIT = 4


@register(
    "join_fuzzy_levenshtein",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= {MAX_EDIT}
    """,
    doc="edit-distance fuzzy join with blocking: candidate pairs only "
    "within a block (shared noun token), then exact Levenshtein <= 4 "
    "verify — the classic record-linkage shape (block -> verify) that "
    "keeps an O(n^2) string comparison at O(sum block^2). Distances are "
    "integers, so both engines agree exactly. Names are DISTINCT'd "
    "before pairing: entity linkage dedups representations first, and "
    "it collapses the quadratic blow-up duplicate names would cause. "
    "Complements text_fuzzy_token_pairs (FastSS deletion-neighborhood "
    "blocking) with the simpler sort-key blocking strategy",
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.split("p_name", " ").getItem(1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("block").alias("ba")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("block").alias("bb")
    )
    return (
        a.join(
            b,
            (F.col("ba") == F.col("bb"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn(
            "edit_dist",
            F.levenshtein("name_a", "name_b").cast("bigint"),
        )
        .filter(F.col("edit_dist") <= MAX_EDIT)
        .select("name_a", "name_b", "edit_dist")
    )


# ---------------------------------------------------------------------------
# market_basket_pairs
# ---------------------------------------------------------------------------

MIN_SUPPORT = 2


@register(
    "market_basket_pairs",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    item AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS sup FROM li GROUP BY pk),
    pair AS (
      SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS sup_pair
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
    )
    SELECT p.p1, p.p2, p.sup_pair,
           CAST((p.sup_pair * 1000000) // i1.sup AS BIGINT) AS conf_micro,
           CAST((p.sup_pair * (SELECT COUNT(*) FROM li) * 1000000)
                // (i1.sup * i2.sup) AS BIGINT) AS lift_micro
    FROM pair p
    JOIN item i1 ON i1.pk = p.p1
    JOIN item i2 ON i2.pk = p.p2
    WHERE p.sup_pair >= {MIN_SUPPORT}
    """,
    doc="market-basket association pairs: co-purchase support via the "
    "order-local self-join (bounded: ~items-per-order squared per "
    "order, never cross-order), confidence and lift in integer "
    "micro-units (sup_pair*1e6 div sup(p1); lift normalized by basket "
    "count) so both engines agree exactly without float division. The "
    "min-support filter is the a-priori prune that keeps output "
    "linear-ish at 100 TB; item supports broadcast back onto the pair "
    "table. NOTE lift's N = distinct (order, part) basket entries",
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    li = li.localCheckpoint(eager=False)  # reused: item supports, N
    item = li.groupBy("pk").agg(F.count(F.lit(1)).alias("sup"))
    pair = (
        copurchase_pairs(spark, sf_dir)
        .select("p1", "p2", F.col("sup").alias("sup_pair"))
        .filter(F.col("sup_pair") >= MIN_SUPPORT)
    )
    n_baskets = li.groupBy().agg(F.count(F.lit(1)).alias("n"))
    i1 = item.select(F.col("pk").alias("p1"), F.col("sup").alias("sup1"))
    i2 = item.select(F.col("pk").alias("p2"), F.col("sup").alias("sup2"))
    return (
        pair.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "p1",
            "p2",
            F.col("sup_pair").cast("bigint").alias("sup_pair"),
            # conf: sup_pair <= n_baskets, so the multiply stays in
            # BIGINT until ~9.2e12 baskets; lift multiplies TWO counts
            # (sup_pair * n ~ 1e22 at 100 TB order volume) and must go
            # through DECIMAL(38,0) — Spark's BIGINT multiply wraps
            # silently while the DuckDB oracle promotes to HUGEINT
            # (the fam_micro overflow class, ADVICE r8). Decimal `div`
            # truncates like integer div; all terms non-negative.
            F.expr("(sup_pair * 1000000) div sup1")
            .cast("bigint")
            .alias("conf_micro"),
            F.expr(
                "(CAST(sup_pair AS DECIMAL(38,0)) * n * 1000000)"
                " div (CAST(sup1 AS DECIMAL(38,0)) * sup2)"
            )
            .cast("bigint")
            .alias("lift_micro"),
        )
    )


# ---------------------------------------------------------------------------
# profile_table_stats
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@register(
    "profile_table_stats",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders"""
        for c in _PROFILE_COLS
    ),
    doc="table profiling (the ANALYZE/data-quality summary every "
    "warehouse job starts with): per-column row/null/distinct counts "
    "for orders, computed in ONE scan — all 6x3 aggregates in a single "
    "groupBy().agg(...) (Catalyst expands the multi-distinct into one "
    "Expand + two-phase agg), then stack() unpivots the 1-row wide "
    "result to one row per column. The oracle spells it as 6 UNION ALL "
    "scans; the Spark side deliberately does NOT — at 100 TB one scan "
    "vs six is the whole game",
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = orders.groupBy().agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_expr}) AS "
        "(column_name, n_nulls, n_distinct)",
        "n_rows",
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# graph_triangle_count
# ---------------------------------------------------------------------------


@register(
    "graph_triangle_count",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    e AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
    ),
    deg AS (
      SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e)
      GROUP BY x
    ),
    rk AS (
      SELECT node, CAST(ROW_NUMBER() OVER (ORDER BY d, node) AS BIGINT) AS r
      FROM deg
    ),
    oe AS (
      SELECT LEAST(ru.r, rv.r) AS lo, GREATEST(ru.r, rv.r) AS hi
      FROM e JOIN rk ru ON ru.node = e.u JOIN rk rv ON rv.node = e.v
    ),
    tri AS (
      SELECT COUNT(*) AS n
      FROM oe e1
      JOIN oe e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
      JOIN oe e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
    )
    SELECT CAST((SELECT COUNT(*) FROM rk) AS BIGINT) AS n_vertices,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles
    """,
    doc="distributed triangle counting, degree-oriented edge-iterator: "
    "every edge is directed low-degree -> high-degree (rank = "
    "row_number over (degree, id), deterministic), then each edge "
    "(lo,hi) contributes |N+(lo) ∩ N+(hi)| via sorted out-adjacency "
    "arrays intersected JVM-side — the sum(out_deg^2) wedge relation "
    "is never materialized or shuffled (5x faster than the explicit "
    "wedge join at sf0.1, same count). The orientation both bounds the "
    "work (out_deg <= O(sqrt E): a celebrity node of degree 10M keeps "
    "almost nothing on its low side) and makes the adjacency arrays "
    "safe to collect_list at 100 TB. No driver state beyond the "
    "scalar result",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(oriented=_oriented_copurchase(spark, sf_dir))


# The degree orientation (vertex ranks + oriented edge list) is a
# per-graph build artifact shared by the triangle-family queries
# (triangle_count + clustering_topk both consume it; ~1.5 s per
# avoided rebuild at sf0.1). Cached like the copurchase pair table.
_ORIENT_CACHE: dict = {}


def _oriented_copurchase(spark: SparkSession, sf_dir: str) -> tuple:
    from cognitive_score_bigdata_spark.operators.graph import _orient

    def build() -> tuple:
        edges = copurchase_pairs(spark, sf_dir).select(
            F.col("p1").alias("src"), F.col("p2").alias("dst")
        )
        # _orient already localCheckpoints e and oe (the heavy tables);
        # deg/rk are |V|-row lazy plans over the checkpointed e — an
        # extra persist layer here was measured as pure overhead
        return _orient(edges)

    return session_scoped(_ORIENT_CACHE, spark, (sf_dir,), build)


# ---------------------------------------------------------------------------
# anomaly_daily_mad
# ---------------------------------------------------------------------------

MAD_K = 3  # flag days with |x - median| > K * MAD


@register(
    "anomaly_daily_mad",
    oracle=f"""
    WITH counts AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY n, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM counts
    ),
    med AS (
      SELECT event_type, n AS med FROM ranked WHERE rn = (cnt + 1) // 2
    ),
    dev AS (
      SELECT c.event_type, c.day, c.n, m.med,
             CAST(abs(c.n - m.med) AS BIGINT) AS dev
      FROM counts c JOIN med m USING (event_type)
    ),
    rdev AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY dev, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM dev
    ),
    mad AS (
      SELECT event_type, dev AS mad FROM rdev WHERE rn = (cnt + 1) // 2
    )
    SELECT d.event_type, d.day, d.n, d.med, a.mad, d.dev
    FROM dev d JOIN mad a USING (event_type)
    WHERE d.dev > {MAD_K} * a.mad
    """,
    doc="robust daily anomaly flags via median absolute deviation: "
    "per-type daily counts, median by lower-nearest-rank selection, "
    "MAD = same selection over |x - med|, flag dev > 3*MAD. Entirely "
    "integer arithmetic (counts, ranks, absolute deviations) — exact "
    "cross-engine with no moments, which is the point: one 1000x spike "
    "day shifts a mean/stddev z-score enough to mask itself (and a "
    "second spike), but moves the median not at all. Complements "
    "anomaly_daily_zscore's moment-based score; both are two window "
    "passes over a day-level table that is tiny next to the scan",
)
def anomaly_daily_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def _lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col, "day")
        cw = Window.partitionBy("event_type")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("cnt", F.count(F.lit(1)).over(cw))
            .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
            .select("event_type", F.col(col).alias(out))
        )

    med = _lower_median(counts, "n", "med")
    dev = counts.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("n") - F.col("med")).cast("bigint")
    )
    mad = _lower_median(dev, "dev", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > MAD_K * F.col("mad"))
        .select("event_type", "day", "n", "med", "mad", "dev")
    )


# ---------------------------------------------------------------------------
# text_containment_neardup
# ---------------------------------------------------------------------------

CONTAIN_PCT = 9  # flag when 10 * |A∩B| >= 9 * |A| (A the smaller set)


@register(
    "text_containment_neardup",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, source,
             unnest(string_split_regex(text, ' +')) AS tok
      FROM documents
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS nc
      FROM tok a JOIN tok b
        ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND i.da < i.db)
                THEN i.da ELSE i.db END AS doc_small,
           CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND i.da < i.db)
                THEN i.db ELSE i.da END AS doc_big,
           i.nc AS n_common,
           LEAST(sa.n, sb.n) AS n_small
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.da
    JOIN sizes sb ON sb.doc_id = i.db
    WHERE i.nc * 10 >= {CONTAIN_PCT} * LEAST(sa.n, sb.n)
    """,
    doc="token-set CONTAINMENT near-dup (|A∩B|/|A| for the smaller set "
    "A): catches a short doc swallowed inside a much longer one — the "
    "quote/excerpt/boilerplate-wrapper case that symmetric Jaccard "
    "structurally misses (J <= |A|/|B| no matter how perfectly A is "
    "contained); threshold as the integer predicate 10*common >= 9*|A| "
    "so no division crosses the engines. Round-4 rewrite "
    "(operators/containment.py): token sets dictionary-encode to "
    "packed int64 bitmaps, so the quadratic stage shuffles (id, n, "
    "signature) — bytes, never token arrays (§9c; plan-pinned) — and "
    "the verify is a zip_with/bit_count fold in codegen, not string "
    "array_intersect. NOT blocked by the MinHash index, deliberately: "
    "qualifying pairs have Jaccard down to 0.20 at sf0.01 (measured), "
    "below any band threshold — a symmetric sketch cannot carry an "
    "asymmetric measure's recall; external blocking injects via "
    "candidate_pairs where the domain provides one",
)
def text_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.functions import text as TX
    from cognitive_score_bigdata_spark.io import fan_out
    from cognitive_score_bigdata_spark.operators.containment import (
        containment_pairs,
        token_bitmap_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        fan_out(docs)
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(TX.tokens("text"))).alias("tok"),
        )
    )
    # reused by both sides of the pair join — materialize once (the §9d
    # lesson: plan branches are not free references)
    sigs = token_bitmap_table(tok, ["doc_id", "source"]).localCheckpoint(
        eager=False
    )
    return containment_pairs(sigs, contain_pct=CONTAIN_PCT)


# ---------------------------------------------------------------------------
# join_interval_overlap
# ---------------------------------------------------------------------------


@register(
    "join_interval_overlap",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, MIN(ts) AS session_start,
             MAX(ts) + INTERVAL '30 minutes' AS session_end
      FROM (SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked)
      GROUP BY user_id, sid
    ),
    hourly AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY n, hr) AS rn,
             count(*) OVER () AS cnt
      FROM hourly
    ),
    med AS (SELECT n AS med FROM ranked WHERE rn = (cnt + 1) // 2),
    incidents AS (
      SELECT hr FROM hourly, med WHERE 2 * hourly.n > 3 * med.med
    )
    SELECT s.user_id, s.session_start,
           CAST(COUNT(i.hr) AS BIGINT) AS n_incident_hours
    FROM sess s JOIN incidents i
      ON s.session_start < i.hr + INTERVAL '1 hour'
     AND s.session_end > i.hr
    GROUP BY s.user_id, s.session_start
    """,
    doc="interval-overlap join: per-user 30-min-gap session intervals x "
    "site-wide 'incident' hours (hourly volume 50% above the "
    "nearest-rank median — a relative, scale-invariant threshold). The "
    "oracle spells the naive inequality theta-join; the Spark side "
    "explodes each session into its covered hour grid and equi-joins "
    "on the bucket — the interval-binning rewrite that turns an "
    "O(sessions x incidents) nested loop into a hash join whose fan-out "
    "is bounded by session duration / bin width (what a range-join "
    "hint does under the hood, generalized here to interval-interval). "
    "Same trick as range_join_time_binned, which bins only one side",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from cognitive_score_bigdata_spark.streaming.windows import session

    ev = load_table(spark, sf_dir, "events")
    sess = session(
        ev, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("_n")]
    )
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    ranked = hourly.withColumn(
        "rn", F.row_number().over(Window.orderBy("n", "hr"))
    ).withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy()))
    med = ranked.filter(F.col("rn") == F.expr("(cnt + 1) div 2")).select(
        F.col("n").alias("med")
    )
    incidents = hourly.crossJoin(F.broadcast(med)).filter(
        2 * F.col("n") > 3 * F.col("med")
    ).select("hr")
    # bin each session to its covered hour grid; equi-join the grid
    covered = sess.select(
        "user_id",
        "session_start",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "session_start"),
                F.date_trunc(
                    "hour",
                    F.expr("session_end - INTERVAL 1 MICROSECOND"),
                ),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hr"),
    )
    return (
        covered.join(incidents, "hr")
        .groupBy("user_id", "session_start")
        .agg(F.count(F.lit(1)).alias("n_incident_hours"))
    )


# ---------------------------------------------------------------------------
# hierarchy_rollup_to_root
# ---------------------------------------------------------------------------

H_MAX_DEPTH = 8  # iteration bound; the derived forest is depth <= 5


@register(
    "hierarchy_rollup_to_root",
    oracle=f"""
    WITH RECURSIVE parts AS (
      SELECT DISTINCT p_partkey AS pk FROM part
    ),
    edge AS (
      SELECT pk AS child,
             CASE WHEN pk < 8 THEN pk ELSE pk // 8 END AS parent
      FROM parts
    ),
    walk AS (
      SELECT child AS pk, child AS cur, 0 AS depth FROM edge
      UNION ALL
      SELECT w.pk, e.parent, w.depth + 1
      FROM walk w JOIN edge e ON e.child = w.cur
      WHERE e.parent <> w.cur AND w.depth < {H_MAX_DEPTH}
    ),
    root AS (
      SELECT pk, cur AS root_key
      FROM (SELECT pk, cur, depth,
                   row_number() OVER (PARTITION BY pk
                                      ORDER BY depth DESC) AS rn
            FROM walk)
      WHERE rn = 1
    )
    SELECT r.root_key,
           CAST(COUNT(DISTINCT r.pk) AS BIGINT) AS n_parts,
           {{rev}}
    FROM root r JOIN lineitem l ON l.l_partkey = r.pk
    GROUP BY r.root_key
    """.format(
        rev=sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")
    ),
    doc="hierarchical closure + rollup (the BOM/org-chart query Spark "
    "SQL cannot express natively — no recursive CTE): each part walks "
    "its parent chain to the root, then lineitem revenue rolls up to "
    "root assemblies. The closure is {H} bounded iterations of "
    "state JOIN broadcast(edge) — the edge table is catalog-sized (one "
    "row per part) even when the fact table is 100 TB, so every "
    "iteration is a broadcast hash join and the only big shuffle is "
    "the final root-keyed aggregate. Fixpoint semantics: root edges "
    "are self-loops (parent = child), so converged rows pass through "
    "unchanged and the bound only needs to exceed max depth. The "
    "hierarchy itself is derived (parent = pk div 8) but treated as an "
    "opaque relation — the plan never exploits the arithmetic. Oracle "
    "is DuckDB's native WITH RECURSIVE".replace("{H}", str(H_MAX_DEPTH)),
)
def hierarchy_rollup_to_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("pk"))
        .distinct()
    )
    edge = parts.select(
        F.col("pk").alias("child"),
        F.when(F.col("pk") < 8, F.col("pk"))
        .otherwise(F.expr("pk div 8"))
        .alias("parent"),
    ).localCheckpoint(eager=False)  # joined every iteration

    state = parts.select("pk", F.col("pk").alias("cur"))
    for _ in range(H_MAX_DEPTH):
        state = (
            state.join(F.broadcast(edge), state.cur == edge.child)
            .select("pk", F.col("parent").alias("cur"))
        )
    root = state.select("pk", F.col("cur").alias("root_key"))
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(root), li.l_partkey == root.pk)
        .groupBy("root_key")
        .agg(
            F.countDistinct("pk").alias("n_parts"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
    )


# ---------------------------------------------------------------------------
# window_trailing_30d_range
# ---------------------------------------------------------------------------

TRAIL_SECS = 30 * 86400


@register(
    "window_trailing_30d_range",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
             AS trail_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS trail_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '{30 * 86400} seconds' PRECEDING
                           AND CURRENT ROW)
    """,
    doc="value-based (RANGE) window frame: per-user trailing-30-day "
    "running sum/count — the frame is bounded by event-TIME distance, "
    "not row count, so sparse and dense users get the same temporal "
    "semantics (a ROWS frame can't say that). Spark side orders by "
    "epoch seconds with rangeBetween(-2592000, 0); both engines treat "
    "range bounds inclusively and include all order-value ties, so "
    "results match exactly with the DECIMAL accumulator. One hash "
    "exchange on user_id + per-partition sort — same cost shape as "
    "every other keyed window at 100 TB",
)
def window_trailing_30d_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.unix_timestamp(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-TRAIL_SECS, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("trail_sum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("trail_n"),
    )


# ---------------------------------------------------------------------------
# agg_bucketed_no_shuffle
# ---------------------------------------------------------------------------


@register(
    "agg_bucketed_no_shuffle",
    oracle=f"""
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_dsum("l_quantity", "total_qty")}
    FROM lineitem
    GROUP BY l_orderkey
    """,
    doc="the second dividend of the bucketed layout: a groupBy on the "
    "bucket key runs with ZERO Exchange — the scan is already hash-"
    "partitioned by l_orderkey, so partial and final aggregate fuse "
    "into one stage per bucket file (plan-pinned). Pre-shuffling data "
    "at write time pays off for every aggregate keyed on it, not just "
    "joins; values identical to the plain-parquet group-by oracle",
)
def agg_bucketed_no_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, lineitem = bucketed_pair(spark, sf_dir)
    return lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum("l_quantity", "total_qty"),
    )


# ---------------------------------------------------------------------------
# agg_trend_slope_by_type
# ---------------------------------------------------------------------------


@register(
    "agg_trend_slope_by_type",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE)
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept
    FROM s
    """,
    doc="per-group least-squares trend line (daily volume vs epoch day) "
    "in ONE aggregation pass: slope = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) "
    "from four BIGINT sufficient-statistic sums — x and y are integers, "
    "so every accumulator is exact and the only floating point is the "
    "final division over identical operands (identical IEEE result "
    "cross-engine). The single-pass sufficient-statistics shape is how "
    "regression/trend detection runs at 100 TB: no per-group iteration, "
    "no driver fitting, just a partial-agg-friendly groupBy",
)
def agg_trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("bigint").alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "event_type",
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


# ---------------------------------------------------------------------------
# sketch_kmv_distinct_users
# ---------------------------------------------------------------------------

KMV_K = 8
_2_60 = 1152921504606846976  # 2^60: 15 hex chars of md5 span [0, 2^60)


@register(
    "sketch_kmv_distinct_users",
    oracle=f"""
    WITH hv AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS UBIGINT) AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_exact
      FROM hv
    )
    SELECT event_type,
           CAST(n_exact AS BIGINT) AS n_exact,
           CASE WHEN n_exact < {KMV_K} THEN CAST(n_exact AS DOUBLE)
                ELSE CAST({KMV_K - 1} AS DOUBLE) * {_2_60}.0 / CAST(h AS DOUBLE)
           END AS kmv_estimate
    FROM ranked
    WHERE rn = LEAST(n_exact, {KMV_K})
    """,
    doc="k-minimum-values distinct sketch with an EXACT oracle: the "
    "sketch is deterministic because the hash is fixed (md5 -> 15 hex "
    "chars -> 60-bit int), so the kth-smallest hash — and therefore "
    "the estimate (k-1)*2^60/h_k — is bit-reproducible cross-engine, "
    "giving a driver hash-match row for an APPROXIMATE algorithm "
    "(the streaming digest-set trick applied to cardinality "
    "sketching). Distributed shape: the k-minima per group survive "
    "partial aggregation (min-k is a mergeable statistic), so at "
    "100 TB this is a map-side-combinable agg like HLL but auditable; "
    "n_exact rides along to show the estimate lands near truth",
)
def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    hv = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    cw = Window.partitionBy("event_type")
    ranked = hv.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_exact", F.count(F.lit(1)).over(cw)
    )
    est = F.when(
        F.col("n_exact") < KMV_K, F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(float(_2_60)) / F.col("h").cast("double")
    )
    return ranked.filter(
        F.col("rn") == F.least(F.col("n_exact"), F.lit(KMV_K))
    ).select(
        "event_type",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        est.alias("kmv_estimate"),
    )


# ---------------------------------------------------------------------------
# dedup_simhash_pairs_md5
# ---------------------------------------------------------------------------

SH_BITS = 60  # 15 md5 hex chars -> fits signed BIGINT in both engines
SH_HAMMING = 3  # 4 chunks of 15 bits: hamming<=3 shares >=1 exact chunk


@register(
    "dedup_simhash_pairs_md5",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(text, ' +')) AS t
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 15)) AS UBIGINT) AS hv
      FROM tok
    ),
    votes AS (
      SELECT doc_id, b.i AS bit,
             SUM(CASE WHEN (hv >> CAST(b.i AS INTEGER)) & 1 = 1
                      THEN 1 ELSE -1 END) AS v
      FROM h, UNNEST(range({SH_BITS})) AS b(i)
      GROUP BY doc_id, b.i
    ),
    sk AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0
                           THEN (CAST(1 AS UBIGINT) << CAST(bit AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS sh
      FROM votes GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, sh, c.i AS ck,
             (sh >> CAST(c.i * 15 AS INTEGER)) & 32767 AS cv
      FROM sk, UNNEST(range(4)) AS c(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sh AS sha, b.sh AS shb
      FROM chunks a JOIN chunks b
        ON a.ck = b.ck AND a.cv = b.cv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sha, shb)) <= {SH_HAMMING}
    """,
    doc="SimHash near-dup pairs with an EXACT oracle: the bit votes use "
    "an md5-derived 60-bit token hash instead of xxhash64, so the "
    "sketch — an approximate similarity structure — is bit-identical "
    "across engines and the full pipeline (votes -> sign bits -> "
    "pigeonhole 15-bit-chunk blocking -> exact Hamming verify) gets a "
    "driver hash-match row. Same one-shuffle explode/agg plan as "
    "dedup_simhash_pairs (which keeps xxhash64 for speed and stays "
    "rows-only); hamming <= 3 over 4 chunks guarantees a shared exact "
    "chunk, so candidates come from an equi-join, never n^2",
)
def dedup_simhash_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.dedup import simhash_sketch

    docs = load_table(spark, sf_dir, "documents")

    def md5_hash60(c):
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    # both sides of the chunk-bucket self-join consume the sketch —
    # materialize once (plan branches are not free references)
    sk = simhash_sketch(
        docs, "doc_id", "text", token_hash=md5_hash60, n_bits=SH_BITS
    ).localCheckpoint(eager=False)
    chunks = sk.select(
        F.col("doc_id"),
        F.col("simhash").alias("sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("ck"),
                        F.shiftright(F.col("simhash"), 15 * k)
                        .bitwiseAND(F.lit(32767).cast("long"))
                        .alias("cv"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "sh", F.col("c.ck").alias("ck"), F.col("c.cv").alias("cv"))
    a = chunks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sha"),
        "ck",
        "cv",
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("shb"),
        "ck",
        "cv",
    )
    cand = (
        a.join(b, ["ck", "cv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sha", "shb")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("sha").bitwiseXOR(F.col("shb"))
    ).cast("bigint")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= SH_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# dedup_minhash_pairs_md5
# ---------------------------------------------------------------------------

MH_K = 16  # minhashes
MH_BANDS = 4  # 4 bands x 4 rows: P(candidate) = 1-(1-j^4)^4
MH_ROWS = MH_K // MH_BANDS  # rows per band, shared by BOTH the Spark
# band keys below and the DuckDB _MH_BANDKEY fragment — one constant,
# so changing MH_K/MH_BANDS can't desynchronize engine from oracle

# Two-hash scheme (Kirsch & Mitzenmacher 2006): ONE md5 per shingle,
# split into two 56-bit halves h1/h2; minhash i uses h1 + i*h2. 56-bit
# halves keep i*h2 (i <= 15) under 2^60 — safe in Spark's SIGNED long
# and DuckDB's UBIGINT alike, so both engines compute bit-identical
# signatures. 16x fewer digests than the per-i md5 formulation.
_MH_H1 = "CAST(('0x' || substr(md5(s), 1, 14)) AS UBIGINT)"
_MH_H2 = "CAST(('0x' || substr(md5(s), 17, 14)) AS UBIGINT)"
_MH_MINS = ",\n             ".join(
    f"MIN({_MH_H1} + {i} * {_MH_H2}) AS m{i}" for i in range(MH_K)
)
_MH_BANDKEY = " ".join(
    f"WHEN b.i = {k} THEN concat_ws('-', "
    + ", ".join(
        f"CAST(m{MH_ROWS * k + j} AS VARCHAR)" for j in range(MH_ROWS)
    )
    + ")"
    for k in range(MH_BANDS)
)
_MH_AGREE = " + ".join(
    f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(MH_K)
)

_MH_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[CAST(u.i AS INTEGER):CAST(u.i + 2 AS INTEGER)],
                             ' ') AS s
      FROM toks,
           UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
    ),
    sig AS (
      SELECT doc_id,
             {_MH_MINS}
      FROM sh GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, b.i AS band,
             CASE {_MH_BANDKEY} END AS bkey
      FROM sig, UNNEST(range({MH_BANDS})) AS b(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST({_MH_AGREE} AS DOUBLE) / {MH_K} AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
"""


def md5_minhash_signatures(d) -> "DataFrame":
    """(doc_id, m0..m{k-1}): the md5 two-hash minhash signature table
    over ``d(doc_id, text)`` (Kirsch & Mitzenmacher 2006; constants
    MH_K/MH_BANDS shared with the DuckDB oracle fragments _MH_MINS /
    _MH_BANDKEY above). THE single implementation — both
    ``dedup_minhash_pairs_md5`` and round5's blocked-verify pipeline
    compose these helpers, so the Spark side cannot drift from the
    oracle in one query but not the other."""
    from cognitive_score_bigdata_spark.operators.dedup import shingles

    sh = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(shingles("text", 3))).alias("s"),
        )
        .distinct()
    )
    digest = F.md5(F.col("s"))
    h1 = F.conv(F.substring(digest, 1, 14), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 17, 14), 16, 10).cast("long")
    hashed = sh.select("doc_id", h1.alias("h1"), h2.alias("h2"))
    mins = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"m{i}")
        for i in range(MH_K)
    ]
    return hashed.groupBy("doc_id").agg(*mins)


def md5_minhash_banded(sig) -> "DataFrame":
    """(doc_id, band, bkey): the banded LSH key table of a signature
    table from :func:`md5_minhash_signatures` — one row per (doc,
    band), bkey = the band's MH_ROWS mins dash-joined (byte-identical
    to the oracle's _MH_BANDKEY CASE). Factored out (r14) so the
    incremental probe can persist/index it, not just self-join it."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col(f"m{MH_ROWS * k + j}").cast("string")
                                for j in range(MH_ROWS)
                            ],
                        ).alias("bkey"),
                    )
                    for k in range(MH_BANDS)
                ]
            )
        ).alias("b"),
    ).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
    )


def md5_minhash_band_candidates(sig, a_col: str = "doc_a", b_col: str = "doc_b"):
    """(a_col, b_col) distinct id pairs sharing at least one full band
    of the signature table from :func:`md5_minhash_signatures`."""
    banded = md5_minhash_banded(sig)
    a = banded.select(F.col("doc_id").alias(a_col), "band", "bkey")
    b = banded.select(F.col("doc_id").alias(b_col), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col(a_col) < F.col(b_col))
        .select(a_col, b_col)
        .distinct()
    )


@register(
    "dedup_minhash_pairs_md5",
    oracle=_MH_ORACLE,
    doc="MinHash-LSH near-dup candidates with an EXACT oracle: k=16 "
    "md5-derived 60-bit minhashes over distinct 3-gram shingles, "
    "banded 4x4 — every stage of the flagship LLM-dedup technique "
    "(shingle, k-way min, band bucket join, signature-agreement "
    "estimate) is bit-identical across engines, so the driver gets a "
    "hash-match row for the approximate algorithm itself, not just a "
    "rows-only run. The xxhash64 pipeline (dedup_minhash_pairs) stays "
    "as the fast path; this variant pays ONE string md5 per shingle "
    "(two-hash scheme, Kirsch & Mitzenmacher 2006: minhash i = "
    "h1 + i*h2 from the digest's two 56-bit halves — bit-identical in "
    "Spark signed long and DuckDB UBIGINT) for cross-engine "
    "verifiability. est_jaccard = agreeing positions / 16 — identical "
    "IEEE division both sides",
)
def dedup_minhash_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # reused by the band explode AND both agreement sides — materialize
    # once (the §9d lesson: plan branches are not free references)
    sig = md5_minhash_signatures(
        fan_out(docs).select("doc_id", "text")
    ).localCheckpoint(eager=False)
    cand = md5_minhash_band_candidates(sig)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(MH_K)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(MH_K)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MH_K)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / F.lit(float(MH_K))).alias("est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# sketch_hll_md5_users
# ---------------------------------------------------------------------------

HLL_M = 64  # 2^6 registers
HLL_CAP = 32  # rho cap keeps 2^(CAP-rho) in BIGINT range
_2_32 = 4294967296


_HLL_ORACLE = f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM events
    ),
    parts AS (
      SELECT event_type, hv & {HLL_M - 1} AS bucket, hv >> 6 AS rest
      FROM h
    ),
    rho AS (
      SELECT event_type, bucket,
             CASE WHEN rest = 0 THEN {HLL_CAP}
                  ELSE LEAST(bit_count((rest & -rest) - 1) + 1, {HLL_CAP})
             END AS r
      FROM parts
    ),
    reg AS (
      SELECT event_type, bucket, CAST(MAX(r) AS BIGINT) AS reg
      FROM rho GROUP BY event_type, bucket
    ),
    acc AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_used,
             CAST(SUM(CAST({_2_32} AS BIGINT) >> CAST(reg AS INTEGER))
                  AS BIGINT) AS denom_used
      FROM reg GROUP BY event_type
    )
    SELECT event_type, n_used,
           CAST(denom_used + ({HLL_M} - n_used) * CAST({_2_32} AS BIGINT)
                AS BIGINT) AS denom,
           0.709 * {HLL_M} * {HLL_M} * {_2_32}.0
             / (denom_used + ({HLL_M} - n_used) * CAST({_2_32} AS BIGINT))
             AS hll_estimate
    FROM acc
"""


@register(
    "sketch_hll_md5_users",
    oracle=_HLL_ORACLE,
    doc="HyperLogLog with an EXACT oracle: md5-fixed hash, 64 "
    "registers, and rho computed by the all-integer trailing-zero "
    "trick bit_count((x & -x) - 1) + 1 — no log2, no float until the "
    "single final division over identical operands, so registers, the "
    "2^(32-rho) fixed-point denominator, and the alpha*m^2/denom "
    "estimate are all bit-reproducible cross-engine. Registers are "
    "MAX-merged (order-insensitive, partial-agg friendly) exactly as "
    "in a production HLL; the theta/HLL sketches in operators/"
    "sketches.py stay as the fast generic path, this row makes the "
    "sketch FAMILY driver-auditable like the KMV and md5-MinHash rows. "
    "NOTE: the small-range linear-counting correction (m*ln(m/empty)) "
    "is deliberately omitted — ln is not bit-identical across libms — "
    "so the raw estimate overshoots when n << m; n_used rides along so "
    "a consumer can apply the correction downstream",
)
def sketch_hll_md5_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("hv"),
        )
        .distinct()
    )
    parts = h.select(
        "event_type",
        F.col("hv").bitwiseAND(F.lit(HLL_M - 1)).alias("bucket"),
        F.shiftright("hv", 6).alias("rest"),
    )
    rho = parts.select(
        "event_type",
        "bucket",
        F.when(F.col("rest") == 0, F.lit(HLL_CAP))
        .otherwise(
            F.least(
                F.bit_count(
                    (F.col("rest").bitwiseAND(-F.col("rest"))) - 1
                )
                + 1,
                F.lit(HLL_CAP),
            )
        )
        .alias("r"),
    )
    reg = rho.groupBy("event_type", "bucket").agg(
        F.max("r").cast("bigint").alias("reg")
    )
    acc = reg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
        # pyspark's shiftright() only takes a literal shift amount; the
        # SQL form accepts a column
        F.sum(F.expr(f"shiftright(cast({_2_32} as bigint), cast(reg as int))"))
        .cast("bigint")
        .alias("denom_used"),
    )
    denom = F.col("denom_used") + (
        F.lit(HLL_M) - F.col("n_used")
    ) * F.lit(_2_32).cast("long")
    return acc.select(
        "event_type",
        "n_used",
        denom.cast("bigint").alias("denom"),
        (
            F.lit(0.709 * HLL_M * HLL_M) * F.lit(float(_2_32))
            / denom.cast("double")
        ).alias("hll_estimate"),
    )


# ---------------------------------------------------------------------------
# graph_minlabel_components
# ---------------------------------------------------------------------------

CC_ITERS = 8
CC_SUPPORT = 2  # edge = parts co-purchased in >= 2 orders (sparser graph)

_CC_ITER = """
l{i} AS (
  SELECT e.dst AS node, MIN(l.lab) AS lab
  FROM es e JOIN l{prev} l ON l.node = e.src
  GROUP BY e.dst
)"""

_CC_ORACLE = (
    f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
pairs AS (
  SELECT a.pk AS p1, b.pk AS p2
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
  HAVING COUNT(*) >= {CC_SUPPORT}
),
sym AS (
  SELECT p1 AS src, p2 AS dst FROM pairs
  UNION ALL SELECT p2, p1 FROM pairs
),
nodes AS (SELECT DISTINCT src AS n FROM sym),
es AS (
  SELECT src, dst FROM sym
  UNION ALL SELECT n, n FROM nodes
),
l0 AS (SELECT n AS node, n AS lab FROM nodes),
"""
    + ",".join(
        _CC_ITER.format(i=i, prev=i - 1) for i in range(1, CC_ITERS + 1)
    )
    + f"""
SELECT node AS part_key, CAST(lab AS BIGINT) AS component
FROM l{CC_ITERS}
"""
)


# session-cached symmetrized + self-looped support>=CC_SUPPORT edge
# table (the minlabel prepared artifact — same economics as the
# pagerank folds above)
_CC_EDGE_CACHE: dict = {}


def _cc_withself_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        e = (
            copurchase_pairs(spark, sf_dir)
            .filter(F.col("sup") >= CC_SUPPORT)
            .select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
        )
        sym = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        nodes = sym.select(F.col("src").alias("n")).distinct()
        withself = sym.unionAll(
            nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        )
        return withself.localCheckpoint(eager=True)

    return session_scoped(_CC_EDGE_CACHE, spark, (sf_dir,), build)


@register(
    "graph_minlabel_components",
    oracle=_CC_ORACLE,
    doc=f"connected components over the support>={CC_SUPPORT} "
    "co-purchase graph by min-label propagation with a FIXED iteration "
    f"count ({CC_ITERS} rounds) — which makes the output a pure "
    "function of the input, so a graph algorithm that is normally "
    "rows-only (the star-contraction CC in operators/dedup.py "
    "converges data-dependently) carries an exact unrolled-CTE oracle. "
    "Convergence at this depth is pinned separately in "
    "tests/test_graph_ops.py (8 vs 12 rounds identical on this graph); "
    "per round: broadcast the |V|-row label vector, one min-agg "
    "shuffle — Pregel shape, edges never reshuffle",
)
def graph_minlabel_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.graph import (
        minlabel_components,
    )

    withself = _cc_withself_edges(spark, sf_dir)
    return minlabel_components(
        withself, n_iters=CC_ITERS, prepared=True
    ).select(
        F.col("node").alias("part_key"),
        F.col("lab").cast("bigint").alias("component"),
    )


# ---------------------------------------------------------------------------
# streaming_hll_users
# ---------------------------------------------------------------------------


_HLL_STREAM_IN: dict[tuple, str] = {}


def _hll_stream_indir(spark: SparkSession, sf_dir: str) -> str:
    """Session-cached JSON export of events: the stream SOURCE is a
    fixture (in production it already exists); caching it keeps the
    timed query measuring the drain + state maintenance, not the
    one-time export."""
    import os

    def build() -> str:
        in_dir = os.path.join(tempfile.mkdtemp(prefix="csb_stream_hll_"), "in")
        (
            load_table(spark, sf_dir, "events")
            .select("user_id", "event_type")
            .write.mode("overwrite")
            .json(in_dir)
        )
        return in_dir

    return session_scoped(_HLL_STREAM_IN, spark, (sf_dir,), build)


@register(
    "streaming_hll_users",
    oracle=_HLL_ORACLE,
    doc="HLL registers maintained as a STREAMING aggregate (file "
    "source -> md5/bucket/rho projection -> MAX-merge state -> memory "
    "sink, availableNow) and finalized to the identical output as the "
    "batch sketch — hash-matching the SAME oracle. MAX is associative, "
    "commutative and idempotent, so micro-batch boundaries and replays "
    "cannot perturb the registers: the streaming path is provably "
    "batch-equivalent, and the state is bounded at groups x 64 rows "
    "regardless of stream length — the use case HLL exists for",
)
def streaming_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from cognitive_score_bigdata_spark.streaming.sketches import (
        hll_register_stream,
    )

    in_dir = _hll_stream_indir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="csb_stream_hll_run_")
    reg = hll_register_stream(
        spark, in_dir, os.path.join(work, "ckpt"), m=HLL_M, rho_cap=HLL_CAP
    )
    # Register table is bounded (groups x m rows): materialize it
    # eagerly so the memory-sink view and per-run checkpoint dir can be
    # reclaimed here instead of leaking one work dir per bench iteration.
    reg = reg.localCheckpoint(eager=True)
    spark.catalog.dropTempView("csb_hll_registers")
    shutil.rmtree(work, ignore_errors=True)
    acc = reg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
        F.sum(F.expr(f"shiftright(cast({_2_32} as bigint), cast(reg as int))"))
        .cast("bigint")
        .alias("denom_used"),
    )
    denom = F.col("denom_used") + (
        F.lit(HLL_M) - F.col("n_used")
    ) * F.lit(_2_32).cast("long")
    return acc.select(
        "event_type",
        "n_used",
        denom.cast("bigint").alias("denom"),
        (
            F.lit(0.709 * HLL_M * HLL_M) * F.lit(float(_2_32))
            / denom.cast("double")
        ).alias("hll_estimate"),
    )


# ---------------------------------------------------------------------------
# timeseries_twap_per_user / timeseries_ohlc_hourly
# ---------------------------------------------------------------------------


@register(
    "timeseries_twap_per_user",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, ts,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    iv AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(19,6)) * 1000000 AS BIGINT)
               * (epoch_ms(nxt) - epoch_ms(ts)) AS wv,
             CAST(epoch_ms(nxt) - epoch_ms(ts) AS BIGINT) AS dur
      FROM seq WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(SUM(dur) AS BIGINT) AS total_ms,
           CAST(SUM(wv) // SUM(dur) AS BIGINT) AS twap_micro
    FROM iv GROUP BY user_id
    HAVING SUM(dur) > 0
    """,
    doc="time-weighted average value per user (the step-function "
    "integral between observations divided by elapsed time — TWAP, the "
    "standard irregular-sampling average that a plain AVG gets wrong "
    "whenever sampling density correlates with value). Entirely "
    "integer: value in exact micro-units (via a DECIMAL(19,6) "
    "intermediate, so the double->int conversion rounds identically "
    "cross-engine), durations in ms, final integer division — a "
    "decimal->double cast here diverges by an ulp because DuckDB "
    "converts int128 decimals to double in two roundings where Spark "
    "rounds once (found by the parity gate, worth recording). One "
    "keyed window + one aggregate — the sessionization cost shape",
)
def timeseries_twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("nxt", F.lead("ts").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    dur = (
        F.unix_millis(F.col("nxt").cast("timestamp"))
        - F.unix_millis(F.col("ts").cast("timestamp"))
    ).cast("bigint")
    value_micro = (
        F.col("value").cast("decimal(19,6)") * 1000000
    ).cast("bigint")
    iv = seq.select(
        "user_id",
        (value_micro * dur).alias("wv"),
        dur.alias("dur"),
    )
    return (
        iv.groupBy("user_id")
        .agg(
            F.sum("dur").cast("bigint").alias("total_ms"),
            F.expr("sum(wv) div sum(dur)").cast("bigint").alias("twap_micro"),
        )
        .filter(F.col("total_ms") > 0)
    )


@register(
    "timeseries_ohlc_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hr,
           MIN({'t': ts, 'e': event_id, 'v': value})['v'] AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX({'t': ts, 'e': event_id, 'v': value})['v'] AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1
    """,
    doc="OHLC bars (open/high/low/close per hour) — the market-data "
    "downsampling primitive: open/close are first/last VALUE by event "
    "time with event_id as the deterministic tiebreak, expressed as "
    "lexicographic MIN/MAX over a (ts, event_id, value) struct — "
    "order-insensitive, partial-agg friendly, no window, ONE shuffle. "
    "The min_by/arg_min formulations are nondeterministic under ties "
    "in both engines; the struct trick is the cross-engine-exact "
    "rewrite (same pattern as span-dedup's winner selection)",
)
def timeseries_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    st = F.struct("ts", "event_id", "value")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.min(st).getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(st).getField("value").alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# agg_equidepth_deciles
# ---------------------------------------------------------------------------


@register(
    "agg_equidepth_deciles",
    oracle="""
    WITH t AS (
      SELECT value, event_id,
             ntile(10) OVER (ORDER BY value, event_id) AS decile
      FROM events
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM t GROUP BY decile
    """,
    doc="equi-depth histogram via NTILE(10): each bucket holds the same "
    "row count and the (lo, hi] bounds trace the empirical deciles — "
    "the complement of agg_histogram_value's equi-WIDTH bins, and the "
    "exact audit for approx_percentile-derived bucketing. event_id "
    "tiebreak makes bucket assignment deterministic for duplicate "
    "values. The global NTILE is a single total-order sort; at 100 TB "
    "the production form is approx quantile cuts + a broadcast "
    "range-bin join (quality_rank_normalize shows the per-group "
    "rank-percentile variant that avoids the global sort entirely)",
)
def agg_equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    t = ev.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("value", "event_id"))
    )
    return t.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


# ---------------------------------------------------------------------------
# events_session_conversion
# ---------------------------------------------------------------------------


@register(
    "events_session_conversion",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, sid,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM (SELECT user_id, ts, event_type,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked)
      GROUP BY user_id, sid
    )
    SELECT CASE WHEN n_events <= 2 THEN 'short'
                WHEN n_events <= 5 THEN 'medium'
                ELSE 'long' END AS session_len,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST((SUM(converted) * 1000000) // COUNT(*) AS BIGINT)
             AS conv_micro
    FROM sess
    GROUP BY 1
    """,
    doc="session-level conversion by session length (the do-longer-"
    "sessions-convert product question): 30-min-gap sessionization, a "
    "per-session converted flag (MAX over an indicator — "
    "order-insensitive), then length-bucketed conversion in integer "
    "micro-units. Composes the session window with conditional "
    "aggregation; two keyed exchanges total (sessionize, bucket-agg) "
    "and the session table is already tiny relative to the scan",
)
def events_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.streaming.windows import session

    ev = load_table(spark, sf_dir, "events")
    sess = session(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        ],
    )
    bucket = (
        F.when(F.col("n_events") <= 2, "short")
        .when(F.col("n_events") <= 5, "medium")
        .otherwise("long")
    )
    return (
        sess.groupBy(bucket.alias("session_len"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("converted").cast("bigint").alias("n_converted"),
        )
        .select(
            "session_len",
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            "n_converted",
            F.expr("(n_converted * 1000000) div n_sessions")
            .cast("bigint")
            .alias("conv_micro"),
        )
    )


# ---------------------------------------------------------------------------
# text_prefix_filter_join
# ---------------------------------------------------------------------------

PFJ_T_NUM, PFJ_T_DEN = 4, 5  # Jaccard threshold t = 4/5


@register(
    "text_prefix_filter_join",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(text, ' +')) AS tok
      FROM documents
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM tok a JOIN tok b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b, i.n_common,
           CAST(sa.n + sb.n - i.n_common AS BIGINT) AS n_union
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE i.n_common * {PFJ_T_DEN}
          >= {PFJ_T_NUM} * (sa.n + sb.n - i.n_common)
    """,
    doc="exact set-similarity join (Jaccard >= 0.8, GLOBAL — no source "
    "blocking) by prefix filtering (Chaudhuri'06/Bayardo'07 AllPairs): "
    "tokens canonically ordered by (global df, token), each doc emits "
    "only its first n - ceil(t*n) + 1 tokens as candidate keys — any "
    "qualifying pair provably shares a prefix token, so the posting "
    "join runs on prefixes (sum of small prefix-df^2) instead of the "
    "full sum-df^2 blow-up the oracle's naive formulation spells. The "
    "hash-match against that naive oracle IS the recall-guarantee "
    "proof on this corpus: a single missed pair would fail parity. "
    "Integer threshold predicate; rarest-first ordering makes prefix "
    "buckets the smallest available",
)
def text_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        fan_out(docs)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.col("text"), " +"))
            ).alias("tok"),
        )
        .distinct()
    )
    df_t = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # prefix arrays carry xxhash64(token) LONGS, not strings: the
    # prefix join then hashes/compares 8-byte keys. A hash collision
    # can only MERGE two tokens (extra candidates, removed by the
    # exact bitmap verify) — never split one, so recall is unchanged
    # and the oracle hash-match still proves exactness.
    ordered = (
        tok.join(df_t, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("df"), F.col("tok")))
                ),
                lambda s: F.xxhash64(s.tok),
            ).alias("toks")
        )
        .withColumn("n", F.size("toks").cast("bigint"))
        # prefix length n - ceil(t*n) + 1, all-integer ceil
        .withColumn(
            "p",
            F.col("n")
            - F.expr(
                f"(n * {PFJ_T_NUM} + {PFJ_T_DEN - 1}) div {PFJ_T_DEN}"
            )
            + 1,
        )
        .localCheckpoint(eager=False)  # reused: prefix emit + verify
    )
    # ASYMMETRIC prefixes (the full Bayardo'07 AllPairs, round 4): the
    # larger record of a qualifying pair must share a token within its
    # PROBE prefix (n - ceil(t*n) + 1: alpha >= t*n_big once the length
    # filter holds), while the smaller record only needs its INDEX
    # prefix of n - ceil(2t/(1+t)*n) + 1 tokens (alpha >= t/(1+t) *
    # (n_big+n_small) >= 2t/(1+t)*n_small) — and the FIRST common token
    # in the global (df, token) canonical order provably sits inside
    # BOTH. At t=4/5 the index prefix is ~n/9+1 vs the probe's ~n/5+1,
    # cutting candidate instances ~45% (28.7M -> 16.3M at sf0.1) before
    # the dedup shuffle, which is where the wall time lived. Recall
    # stays exact — the hash-match against the naive all-pairs oracle
    # is the proof, as before.
    probe = ordered.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("pna"),
        F.posexplode(
            F.slice(F.col("toks"), 1, F.col("p").cast("int"))
        ).alias("ia", "tk"),
    )
    # index prefix length: n - ceil(2t/(1+t) * n) + 1, all-integer
    # (2t/(1+t) at t=4/5 is 8/9)
    idx = ordered.withColumn(
        "pi", F.col("n") - F.expr("(n * 8 + 8) div 9") + 1
    ).select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("pnb"),
        F.posexplode(
            F.slice(F.col("toks"), 1, F.col("pi").cast("int"))
        ).alias("ib", "tk"),
    )
    # AllPairs length filter at candidate GENERATION: J >= t forces
    # n_small >= t*n_big, an integer predicate evaluated inside the
    # prefix join before the dedup shuffle — without it a flat-df
    # vocabulary (this corpus) degenerates the prefix buckets
    # (25.5 s -> 17.1 s at sf0.1; the remaining cost is OUTPUT volume:
    # this synthetic corpus really contains ~3M J>=0.8 pairs at sf0.1,
    # so the query is emit-bound, not filter-bound).
    size_ok = F.col("pnb") * PFJ_T_DEN >= PFJ_T_NUM * F.col("pna")
    # orientation: probe side is the larger record (ties by id), so
    # each unordered pair is generated exactly one way
    bigger = (F.col("pna") > F.col("pnb")) | (
        (F.col("pna") == F.col("pnb")) & (F.col("doc_a") < F.col("doc_b"))
    )
    # PPJoin positional filter (Xiao'08, round 6): a match at 0-based
    # prefix positions (ia, ib) bounds the whole-pair overlap at
    # min(na-ia, nb-ib) — every common token sits at or after the
    # FIRST common one in the shared canonical order — so instances
    # that can't reach alpha = ceil(t/(1+t)*(na+nb)) drop before the
    # candidate-dedup exchange (the measured wall-time floor: 18.4M ->
    # 12.6M instances at sf0.1, verified output bit-identical). The
    # first-common-token instance of every qualifying pair always
    # passes, so recall is exact — the oracle hash-match is the proof.
    alpha = F.expr(
        f"({PFJ_T_NUM} * (pna + pnb) + {PFJ_T_NUM + PFJ_T_DEN - 1}) "
        f"div {PFJ_T_NUM + PFJ_T_DEN}"
    )
    pos_ok = (
        F.least(F.col("pna") - F.col("ia"), F.col("pnb") - F.col("ib"))
        >= alpha
    )
    cand = (
        probe.join(idx, "tk")
        .filter(bigger & size_ok & pos_ok)
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    # Verify on packed bitmap signatures, not token arrays (round 4 —
    # same trick as operators/containment.py): the candidate set is
    # millions of rows and array_intersect on string arrays was the
    # per-candidate bottleneck; bit_count(sig&sig) is a codegen integer
    # op and the signature table joins in at ~8 bytes/doc instead of
    # ~300. Exactness unchanged — the same oracle hash-match proves it.
    from cognitive_score_bigdata_spark.operators.containment import (
        sig_intersect_count,
        token_bitmap_table,
    )

    sigs = token_bitmap_table(tok, ["doc_id"])
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("sig").alias("sig_a"),
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("sig").alias("sig_b"),
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", sig_intersect_count(sigs, "sig_a", "sig_b"))
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_common"))
        .filter(
            F.col("n_common") * PFJ_T_DEN >= PFJ_T_NUM * F.col("n_union")
        )
        .select("doc_a", "doc_b", "n_common", "n_union")
    )


# ---------------------------------------------------------------------------
# graph_sssp_copurchase
# ---------------------------------------------------------------------------

SSSP_ITERS = 6

_SSSP_ITER = """
d{i} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT d.node, d.dist FROM d{prev} d
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM es e JOIN d{prev} d ON d.node = e.src
  ) GROUP BY node
)"""

_SSSP_ORACLE = (
    """
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
pairs AS (
  SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS sup
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
),
sym AS (
  SELECT p1 AS src, p2 AS dst, sup FROM pairs
  UNION ALL SELECT p2, p1, sup FROM pairs
),
es AS (SELECT src, dst, CAST(1000 // sup AS BIGINT) + 1 AS w FROM sym),
src0 AS (SELECT MIN(src) AS s FROM es),
d0 AS (SELECT s AS node, CAST(0 AS BIGINT) AS dist FROM src0),
"""
    + ",".join(
        _SSSP_ITER.format(i=i, prev=i - 1)
        for i in range(1, SSSP_ITERS + 1)
    )
    + f"""
SELECT node AS part_key, dist AS dist_milli FROM d{SSSP_ITERS}
"""
)


@register(
    "graph_sssp_copurchase",
    oracle=_SSSP_ORACLE,
    doc="single-source shortest paths (Bellman-Ford, the recursive-"
    "aggregate benchmark query of RaSQL SIGMOD'19) over the weighted "
    "co-purchase graph: edge weight = 1000 div support + 1 (stronger "
    f"co-purchase = closer), {SSSP_ITERS} fixed min-plus relaxation "
    "rounds from the minimum part key. Fixed iterations + integer "
    "weights = pure function of the input, so the unrolled-CTE oracle "
    "matches exactly whether or not the fixpoint has been reached "
    "(same contract as graph_minlabel_components). Per round: "
    "broadcast the frontier distances into the edge list, one min-agg "
    "shuffle — Spark has no recursive SQL, the iterate-and-min-merge "
    "loop IS the engine's recursive aggregate",
)
def graph_sssp_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = copurchase_pairs(spark, sf_dir)
    sym = pairs.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst"), "sup"
    ).unionAll(
        pairs.select(
            F.col("p2").alias("src"), F.col("p1").alias("dst"), "sup"
        )
    )
    es = sym.select(
        "src",
        "dst",
        (F.expr("1000 div sup") + 1).cast("bigint").alias("w"),
    )
    dist = sssp_fixed_rounds(es, n_iters=SSSP_ITERS)
    return dist.select(
        F.col("node").alias("part_key"),
        F.col("dist").cast("bigint").alias("dist_milli"),
    )


# ---------------------------------------------------------------------------
# graph_kcore_copurchase
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 8

_KCORE_ITER = """
keep{i} AS MATERIALIZED (
  SELECT src AS n FROM e{prev} GROUP BY src HAVING COUNT(*) >= {k}
),
e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{prev} e
  JOIN keep{i} a ON a.n = e.src
  JOIN keep{i} b ON b.n = e.dst
)"""

_KCORE_ORACLE = (
    f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
pairs AS (
  SELECT a.pk AS p1, b.pk AS p2
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk HAVING COUNT(*) >= 2
),
e0 AS MATERIALIZED (
  SELECT p1 AS src, p2 AS dst FROM pairs
  UNION ALL SELECT p2, p1 FROM pairs
),
"""
    + ",".join(
        _KCORE_ITER.format(i=i, prev=i - 1, k=KCORE_K)
        for i in range(1, KCORE_ROUNDS + 1)
    )
    + f"""
SELECT src AS part_key, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM e{KCORE_ROUNDS} GROUP BY src
"""
)


@register(
    "graph_kcore_copurchase",
    oracle=_KCORE_ORACLE,
    doc=f"k-core decomposition (k={KCORE_K}) of the support>=2 "
    f"co-purchase graph by {KCORE_ROUNDS} fixed peeling rounds: drop "
    "nodes with degree < k, restrict edges to survivors, repeat — the "
    "cohesive-subgraph primitive behind spam-cluster and community "
    "detection. Fixed rounds keep the output a pure function of the "
    "input (the same contract as min-label CC and SSSP), and the "
    "oracle's unrolled CTEs are AS MATERIALIZED — without it DuckDB "
    "inlines each level's three references and the plan grows 3^8-fold "
    "(found the hard way: 'too many open files' from 6561 inlined "
    "parquet scans). Per round: one degree aggregate + two semi-joins, "
    "all hash-partitioned on vertex ids",
)
def graph_kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = copurchase_pairs(spark, sf_dir).filter(F.col("sup") >= 2)
    edges = pairs.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst")
    ).unionAll(
        pairs.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    ).localCheckpoint(eager=False)
    for _ in range(KCORE_ROUNDS):
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select(F.col("src").alias("n"))
        )
        edges = (
            edges.join(keep.withColumnRenamed("n", "src"), "src", "semi")
            .join(keep.withColumnRenamed("n", "dst"), "dst", "semi")
            .select("src", "dst")
            # each round's survivor edge set feeds the next round's
            # degree count AND both semi-joins: cut the lineage
            .localCheckpoint(eager=False)
        )
    return edges.groupBy(F.col("src").alias("part_key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )


# ---------------------------------------------------------------------------
# text_novelty_score
# ---------------------------------------------------------------------------


@register(
    "text_novelty_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[CAST(u.i AS INTEGER):CAST(u.i + 2 AS INTEGER)],
                             ' ') AS s
      FROM toks,
           UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
    ),
    df AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (df.df = 1) AS BIGINT) AS n_unique,
           CAST((COUNT(*) FILTER (df.df = 1)) * 1000000 // COUNT(*)
                AS BIGINT) AS novelty_micro
    FROM sh JOIN df ON df.s = sh.s
    GROUP BY sh.doc_id
    """,
    doc="per-document n-gram novelty: the fraction of a doc's distinct "
    "3-gram shingles that appear NOWHERE else in the corpus — high "
    "novelty = original content, low = boilerplate/template recombination "
    "(the inverse signal of text_charngram_familiarity, computed "
    "corpus-relative instead of model-relative). Shingle document "
    "frequencies via one hash agg, joined back to the doc's shingles — "
    "two shuffles on the shingle key; integer micro-unit ratio. The "
    "upweight-novel/downweight-duplicated curriculum signal in LLM "
    "data pipelines",
)
def text_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.io import fan_out
    from cognitive_score_bigdata_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        fan_out(docs)
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles("text", 3))).alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # reused: df build + rejoin
    )
    df_s = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(df_s, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            F.expr("(n_unique * 1000000) div n_shingles")
            .cast("bigint")
            .alias("novelty_micro"),
        )
    )


# ---------------------------------------------------------------------------
# graph_clustering_topk
# ---------------------------------------------------------------------------

LCC_TOPK = 50


@register(
    "graph_clustering_topk",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
    ),
    deg AS MATERIALIZED (
      SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x
    ),
    rk AS MATERIALIZED (
      SELECT node, CAST(ROW_NUMBER() OVER (ORDER BY d, node) AS BIGINT) AS r
      FROM deg
    ),
    oe AS MATERIALIZED (
      SELECT LEAST(ru.r, rv.r) AS lo, GREATEST(ru.r, rv.r) AS hi
      FROM e JOIN rk ru ON ru.node = e.u JOIN rk rv ON rv.node = e.v
    ),
    tri AS MATERIALIZED (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM oe e1
      JOIN oe e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
      JOIN oe e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
    ),
    pertri AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS t
      FROM (SELECT a AS x FROM tri UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
      GROUP BY x
    )
    SELECT rk.node AS part_key, p.t AS n_triangles, d.d AS degree,
           CAST((p.t * 2000000) // (d.d * (d.d - 1)) AS BIGINT)
             AS clustering_micro
    FROM pertri p JOIN rk ON rk.r = p.x JOIN deg d ON d.node = rk.node
    ORDER BY n_triangles DESC, part_key
    LIMIT {LCC_TOPK}
    """,
    doc="local clustering coefficient, top-50 by triangle "
    "participation: per-node triangle counts from the oriented "
    "edge-iterator with the intersections EXPLODED (all three corners "
    "credited; output linear in the triangle count, the wedge relation "
    "still never materialized), coefficient = 2T/(d(d-1)) in integer "
    "micro-units. The oracle enumerates triangles naively with "
    "MATERIALIZED CTEs; the hash match transfers the edge-iterator's "
    "correctness from global counting (graph_triangle_count) to the "
    "per-node decomposition",
)
def graph_clustering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.graph import (
        local_triangle_counts,
    )

    lt = local_triangle_counts(
        oriented=_oriented_copurchase(spark, sf_dir)
    )
    return (
        lt.select(
            F.col("node").alias("part_key"),
            "n_triangles",
            "degree",
            F.expr("(n_triangles * 2000000) div (degree * (degree - 1))")
            .cast("bigint")
            .alias("clustering_micro"),
        )
        .orderBy(F.desc("n_triangles"), "part_key")
        .limit(LCC_TOPK)
    )


# ---------------------------------------------------------------------------
# graph_pagerank_weighted
# ---------------------------------------------------------------------------

_WPR_ITER = """
r{i} AS MATERIALIZED (
  SELECT e.dst AS node,
         CAST(150000 + SUM((r.r * 17 * e.sup) // (20 * d.d)) AS BIGINT) AS r
  FROM edges e
  JOIN r{prev} r ON r.node = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
)"""

_WPR_ORACLE = (
    """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
pairs AS (
  SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS sup
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
),
edges AS MATERIALIZED (
  SELECT p1 AS src, p2 AS dst, sup FROM pairs
  UNION ALL
  SELECT p2, p1, sup FROM pairs
),
deg AS MATERIALIZED (
  SELECT src, CAST(SUM(sup) AS BIGINT) AS d FROM edges GROUP BY src
),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
"""
    + ",".join(
        _WPR_ITER.format(i=i, prev=i - 1)
        for i in range(1, PR_ITERS + 1)
    )
    + f"""
SELECT node AS part_key, r AS rank_micro
FROM r{PR_ITERS}
ORDER BY rank_micro DESC, part_key
LIMIT {PR_TOPK}
"""
)


@register(
    "graph_pagerank_weighted",
    oracle=_WPR_ORACLE,
    doc="support-weighted PageRank: rank flows proportional to "
    "co-purchase strength — contribution (r * 17 * sup) div "
    "(20 * weighted_outdeg), still all-BIGINT and bit-exact. NOTE the "
    "weighted and unweighted variants rank DIFFERENT parts at the top "
    "(a part in many weak baskets outranks one in few strong baskets "
    "only in the unweighted walk) — which is why both are registered; "
    "the operator takes weight_col and serves both from one "
    "implementation. Unweighted li is DISTINCT'd per order (basket "
    "semantics), same Pregel broadcast-and-aggregate loop; the "
    "weighted fold is its own session-cached prepared artifact",
)
def graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ed = _pr_folded_edges(spark, sf_dir, weighted=True)
    # weight_col is baked into the prepared fold (__w = sup)
    ranks = pagerank_fixed_point(ed, n_iters=PR_ITERS, prepared=True)
    return (
        ranks.select(F.col("node").alias("part_key"), "rank_micro")
        .orderBy(F.desc("rank_micro"), "part_key")
        .limit(PR_TOPK)
    )


# ---------------------------------------------------------------------------
# setop_intersect_all / setop_except_all  (multiset semantics)
# ---------------------------------------------------------------------------


@register(
    "setop_intersect_all",
    oracle="""
    SELECT user_id, CAST(FLOOR(value) AS BIGINT) AS v
    FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id, CAST(FLOOR(value) AS BIGINT)
    FROM events WHERE event_type = 'view'
    """,
    doc="INTERSECT ALL — multiset intersection (each row survives "
    "min(count_left, count_right) times), vs the distinct-set "
    "intersect already covered by setop_intersect. Values bucketed to "
    "BIGINT so duplicates actually occur; Spark intersectAll "
    "implements the same bag semantics via a counted hash aggregate",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("value").cast("bigint").alias("v")
    )
    b = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("value").cast("bigint").alias("v")
    )
    return a.intersectAll(b)


@register(
    "setop_except_all",
    oracle="""
    SELECT user_id, CAST(FLOOR(value) AS BIGINT) AS v
    FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id, CAST(FLOOR(value) AS BIGINT)
    FROM events WHERE event_type = 'view'
    """,
    doc="EXCEPT ALL — multiset difference (each row survives "
    "count_left - count_right times, floored at zero): the bag "
    "semantics a reconciliation/anti-delta job needs, where the "
    "distinct EXCEPT would hide duplicate-count drift entirely",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("value").cast("bigint").alias("v")
    )
    b = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("value").cast("bigint").alias("v")
    )
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# timeseries_max_drawdown
# ---------------------------------------------------------------------------


@register(
    "timeseries_max_drawdown",
    oracle="""
    WITH runmax AS (
      SELECT user_id, value,
             MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS peak
      FROM events
    )
    SELECT user_id,
           MAX(peak - value) AS max_drawdown,
           MAX(peak) AS peak_value
    FROM runmax GROUP BY user_id
    """,
    doc="maximum drawdown per user (largest drop from a running peak — "
    "the risk metric every monitoring dashboard wants on a value "
    "stream): running MAX window + one aggregate. Float-safe WITHOUT "
    "decimal tricks because the arithmetic is max/subtract only — no "
    "accumulation, so every engine computes the identical IEEE result "
    "on identical operands. Same two-exchange shape as the other keyed "
    "windows",
)
def timeseries_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runmax = ev.withColumn("peak", F.max("value").over(w))
    return runmax.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("value")).alias("max_drawdown"),
        F.max("peak").alias("peak_value"),
    )


# ---------------------------------------------------------------------------
# agg_weighted_median_by_source
# ---------------------------------------------------------------------------


@register(
    "agg_weighted_median_by_source",
    oracle="""
    WITH w AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n_chars) OVER (PARTITION BY source) AS total
      FROM documents
    )
    SELECT source,
           MIN(n_chars) FILTER (2 * cum >= total) AS weighted_median_chars,
           CAST(MAX(total) AS BIGINT) AS total_chars
    FROM w GROUP BY source
    """,
    doc="weighted median document length per source: the n_chars value "
    "at which the cumulative character mass crosses half the total — "
    "lower-weighted-nearest-rank selection via the integer predicate "
    "2*cum >= total, so a handful of giant documents can't drag the "
    "'typical length' the way a weighted MEAN lets them. Same exact "
    "prefix-sum machinery as the systematic sampler; one keyed window "
    "+ one aggregate. MIN FILTER picks the crossing row without a "
    "second window pass",
)
def agg_weighted_median_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cum_w = Window.partitionBy("source").orderBy(
        "n_chars", "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot_w = Window.partitionBy("source")
    w = docs.select(
        "source",
        "n_chars",
        F.sum("n_chars").over(cum_w).alias("cum"),
        F.sum("n_chars").over(tot_w).alias("total"),
    )
    return w.groupBy("source").agg(
        F.min(F.when(2 * F.col("cum") >= F.col("total"), F.col("n_chars")))
        .alias("weighted_median_chars"),
        F.max("total").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# sketch_kmv_overlap3
# ---------------------------------------------------------------------------

KMV3_K = 8
KMV3_THR = 90  # per-type high-value user sets: partial 3-way overlap


@register(
    "sketch_kmv_overlap3",
    oracle=f"""
    WITH m AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in_b,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_c
      FROM events WHERE value > {KMV3_THR}
        AND event_type IN ('click', 'view', 'purchase')
      GROUP BY user_id
    ),
    h AS (
      SELECT *,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS UBIGINT) AS hv
      FROM m
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY hv) AS rn,
             count(*) OVER () AS n_union
      FROM h
    ),
    bk AS (SELECT * FROM ranked WHERE rn <= {KMV3_K})
    SELECT CAST(MAX(n_union) AS BIGINT) AS n_union_exact,
           CAST((SELECT COUNT(*) FROM m
                 WHERE in_a = 1 AND in_b = 1 AND in_c = 1) AS BIGINT)
             AS n_abc_exact,
           CAST(SUM(in_a * in_b * in_c) AS BIGINT) AS k_hits,
           CAST({KMV3_K - 1} AS DOUBLE) * 1152921504606846976.0
             / CAST(MAX(CASE WHEN rn = {KMV3_K} THEN hv END) AS DOUBLE)
             * CAST(SUM(in_a * in_b * in_c) AS DOUBLE) / {KMV3_K}
             AS est_abc
    FROM bk
    """,
    doc="theta-sketch-style 3-way set-intersection estimate from ONE "
    "bottom-k sample: the k minimum hashes of the UNION of the three "
    "high-value user sets form an unbiased sample; intersection "
    "estimate = union KMV estimate x fraction of the sample present "
    "in all three sets. Deterministic md5 hashing makes the sketch "
    "algebra itself hash-match the oracle (exact counts ride along "
    "for error inspection). The set-operation composability that "
    "plain distinct-counters lack is the whole reason theta/KMV "
    "sketches exist; the generic theta implementation stays in "
    "operators/sketches.py, this row makes the algebra auditable. "
    "Round-10 scale fix (caught by the tightened window-skew sweep): "
    "the original form smuggled the union count through a COUNT() "
    "OVER () window, which both ran on one reducer over ALL per-user "
    "rows and blocked WindowGroupLimit on the rank window. Now the "
    "bottom-k is orderBy(hv).limit(k) — TakeOrderedAndProject, "
    "map-side partial top-k — and the union count is a 1-row "
    "aggregate broadcast back; the per-user table is checkpointed "
    "once and shared by all three legs. The oracle keeps the window "
    "form as the independent-implementation proof",
)
def sketch_kmv_overlap3(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = (
        ev.filter(
            (F.col("value") > KMV3_THR)
            & F.col("event_type").isin("click", "view", "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("in_b"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("in_c"),
        )
    )
    # shared by the bottom-k, union-count and exact-intersection legs
    h = m.withColumn(
        "hv",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long"),
    ).localCheckpoint(eager=False)
    # bottom-k of the union: TakeOrderedAndProject (map-side top-k) —
    # every task keeps k rows, no global sort, no window
    bk = h.orderBy("hv").limit(KMV3_K)
    n_union = h.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union_exact")
    )
    abc = h.filter(
        (F.col("in_a") == 1) & (F.col("in_b") == 1) & (F.col("in_c") == 1)
    ).groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_abc_exact"))
    # the k-th smallest hash == max of the kept set, defined only when
    # the union actually has k members (matches the window form's
    # CASE WHEN rn = k semantics on short inputs)
    kth = F.when(F.count(F.lit(1)) == KMV3_K, F.max("hv"))
    hits = F.sum(F.col("in_a") * F.col("in_b") * F.col("in_c"))
    return (
        bk.groupBy()
        .agg(
            hits.cast("bigint").alias("k_hits"),
            (
                F.lit(float(KMV3_K - 1))
                * F.lit(1152921504606846976.0)
                / kth.cast("double")
                * hits.cast("double")
                / F.lit(KMV3_K)
            ).alias("est_abc"),
        )
        .crossJoin(F.broadcast(n_union))
        .crossJoin(F.broadcast(abc))
        .select("n_union_exact", "n_abc_exact", "k_hits", "est_abc")
    )


# ---------------------------------------------------------------------------
# ml_kfold_assignment / agg_corr_value_hour
# ---------------------------------------------------------------------------

KFOLDS = 5


@register(
    "ml_kfold_assignment",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, source, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS UBIGINT) % {KFOLDS} AS fold
      FROM documents
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM f GROUP BY fold
    """,
    doc="deterministic k-fold assignment (k=5) by hash-mod of the "
    "document id — the cross-validation prep that must be reproducible "
    "across engines, reruns, and cluster sizes (a random split is "
    "none of those); per-fold size/mass/source stats let a consumer "
    "check balance before training. Same md5->60-bit mechanism as the "
    "holdout split (corpus_train_holdout_split), generalized to k "
    "ways; embarrassingly parallel, one aggregate",
)
def ml_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fold = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(KFOLDS),
    )
    return (
        docs.withColumn("fold", fold.cast("bigint"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
    )


@register(
    "agg_corr_value_hour",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS x,
             CAST(CAST(value AS DECIMAL(19,6)) * 1000 AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM d GROUP BY event_type
    )
    SELECT event_type, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             AS pearson_r
    FROM s
    """,
    doc="Pearson correlation (value vs hour-of-day, per event type) "
    "from one-pass integer sufficient statistics: y in exact "
    "micro-units, all five sums exact, and the only floating point is "
    "division and sqrt over identical operands — sqrt is CORRECTLY "
    "ROUNDED by IEEE 754 (unlike ln/exp/pow), so the result is "
    "bit-identical cross-engine and the correlation earns a hash row "
    "where corr()'s streaming covariance (update-order-dependent) "
    "could not. Near-zero r expected: value is hour-independent in "
    "this data, which is itself the check a feature-screening job "
    "wants",
)
def agg_corr_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("x"),
        # milli-units: y^2 sums stay under 2^63, so BOTH engines keep
        # exact int64 all the way (micro-units pushed syy past 2^63,
        # where DuckDB's hugeint->double two-step rounding can diverge)
        (F.col("value").cast("decimal(19,6)") * 1000)
        .cast("bigint")
        .alias("y"),
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    dx = F.sqrt(
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    dy = F.sqrt(
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return s.select("event_type", "n", (num / dx / dy).alias("pearson_r"))


# ---------------------------------------------------------------------------
# agg_gini_value
# ---------------------------------------------------------------------------


@register(
    "agg_gini_value",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(19,6)) * 1000 AS BIGINT) AS y,
             event_id
      FROM events
    ),
    r AS (
      SELECT event_type, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY y, event_id) AS BIGINT) AS i
      FROM d
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(i * y) AS BIGINT) AS siy
      FROM r GROUP BY event_type
    )
    SELECT event_type, n,
           (2.0 * CAST(siy AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
    FROM s
    """,
    doc="Gini coefficient of event value per type (the concentration/"
    "inequality metric: 0 = uniform, ->1 = one event carries all the "
    "mass — the long-tail diagnostic for monetization or token-count "
    "distributions): rank-weighted sum formula G = 2*Sum(i*y_i)/(n*Sum y) "
    "- (n+1)/n over milli-unit integer values, exact sums, final "
    "arithmetic over identical operands. One keyed sort-window + one "
    "aggregate; event_id tiebreak makes ranks (and thus Sum(i*y)) "
    "deterministic under duplicate values",
)
def agg_gini_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        (F.col("value").cast("decimal(19,6)") * 1000)
        .cast("bigint")
        .alias("y"),
        "event_id",
    )
    r = d.withColumn(
        "i",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("y", "event_id"))
        .cast("bigint"),
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("i") * F.col("y")).cast("bigint").alias("siy"),
    )
    gini = (
        F.lit(2.0)
        * F.col("siy").cast("double")
        / (F.col("n").cast("double") * F.col("sy").cast("double"))
    ) - (F.col("n").cast("double") + F.lit(1.0)) / F.col("n").cast("double")
    return s.select("event_type", "n", gini.alias("gini"))


# ---------------------------------------------------------------------------
# quality_benford_digits / corpus_dedup_rate_by_source
# ---------------------------------------------------------------------------


@register(
    "quality_benford_digits",
    oracle="""
    SELECT CAST(substr(CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR),
                       1, 1) AS BIGINT) AS first_digit,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE value > 0
    GROUP BY 1
    """,
    doc="first-significant-digit profile of event values (the Benford "
    "forensics screen: organic magnitudes lean on small leading "
    "digits, fabricated or clipped data does not): digits extracted "
    "integer-only — value x100 floored to an integer, first character "
    "of its decimal rendering — so no log10 crosses the engines. "
    "Output is raw counts; the consumer compares against log10(1+1/d) "
    "downstream. One map-side-combined aggregate over the scan",
)
def quality_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    first_digit = F.substring(
        F.floor(F.col("value") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    return ev.groupBy(first_digit.alias("first_digit")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@register(
    "corpus_dedup_rate_by_source",
    oracle="""
    WITH h AS (
      SELECT source, md5(text) AS d FROM documents
    ),
    g AS (
      SELECT source, d, CAST(COUNT(*) AS BIGINT) AS c
      FROM h GROUP BY source, d
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_redundant,
           CAST(((SUM(c) - COUNT(*)) * 1000000) // SUM(c) AS BIGINT)
             AS dup_rate_micro
    FROM g GROUP BY source
    """,
    doc="per-source exact-duplication report (the provenance screen a "
    "corpus intake runs before committing crawl budget: a source with "
    "30% redundancy needs dedup upstream, not more crawling): content "
    "digests grouped per source, redundancy = docs minus distinct "
    "digests, rate in integer micro-units. Two hash aggregates, both "
    "map-side combinable; at 100 TB the digest groupBy is the same "
    "single shuffle the exact-dedup pass already pays, so the report "
    "is free when piggybacked on it",
)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select("source", F.md5("text").alias("d")).groupBy(
        "source", "d"
    ).agg(F.count(F.lit(1)).alias("c"))
    return g.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (F.sum("c") - F.count(F.lit(1))).cast("bigint").alias("n_redundant"),
        F.expr("((sum(c) - count(1)) * 1000000) div sum(c)")
        .cast("bigint")
        .alias("dup_rate_micro"),
    )


# ---------------------------------------------------------------------------
# events_dau_wau_stickiness
# ---------------------------------------------------------------------------


@register(
    "events_dau_wau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    cover AS (
      SELECT DISTINCT user_id, day + CAST(g.i AS INTEGER) AS day
      FROM ud, UNNEST(range(7)) AS g(i)
    ),
    wau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM cover GROUP BY day
    )
    SELECT d.day, d.dau, w.wau,
           CAST((d.dau * 1000000) // w.wau AS BIGINT) AS stickiness_micro
    FROM dau d JOIN wau w ON w.day = d.day
    """,
    doc="DAU/WAU stickiness per day (the product-engagement ratio): "
    "WAU(D) = distinct users active in [D-6, D], computed by "
    "EXPLODING each (user, day) into the 7 future days it covers and "
    "distinct-counting per day — the binning trick that turns a "
    "distinct-over-sliding-range (which window frames cannot express "
    "over DISTINCT) into two plain hash aggregates with 7x fan-out. "
    "Integer micro-unit ratio; only days with DAU > 0 emit (inner "
    "join), so the ratio is always well-defined",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    ).distinct()
    wau = cover.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(dau * 1000000) div wau")
            .cast("bigint")
            .alias("stickiness_micro"),
        )
    )


# ---------------------------------------------------------------------------
# events_pareto_user_deciles
# ---------------------------------------------------------------------------


@register(
    "events_pareto_user_deciles",
    oracle="""
    WITH uc AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ),
    t AS (
      SELECT n_events,
             ntile(10) OVER (ORDER BY n_events DESC, user_id) AS decile,
             SUM(n_events) OVER () AS total
      FROM uc
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST((SUM(n_events) * 1000000) // MAX(total) AS BIGINT)
             AS share_micro
    FROM t GROUP BY decile
    """,
    doc="Pareto activity curve: users ranked by event count into "
    "deciles (busiest first, user_id tiebreak), each decile's share of "
    "total events in integer micro-units — the who-produces-the-load "
    "report behind capacity planning and the skew intuition the salted "
    "join exists for. The per-user aggregate shrinks the sort input to "
    "|users| rows, so the global NTILE sorts the small table, never "
    "the event stream; complements agg_gini_value's scalar score with "
    "the full curve",
)
def events_pareto_user_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    t = uc.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.desc("n_events"), "user_id")),
    ).withColumn("total", F.sum("n_events").over(Window.partitionBy()))
    return t.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.expr("(sum(n_events) * 1000000) div max(total)")
        .cast("bigint")
        .alias("share_micro"),
    )


# ---------------------------------------------------------------------------
# events_weekday_profile
# ---------------------------------------------------------------------------


@register(
    "events_weekday_profile",
    oracle="""
    SELECT event_type,
           CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value)
             AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="weekday activity profile per event type (ISO day-of-week 1 = "
    "Monday ... 7 = Sunday): counts + exact-decimal average value. "
    "Day-numbering is a cross-engine trap worth one registered query: "
    "Spark's dayofweek() is 1 = Sunday while DuckDB's dayofweek() is "
    "0 = Sunday — the only pair that agrees is Spark "
    "weekday()+1 == DuckDB isodow(), which this query pins. One "
    "map-side-combined aggregate over the scan",
)
def events_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.queries._helpers import davg

    ev = load_table(spark, sf_dir, "events")
    # weekday(): 0 = Monday; +1 aligns with DuckDB isodow (1 = Monday)
    dow = (F.weekday(F.col("ts").cast("timestamp")) + 1).cast("bigint")
    return ev.groupBy("event_type", dow.alias("dow")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        davg("value", "avg_value"),
    )


# ---------------------------------------------------------------------------
# quality_independence_residuals
# ---------------------------------------------------------------------------


@register(
    "quality_independence_residuals",
    oracle="""
    WITH o AS (
      SELECT event_type,
             CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS rt FROM o GROUP BY 1),
    c AS (SELECT dow, CAST(SUM(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS total FROM o)
    SELECT o.event_type, o.dow, o.obs,
           CAST(((o.obs * n.total - r.rt * c.ct) * 1000000)
                // (r.rt * c.ct) AS BIGINT) AS residual_micro
    FROM o JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
    """,
    doc="contingency-table independence residuals for event_type x "
    "weekday: relative deviation of each observed cell from the "
    "independence expectation (O*N - R*C)/(R*C) in integer micro-units "
    "— the screen behind a chi-square test without the chi-square's "
    "float accumulation (every operation is BIGINT, so the whole "
    "residual table hash-matches). Row/column marginals broadcast "
    "back onto the cell table; a large |residual| row is a "
    "day-of-week effect worth a look. The O*N and R*C products go "
    "through DECIMAL(38,0) on the Spark side — two event-count "
    "multiplies pass int64 long before 100 TB, and the DuckDB oracle "
    "is already HUGEINT-exact",
)
def quality_independence_residuals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dow = (F.weekday(F.col("ts").cast("timestamp")) + 1).cast("bigint")
    o = ev.groupBy("event_type", dow.alias("dow")).agg(
        F.count(F.lit(1)).cast("bigint").alias("obs")
    )
    o = o.localCheckpoint(eager=False)  # reused: cells + three marginals
    r = o.groupBy("event_type").agg(F.sum("obs").cast("bigint").alias("rt"))
    c = o.groupBy("dow").agg(F.sum("obs").cast("bigint").alias("ct"))
    n = o.groupBy().agg(F.sum("obs").cast("bigint").alias("total"))
    return (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow",
            "obs",
            # obs*total and rt*ct multiply two event counts (~1e24 at
            # 100 TB) — DECIMAL(38,0) keeps the Spark side exact where
            # BIGINT would wrap silently against the HUGEINT oracle
            # (the fam_micro overflow class, ADVICE r8). The residual
            # can be negative; decimal `div` truncates toward zero
            # exactly like the BIGINT div (and DuckDB //) it replaces.
            F.expr(
                "((CAST(obs AS DECIMAL(38,0)) * total"
                " - CAST(rt AS DECIMAL(38,0)) * ct) * 1000000)"
                " div (CAST(rt AS DECIMAL(38,0)) * ct)"
            )
            .cast("bigint")
            .alias("residual_micro"),
        )
    )
