"""Round-5 additions.

``dedup_pipeline_blocked_verify`` — the production near-dup posture as
ONE registered, oracle-checked pipeline (VERDICT r4 "Next round" #3).
The §9d/§9g scale studies conclude that on a near-dup-dense corpus the
exact similarity joins are EMIT-bound (the answer itself is quadratic),
and that the 100 TB answer is a composition, previously documented only
as prose:

1. **exact dedup first** — collapse literal copies (md5 digest groupBy,
   min doc_id canonical), shrinking every downstream block;
2. **MinHash-LSH blocking** — candidate pairs come from band-bucket
   joins (bounded buckets), never from an all-pairs or whole-block
   self-join;
3. **bitmap verify** — candidates are scored on packed int64 bitmap
   signatures (codegen ``bit_count``), so the verify stage shuffles
   (id, n, sig) bytes, never token arrays.

Every stage is deterministic and cross-engine reproducible (the md5
two-hash minhash scheme from ``dedup_minhash_pairs_md5``), so the whole
composition gets a full value-hash driver row — the recall/threshold
behavior of the blocking IS part of the checked answer, like
``dedup_semantic_exact``. Plan contract (pinned in
``tests/test_plans.py``): candidate generation joins on (band, bkey)
— bucket-bounded — and no exchange after the signature build carries a
token array.

Reference parity note: the reference (an AWS scoring stack,
`/root/reference/src/backend/main.py`) has no dedup surface; this
module belongs to the brief's LLM-pipeline extension surface.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.dedup_md5 import (
    _MH_BANDKEY,
    _MH_MINS,
    MH_BANDS,
    MH_K,
)

# verify threshold: flag when 10 * |A∩B| >= 9 * |A| (A the smaller set)
PIPE_CONTAIN_PCT = 9

_PIPE_ORACLE = f"""
    WITH canon AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    d AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id IN (SELECT doc_id FROM canon)
    ),
    toks AS (
      SELECT doc_id, string_split_regex(text, ' +') AS t FROM d
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
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    tok AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(text, ' +')) AS tok
      FROM d
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id
    ),
    inter AS (
      SELECT c.da, c.db, CAST(COUNT(*) AS BIGINT) AS nc
      FROM cand c
      JOIN tok a ON a.doc_id = c.da
      JOIN tok b ON b.doc_id = c.db AND b.tok = a.tok
      GROUP BY c.da, c.db
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
    WHERE i.nc * 10 >= {PIPE_CONTAIN_PCT} * LEAST(sa.n, sb.n)
"""


def _md5_minhash_candidates(d: DataFrame) -> DataFrame:
    """(da, db) LSH candidate pairs over ``d(doc_id, text)`` — composes
    the SHARED md5 two-hash minhash helpers in round4_staging2 (whose
    ``dedup_minhash_pairs_md5`` driver row verifies the machinery
    bit-for-bit against DuckDB)."""
    from cognitive_score_bigdata_spark.queries.dedup_md5 import (
        md5_minhash_band_candidates,
        md5_minhash_signatures,
    )

    return md5_minhash_band_candidates(
        md5_minhash_signatures(d), a_col="da", b_col="db"
    )


@register(
    "dedup_pipeline_blocked_verify",
    oracle=_PIPE_ORACLE,
    doc="the production near-dup composition as one checked pipeline: "
    "exact dedup (md5 groupBy, min-doc_id canonical) -> MinHash-LSH "
    "blocking (md5 two-hash scheme, 4x4 bands — bucket-bounded "
    "candidate generation, the 100 TB alternative to the emit-bound "
    "whole-block self-joins) -> packed-bitmap containment verify "
    "(codegen bit_count over dictionary-encoded int64 signatures; "
    "10*common >= 9*|A| integer predicate). Deterministic end to end, "
    "so the driver hash-checks the composition INCLUDING the blocking "
    "recall at these thresholds; plan-pinned: candidates join on "
    "(band, bkey), and no exchange after the signature build moves a "
    "token array",
)
def dedup_pipeline_blocked_verify(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cognitive_score_bigdata_spark.functions import text as TX
    from cognitive_score_bigdata_spark.operators.containment import (
        containment_pairs,
        token_bitmap_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    canon_ids = (
        docs.groupBy(F.md5("text").alias("dig"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d = fan_out(
        docs.join(canon_ids, "doc_id").select("doc_id", "text")
    ).localCheckpoint(eager=False)
    cand = _md5_minhash_candidates(d)
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(TX.tokens("text"))).alias("tok"),
    )
    sigs = token_bitmap_table(tok, ["doc_id"]).localCheckpoint(eager=False)
    return containment_pairs(
        sigs,
        contain_pct=PIPE_CONTAIN_PCT,
        block_col="doc_id",
        candidate_pairs=cand,
    )


# ---------------------------------------------------------------------------
# Round-6 staging: registered + locally verified now, outside the
# round-5 driver window by design (the window must keep the 16 carried
# queries; these front the round-6 rotation).
# ---------------------------------------------------------------------------


# The bucketed degree-folded edge table is the build artifact of this
# physical mode (pay the bucketBy(src) write once per corpus, iterate
# many times) — session-cached exactly like join_bucketed_colocated's
# bucketed pair and the copurchase pair parquet.
_PR_BKT_CACHE: dict = {}


def _pr_bucketed_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.graph import (
        bucketize_edges,
        fold_pagerank_edges,
    )
    from cognitive_score_bigdata_spark.queries.graphs import (
        copurchase_pairs,
    )
    from cognitive_score_bigdata_spark.session_cache import session_scoped

    # bucketize_edges returns the re-read bucketed scan; cache THAT
    # DataFrame — it is just a table scan, safe to reuse within the
    # session
    def build_df() -> DataFrame:
        pairs = copurchase_pairs(spark, sf_dir)
        edges = pairs.select(
            F.col("p1").alias("src"), F.col("p2").alias("dst")
        ).unionAll(
            pairs.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
        )
        # pin=True: this scan is cached across calls by session_scoped
        # below — bucketize_edges' ad-hoc LRU must never drop its table
        return bucketize_edges(
            fold_pagerank_edges(edges), "src", 32, pin=True
        )

    return session_scoped(_PR_BKT_CACHE, spark, (sf_dir,), build_df)


@register(
    "graph_pagerank_bucketed",
    oracle=None,  # set just below to the copurchase oracle — same answer,
    # different physical layout; see _set_bucketed_oracle
    doc="the SAME PageRank answer as graph_pagerank_copurchase computed "
    "on the BUCKETED-EDGE layout (operators/graph.bucketize_edges + "
    "edge_buckets=32): the degree-folded edge table is written once "
    "with bucketBy(src).sortBy(src), every iteration sort-merge joins "
    "the rank table into the bucket partitioning — zero edge-side "
    "exchange per iteration. This is the >2M-node physical mode of "
    "SURVEY §9j (3.4x faster than per-iteration broadcast at the 32x "
    "replica) under a full value-hash oracle: like "
    "join_bucketed_colocated, the mode changes the physical plan only, "
    "and the driver row proves it bit-for-bit",
)
def graph_pagerank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.graph import (
        pagerank_fixed_point,
    )
    from cognitive_score_bigdata_spark.queries.graphs import (
        PR_ITERS,
        PR_TOPK,
    )

    ed = _pr_bucketed_table(spark, sf_dir)
    ranks = pagerank_fixed_point(
        ed, n_iters=PR_ITERS, edge_buckets=32, prepared=True
    )
    return (
        ranks.select(
            F.col("node").alias("part_key"),
            F.col("rank_micro").cast("bigint").alias("rank_micro"),
        )
        .orderBy(F.desc("rank_micro"), "part_key")
        .limit(PR_TOPK)
    )


def _set_bucketed_oracle() -> None:
    # identical answer to the broadcast-mode query, so identical oracle;
    # assigned after registration to reuse the (long) unrolled CTE text
    from dataclasses import replace

    from cognitive_score_bigdata_spark.queries import REGISTRY
    from cognitive_score_bigdata_spark.queries.graphs import (
        _PR_ORACLE,
    )

    spec = REGISTRY["graph_pagerank_bucketed"]
    REGISTRY["graph_pagerank_bucketed"] = replace(spec, oracle=_PR_ORACLE)


_set_bucketed_oracle()


@register(
    "analytics_skyline_parts",
    oracle="""
    SELECT p.p_partkey AS part_key,
           p.p_retailprice AS price,
           CAST(p.p_size AS BIGINT) AS size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    doc="2-D skyline / pareto frontier (Borzsonyi et al. ICDE'01): the "
    "parts no other part dominates on (minimize retail price, maximize "
    "size) — the multi-criteria shortlist query. NOT the naive "
    "not-exists self-join the oracle runs: the plan is the sort-sweep "
    "formulation — per-price max size (one hash aggregate), a running "
    "max over STRICTLY cheaper prices (window over the distinct-price "
    "table, |prices| rows, never the fact table), broadcast back. A "
    "part survives iff it ties its price group's max size and beats "
    "every cheaper group's max: O(n) + O(|prices| log |prices|) vs the "
    "oracle's O(n^2), zero self-joins (plan-pinned). Ties on both "
    "coordinates all survive (neither dominates)",
)
def analytics_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    by_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("mx")
    )
    w = (
        Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # frontier per distinct price: the max size among all strictly
    # cheaper prices (NULL for the cheapest)
    frontier = by_price.withColumn("prev_mx", F.max("mx").over(w))
    return (
        part.join(F.broadcast(frontier), "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("mx"))
            & (
                F.col("prev_mx").isNull()
                | (F.col("prev_mx") < F.col("p_size"))
            )
        )
        .select(
            F.col("p_partkey").alias("part_key"),
            F.col("p_retailprice").alias("price"),
            F.col("p_size").cast("bigint").alias("size"),
        )
    )


_MARKOV_ORACLE = """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    t AS (SELECT prev_type, SUM(n) AS tot FROM c GROUP BY 1)
    SELECT c.prev_type, c.next_type, c.n,
           CAST(c.n AS DOUBLE) / t.tot AS p
    FROM c JOIN t USING (prev_type)
"""


@register(
    "events_markov_transitions",
    oracle=_MARKOV_ORACLE,
    doc="first-order Markov transition matrix over per-user event "
    "sequences (the user-journey mining primitive behind funnel/"
    "next-action models): lag over (user, ts, event_id) — event_id "
    "breaks timestamp ties so the sequence is deterministic on both "
    "engines — then exact BIGINT transition counts; p is ONE double "
    "division of identical integers (the est_jaccard rule). One "
    "event-sized shuffle on user_id for the lag window, then "
    "|types|²-bounded aggregates — the transition matrix is tiny at "
    "any corpus scale, the sequence pass is linear",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    # c is referenced by the matrix AND its row totals: cut lineage so
    # the event-sized lag window + aggregation run once, not twice
    c = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    t = c.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return (
        c.join(F.broadcast(t), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            (F.col("n").cast("double") / F.col("tot")).alias("p"),
        )
    )


# Stream-source fixture: events exported once per (session, sf_dir) as
# JSON with integer micros + the event_id tiebreak column (the stream
# exists already in production; caching keeps the timed query measuring
# the drain + state machinery, not the export).
_MARKOV_STREAM_IN: dict = {}
_MARKOV_SEQ = itertools.count()


def _markov_stream_indir(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    from cognitive_score_bigdata_spark.session_cache import session_scoped

    def build() -> str:
        in_dir = os.path.join(
            tempfile.mkdtemp(prefix="csb_stream_markov_"), "in"
        )
        (
            load_table(spark, sf_dir, "events")
            .select(
                "user_id",
                "event_type",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                "event_id",
            )
            .write.mode("overwrite")
            .json(in_dir)
        )
        return in_dir

    return session_scoped(_MARKOV_STREAM_IN, spark, (sf_dir,), build)


@register(
    "streaming_markov_transitions",
    oracle=_MARKOV_ORACLE,
    doc="the Markov transition matrix maintained as a STREAMING "
    "stateful operator (applyInPandasWithState: one (last ts, id, "
    "type) state row per user; each batch sorts its rows by "
    "(ts_us, event_id) and emits the transition PAIRS as the change "
    "stream) and aggregated to the identical matrix as the batch lag "
    "window — hash-matching the SAME oracle. Order-sensitive streaming "
    "state, the class the HLL row (order-INsensitive max-merge) cannot "
    "witness: with a single-batch availableNow drain the in-function "
    "sort reproduces the lag-window order exactly; multi-batch "
    "carryover is pinned separately in tests (time-split files), and "
    "cross-batch reordering is the documented limit. State bounded by "
    "|users|, not stream length",
)
def streaming_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from cognitive_score_bigdata_spark.streaming.transitions import (
        transition_stream,
    )

    in_dir = _markov_stream_indir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="csb_stream_markov_run_")
    name = f"csb_markov_{next(_MARKOV_SEQ)}"
    pairs = transition_stream(
        spark, in_dir, os.path.join(work, "ckpt"), query_name=name
    )
    # localCheckpoint: c is referenced by both the matrix and its row
    # totals, and Spark's memory-sink view cannot self-join its own
    # lineage (conflicting-reference resolution fails); the cut also
    # means the tiny matrix is computed once. EAGER so the memory-sink
    # table and checkpoint dir can be dropped right here — otherwise
    # every bench iteration leaks a csb_markov_<n> view (driver memory)
    # and a work dir (disk), unbounded across repeated calls.
    c = (
        pairs.groupBy("prev_type", F.col("next_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    spark.catalog.dropTempView(name)
    shutil.rmtree(work, ignore_errors=True)
    t = c.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("tot")).alias("p"),
    )
