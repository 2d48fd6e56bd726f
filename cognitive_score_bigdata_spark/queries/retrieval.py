"""Retrieval composition: hybrid rank fusion + diversity re-rank.

The registry already carries both retrieval legs a curation pipeline
mines candidates with — BM25 posting-list top-k (``text_bm25_topk``)
and embedding cosine top-k (``vector_cosine_topk``). This module adds
the two standard compositions run on top of them:

``search_hybrid_rrf`` — reciprocal-rank fusion (Cormack/Clarke/Buettcher
SIGIR'09): each leg contributes ``1/(K + rank)``; the fused ordering is
robust to the legs' incomparable score scales, which is why RRF is the
default fusion in hybrid lexical+vector search. Fusion consumes only
INTEGER ranks, so cross-engine float drift cannot exist in this stage
by construction.

``search_mmr_rerank`` — maximal marginal relevance (Carbonell/Goldstein
SIGIR'98): greedy re-rank of a candidate pool balancing query relevance
against redundancy to the already-selected set — the diversity-aware
selection a training-data curator runs to avoid filling a budget with
near-identical documents. The greedy step is inherently sequential, but
over a candidate pool that is top-C per query — candidate generation
stays distributed (posting lists / ANN); the per-query rerank touches C
rows. That split (distributed candidates, bounded sequential rerank) is
the only shape that survives 100 TB.

Cross-engine exactness (measured, not hoped): Spark's sequential
``aggregate`` fold over ``DOUBLE``-cast arrays is bit-identical to
DuckDB's ``list_cosine_similarity(CAST(... AS DOUBLE[]), ...)`` — max
abs diff 0.0 over sampled pairs at sf0.01 (see
``tests/test_retrieval.py``). Every cosine both queries consume is
computed ONCE on the Spark side with that fold; the MMR greedy then
only compares ``0.5*rel - 0.5*max(sim)`` over those scalars, written as
the same expression in the oracle's recursive CTE, so selection is
exact, not margin-dependent. Reference parity: the reference serves
score lookups (``/root/reference/src/backend/main.py:69-134``); ranked
retrieval over the corpus is part of the engine battery this repo adds
on top (brief: training-data similarity search operators).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.operators.similarity import cosine
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.round3_additions import (
    _bm25_index,
)

QUERY_MOD = 97  # query set: vec_id % 97 == 1 (same family as text_bm25_topk)
RRF_K = 60  # the SIGIR'09 paper's constant
RRF_LEG_K = 20  # depth each leg contributes
RRF_TOP_K = 10  # fused cut
MMR_CAND_K = 30  # candidate pool per query (top-C by relevance)
MMR_SEL_K = 10  # selections per query
# IVF candidate generation (the *_ivf scale variants): same coarse
# quantizer geometry as vector_ann_ivf_topk, same session-scoped index
# build — the inverted file is a batch artifact probed by every
# retrieval query.
MMR_IVF_CELLS = 16
MMR_IVF_PROBE = 4
# MMR balance: score = 0.5*rel - 0.5*max_sim, written identically in the
# Spark-side greedy and the oracle's recursive CTE (exact halves, so the
# expression is two IEEE ops on bit-identical inputs in both engines).

_BM25_SQL_LEG = f"""
    tok AS (
      SELECT doc_id, unnest(string_split_regex(text, ' +')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    q AS (
      SELECT e.vec_id AS query_id,
             unnest(list_distinct(
               string_split_regex(d.text, ' +')[1:5])) AS term
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
      WHERE e.vec_id % {QUERY_MOD} = 1
    ),
    bscored AS (
      SELECT q.query_id, tf.doc_id,
             CAST(SUM(CAST(
               ((s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * ((tf.tf * 2.2)
                  / (tf.tf + 1.2 * (0.25 + (0.75 * dl.dl) / s.avgdl)))
             AS DECIMAL(28,6))) AS DOUBLE) AS score
      FROM q
      JOIN tf ON tf.term = q.term AND tf.doc_id <> q.query_id
      JOIN dfreq ON dfreq.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    ),
    bleg AS (
      SELECT query_id, doc_id, rb FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id ASC) AS rb
        FROM bscored
      ) WHERE rb <= {RRF_LEG_K}
    )
"""

_VEC_SQL_LEG = f"""
    vleg AS (
      SELECT query_id, doc_id, rv FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])) DESC,
                          c.vec_id ASC) AS rv
        FROM embeddings q
        JOIN embeddings c ON q.vec_id % {QUERY_MOD} = 1
                         AND c.vec_id <> q.vec_id
      ) WHERE rv <= {RRF_LEG_K}
    )
"""


def _query_ids(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") % QUERY_MOD == 1)


def _cosine_ranked(emb: DataFrame, top_k: int) -> DataFrame:
    """(query_id, doc_id, rv, rel): cosine rank + value per query.

    Broadcast queries x fan-out candidates — the exact brute-force leg
    (`vector_cosine_topk` pattern). The HOF fold is the bit-exactness
    anchor: sequential double adds, same order as the oracle.
    """
    queries = _query_ids(emb).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = fan_out(
        emb.select(
            F.col("vec_id").alias("doc_id"), F.col("embedding").alias("c_emb")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    return (
        F.broadcast(queries)
        .join(cand, F.col("doc_id") != F.col("query_id"))
        .withColumn("rel", cosine(F.col("q_emb"), F.col("c_emb")))
        .withColumn("rv", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rv") <= top_k)
        .select("query_id", "doc_id", "rv", "rel", "c_emb")
    )


@register(
    "search_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_SQL_LEG},
    {_VEC_SQL_LEG},
    fused AS (
      SELECT COALESCE(b.query_id, v.query_id) AS query_id,
             COALESCE(b.doc_id, v.doc_id) AS doc_id,
             COALESCE(1.0 / ({RRF_K} + b.rb), 0.0)
               + COALESCE(1.0 / ({RRF_K} + v.rv), 0.0) AS rrf,
             CAST(b.rb IS NOT NULL AS INT)
               + CAST(v.rv IS NOT NULL AS INT) AS n_legs
      FROM bleg b FULL OUTER JOIN vleg v
        ON v.query_id = b.query_id AND v.doc_id = b.doc_id
    )
    SELECT query_id, doc_id, n_legs, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT query_id, doc_id, n_legs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf DESC, doc_id ASC) AS rnk
      FROM fused
    ) WHERE rnk <= {RRF_TOP_K}
    """,
    doc=f"hybrid search via reciprocal-rank fusion (Cormack et al. "
    f"SIGIR'09, K={RRF_K}): BM25 posting-list top-{RRF_LEG_K} (the "
    f"text_bm25_topk formulation — rational idf surrogate, "
    f"DECIMAL(28,6) accumulator) fused with embedding-cosine "
    f"top-{RRF_LEG_K} (HOF fold, bit-identical to the oracle's "
    f"DOUBLE[] list_cosine_similarity) by 1/(K+rank) per leg. Fusion "
    f"consumes integer ranks only — engines cannot drift in this "
    f"stage; exact-tie fused scores (one-leg docs at equal rank) break "
    f"on doc_id identically. Scale: each leg is top-K-per-query "
    f"(posting-list join / ANN candidate generation), fusion joins two "
    f"K-row-per-query tables on (query, doc) — never corpus-sized",
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vleg = _cosine_ranked(emb, RRF_LEG_K).select("query_id", "doc_id", "rv")
    return _rrf_fuse(_bm25_leg(spark, sf_dir), vleg)


def _bm25_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, rb): BM25 posting-list ranks to RRF_LEG_K —
    query terms are the query documents' first 5 distinct tokens (the
    text_bm25_topk convention). Shared verbatim by the exact and the
    IVF hybrid queries — only the VECTOR leg changes with scale."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    tf, dl, stats, dfreq = _bm25_index(spark, sf_dir)
    q = (
        _query_ids(emb)
        .select("vec_id")
        .join(docs, F.col("doc_id") == F.col("vec_id"))
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.array_distinct(F.slice(F.split(F.col("text"), " +"), 1, 5))
            ).alias("term"),
        )
    )
    idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tfn = (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (0.25 + (0.75 * F.col("dl")) / F.col("avgdl"))
    )
    bscored = (
        tf.join(F.broadcast(q), "term")
        # a document is not a retrieval result for its own query (the
        # vector leg's c.vec_id <> q.vec_id rule, applied symmetrically)
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum((idf * tfn).cast("decimal(28,6)"))
            .cast("double")
            .alias("score")
        )
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        bscored.withColumn("rb", F.row_number().over(wb).cast("bigint"))
        .filter(F.col("rb") <= RRF_LEG_K)
        .select("query_id", "doc_id", "rb")
    )


def _rrf_fuse(bleg: DataFrame, vleg: DataFrame) -> DataFrame:
    """1/(K+rank) fusion of two (query_id, doc_id, rank) legs — integer
    ranks in, so no cross-engine float drift can originate here."""
    fused = bleg.join(vleg, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rb")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rv")), F.lit(0.0))
        ).alias("rrf"),
        (
            F.col("rb").isNotNull().cast("int")
            + F.col("rv").isNotNull().cast("int")
        ).alias("n_legs"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("rnk") <= RRF_TOP_K)
        .select("query_id", "doc_id", "n_legs", "rnk")
    )


@register(
    "search_hybrid_rrf_ivf",
    oracle=None,  # the IVF leg's ranks are approximate by design; leg
    # recall + fusion-agreement floors pinned vs the exact sibling in
    # tests/test_retrieval.py
    doc=f"hybrid RRF with the vector leg generated by IVF probe — the "
    f"100 TB form of search_hybrid_rrf, completing the retrieval "
    f"family's scale path (the search_mmr_rerank_ivf move applied to "
    f"fusion): BM25 leg and 1/(K+rank) fusion are the exact sibling's "
    f"code shared byte-for-byte (_bm25_leg/_rrf_fuse); only the "
    f"cosine leg swaps brute force for ivf_probe over the shared "
    f"session-scoped {MMR_IVF_CELLS}-cell inverted file "
    f"({MMR_IVF_PROBE} nearest cells per query, top-{RRF_LEG_K}). "
    f"Rows-only ledgered; search_hybrid_rrf is the hash-green exact "
    f"sibling",
)
def search_hybrid_rrf_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.similarity import ivf_probe
    from cognitive_score_bigdata_spark.queries.dedup_similarity import (
        ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    index = ivf_index(spark, sf_dir, n_cells=MMR_IVF_CELLS)
    vleg = ivf_probe(
        index, _query_ids(emb), k=RRF_LEG_K, n_probe=MMR_IVF_PROBE
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rnk").alias("rv"),
    )
    return _rrf_fuse(_bm25_leg(spark, sf_dir), vleg)


def _mmr_greedy(
    rel: pd.DataFrame, sim: pd.DataFrame
) -> pd.DataFrame:
    """Sequential MMR over one query's candidate pool (scalars only).

    No float is recomputed here: rel/sim arrive as the Spark-side HOF
    cosines (bit-identical to the oracle's), and the selection compares
    ``0.5*rel - 0.5*max_sim`` — the oracle's exact expression.
    """
    qid = int(rel["query_id"].iloc[0])
    rels = dict(zip(rel["doc_id"].astype(int), rel["rel"]))
    sims: dict[tuple[int, int], float] = {}
    for a, b, s in zip(
        sim["id_a"].astype(int), sim["id_b"].astype(int), sim["sim"]
    ):
        sims[(a, b)] = s
        sims[(b, a)] = s
    # first pick: pure relevance, ties on lower doc_id
    selected = [min(rels, key=lambda d: (-rels[d], d))]
    while len(selected) < min(MMR_SEL_K, len(rels)):
        best = None
        best_key = None
        for d in rels:
            if d in selected:
                continue
            mxs = max(sims[(d, s)] for s in selected)
            score = 0.5 * rels[d] - 0.5 * mxs
            key = (-score, d)
            if best_key is None or key < best_key:
                best, best_key = d, key
        selected.append(best)
    return pd.DataFrame(
        {
            "query_id": qid,
            "doc_id": selected,
            "rnk": range(1, len(selected) + 1),
        }
    )


def _mmr_from_candidates(ranked: DataFrame, vecs: DataFrame) -> DataFrame:
    """The shared MMR tail: re-attach vectors to the (query_id, doc_id,
    rel) candidate pool, compute pairwise pool sims, run the bounded
    per-query greedy in one cogrouped Arrow stage. The candidate LEG is
    the part that changes with scale (brute force vs IVF probe); this
    tail is identical for both."""
    # three consumers (rel projection + both pair-join sides) — without
    # this the candidate leg executes three times (the §9d winnowing
    # lesson; the plan showed 3 BroadcastNestedLoopJoins). The
    # checkpoint hides the leg's windows from the registry sweep, so
    # tests/test_retrieval.py classifies them directly — the documented
    # pattern for checkpoint-hidden stages.
    cand = ranked.join(vecs, "doc_id").localCheckpoint(eager=False)
    # Pairwise sims within each query's pool: C*(C-1)/2 HOF cosines per
    # query, join keyed on query_id — bounded by the pool, not the corpus.
    a = cand.alias("a")
    b = cand.alias("b")
    sims = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            cosine(F.col("a.c_emb"), F.col("b.c_emb")).alias("sim"),
        )
    )
    rel = cand.select("query_id", "doc_id", "rel")
    return (
        rel.groupBy("query_id")
        .cogroup(sims.groupBy("query_id"))
        .applyInPandas(
            lambda left, right: _mmr_greedy(left, right),
            "query_id bigint, doc_id bigint, rnk bigint",
        )
    )


@register(
    "search_mmr_rerank",
    oracle=f"""
    WITH RECURSIVE cand AS (
      SELECT query_id, doc_id, rel FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) AS rel,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])) DESC,
                          c.vec_id ASC) AS rc
        FROM embeddings q
        JOIN embeddings c ON q.vec_id % {QUERY_MOD} = 1
                         AND c.vec_id <> q.vec_id
      ) WHERE rc <= {MMR_CAND_K}
    ),
    sim AS (
      SELECT a.query_id, a.doc_id AS id_a, b.doc_id AS id_b,
             list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                    CAST(eb.embedding AS DOUBLE[])) AS s
      FROM cand a
      JOIN cand b ON b.query_id = a.query_id AND a.doc_id < b.doc_id
      JOIN embeddings ea ON ea.vec_id = a.doc_id
      JOIN embeddings eb ON eb.vec_id = b.doc_id
    ),
    simsym AS (
      SELECT query_id, id_a, id_b, s FROM sim
      UNION ALL
      SELECT query_id, id_b, id_a, s FROM sim
    ),
    mmr AS (
      SELECT query_id, 1 AS step,
             [first(doc_id ORDER BY rel DESC, doc_id ASC)] AS sel
      FROM cand GROUP BY query_id
      UNION ALL
      SELECT m.query_id, m.step + 1,
             list_append(m.sel,
               first(c.doc_id
                     ORDER BY 0.5 * c.rel - 0.5 * mx.mxs DESC,
                              c.doc_id ASC))
      FROM mmr m
      JOIN cand c ON c.query_id = m.query_id
                 AND NOT list_contains(m.sel, c.doc_id)
      JOIN LATERAL (
        SELECT max(ss.s) AS mxs FROM simsym ss
        WHERE ss.query_id = m.query_id AND ss.id_a = c.doc_id
          AND list_contains(m.sel, ss.id_b)
      ) mx ON TRUE
      WHERE m.step < {MMR_SEL_K}
      GROUP BY m.query_id, m.step, m.sel
    ),
    laststep AS (
      SELECT query_id, sel,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY step DESC) AS rs
      FROM mmr
    )
    SELECT query_id, unnest(sel) AS doc_id,
           CAST(unnest(range(1, len(sel) + 1)) AS BIGINT) AS rnk
    FROM laststep WHERE rs = 1
    """,
    doc=f"maximal-marginal-relevance diversity re-rank (Carbonell/"
    f"Goldstein SIGIR'98, lambda=0.5): top-{MMR_CAND_K} cosine "
    f"candidates per query, then greedy selection of {MMR_SEL_K} "
    f"maximizing 0.5*rel - 0.5*max-sim-to-selected. Every cosine is "
    f"computed once Spark-side via the sequential HOF fold — measured "
    f"bit-identical to the oracle's DOUBLE[] list_cosine_similarity — "
    f"so the greedy compares identical doubles in both engines and the "
    f"oracle's recursive CTE replays the exact selection. Scale: "
    f"candidate generation is the distributed stage (brute force here; "
    f"the IVF/PQ registry family at 100 TB), the sequential greedy "
    f"touches only C={MMR_CAND_K} rows per query inside one cogrouped "
    f"Arrow batch — never a corpus-sized loop",
)
def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Drop the embedding payload BEFORE the leg's rank shuffle (the
    # ivf_probe lesson: sorting Q x N rows that still carry a vector is
    # the quadratic-payload term at scale; Catalyst prunes it here
    # because this select does not consume c_emb) and re-attach vectors
    # afterwards for the top-C x Q survivors only.
    ranked = _cosine_ranked(emb, MMR_CAND_K).select(
        "query_id", "doc_id", "rel"
    )
    vecs = emb.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("c_emb")
    )
    return _mmr_from_candidates(ranked, vecs)


@register(
    "search_mmr_rerank_ivf",
    oracle=None,  # IVF candidates are approximate by design; recall +
    # greedy-agreement pinned vs the exact sibling in tests
    doc=f"MMR diversity re-rank over IVF-probed candidates — the 100 TB "
    f"candidate path made registry-resident (VERDICT r10 item 3; §9v "
    f"measured the exact-vs-IVF crossover: 71.2 s vs 1.4 s at 32x). "
    f"Candidate leg = ivf_probe over the session-scoped "
    f"{MMR_IVF_CELLS}-cell inverted file, {MMR_IVF_PROBE} nearest "
    f"cells per query, top-{MMR_CAND_K} by unit-dot cosine — each "
    f"query scores ~n_probe/n_cells of the corpus instead of all of "
    f"it, and the rank shuffle is payload-free (both pinned in "
    f"tests/test_retrieval.py). The greedy tail is byte-for-byte the "
    f"exact sibling's (_mmr_from_candidates): pairwise pool sims via "
    f"the HOF cosine fold, bounded per-query selection of "
    f"{MMR_SEL_K} in one cogrouped Arrow stage. search_mmr_rerank is "
    f"the exact-oracle sibling",
)
def search_mmr_rerank_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.similarity import ivf_probe
    from cognitive_score_bigdata_spark.queries.dedup_similarity import (
        ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    index = ivf_index(spark, sf_dir, n_cells=MMR_IVF_CELLS)
    ranked = ivf_probe(
        index, _query_ids(emb), k=MMR_CAND_K, n_probe=MMR_IVF_PROBE
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("cos").alias("rel"),
    )
    vecs = emb.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("c_emb")
    )
    return _mmr_from_candidates(ranked, vecs)
