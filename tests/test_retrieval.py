"""Retrieval compositions (queries/retrieval.py): the cross-engine
bit-exactness anchor, RRF fusion semantics, MMR diversity semantics,
and the plan shapes that make both scale."""

from __future__ import annotations

import tempfile

import numpy as np
import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.similarity import cosine
from cognitive_score_bigdata_spark.queries.retrieval import (
    MMR_CAND_K,
    MMR_SEL_K,
    QUERY_MOD,
    _cosine_ranked,
    _query_ids,
    search_hybrid_rrf,
    search_mmr_rerank,
)
from tests.conftest import SF_DIR


def test_hof_cosine_bit_identical_to_duckdb(spark, oracle_con):
    """The exactness anchor the module docstring claims: Spark's
    sequential aggregate fold over DOUBLE-cast arrays equals DuckDB's
    list_cosine_similarity(CAST(... AS DOUBLE[])) BIT FOR BIT, so every
    downstream comparison (top-C cuts, MMR greedy) is exact, not
    margin-dependent. If this ever fails, both retrieval queries must
    be re-audited for float-boundary risk before trusting a hash-green
    row."""
    emb = load_table(spark, SF_DIR, "embeddings")
    a = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qa"), F.col("embedding").alias("ea")
    )
    b = emb.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 40)).select(
        F.col("vec_id").alias("qb"), F.col("embedding").alias("eb")
    )
    got = {
        (r.qa, r.qb): r.c
        for r in a.crossJoin(b)
        .select("qa", "qb", cosine(F.col("ea"), F.col("eb")).alias("c"))
        .collect()
    }
    want = oracle_con.execute(
        """
        SELECT a.vec_id, b.vec_id,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[]))
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < 3 AND b.vec_id >= 3 AND b.vec_id < 40
        """
    ).fetchall()
    assert len(want) == len(got) > 0
    for qa, qb, c in want:
        assert got[(qa, qb)] == c, (qa, qb, got[(qa, qb)], c)


def _write_corpus(spark, docs_rows, emb_rows):
    d = tempfile.mkdtemp(prefix="csb_retrieval_")
    spark.createDataFrame(
        docs_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in emb_rows],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def test_rrf_promotes_doc_strong_in_both_legs(spark):
    """The reason hybrid fusion exists: a document that is SECOND in
    each leg must outrank documents that are FIRST in one leg and
    absent from the other (1/62 + 1/62 > 1/61 + 0). Fixture: doc 98 is
    the lexical #1 (pure term spam, orthogonal embedding), doc 99 the
    vector #1 (near-identical embedding, no query terms), doc 100
    second in both — fused #1 must be 100."""
    rng = np.random.RandomState(7)
    q_vec = _unit(rng.randn(64))
    near = _unit(q_vec + 0.05 * _unit(rng.randn(64)))  # vector #1
    both = _unit(q_vec + 0.40 * _unit(rng.randn(64)))  # vector #2
    docs = [
        (1, "alpha beta gamma delta eps", "en", "s", 0),  # the query doc
        (98, " ".join(["alpha beta gamma delta eps"] * 6), "en", "s", 0),
        (99, "nothing shared here at all", "en", "s", 0),
        (100, "alpha beta gamma filler filler", "en", "s", 0),
    ]
    embs = [
        (1, q_vec),
        (98, _unit(rng.randn(64))),
        (99, near),
        (100, both),
    ]
    # filler docs keep BM25 idf sane and the vector pool >2, with no
    # query terms and embeddings far from q
    for i in range(2, 20):
        docs.append((i, f"fill{i}a fill{i}b fill{i}c", "en", "s", 0))
        embs.append((i, _unit(rng.randn(64))))
    d = _write_corpus(spark, docs, embs)
    out = search_hybrid_rrf(spark, d).collect()
    by_rank = {r.rnk: r for r in out if r.query_id == 1}
    assert by_rank[1].doc_id == 100, sorted(
        (r.rnk, r.doc_id, r.n_legs) for r in out
    )
    assert by_rank[1].n_legs == 2
    # the single-leg champions trail the both-legs doc
    trailing = {by_rank[k].doc_id for k in by_rank if k > 1}
    assert {98, 99} <= trailing


def test_mmr_demotes_near_duplicate(spark):
    """The diversity property MMR is for: after picking the top hit,
    its near-duplicate (sim ~1) scores 0.5*rel - 0.5*~1 and must fall
    behind a diverse moderately-relevant doc; pure-relevance order
    would pick the duplicate second."""
    rng = np.random.RandomState(11)
    q_vec = _unit(rng.randn(64))
    off = _unit(rng.randn(64))
    top = _unit(q_vec + 0.10 * off)
    # same offset direction, slightly farther: sim(top, dup) ~ 1 while
    # rel(dup) < rel(top) by construction, not by luck of the seed
    dup = _unit(q_vec + 0.12 * off)
    diverse = _unit(q_vec + 0.80 * _unit(rng.randn(64)))
    embs = [(1, q_vec), (2, top), (3, dup), (4, diverse)]
    docs = [(i, f"text {i}", "en", "s", 0) for i, _ in embs]
    for i in range(5, 12):
        embs.append((i, _unit(rng.randn(64))))
        docs.append((i, f"text {i}", "en", "s", 0))
    d = _write_corpus(spark, docs, embs)
    out = sorted(
        ((r.rnk, r.doc_id) for r in search_mmr_rerank(spark, d).collect()
         if r.query_id == 1)
    )
    order = [doc for _, doc in out]
    assert order[0] == 2, order  # top relevance first
    assert order[1] == 4, order  # diverse beats the near-dup
    assert order.index(3) > order.index(4), order


def test_mmr_first_pick_is_pure_relevance(spark):
    """Step 1 of the greedy has an empty selected set, so it must equal
    the cosine rank-1 candidate per query — the registry's exact
    brute-force ordering (vector_cosine_topk machinery). Pins the
    rel/sim wiring through the cogrouped rerank."""
    emb = load_table(spark, SF_DIR, "embeddings")
    want = {
        (r.query_id, r.doc_id)
        for r in _cosine_ranked(emb, 1).select("query_id", "doc_id").collect()
    }
    got = {
        (r.query_id, r.doc_id)
        for r in search_mmr_rerank(spark, SF_DIR).collect()
        if r.rnk == 1
    }
    assert got == want


def test_mmr_output_shape(spark):
    """Every query id in the modulus class emits exactly MMR_SEL_K
    contiguous ranks (candidate pool >= MMR_SEL_K at test SF)."""
    rows = search_mmr_rerank(spark, SF_DIR).collect()
    n_emb = load_table(spark, SF_DIR, "embeddings").count()
    expect_q = {i for i in range(n_emb) if i % QUERY_MOD == 1}
    assert MMR_CAND_K >= MMR_SEL_K
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rnk)
    assert set(by_q) == expect_q
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, MMR_SEL_K + 1)), (q, rnks)


def test_mmr_short_pool_matches_oracle(spark):
    """A query whose candidate pool is SMALLER than MMR_SEL_K must emit
    min(MMR_SEL_K, pool) rows in BOTH engines. The Spark greedy always
    did; the oracle's recursive CTE used to stop at `step = MMR_SEL_K`
    and emit ZERO rows for short pools (the recursion never reaches
    that step when the pool runs dry) — fixed to take the per-query max
    step. 6 vectors -> query vec_id=1, pool of 5 < MMR_SEL_K=10."""
    import duckdb

    from cognitive_score_bigdata_spark.queries import REGISTRY, load_registry

    load_registry()
    rng = np.random.default_rng(7)
    emb_rows = [(i, _unit(rng.normal(size=16))) for i in range(6)]
    d = _write_corpus(spark, [(0, "x", "en", "s", 1)], emb_rows)
    pool = len(emb_rows) - 1
    assert pool < MMR_SEL_K
    got = {
        (r.query_id, r.doc_id, r.rnk)
        for r in search_mmr_rerank(spark, d).collect()
    }
    assert len(got) == pool, got
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    want = {
        (q, doc, rnk)
        for q, doc, rnk in con.execute(
            REGISTRY["search_mmr_rerank"].oracle
        ).fetchall()
    }
    con.close()
    assert got == want


def test_mmr_leg_windows_classify_safely(spark):
    """search_mmr_rerank lazily checkpoints its candidate leg (three
    consumers), which hides the leg's rank window from the registry
    sweep — so classify it directly, the documented pattern for
    checkpoint-hidden stages (see window_audit / test_winnowing). The
    top-k-per-query rank filter must stay in a safe class."""
    from cognitive_score_bigdata_spark.plans.window_audit import (
        classify_windows,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    leg = _cosine_ranked(emb, MMR_CAND_K)
    ks = {w.klass for w in classify_windows(leg)}
    assert ks and ks <= {"wgl", "per-entity"}, ks


def test_mmr_candidate_leg_runs_once(spark):
    """The §9d lesson, pinned: three consumers of the candidate pool
    must not triple the broadcast-NLJ scoring leg. After the lazy
    checkpoint the registered query's plan contains no
    BroadcastNestedLoopJoin (the leg hides behind the checkpoint scan
    and executes once)."""
    plan = (
        search_mmr_rerank(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_mmr_ivf_pool_recall_and_selection_contract(spark):
    """The rows-only ledger pins for search_mmr_rerank_ivf vs its
    exact-oracle sibling. Testdata embeddings are RANDOM — IVF's worst
    case (no cluster structure to exploit) — so the floors are above
    the n_probe/n_cells = 25% chance baseline, not near 1.0: measured
    pool recall 0.47-0.60 per query at sf0.001. Selection contract is
    structural: every query emits exactly MMR_SEL_K contiguous ranks,
    every selection comes from the IVF pool, and the first pick is the
    pool's pure-relevance argmax (the greedy's step-1 definition)."""
    from cognitive_score_bigdata_spark.operators.similarity import ivf_probe
    from cognitive_score_bigdata_spark.queries.dedup_similarity import (
        ivf_index,
    )
    from cognitive_score_bigdata_spark.queries.retrieval import (
        MMR_IVF_CELLS,
        MMR_IVF_PROBE,
        search_mmr_rerank_ivf,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    exact_pool: dict = {}
    for r in _cosine_ranked(emb, MMR_CAND_K).select(
        "query_id", "doc_id"
    ).collect():
        exact_pool.setdefault(r.query_id, set()).add(r.doc_id)
    idx = ivf_index(spark, SF_DIR, n_cells=MMR_IVF_CELLS)
    probe = ivf_probe(
        idx, _query_ids(emb), k=MMR_CAND_K, n_probe=MMR_IVF_PROBE
    ).collect()
    ivf_pool: dict = {}
    ivf_rel: dict = {}
    for r in probe:
        ivf_pool.setdefault(r.query_id, set()).add(r.neighbor_id)
        ivf_rel.setdefault(r.query_id, {})[r.neighbor_id] = r.cos
    assert set(ivf_pool) == set(exact_pool)
    recalls = [
        len(ivf_pool[q] & s) / len(s) for q, s in exact_pool.items()
    ]
    chance = MMR_IVF_PROBE / MMR_IVF_CELLS
    assert min(recalls) > chance + 0.05, recalls
    assert sum(recalls) / len(recalls) >= 0.4, recalls

    sel = search_mmr_rerank_ivf(spark, SF_DIR).collect()
    by_q: dict = {}
    for r in sel:
        by_q.setdefault(r.query_id, {})[r.rnk] = r.doc_id
    assert set(by_q) == set(exact_pool)
    for q, picks in by_q.items():
        assert sorted(picks) == list(range(1, MMR_SEL_K + 1)), (q, picks)
        assert set(picks.values()) <= ivf_pool[q], q
        rels = ivf_rel[q]
        assert picks[1] == min(rels, key=lambda d: (-rels[d], d)), q

    ex_sel = {}
    for r in search_mmr_rerank(spark, SF_DIR).collect():
        ex_sel.setdefault(r.query_id, set()).add(r.doc_id)
    agree = [
        len(set(by_q[q].values()) & ex_sel[q]) / MMR_SEL_K for q in ex_sel
    ]
    assert sum(agree) / len(agree) >= 0.25, agree


def test_mmr_ivf_leg_windows_classify_safely(spark):
    """The IVF candidate leg's windows (per-query cell rank + per-query
    candidate rank) classify per-entity under the §9r sweep. Classified
    PRE-checkpoint: _mmr_from_candidates lazily localCheckpoints the
    pool (three consumers), truncating the registered plan at an
    ExistingRDD scan — the documented dedicated-test pattern for
    checkpoint-hidden windows."""
    from cognitive_score_bigdata_spark.operators.similarity import ivf_probe
    from cognitive_score_bigdata_spark.plans.window_audit import (
        classify_windows,
    )
    from cognitive_score_bigdata_spark.queries.dedup_similarity import (
        ivf_index,
    )
    from cognitive_score_bigdata_spark.queries.retrieval import (
        MMR_IVF_CELLS,
        MMR_IVF_PROBE,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_index(spark, SF_DIR, n_cells=MMR_IVF_CELLS)
    leg = ivf_probe(
        idx, _query_ids(emb), k=MMR_CAND_K, n_probe=MMR_IVF_PROBE
    )
    ks = {w.klass for w in classify_windows(leg)}
    # wgl (WindowGroupLimit fires on the rank<=k filters) is the best
    # class; per-entity is the acceptable fallback — never exposed
    assert ks and ks <= {"wgl", "per-entity"}, ks


def test_mmr_ivf_rank_shuffle_is_payload_free(spark):
    """The IVF leg's rank exchange must not carry vector payloads (the
    quadratic-payload term the exact leg already eliminated): no
    Exchange in the probe plan may ship an array column."""
    import re as _re

    from cognitive_score_bigdata_spark.operators.similarity import ivf_probe
    from cognitive_score_bigdata_spark.queries.dedup_similarity import (
        ivf_index,
    )
    from cognitive_score_bigdata_spark.queries.retrieval import (
        MMR_IVF_CELLS,
        MMR_IVF_PROBE,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = ivf_index(spark, SF_DIR, n_cells=MMR_IVF_CELLS)
    leg = ivf_probe(
        idx, _query_ids(emb), k=MMR_CAND_K, n_probe=MMR_IVF_PROBE
    )
    plan = leg._jdf.queryExecution().executedPlan().toString()
    for m in _re.finditer(r"Exchange hashpartitioning\(([^\n]*)", plan):
        assert "__q" not in m.group(1) and "__c" not in m.group(1), m.group(0)


def test_rrf_ivf_leg_recall_and_fusion_agreement(spark):
    """The rows-only ledger pins for search_hybrid_rrf_ivf vs its
    exact sibling: (a) the IVF vector leg's recall of the exact
    cosine top-RRF_LEG_K beats the n_probe/n_cells chance baseline
    (random testdata embeddings — IVF's worst case); (b) the fused
    top-10 sets agree above a floor (the BM25 leg and the fusion are
    the sibling's code shared byte-for-byte, so divergence can ONLY
    enter through dropped vector-leg candidates; measured agreement
    0.80 at sf0.001 and sf0.01); (c) structure: every query emits
    exactly RRF_TOP_K contiguous ranks."""
    from cognitive_score_bigdata_spark.queries import load_registry
    from cognitive_score_bigdata_spark.queries.retrieval import (
        MMR_IVF_CELLS,
        MMR_IVF_PROBE,
        RRF_LEG_K,
        RRF_TOP_K,
    )

    R = load_registry()
    emb = load_table(spark, SF_DIR, "embeddings")
    exact_leg: dict = {}
    for r in _cosine_ranked(emb, RRF_LEG_K).collect():
        exact_leg.setdefault(r.query_id, set()).add(r.doc_id)

    from cognitive_score_bigdata_spark.operators.similarity import ivf_probe
    from cognitive_score_bigdata_spark.queries.dedup_similarity import (
        ivf_index,
    )

    idx = ivf_index(spark, SF_DIR, n_cells=MMR_IVF_CELLS)
    ivf_leg: dict = {}
    for r in ivf_probe(
        idx, _query_ids(emb), k=RRF_LEG_K, n_probe=MMR_IVF_PROBE
    ).collect():
        ivf_leg.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(ivf_leg) == set(exact_leg)
    recalls = [len(ivf_leg[q] & s) / len(s) for q, s in exact_leg.items()]
    chance = MMR_IVF_PROBE / MMR_IVF_CELLS
    assert min(recalls) > chance + 0.05, recalls

    fused_ivf: dict = {}
    by_q_ranks: dict = {}
    for r in R["search_hybrid_rrf_ivf"].fn(spark, SF_DIR).collect():
        fused_ivf.setdefault(r.query_id, set()).add(r.doc_id)
        by_q_ranks.setdefault(r.query_id, []).append(r.rnk)
    fused_exact: dict = {}
    for r in R["search_hybrid_rrf"].fn(spark, SF_DIR).collect():
        fused_exact.setdefault(r.query_id, set()).add(r.doc_id)
    assert set(fused_ivf) == set(fused_exact)
    agree = [
        len(fused_ivf[q] & s) / len(s) for q, s in fused_exact.items()
    ]
    assert sum(agree) / len(agree) >= 0.5, agree
    for q, rnks in by_q_ranks.items():
        assert sorted(rnks) == list(range(1, RRF_TOP_K + 1)), (q, rnks)


def test_retrieval_plan_shapes(spark):
    """Scale pins: the relevance leg broadcasts the query side (never
    shuffles the corpus for it); the MMR rerank is ONE cogrouped Arrow
    stage fed by candidate pools, and the pairwise-sim join is keyed on
    query_id (an equi-join, not a cartesian)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    leg = _cosine_ranked(emb, MMR_CAND_K)
    leg_plan = leg._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in leg_plan, leg_plan

    mmr = search_mmr_rerank(spark, SF_DIR)
    plan = mmr._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapCoGroupsInPandas") == 1, plan
    assert "CartesianProduct" not in plan, plan

    rrf = search_hybrid_rrf(spark, SF_DIR)
    rplan = rrf._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in rplan, rplan
