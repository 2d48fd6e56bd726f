"""Round-12 seeded SemDeDup (queries/round12.py): float-margin
non-degeneracy for the two cross-engine decisions (cell argmax, pair
threshold), planted-duplicate recovery through the blocked path, and
the ids-only pair-shuffle plan pin."""

from __future__ import annotations

import re

import numpy as np
import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.plans.audit import plan_text
from cognitive_score_bigdata_spark.queries.round12 import (
    SEED_MAX,
    SEED_MOD,
    SEED_REM,
    SEM_THRESHOLD,
    _planted_corpus,
    dedup_semantic_pairs_seeded,
)
from tests.conftest import SF_DIR


def _corpus_and_seeds(spark):
    corpus = _planted_corpus(spark, SF_DIR).toPandas()
    M = np.stack(corpus["embedding"].to_numpy()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    seed_mask = (
        (corpus["vec_id"] % SEED_MOD == SEED_REM)
        & (corpus["vec_id"] < SEED_MAX)
    ).to_numpy()
    order = np.argsort(corpus["vec_id"].to_numpy()[seed_mask])
    C = M[seed_mask][order]
    return corpus["vec_id"].to_numpy(), M, C


def test_assignment_and_threshold_margins_nondegenerate(spark):
    """Both cross-engine float decisions have margins far above float
    noise, so Spark's unit-space argmin and DuckDB's cosine DESC rank
    cannot disagree on any vector, and no pair's threshold membership
    can flip — the same non-degeneracy contract dedup_semantic_exact
    documents for its threshold (its docstring: no pair within 0.02).
    Identical vectors (the planted duplicates) tie EXACTLY on every
    seed similarity, which both engines break identically (lowest
    cell), so they are excluded from the margin statistic."""
    ids, M, C = _corpus_and_seeds(spark)
    sims = M @ C.T
    top2 = np.sort(sims, axis=1)[:, -2:]
    gap = top2[:, 1] - top2[:, 0]
    assert gap.min() > 1e-6, f"assignment margin degenerate: {gap.min()}"

    cells = sims.argmax(axis=1)
    thr_gaps = []
    for c in range(C.shape[0]):
        blk = M[cells == c]
        G = blk @ blk.T
        iu = np.triu_indices(len(blk), k=1)
        d = np.abs(G[iu] - SEM_THRESHOLD)
        thr_gaps.append(d[d > 1e-12].min())  # exact dups sit at 1.0
    assert min(thr_gaps) > 1e-6, f"threshold margin: {min(thr_gaps)}"


def test_blocked_path_recovers_planted_duplicates(spark):
    """Every planted copy (vec_id, vec_id+1M) must survive blocking:
    identical vectors produce identical seed similarities, land in the
    same cell, and pair at cos 1.0 >= threshold."""
    out = dedup_semantic_pairs_seeded(spark, SF_DIR).toPandas()
    got = set(zip(out["id_a"], out["id_b"]))
    planted_ids = [
        r.vec_id
        for r in _planted_corpus(spark, SF_DIR)
        .filter(F.col("vec_id") < 1_000_000)
        .filter(F.col("vec_id") % 25 == 0)
        .collect()
    ]
    missing = [
        i for i in planted_ids if (i, i + 1_000_000) not in got
    ]
    assert not missing, f"planted pairs lost by blocking: {missing}"


def test_pair_shuffle_is_ids_only(spark):
    """Scale contract: after the per-cell Gram kernel, no embedding
    payload crosses an exchange — the pair->cell join moves (cell,
    id_a, id_b) integers only. The plan's exchanges above the Python
    kernel must not reference the vector column."""
    df = dedup_semantic_pairs_seeded(spark, SF_DIR)
    text = plan_text(df)
    # split at the Arrow kernel node: everything planned ABOVE it is
    # the pair/join side
    kernel_pos = text.find("FlatMapGroupsInPandas")
    assert kernel_pos != -1, text[:2000]
    above = text[:kernel_pos]
    for ex in re.findall(r"Exchange [^\n]*", above):
        assert "__c" not in ex and "embedding" not in ex, ex


def test_bpe_pipeline_composition_invariants(spark):
    """The composed row's packing/sharding arithmetic re-derives from
    its own n_tok column (integer mirror independent of the prefix-sum
    operator), and the trained-encode leg agrees with the DRIVER
    tokenizer: n_tok per doc == sum over the doc's words of the greedy
    applier's token count under the independently-trained merge list
    (bpe_train == distributed trainer is pinned in
    test_round12_staging)."""
    import pandas as pd

    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.operators.bpe import (
        _encode_word,
        bpe_train,
    )
    from cognitive_score_bigdata_spark.queries import load_registry
    from cognitive_score_bigdata_spark.queries.round12 import (
        SEQ_LEN,
        TOKENS_PER_SHARD,
    )
    from cognitive_score_bigdata_spark.queries.round12_staging import (
        K_BPE_MERGES,
    )

    out = (
        load_registry()["corpus_bpe_pipeline"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # integer mirror of pack/shard from n_tok alone
    start = out["n_tok"].cumsum().shift(fill_value=0)
    assert (out["first_seq"] == start // SEQ_LEN).all()
    assert (out["last_seq"] == (start + out["n_tok"] - 1) // SEQ_LEN).all()
    assert (out["shard"] == start // TOKENS_PER_SHARD).all()

    # trained-encode leg vs the driver tokenizer
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    merges = bpe_train(docs, K_BPE_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}
    pdf = docs.toPandas()
    expected = pdf["text"].map(
        lambda t: sum(
            len(_encode_word(w, ranks)) for w in t.split() if w
        )
    )
    got = out.set_index("doc_id")["n_tok"]
    exp = pd.Series(expected.values, index=pdf["doc_id"].values)
    assert got.sort_index().equals(exp.sort_index().astype(got.dtype))
