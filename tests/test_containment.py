"""Unit pins for operators/containment.py (round-4 rewrite of the
containment near-dup): bitmap signature correctness beyond one int64
word, candidate-pair injection, and tie handling."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.operators.containment import (
    containment_pairs,
    token_bitmap_table,
)


def _tok_df(spark, docs: dict[int, set[str]], source: str = "s"):
    rows = [
        (doc_id, source, t) for doc_id, toks in docs.items() for t in toks
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, tok string"
    )


def test_bitmap_signatures_multiword_vocab(spark):
    """150-token vocabulary forces 3 signature words; n and pairwise
    intersect counts must equal python set arithmetic exactly."""
    rng = random.Random(7)
    vocab = [f"t{i:03d}" for i in range(150)]
    docs = {
        i: set(rng.sample(vocab, rng.randint(5, 80))) for i in range(12)
    }
    sigs = token_bitmap_table(_tok_df(spark, docs), ["doc_id", "source"])
    got = {r["doc_id"]: r for r in sigs.collect()}
    assert set(got) == set(docs)
    for i, toks in docs.items():
        assert got[i]["n"] == len(toks)
        assert len(got[i]["sig"]) == 3  # ceil(150/64)

    # verify pairwise intersections through the full operator at a
    # threshold of 0 (emit everything) against python ground truth
    pairs = containment_pairs(sigs, contain_pct=0).collect()
    by_pair = {
        (r["doc_small"], r["doc_big"]): r["n_common"] for r in pairs
    }
    for a in docs:
        for b in docs:
            if a >= b:
                continue
            expect = len(docs[a] & docs[b])
            small, big = (
                (a, b)
                if (len(docs[a]), a) <= (len(docs[b]), b)
                else (b, a)
            )
            assert by_pair[(small, big)] == expect, (a, b)


def test_containment_threshold_and_orientation(spark):
    """A strict subset qualifies regardless of the size gap (the case
    Jaccard misses); orientation always names the smaller set first."""
    big = {f"w{i}" for i in range(40)}
    docs = {
        1: big,
        2: set(list(big)[:8]),          # fully contained, J = 0.2
        3: {"w0", "w1", "x1", "x2"},    # 2/4 contained -> fails 0.9
    }
    sigs = token_bitmap_table(_tok_df(spark, docs), ["doc_id", "source"])
    rows = containment_pairs(sigs, contain_pct=9).collect()
    assert {(r["doc_small"], r["doc_big"]) for r in rows} == {(2, 1)}
    r = rows[0]
    assert r["n_common"] == 8 and r["n_small"] == 8


def test_candidate_pairs_injection(spark):
    """External blocking: the operator verifies exactly the supplied
    pairs — a full within-source candidate set reproduces the default
    result; a restricted one returns the matching subset."""
    docs = {
        1: {"a", "b", "c", "d", "e"},
        2: {"a", "b", "c", "d", "e", "f"},
        3: {"a", "b", "c", "d", "e", "g"},
    }
    sigs = token_bitmap_table(_tok_df(spark, docs), ["doc_id", "source"])
    default = {
        (r["doc_small"], r["doc_big"])
        for r in containment_pairs(sigs, contain_pct=9).collect()
    }
    # (2,3) shares 5 of 6 — 0.83 < 0.9 — and must NOT appear
    assert default == {(1, 2), (1, 3)}

    full = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "da long, db long"
    )
    got = {
        (r["doc_small"], r["doc_big"])
        for r in containment_pairs(
            sigs, contain_pct=9, candidate_pairs=full
        ).collect()
    }
    assert got == default

    partial = spark.createDataFrame([(1, 2)], "da long, db long")
    got = {
        (r["doc_small"], r["doc_big"])
        for r in containment_pairs(
            sigs, contain_pct=9, candidate_pairs=partial
        ).collect()
    }
    assert got == {(1, 2)}


def test_different_sources_never_pair(spark):
    a = _tok_df(spark, {1: {"x", "y"}}, source="s1")
    b = _tok_df(spark, {2: {"x", "y"}}, source="s2")
    sigs = token_bitmap_table(a.union(b), ["doc_id", "source"])
    assert containment_pairs(sigs, contain_pct=9).count() == 0


def test_salted_block_join_same_pairs(spark):
    """n_salts parallelizes the block self-join without changing the
    pair set (deterministic id salt; right side replicated)."""
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(40)]
    docs = {i: set(rng.sample(vocab, rng.randint(10, 30))) for i in range(30)}
    sigs = token_bitmap_table(_tok_df(spark, docs), ["doc_id", "source"])
    plain = {
        (r["doc_small"], r["doc_big"], r["n_common"])
        for r in containment_pairs(sigs, contain_pct=5).collect()
    }
    salted = {
        (r["doc_small"], r["doc_big"], r["n_common"])
        for r in containment_pairs(sigs, contain_pct=5, n_salts=7).collect()
    }
    assert plain == salted and plain


def test_empty_token_input_yields_empty_signature_table(spark):
    """ADVICE r4: an empty token input must return an empty signature
    table, not raise on the NULL max(bit) scalar."""
    empty = _tok_df(spark, {}).limit(0)
    sigs = token_bitmap_table(empty, ["doc_id", "source"])
    assert sigs.count() == 0
    assert containment_pairs(sigs).count() == 0
