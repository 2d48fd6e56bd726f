"""Property-based tests (hypothesis): operator invariants that must hold
for ANY input, not just the fixtures — span-dedup conservation, prefix-sum
equivalence, Misra–Gries superset, sequence-packing coverage.

Strategies are kept small (docs of ≤12 short tokens, ≤30 rows) so each
case is one fast local Spark job; `deadline=None` because JVM scheduling
jitter would otherwise flake."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cognitive_score_bigdata_spark.operators.sharding import (
    global_exclusive_prefix_sum,
    pack_sequences,
)
from cognitive_score_bigdata_spark.queries.spandedup import CHUNK, chunk_dedup

TOK = st.text(alphabet="abcd", min_size=1, max_size=3)
DOC = st.lists(TOK, min_size=1, max_size=12).map(" ".join)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=st.lists(DOC, min_size=1, max_size=12))
@SETTINGS
def test_chunk_dedup_conservation(spark, texts):
    """For any corpus: n_kept ≤ n_chunks per doc, totals conserve
    (Σ n_kept = number of DISTINCT spans corpus-wide), and a cleaned
    document is always a subsequence-of-chunks of the original."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = chunk_dedup(docs).collect()
    assert len(out) == len(texts)
    total_kept = 0
    distinct_spans = set()
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_chunks"]
        total_kept += r["n_kept"]
    for i, t in enumerate(texts):
        toks = t.split()
        for s in range(0, len(toks), CHUNK):
            distinct_spans.add(" ".join(toks[s : s + CHUNK]))
    assert total_kept == len(distinct_spans)


@given(
    vals=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
    parts=st.integers(min_value=1, max_value=5),
)
@SETTINGS
def test_prefix_sum_matches_reference(spark, vals, parts):
    df = spark.createDataFrame(
        list(enumerate(vals)), "k long, v long"
    ).repartition(parts)
    got = {
        r["k"]: r["prefix"]
        for r in global_exclusive_prefix_sum(df, "k", "v").collect()
    }
    acc, ref = 0, {}
    for i, v in enumerate(vals):
        ref[i] = acc
        acc += v
    assert got == ref


@given(
    texts=st.lists(DOC, min_size=1, max_size=10),
    seq_len=st.integers(min_value=1, max_value=7),
)
@SETTINGS
def test_pack_sequences_partitions_every_token(spark, texts, seq_len):
    """Packing must cover every token of every doc exactly once, with
    segment lengths ≤ seq_len and contiguous in-doc ranges."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    segs: dict[int, list] = {}
    for r in pack_sequences(docs, seq_len).collect():
        segs.setdefault(r["doc_id"], []).append(
            (r["seq_id"], r["doc_tok_start"], r["doc_tok_end"])
        )
    for i, t in enumerate(texts):
        n = len(t.split())
        parts_ = sorted(segs[i], key=lambda s: s[1])
        assert parts_[0][1] == 0 and parts_[-1][2] == n
        for (_, a1, b1), (_, a2, _b2) in zip(parts_, parts_[1:]):
            assert b1 == a2  # contiguous, no gap or overlap
        assert all(0 < b - a <= seq_len for _, a, b in parts_)
