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


@given(
    docs=st.dictionaries(
        st.integers(min_value=0, max_value=50),
        st.sets(TOK, min_size=1, max_size=10),
        min_size=2,
        max_size=10,
    ),
    pct=st.integers(min_value=0, max_value=10),
)
@SETTINGS
def test_containment_pairs_match_set_arithmetic(spark, docs, pct):
    """For ANY doc->token-set map and ANY integer threshold: the bitmap
    containment operator's (n_common, n_small) and pair membership equal
    python set arithmetic exactly (covers both signature layouts via the
    tiny shared alphabet -> single int64 word)."""
    from cognitive_score_bigdata_spark.operators.containment import (
        containment_pairs,
        token_bitmap_table,
    )

    rows = [(i, "s", t) for i, toks in docs.items() for t in toks]
    tok = spark.createDataFrame(rows, "doc_id long, source string, tok string")
    sigs = token_bitmap_table(tok, ["doc_id", "source"])
    got = {
        (r["doc_small"], r["doc_big"]): (r["n_common"], r["n_small"])
        for r in containment_pairs(sigs, contain_pct=pct).collect()
    }
    expect = {}
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            nc = len(docs[a] & docs[b])
            small, big = (
                (a, b)
                if (len(docs[a]), a) <= (len(docs[b]), b)
                else (b, a)
            )
            ns = len(docs[small])
            if nc * 10 >= pct * ns:
                expect[(small, big)] = (nc, ns)
    assert got == expect


@given(
    word=st.text(alphabet="abcdefky!7", min_size=1, max_size=16),
)
@settings(max_examples=200, deadline=None)
def test_bpe_chained_equals_greedy_any_alphabet(word):
    """The chained-replace/greedy equivalence must hold for words over
    ANY alphabet — including characters the merge table never saw (no
    merge applies to them) and characters colliding with merge symbol
    prefixes."""
    from tests.test_bpe_artifact import RANKS, _chained

    from cognitive_score_bigdata_spark.operators.bpe import _encode_word

    assert _encode_word(word, RANKS) == _chained(word)


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),   # price (small domain
            st.integers(min_value=0, max_value=8),   # + size => many ties)
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_skyline_sweep_equals_bruteforce(spark, pts):
    """For ANY point set (dense tie structure on both coordinates): the
    sort-sweep skyline equals the brute-force dominance definition."""
    import os
    import tempfile

    from cognitive_score_bigdata_spark.queries import load_registry

    rows = [(i, float(p), s) for i, (p, s) in enumerate(pts)]
    brute = {
        pk
        for pk, pr, sz in rows
        if not any(
            qr <= pr and qs >= sz and (qr < pr or qs > sz)
            for _, qr, qs in rows
        )
    }
    d = tempfile.mkdtemp(prefix="csb_sky_prop_")
    spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    ).write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    got = {
        r["part_key"]
        for r in load_registry()["analytics_skyline_parts"]
        .fn(spark, d)
        .collect()
    }
    assert got == brute


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),    # user
            st.sampled_from(["a", "b", "c"]),         # type
            st.integers(min_value=0, max_value=5),    # ts (ties likely)
        ),
        min_size=1,
        max_size=15,
    )
)
@SETTINGS
def test_markov_counts_match_reference(spark, events):
    """For ANY event set (including heavy timestamp ties, broken by
    event_id): transition counts equal the python lag reference."""
    import collections

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = [(u, t, ts, i) for i, (u, t, ts) in enumerate(events)]
    ref: collections.Counter = collections.Counter()
    last: dict = {}
    for u, t, ts, i in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
        if u in last:
            ref[(last[u], t)] += 1
        last[u] = t
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    got = collections.Counter(
        {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in df.select(
                "event_type",
                F.lag("event_type").over(w).alias("prev_type"),
            )
            .filter(F.col("prev_type").isNotNull())
            .groupBy("prev_type", F.col("event_type").alias("next_type"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    )
    assert got == ref
