"""Sketch + span-dedup operator guarantees that the oracle can't state:
Misra–Gries candidate-superset property, partition-independence of the
exact-verify answer, the k-vs-phi precondition, and chunk-dedup
first-occurrence semantics on a controlled corpus."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.operators.sketches import (
    heavy_hitters_exact,
    mg_candidates,
)
from cognitive_score_bigdata_spark.queries.spandedup import chunk_dedup


def _stream(spark, freqs: dict[str, int], parts: int):
    rows = [(tok,) for tok, n in sorted(freqs.items()) for _ in range(n)]
    return spark.createDataFrame(rows, "tok string").repartition(parts)


FREQS = {"hot": 400, "warm": 120, "mid": 60, **{f"t{i}": 3 for i in range(140)}}
N = sum(FREQS.values())  # 1000


def test_mg_candidates_superset(spark):
    """Every item with global freq > n/(k+1) must survive the sketch
    (candidates live in xxhash64 space — compare hashes)."""
    import pyspark.sql.functions as F

    k = 16
    required = {t for t, n in FREQS.items() if n > N / (k + 1)}
    req_hashes = {
        r["h"]
        for r in spark.createDataFrame([(t,) for t in required], "tok string")
        .select(F.xxhash64("tok").alias("h"))
        .collect()
    }
    for parts in (1, 4, 16):
        cands = {
            r["item"]
            for r in mg_candidates(_stream(spark, FREQS, parts), "tok", k).collect()
        }
        assert req_hashes <= cands, f"parts={parts}: lost {required}"


def test_heavy_hitters_exact_partition_independent(spark):
    expected = {
        t: n for t, n in FREQS.items() if n > 0.05 * N
    }  # hot, warm, mid
    for parts in (1, 3, 16):
        got = {
            r["item"]: r["n_occurrences"]
            for r in heavy_hitters_exact(
                _stream(spark, FREQS, parts), "tok", phi=0.05, k=32
            ).collect()
        }
        assert got == expected, f"parts={parts}"


def test_heavy_hitters_k_precondition():
    with pytest.raises(ValueError, match="k=8 too small"):
        heavy_hitters_exact(None, "tok", phi=0.01, k=8)


def test_chunk_dedup_first_occurrence(spark):
    # doc 0 owns "a b c"; doc 1 repeats it then adds its own chunk;
    # doc 2 is entirely doc 0's chunk → cleaned to empty string.
    docs = spark.createDataFrame(
        [(0, "a b c x y z"), (1, "a b c q r s"), (2, "a b c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup(docs).collect()}
    assert (out[0]["n_chunks"], out[0]["n_kept"]) == (2, 2)
    assert out[0]["cleaned_text"] == "a b c x y z"
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 1)
    assert out[1]["cleaned_text"] == "q r s"
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (1, 0)
    assert out[2]["cleaned_text"] == ""


def test_chunk_dedup_partial_trailing_chunk(spark):
    # 4 tokens → chunks "a b c" + trailing "d"; duplicate trailing chunk
    # in a later doc is deduped like any full-width chunk.
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "p q r d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in chunk_dedup(docs).collect()}
    assert (out[0]["n_chunks"], out[0]["n_kept"]) == (2, 2)
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 1)
    assert out[1]["cleaned_text"] == "p q r"


def test_prefix_sum_partition_independent(spark):
    """The two-pass distributed prefix sum must equal the naive global
    running sum for ANY incoming partitioning."""
    import pyspark.sql.functions as F

    from cognitive_score_bigdata_spark.operators.sharding import (
        global_exclusive_prefix_sum,
    )

    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 37 + 1).alias("v")
    )
    # naive reference computed driver-side
    rows = sorted((r["k"], r["v"]) for r in base.collect())
    acc, ref = 0, {}
    for k, v in rows:
        ref[k] = acc
        acc += v
    for parts in (1, 7, 64):
        got = {
            r["k"]: r["prefix"]
            for r in global_exclusive_prefix_sum(
                base.repartition(parts), "k", "v"
            ).collect()
        }
        assert got == ref, f"parts={parts}"


def test_pack_sequences_boundary_split(spark):
    import pyspark.sql.functions as F

    from cognitive_score_bigdata_spark.operators.sharding import pack_sequences

    # 3 docs of 4/3/5 tokens, seq_len 5: doc0=[0,4), doc1=[4,7) spans the
    # 5-boundary and must split 1+2; doc2=[7,12) spans the 10-boundary 3+2
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f g"), (2, "h i j k l")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["seq_id"], r["doc_tok_start"], r["doc_tok_end"])
        for r in pack_sequences(docs, 5).collect()
    )
    assert rows == [
        (0, 0, 0, 4),
        (1, 0, 0, 1),
        (1, 1, 1, 3),
        (2, 1, 0, 3),
        (2, 2, 3, 5),
    ]
    # invariant on real data: per-doc segment lengths sum to n_tokens
    from cognitive_score_bigdata_spark.io import load_table
    from tests.conftest import SF_DIR

    real = load_table(spark, SF_DIR, "documents")
    packed = pack_sequences(real, 512)
    bad = (
        packed.groupBy("doc_id")
        .agg(F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("covered"))
        .join(
            real.select(
                "doc_id",
                F.size(F.split("text", " +")).cast("bigint").alias("n"),
            ),
            "doc_id",
        )
        .filter(F.col("covered") != F.col("n"))
        .count()
    )
    assert bad == 0


def test_hll_group_cardinality_accuracy_and_merge(spark):
    """HLL estimates within 5% of exact per group; the ALL row (merged
    sketches) within 5% of the exact global distinct; estimates
    independent of partitioning (commutative register updates)."""
    import pyspark.sql.functions as F

    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.operators.sketches import (
        hll_group_cardinality,
    )
    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events")
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_group_cardinality(events, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(got[g] - n) <= max(2, 0.05 * n), (g, got[g], n)
    total = events.select("user_id").distinct().count()
    assert abs(got["ALL"] - total) <= max(2, 0.05 * total)

    got7 = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_group_cardinality(
            events.repartition(7), "event_type", "user_id"
        ).collect()
    }
    assert got7 == got


def test_theta_overlap_tracks_exact_set_algebra(spark):
    import pyspark.sql.functions as F

    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.operators.sketches import theta_overlap
    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events")
    row = theta_overlap(events, "event_type", "user_id", "view", "purchase").collect()[0]

    def users(t):
        return {
            r["user_id"]
            for r in events.filter(F.col("event_type") == t)
            .select("user_id").distinct().collect()
        }

    va, vb = users("view"), users("purchase")
    for key, exact in [
        ("n_a", len(va)),
        ("n_b", len(vb)),
        ("n_intersection", len(va & vb)),
        ("n_union", len(va | vb)),
    ]:
        assert abs(row[key] - exact) <= max(2, 0.05 * exact), (key, row[key], exact)
