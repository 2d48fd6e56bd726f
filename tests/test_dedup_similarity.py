"""Near-dup / similarity operator tests: sketch paths are pinned against
exact formulations, plus behavioral checks on synthetic near-dup corpora
(true positives found, unrelated docs not paired)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.dedup import (
    minhash_candidate_pairs,
    shingles,
    simhash_candidate_pairs,
    simhash_sketch,
)
from cognitive_score_bigdata_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    MEDIA_SCHEMA,
)
from cognitive_score_bigdata_spark.operators.similarity import (
    cosine_neardup_exact,
    cosine_neardup_lsh,
    cosine_topk_exact,
    cosine_topk_numpy,
)
from tests.conftest import SF_DIR

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside "
    "every single morning before the sun rises over the quiet hills"
)


@pytest.fixture(scope="module")
def neardup_corpus(spark):
    docs = [
        (0, BASE),
        (1, BASE.replace("lazy", "sleepy")),  # near-dup of 0
        (2, BASE),  # exact dup of 0
        (3, "completely different content about spark query planning and "
            "shuffle partitioning strategies for large scale aggregation "
            "pipelines with adaptive execution and broadcast join selection"),
        (4, "yet another unrelated document mentioning minhash signatures "
            "banding buckets and jaccard similarity estimation for corpus "
            "deduplication at the scale of many terabytes of raw text"),
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_minhash_finds_neardups(neardup_corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_candidate_pairs(neardup_corpus).collect()
    }
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0  # exact dup: all sigs agree
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.5  # near dup
    assert (3, 4) not in pairs  # unrelated docs don't pair


def test_simhash_distance_tracks_similarity(spark, neardup_corpus):
    sh = {
        r["doc_id"]: r["simhash"]
        for r in simhash_sketch(neardup_corpus).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sh[0], sh[2]) == 0  # identical text, identical sketch
    assert ham(sh[0], sh[1]) < ham(sh[0], sh[3])  # near-dup closer than unrelated
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_candidate_pairs(neardup_corpus, max_hamming=6).collect()
    }
    assert (0, 2) in pairs
    assert (3, 4) not in pairs


def test_minhash_on_testdata_matches_exact_high_jaccard(spark):
    """Candidate generation must cover the high-similarity region: every
    testdata doc pair with exact unigram-jaccard ≥ 0.8 (there may be
    none — random corpus) must appear among minhash candidates."""
    docs = load_table(spark, SF_DIR, "documents")
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(docs).collect()
    }
    # exact 3-shingle-set jaccard (what minhash sketches) for validation
    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles("text", 3))).alias("t"),
    )
    sizes = tok.groupBy("doc_id").count()
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(b, (F.col("a.t") == F.col("b.t")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .count()
        .withColumnRenamed("count", "inter")
    )
    sa = sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("count", "na")
    sb = sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("count", "nb")
    strong = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("j", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("j") >= 0.8)
    )
    missing = [
        (r["id_a"], r["id_b"])
        for r in strong.collect()
        if (r["id_a"], r["id_b"]) not in cands
    ]
    assert not missing


def test_simhash_sketch_computed_once(spark, neardup_corpus):
    """The bucket-local pair generation must not re-run the explode→64-SUM
    sketch aggregation per join side: 3 shuffles total (doc-id sketch agg,
    (ck,cv) bucket agg, pair dropDuplicates), 3 aggs = 6 partial+final."""
    plan = (
        simhash_candidate_pairs(neardup_corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 3
    assert plan.count("HashAggregate") <= 6


def test_numpy_topk_query_size_guard(spark):
    import cognitive_score_bigdata_spark.operators.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    old = sim.MAX_QUERY_ROWS
    sim.MAX_QUERY_ROWS = 3
    try:
        with pytest.raises(ValueError, match="query rows"):
            cosine_topk_numpy(emb, emb.limit(10), k=2)
    finally:
        sim.MAX_QUERY_ROWS = old


def test_numpy_topk_matches_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in cosine_topk_exact(emb, queries, k=5).collect()
    }
    fast = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in cosine_topk_numpy(emb, queries, k=5).collect()
    }
    assert exact == fast


def test_lsh_neardup_subset_of_exact_and_decent_recall(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_exact(emb, threshold=0.40).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_lsh(
            emb, threshold=0.40, n_planes=4, n_tables=12
        ).collect()
    }
    assert lsh <= exact  # precision 1: every candidate exactly verified
    if exact:
        recall = len(lsh) / len(exact)
        # pairs at cos≈0.4: per-table P=(1-θ/π)^4≈0.2, 12 tables →
        # 1-(1-0.2)^12 ≈ 0.93 expected recall; assert a loose floor
        assert recall > 0.5, f"suspiciously low LSH recall: {recall}"


def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", b"\x00\x01\x02\x03" * 64, (8, 8, None, "fake")),
        (2, "video", bytes(range(256)), (16, 16, 4000, "fake")),
        (3, "audio", None, (None, None, 1000, "fake")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(feats[1]["features"]) == 32
    assert feats[1]["n_bytes"] == 256 and feats[3]["n_bytes"] == 0
    assert abs(sum(feats[2]["features"]) - 1.0) < 1e-6  # normalized histogram
    # determinism: same payload → same sha256/features
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert again[1]["sha256"] == feats[1]["sha256"]
    assert again[1]["features"] == feats[1]["features"]

    frames = frame_sample(media, n_frames=4).collect()
    assert {r["media_id"] for r in frames} == {2}  # only video rows fan out
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2, 3]

    # decoder='real' parses actual formats (test_multimodal.py); on
    # opaque test bytes it must reject loudly, not fake features
    with pytest.raises(Exception, match="unrecognized media format"):
        extract_features(media, decoder="real").collect()


def test_ivf_topk_recall(spark):
    """IVF with n_probe << n_cells must recover most exact neighbors;
    n_probe == n_cells must be exact."""
    from cognitive_score_bigdata_spark.operators.similarity import (
        cosine_topk_exact,
        ivf_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_exact(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=10, n_cells=8, n_probe=3).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"

    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=10, n_cells=8, n_probe=8).collect()
    }
    assert full == exact


def test_incremental_dedup_against_saved_index(spark, tmp_path):
    """New-batch dedup against the persisted corpus index must find the
    planted near-duplicate, skip unrelated docs, and never recompute or
    self-pair the corpus."""
    import pyspark.sql.functions as F

    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.operators.dedup import (
        dedup_incremental,
        load_minhash_index,
        save_minhash_index,
    )
    from tests.conftest import SF_DIR

    corpus = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    path = str(tmp_path / "mh_index")
    save_minhash_index(corpus, path)
    index = load_minhash_index(spark, path)

    # new batch: an exact copy of corpus doc 7 (new id) + an unrelated doc
    copy_text = corpus.filter(F.col("doc_id") == 7).collect()[0]["text"]
    new_docs = spark.createDataFrame(
        [
            (1_000_007, copy_text),
            (1_000_008, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["new_id"], r["corpus_id"]): r["est_jaccard"]
        for r in dedup_incremental(new_docs, index, threshold=0.8).collect()
    }
    assert (1_000_007, 7) in pairs and pairs[(1_000_007, 7)] == 1.0
    assert all(nid != 1_000_008 for nid, _ in pairs)


def test_minhash_bucket_cap_bounds_hot_bucket_pairs(spark):
    """Production skew guard: a planted bucket of identical boilerplate
    docs must not emit |bucket|² pairs when max_bucket_size is set, while
    ordinary near-dup pairs elsewhere in the corpus still surface."""
    from cognitive_score_bigdata_spark.operators.dedup import (
        lsh_overflow_buckets,
    )

    other = (
        "completely different content about spark query planning and "
        "shuffle partitioning strategies for large scale aggregation "
        "pipelines with adaptive execution and broadcast join selection"
    )
    boiler = [(i, BASE) for i in range(300)]  # one hot bucket per band
    pair = [(2000, other), (2001, other.replace("broadcast", "shuffle"))]
    docs = spark.createDataFrame(boiler + pair, "doc_id long, text string")

    uncapped = minhash_candidate_pairs(docs).count()
    assert uncapped >= 300 * 299 // 2  # the explosion the cap exists for

    capped = minhash_candidate_pairs(docs, max_bucket_size=16)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (2000, 2001) in got  # normal near-dups unaffected
    assert all(a >= 2000 for a, _ in got)  # no pair from the hot content
    assert len(got) < 100

    # the audit companion reports exactly what the cap dropped
    overflow = lsh_overflow_buckets(docs, max_bucket_size=16).collect()
    assert overflow and all(r["n_members"] >= 300 for r in overflow)


def test_semantic_dedup_finds_planted_copies(spark):
    """SemDeDup: identical vectors land in the same cell (identical
    quantizer assignment), so every planted copy must pair with its
    original at cos ~= 1; every reported pair must satisfy the
    threshold exactly (precision is exact within a cluster); and the
    pair set must not depend on input partitioning."""
    import numpy as np

    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.operators.similarity import (
        semantic_dedup_pairs,
    )
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)

    got = semantic_dedup_pairs(corpus, threshold=0.95, n_cells=4).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cos"] for r in got}

    expect = {
        (r["vec_id"], r["vec_id"] + 1_000_000)
        for r in emb.filter(F.col("vec_id") % 25 == 0).collect()
    }
    assert expect, "planted set must be non-empty"
    assert expect <= set(pairs), "every planted copy must be found"
    assert all(c >= 0.95 for c in pairs.values())

    # precision: recompute cosine from raw vectors for every reported pair
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in corpus.collect()
    }
    for (a, b), c in pairs.items():
        va, vb = vecs[a], vecs[b]
        exact = float(
            va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        )
        assert abs(exact - c) < 1e-9

    # partition independence
    got7 = semantic_dedup_pairs(
        corpus.repartition(7), threshold=0.95, n_cells=4
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got7} == set(pairs)
