"""Product quantization: encode determinism, compression contract, and
ADC recall against exact cosine top-k."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_topk,
    pq_train,
)
from cognitive_score_bigdata_spark.operators.similarity import cosine_topk_exact
from tests.conftest import SF_DIR


def test_pq_train_shapes_and_determinism(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    b1 = pq_train(emb, m=8, k=16)
    b2 = pq_train(emb.repartition(7), m=8, k=16)
    assert b1.shape == (8, 16, 8)
    assert (b1 == b2).all(), "codebooks must not depend on partitioning"
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7)


def test_pq_encode_deterministic(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    books = pq_train(emb, m=8, k=16)
    c1 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    c2 = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb.repartition(5), books).collect()
    }
    assert c1 == c2
    assert all(len(v) == 8 for v in c1.values())


def test_pq_adc_recall_vs_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk_exact(emb, queries, k=10)
    approx = pq_topk(emb, queries, k_top=10)  # m=16, k=64, refine=5

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    e, a = sets(exact), sets(approx)
    recalls = [len(e[q] & a[q]) / len(e[q]) for q in e]
    mean_recall = float(np.mean(recalls))
    # ADC retrieval + exact refine (5x) measured 0.97 on this data;
    # 0.8 leaves margin for other scale factors
    assert mean_recall >= 0.8, f"mean recall@10 {mean_recall:.2f}"

    # pure ADC (no refine) is the lossy tier: much weaker, still far
    # above chance (10/500 = 0.02)
    pure = sets(pq_topk(emb, queries, k_top=10, refine=1))
    pure_recall = float(np.mean([len(e[q] & pure[q]) / len(e[q]) for q in e]))
    assert 0.2 <= pure_recall <= mean_recall


def test_pq_query_guard(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    books = pq_train(emb, m=8, k=16)
    codes = pq_encode(emb, books)
    import cognitive_score_bigdata_spark.operators.pq as pqmod

    old = pqmod.MAX_QUERY_ROWS
    pqmod.MAX_QUERY_ROWS = 3
    try:
        with pytest.raises(ValueError, match="query rows"):
            pq_adc_topk(codes, emb.limit(10), books)
    finally:
        pqmod.MAX_QUERY_ROWS = old


def test_ivfpq_recall_vs_exact(spark):
    """IVFADC composes two approximations (cell pruning + residual PQ);
    with n_probe=8/16 cells and 5x exact refine the pipeline must still
    agree with brute-force cosine on most of the top-10."""
    from cognitive_score_bigdata_spark.operators.pq import ivfpq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk_exact(emb, queries, k=10)
    approx = ivfpq_topk(emb, queries, k_top=10, n_cells=16, n_probe=8)

    def sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    e, a = sets(exact), sets(approx)
    recalls = [len(e[q] & a[q]) / len(e[q]) for q in e]
    mean_recall = float(np.mean(recalls))
    assert mean_recall >= 0.7, f"mean recall@10 {mean_recall:.2f}"


def test_ivfpq_deterministic(spark):
    from cognitive_score_bigdata_spark.operators.pq import ivfpq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    r1 = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in ivfpq_topk(emb, queries, k_top=5).collect()
    }
    r2 = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in ivfpq_topk(emb.repartition(7), queries, k_top=5).collect()
    }
    assert r1 == r2, "IVFADC result must not depend on partitioning"
