"""Systematic weighted sampling: deterministic selection properties."""

from __future__ import annotations

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.operators.sharding import (
    systematic_weighted_sample,
)


def test_uniform_weights_select_exactly_k(spark):
    # 100 rows of weight 1, k=50: step=2, every second row selected
    df = spark.range(100).withColumn("w", F.lit(1))
    got = systematic_weighted_sample(df, "w", "id", 50).collect()
    assert len(got) == 50
    assert sorted(r.id for r in got) == list(range(1, 100, 2))


def test_heavy_row_always_selected_once(spark):
    # one row holds half the total weight: always in, counted once
    df = spark.range(100).withColumn(
        "w", F.when(F.col("id") == 37, 99).otherwise(1)
    )
    got = [r.id for r in systematic_weighted_sample(df, "w", "id", 10).collect()]
    assert 37 in got
    assert len(got) == len(set(got))


def test_periodic_weights_alias(spark):
    """The documented failure mode: weights periodic along the order
    with block weight == stride alias onto block-final positions — the
    heavy rows (50% of total weight) are NEVER selected."""
    df = spark.range(1000).withColumn(
        "w", F.when(F.col("id") % 10 == 0, 9).otherwise(1)
    )
    got = [r.id for r in systematic_weighted_sample(df, "w", "id", 100).collect()]
    assert sum(1 for i in got if i % 10 == 0) == 0  # total aliasing


def test_hash_order_restores_proportionality(spark):
    """The fix: order by a hash scramble of the key. Same data, same
    weights — heavy rows (10% of rows, 50% of weight) now draw about
    half the selections."""
    df = spark.range(1000).withColumn(
        "w", F.when(F.col("id") % 10 == 0, 9).otherwise(1)
    ).withColumn("ord", F.md5(F.col("id").cast("string")))
    got = [
        r.id for r in systematic_weighted_sample(df, "w", "ord", 100).collect()
    ]
    heavy = sum(1 for i in got if i % 10 == 0)
    light = len(got) - heavy
    assert abs(heavy - light) <= 20, (heavy, light)


def test_partitioning_invariance(spark):
    df = spark.range(500).withColumn("w", (F.col("id") % 7) + 1)
    a = {r.id for r in systematic_weighted_sample(df, "w", "id", 40).collect()}
    b = {
        r.id
        for r in systematic_weighted_sample(
            df.repartition(13), "w", "id", 40
        ).collect()
    }
    assert a == b


def test_overlap_chunks_cover_every_token(spark):
    """Chunker contract: stride windows cover [0, n) with no gap — the
    last chunk's end reaches the token count, starts advance by STRIDE,
    and chunk 0 starts at 0. Checked against independently computed
    token counts."""
    import pandas as pd  # noqa: F401

    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.queries import load_registry
    from cognitive_score_bigdata_spark.queries.round4_staging2 import (
        STRIDE,
        WIN,
    )
    from tests.conftest import SF_DIR

    R = load_registry()
    out = R["corpus_overlap_chunks"].fn(spark, SF_DIR).toPandas()
    docs = load_table(spark, SF_DIR, "documents").toPandas()
    import re

    true_n = {
        r.doc_id: len(re.split(" +", r.text)) if r.text else 1
        for r in docs.itertuples()
    }
    grouped = out.groupby("doc_id")
    for doc_id, g in grouped:
        n = true_n[doc_id]
        ends = (g.chunk_id * STRIDE + g.n_tokens).max()
        assert ends == n, (doc_id, ends, n)
        assert g.chunk_id.min() == 0
        # every chunk except possibly the last is full width
        full = g[g.chunk_id < g.chunk_id.max()]
        assert (full.n_tokens == WIN).all() or n <= WIN
    assert set(grouped.groups) == set(true_n)


def test_weighted_order_col_unique(spark):
    """ADVICE r9: systematic_weighted_sample now requires a UNIQUE
    order_col (the prefix-sum form gives each row a distinct cumulative
    interval; duplicate keys would make selection depend on intra-key
    placement). Pin the registry caller's ordering column — doc_id on
    documents — as distinct so the precondition is checked, not folklore."""
    from cognitive_score_bigdata_spark.io import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    total, distinct = docs.agg(
        F.count("doc_id"), F.countDistinct("doc_id")
    ).first()
    assert total == distinct, f"doc_id not unique: {total} rows, {distinct} keys"
