"""Round-13 staged queries (queries/round13_staging.py): incremental
semantic probe margins + planted recovery, ensemble cluster evidence
closure, and the ids-only probe-output plan pin."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import load_registry
from cognitive_score_bigdata_spark.queries.round13_staging import (
    NEW_MOD,
    NEW_SHIFT,
    dedup_ensemble_clusters,
    dedup_semantic_incremental,
)
from tests.conftest import SF_DIR


def test_incremental_probe_recovers_planted_copies(spark):
    """Every re-ingested vector (vec_id % NEW_MOD == 0, +NEW_SHIFT)
    must find its original: identical vectors share a cell and pair at
    cos 1.0. Threshold margins are pinned for the shared corpus in
    test_round12 (same seeds, same vectors)."""
    out = dedup_semantic_incremental(spark, SF_DIR).toPandas()
    got = set(zip(out["new_id"], out["corpus_id"]))
    originals = [
        r.vec_id
        for r in load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") % NEW_MOD == 0)
        .select("vec_id")
        .collect()
    ]
    missing = [v for v in originals if (v + NEW_SHIFT, v) not in got]
    assert not missing, f"planted copies not recovered: {missing}"
    # probe never pairs new x new (corpus side only)
    assert (out["corpus_id"] < NEW_SHIFT).all()


def test_incremental_probe_output_is_ids_only(spark):
    """Scale contract: the cogrouped kernel's output schema carries no
    vector payload — only (cell, new_id, corpus_id) integers leave the
    Python stage."""
    df = dedup_semantic_incremental(spark, SF_DIR)
    assert [f.name for f in df.schema.fields] == [
        "cell",
        "new_id",
        "corpus_id",
    ]
    assert all(f.dataType.typeName() == "long" for f in df.schema.fields)


def test_ensemble_clusters_close_over_every_evidence_leg(spark):
    """Cluster closure: for EACH evidence leg, every pair it emits must
    land in the same ensemble cluster (the union graph can only merge
    clusters, never split a leg's pair across two) — and a doc with no
    evidence labels itself (singleton)."""
    from cognitive_score_bigdata_spark.operators.similarity import (
        IvfIndex,
        semantic_dedup_pairs,
    )
    from cognitive_score_bigdata_spark.queries.dedup_md5 import (
        dedup_minhash_pairs_md5,
    )
    from cognitive_score_bigdata_spark.queries.round11_staging import (
        dedup_winnowing_pairs,
    )
    from cognitive_score_bigdata_spark.queries.round12 import (
        SEM_THRESHOLD,
        _seeded_cand,
    )

    label = dict(
        dedup_ensemble_clusters(spark, SF_DIR)
        .toPandas()[["doc_id", "cluster_id"]]
        .itertuples(index=False, name=None)
    )
    legs = {
        "mh": dedup_minhash_pairs_md5(spark, SF_DIR)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b")
        .toPandas(),
        "win": dedup_winnowing_pairs(spark, SF_DIR)
        .select("doc_a", "doc_b")
        .toPandas(),
        "sem": semantic_dedup_pairs(
            load_table(spark, SF_DIR, "documents"),
            threshold=SEM_THRESHOLD,
            index=IvfIndex(
                _seeded_cand(spark, SF_DIR).filter(
                    F.col("neighbor_id") < 1_000_000
                ),
                None,
            ),
        )
        .select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        )
        .toPandas(),
    }
    evidenced = set()
    for name, pdf in legs.items():
        for a, b in pdf.itertuples(index=False, name=None):
            assert label[a] == label[b], (name, a, b)
            evidenced |= {a, b}
    singletons = [d for d in label if d not in evidenced]
    assert singletons, "fixture degenerate: no singleton docs"
    assert all(label[d] == d for d in singletons)
