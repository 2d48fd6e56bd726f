"""Round-15 staged queries (queries/round15_staging.py): oracle parity
plus the pins each query exists to demonstrate — every cross-engine
float decision of the seeded sign-LSH is margin-protected and the
pipeline recall is real (planted duplicates emitted), and the
time-travel audit reads ONLY the manifest-diff files while naming
exactly the delete predicate's rows."""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import load_registry
from cognitive_score_bigdata_spark.queries.round15_staging import (
    LSH_PLANE_MAX,
    LSH_PLANE_MOD,
    LSH_PLANE_REM,
    LSH_THRESHOLD,
)
from tests.conftest import SF_DIR, assert_frames_match


def test_oracle_parity(spark, oracle_con):
    for name in ["vector_ann_lsh_seeded", "scan_time_travel_audit"]:
        spec = load_registry()[name]
        sp = spec.fn(spark, SF_DIR).toPandas()
        oc = oracle_con.execute(spec.oracle).df()
        assert_frames_match(sp, oc, name)


def _corpus_and_planes(spark):
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb.vec_id.to_numpy()
    M = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    pmask = (ids % LSH_PLANE_MOD == LSH_PLANE_REM) & (ids < LSH_PLANE_MAX)
    planted = ids % 25 == 0
    cids = np.concatenate([ids, ids[planted] + 1_000_000])
    C = np.vstack([M, M[planted]])
    return cids, C, M[pmask]


def test_lsh_sign_margins_nondegenerate(spark):
    """Every sign decision sign(v . h_i) that Spark (float64 numpy) and
    DuckDB (list_inner_product) must agree on is far from 0 — measured
    1.2e-5 at sf0.01, 4.4e-5 at sf0.001; pinned at 1e-6."""
    _, C, P = _corpus_and_planes(spark)
    assert P.shape[0] == 6  # six planes at every test SF
    assert np.abs(C @ P.T).min() > 1e-6


def test_lsh_verify_threshold_margins(spark):
    """No same-bucket candidate pair's cosine sits near the 0.90 verify
    threshold (measured gap ~0.1: the non-planted candidates top out
    far below, the planted duplicates sit at 1.0), so the emit set is
    engine-independent."""
    cids, C, P = _corpus_and_planes(spark)
    sig = ((C @ P.T) >= 0) @ (1 << np.arange(P.shape[0]))
    u = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    worst = 1.0
    for b in np.unique(sig):
        members = np.where(sig == b)[0]
        if len(members) < 2:
            continue
        G = u[members] @ u[members].T
        cos = G[np.triu_indices(len(members), 1)]
        if len(cos):
            worst = min(worst, np.abs(cos - LSH_THRESHOLD).min())
    assert worst > 1e-3, worst


def test_lsh_planted_recall_and_numpy_truth(spark):
    """The emitted pair set equals the numpy recompute of the whole
    pipeline (signature -> bucket join -> cosine verify), and contains
    every planted duplicate pair — identical vectors share every sign,
    so LSH recall of true duplicates is 100% by construction and the
    test proves the plumbing delivers it."""
    reg = load_registry()
    got = {
        (r.id_a, r.id_b, r.bucket)
        for r in reg["vector_ann_lsh_seeded"].fn(spark, SF_DIR).collect()
    }
    cids, C, P = _corpus_and_planes(spark)
    sig = ((C @ P.T) >= 0) @ (1 << np.arange(P.shape[0]))
    u = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    want = set()
    for b in np.unique(sig):
        members = np.where(sig == b)[0]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, c = members[i], members[j]
                if u[a] @ u[c] >= LSH_THRESHOLD:
                    lo, hi = sorted((int(cids[a]), int(cids[c])))
                    want.add((lo, hi, int(b)))
    assert got == want
    planted = {
        (int(i), int(i) + 1_000_000) for i in cids[cids < 1_000_000][::1]
        if i % 25 == 0
    }
    assert planted <= {(a, b) for a, b, _ in got}


def test_time_travel_audit_reads_only_diff_files(spark):
    """The audit's IO contract: it opens ONLY the manifest-diff files
    (superseded = v1-v2, replacement = v2-v1 — one band's worth each),
    and its removed-row set is exactly the delete predicate's rows, so
    conservation holds: |v1 rows| = |v2 rows| + |removed|."""
    import cognitive_score_bigdata_spark.operators.index_manifest as im
    from cognitive_score_bigdata_spark.queries.round14_staging import (
        DEL_MOD,
        DEL_REM,
        N_BANDS,
        rewrite_artifact,
    )

    path, _mx = rewrite_artifact(spark, SF_DIR)
    pre = set(im._read_manifest_doc(path, version=1)["files"])
    post = set(im._read_manifest_doc(path, version=2)["files"])
    superseded, replacement = pre - post, post - pre
    bands = {f.split("/")[0] for f in superseded | replacement}
    assert len(bands) == 1  # the diff is one partition, not the table
    assert superseded and replacement

    def opened(files):
        df = spark.read.option("basePath", path).parquet(
            *[os.path.join(path, f) for f in sorted(files)]
        )
        return {
            os.path.relpath(f.replace("file:", ""), path)
            for f in df.inputFiles()
        }

    assert opened(superseded) == superseded
    assert opened(replacement) == replacement

    sup_df = spark.read.option("basePath", path).parquet(
        *[os.path.join(path, f) for f in sorted(superseded)]
    )
    rep_df = spark.read.option("basePath", path).parquet(
        *[os.path.join(path, f) for f in sorted(replacement)]
    )
    removed = sup_df.join(rep_df.select("doc_id"), "doc_id", "left_anti")
    removed_ids = {r.doc_id for r in removed.select("doc_id").collect()}
    docs = load_table(spark, SF_DIR, "documents")
    victim_ids = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % DEL_MOD == DEL_REM)
        .select("doc_id")
        .collect()
    }
    assert removed_ids == victim_ids
    assert sup_df.count() == rep_df.count() + len(removed_ids)
    assert N_BANDS > 1  # the skipped-partition claim is non-vacuous
