"""IVF inverted-file incremental merge (VERDICT r10 item 5): the
vector-index lifecycle brought up to the minhash index's standard.

The minhash band index gained merge + manifest-committed compaction in
round 10 (``queries/round10.py``); the IVF inverted file was still
build-once, in-memory. This module persists the inverted file as a
``cell=N``-partitioned parquet table under the SAME manifest commit
protocol (``operators/index_manifest.py``) and absorbs each new vector
snapshot by FROZEN-CENTROID assignment + append:

- **Why append works here too**: cell membership under a FIXED coarse
  quantizer is a pure function of the vector — assigning new vectors
  reads zero old partitions and rewrites nothing, exactly like LSH
  bucket membership. The centroids are the frozen part; they are the
  index's schema, not its data.
- **Where IVF differs from LSH**: a from-scratch rebuild would RE-TRAIN
  centroids on the union and assign some vectors to different cells, so
  artifact-level equality with a rebuild (the minhash index's
  ``test_merged_index_equals_full_rebuild``) cannot hold. Conservation
  is therefore proven at the RESULT level: probing the merged file with
  ``n_probe == n_cells`` visits every cell, which makes the result
  independent of HOW vectors are binned — it must equal brute-force
  top-k over the snapshot union (= the full corpus). That is this
  query's oracle, so the driver hash-match IS the conservation proof
  (the ``vector_ann_ivf_exact`` move applied to the merged artifact).
- **Re-train threshold (operational, documented not automated)**: the
  FAISS practice — frozen-centroid absorption is sound while the new
  data is drawn from the trained distribution; re-train when the
  absorbed fraction grows past ~50% of the trained corpus or the
  max/mean cell-size ratio drifts past ~4x (imbalance is a probe-time
  cost and recall hazard, not a correctness hazard — exact mode stays
  exact regardless). Re-training writes a NEW index generation; the
  manifest protocol gives the cutover the same old-XOR-new atomicity
  as compaction.

At 100 TB the inverted file is the billions-of-rows artifact; per-crawl
absorption MUST be append-only for the same reason the minhash merge
is (a nightly job, not a full-index rewrite), and the file-count growth
it causes is handled by the shared per-partition compaction +
vacuum — exercised on ``cell=`` partitions in
``tests/test_ivf_lifecycle.py``.

The streaming face (:func:`absorb_stream_increment`) runs the same
absorption per micro-batch under a batch-id fence committed INSIDE the
manifest flip — files and fence state are one atomic commit, no
replay residual window. The MV's streaming merge makes the same move
via the replace-parts commit (``mv_maintenance.py``).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.operators.index_manifest import (
    _list_data_files,
    append_commit,
    publish_manifest,
    read_index,
    read_manifest_meta,
)
from cognitive_score_bigdata_spark.operators.similarity import (
    IVF_CAND_SCHEMA,
    IvfIndex,
    ivf_build,
    ivf_probe,
    norm_assign_fn,
)
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.session_cache import session_scoped

# Snapshot split mirrors the minhash merge: 2/3 standing index, 1/3
# new crawl increment (on vec_id instead of doc_id).
SNAP_MOD = 3
SNAP_NEW = 2
IVFM_CELLS = 8
IVFM_K = 10


def snapshot_vectors(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    snap1 = emb.filter(F.col("vec_id") % SNAP_MOD != SNAP_NEW)
    snap2 = emb.filter(F.col("vec_id") % SNAP_MOD == SNAP_NEW)
    return snap1, snap2


def build_ivf_file(vectors: DataFrame, path: str, n_cells: int) -> None:
    """Initial build: train the coarse quantizer on ``vectors``, store
    the centroid table beside the index (``<path>_centers`` — the
    frozen quantizer every later absorption assigns against), write the
    inverted file cell-partitioned, and publish the first manifest
    LAST. The manifest flip is the commit (ADVICE r11): publishing
    before the centers write left a crash window where a committed
    index had no quantizer, breaking every later merge/probe; with the
    centers written first, a crash before the flip leaves only
    uncommitted garbage. The centers artifact is recorded in the
    manifest meta so it is part of the committed index description."""
    idx = ivf_build(vectors, n_cells=n_cells)
    idx.centers_df.write.parquet(f"{path}_centers")
    idx.cand.write.partitionBy("cell").parquet(path)
    publish_manifest(
        path,
        _list_data_files(path),
        note="initial build",
        meta={"centers": f"{path}_centers"},
    )
    idx.unpersist()


def load_centers(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}_centers")


def merge_vectors_into_ivf(
    new_vectors: DataFrame,
    path: str,
    note: str = "merge append (frozen centroids)",
    meta: dict | None = None,
    _before_publish=None,
) -> DataFrame:
    """Absorb ``new_vectors`` into the inverted file at ``path`` by
    frozen-centroid assignment + append (the per-snapshot MERGE).
    Returns the candidate rows that were appended — whose plan, by
    construction, contains no scan of ``path``: only the new batch and
    the (n_cells-row) centroid table are read, no old cell partition
    is touched. ``meta``/``_before_publish`` pass through to
    :func:`append_commit` (the streaming fence and its crash-window
    test seam)."""
    spark = new_vectors.sparkSession
    centers = load_centers(spark, path).collect()  # n_cells rows
    C = np.array(
        [r.center for r in sorted(centers, key=lambda r: r.cell)],
        dtype=np.float64,
    )
    new_rows = fan_out(new_vectors.select("vec_id", "embedding")).mapInPandas(
        norm_assign_fn(C, "vec_id", "embedding"), IVF_CAND_SCHEMA
    )
    append_commit(
        path,
        lambda: new_rows.write.mode("append").partitionBy("cell").parquet(path),
        note=note,
        meta=meta,
        _before_publish=_before_publish,
    )
    return new_rows


def absorb_stream_increment(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    batch_id: int,
    _before_publish=None,
) -> bool:
    """``foreachBatch`` hook: continuous vector ingestion into the
    inverted file — the streaming face of the same frozen-centroid
    absorption the batch merge runs.

    foreachBatch is at-least-once, and a replayed append would bin the
    same vectors twice (duplicate index rows change probe results —
    unlike the minhash index, whose candidate pairs are DISTINCTed
    downstream). So committed batch ids are fenced. The fence lives IN
    THE MANIFEST (``meta["batch_ids"]``), committed by the SAME
    ``_current`` flip that makes the batch's files live: files and
    fence state cannot disagree. A crash before the flip leaves the
    appended files uncommitted garbage (vacuum sweeps them) and the
    fence unrecorded, so the replay re-absorbs into the committed view
    exactly once — no residual window. The MV's streaming merge
    (``mv_maintenance.merge_stream_increment``) commits its fence the
    same way; the only difference is the commit's shape — pure append
    here (cell membership is a function of the vector) vs
    replace-parts there (aggregation state is read-modify-write, so
    its staged day files must SUPERSEDE the old ones in the manifest).

    Returns whether the batch was absorbed."""
    meta = read_manifest_meta(path)
    seen = list(meta.get("batch_ids", []))
    if batch_id in seen:
        return False
    merge_vectors_into_ivf(
        batch_df,
        path,
        note=f"stream absorb batch {batch_id}",
        meta={**meta, "batch_ids": sorted([*seen, batch_id])},
        _before_publish=_before_publish,
    )
    return True


_MERGED_IVF_CACHE: dict[tuple, str] = {}


def merged_ivf_path(spark: SparkSession, sf_dir: str) -> str:
    """Session-scoped build+merge: the inverted file is a batch
    artifact with snapshot absorptions layered on it, not a per-query
    cost — the same lifecycle contract as ``merged_index_path``."""

    def build() -> str:
        snap1, snap2 = snapshot_vectors(spark, sf_dir)
        path = tempfile.mkdtemp(prefix="csb_ivf_merged_") + "/idx"
        build_ivf_file(snap1, path, n_cells=IVFM_CELLS)
        merge_vectors_into_ivf(snap2, path)
        return path

    return session_scoped(_MERGED_IVF_CACHE, spark, (sf_dir,), build)


def merged_ivf_index(spark: SparkSession, sf_dir: str) -> IvfIndex:
    path = merged_ivf_path(spark, sf_dir)
    return IvfIndex(read_index(spark, path), load_centers(spark, path))


@register(
    "vector_ivf_merge_topk",
    oracle=f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                      c.vec_id ASC) AS BIGINT) AS rnk
    FROM embeddings q JOIN embeddings c ON q.vec_id < 5
                                       AND c.vec_id <> q.vec_id
    QUALIFY rnk <= {IVFM_K}
    """,
    doc=f"IVF inverted-file incremental MERGE (the minhash-merge "
    f"lifecycle mirrored onto the vector index, VERDICT r10 item 5): "
    f"snapshot 1 (2/3 of vectors) trains the coarse quantizer and is "
    f"written as the cell-partitioned inverted file under the manifest "
    f"commit; snapshot 2 is absorbed by FROZEN-CENTROID assignment + "
    f"append — cell membership under a fixed quantizer is a pure "
    f"function of the vector, so the merge reads zero old partitions "
    f"(plan-pinned in test_ivf_lifecycle). Top-{IVFM_K} is then probed "
    f"FROM THE MERGED ON-DISK FILE at n_probe = n_cells: visiting "
    f"every cell makes the result independent of how vectors were "
    f"binned, so the brute-force full-corpus oracle hash-match IS the "
    f"conservation proof (merged-file probe == one-shot exact top-k "
    f"over the snapshot union). Re-train threshold + manifest-atomic "
    f"generation cutover documented in the module docstring",
)
def vector_ivf_merge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    index = merged_ivf_index(spark, sf_dir)
    return ivf_probe(index, queries, k=IVFM_K, n_probe=IVFM_CELLS).select(
        "query_id", "neighbor_id", "rnk"
    )
