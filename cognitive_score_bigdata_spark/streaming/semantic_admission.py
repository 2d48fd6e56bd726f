"""Streaming semantic-dedup admission: reject incoming vectors that are
semantic near-dups of the standing corpus, absorb the survivors — the
streaming face of ``dedup_semantic_incremental`` (whose driver oracle
row pins the probe math; this module adds the lifecycle around it).

The production shape: a crawl/ingest stream should drop semantically
duplicate content BEFORE it lands in the training corpus, and every
admitted vector must immediately become corpus for later batches (a
duplicate of an admitted vector arriving one micro-batch later is a
duplicate, full stop). That second property is what makes this a
stateful pipeline rather than a stateless filter, and the state is the
SAME manifest-committed cell-partitioned index the batch operators use:

- the index at ``path`` is the seeded-cell candidate table
  (``neighbor_id, __c unit-vector, cell`` — hive-partitioned on cell),
  committed through the §4.1 manifest protocol; the frozen quantizer is
  the seed matrix stored beside it (``<path>_centers``, recorded in the
  manifest meta like the IVF build's);
- per micro-batch: assign the batch to cells against the frozen seeds
  (one Arrow pass), probe SAME-cell corpus vectors with the cogrouped
  blocked-Gram kernel (``semantic_probe_pairs`` — new x corpus only,
  ids-only output), drop every batch vector with cos >= threshold
  against any committed vector, deduplicate WITHIN the batch by keeping
  the smallest id per near-dup group (batch-local pairs from the same
  kernel), and append-commit the survivors with the batch id fenced IN
  the manifest meta — the same no-residual-window move as
  ``absorb_stream_increment``: files and fence commit in one
  ``_current`` flip, so an at-least-once foreachBatch replay is a
  no-op and a crash before the flip replays exactly once.

At 100 TB: the probe touches only the batch's cells (partition-pruned
read of the committed file list), pair volume is cell-bounded, the
corpus is never rescanned or rewritten (append-only), and compaction/
vacuum run as the §4.1 nightly job. Checked by deterministic tests
(tests/test_semantic_admission.py): end-to-end availableNow drive,
admitted-becomes-corpus across batches, replay fence, crash-window
exactly-once — the same battery as the IVF absorption and the MV
merge, because it is the same protocol.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.operators.index_manifest import (
    _list_data_files,
    append_commit,
    publish_manifest,
    read_index,
    read_manifest_meta,
)

SEM_ADMIT_THRESHOLD = 0.95


def build_semantic_index(
    corpus: DataFrame, seeds: DataFrame, path: str
) -> None:
    """Initial build: seed-cell assignment of the corpus, written
    cell-partitioned; seeds stored beside it (the frozen quantizer);
    manifest flip LAST (the commit — the build_ivf_file ordering)."""
    from cognitive_score_bigdata_spark.queries.round12 import seeded_cells

    seeds.write.parquet(f"{path}_centers")
    seeded_cells(corpus, seeds).write.partitionBy("cell").parquet(path)
    publish_manifest(
        path,
        _list_data_files(path),
        note="initial semantic index",
        meta={"centers": f"{path}_centers"},
    )


def _assign_batch(spark: SparkSession, batch_df: DataFrame, path: str):
    from cognitive_score_bigdata_spark.io import fan_out
    from cognitive_score_bigdata_spark.operators.similarity import (
        IVF_CAND_SCHEMA,
        norm_assign_fn,
    )

    rows = spark.read.parquet(f"{path}_centers").collect()  # n_seeds rows
    rows.sort(key=lambda r: r.vec_id)
    C = np.array([r.embedding for r in rows], dtype=np.float64)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return fan_out(batch_df.select("vec_id", "embedding")).mapInPandas(
        norm_assign_fn(C, "vec_id", "embedding"), IVF_CAND_SCHEMA
    )


def admit_stream_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    batch_id: int,
    threshold: float = SEM_ADMIT_THRESHOLD,
    _before_publish=None,
) -> dict:
    """``foreachBatch`` hook: probe-then-absorb with a manifest fence.

    Returns {"admitted": n, "rejected": n, "replayed": bool} — the
    admission decision per batch, for the caller's metrics sink."""
    meta = read_manifest_meta(path)
    seen = list(meta.get("batch_ids", []))
    if batch_id in seen:
        return {"admitted": 0, "rejected": 0, "replayed": True}

    from cognitive_score_bigdata_spark.queries.round13_staging import (
        semantic_probe_pairs,
    )

    cand = _assign_batch(spark, batch_df, path).localCheckpoint()
    # metadata-level cell pruning (r13): the probe can only pair within
    # the batch's cells, so files of other cells never enter the scan
    # relation. The distinct-cells collect is bounded by n_cells (the
    # seed count), a build-artifact-sized driver step — and
    # semantic_probe_pairs additionally semi-join-prunes the corpus
    # side, so non-probed cells neither read nor shuffle.
    batch_cells = [r.cell for r in cand.select("cell").distinct().collect()]
    corpus = read_index(spark, path, part_values=batch_cells)
    # vs-corpus duplicates: any batch vector pairing with a committed one
    dup_ids = (
        semantic_probe_pairs(corpus, cand, threshold)
        .select(F.col("new_id").alias("vec_id"))
        .distinct()
    )
    # within-batch duplicates: drop any batch vector similar to a
    # SMALLER-id batch vector (greedy keep-smallest, conservative
    # under similarity chains — an admission gate may over-reject,
    # never double-admit). Uses the one-sided per-cell Gram kernel
    # (semantic_dedup_pairs emits id_a < id_b upper-triangle pairs);
    # cogrouping a DataFrame with ITSELF is not well-defined in Spark.
    from cognitive_score_bigdata_spark.operators.similarity import (
        IvfIndex,
        semantic_dedup_pairs,
    )

    batch_dup_ids = (
        semantic_dedup_pairs(cand, threshold=threshold, index=IvfIndex(cand, None))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    survivors = (
        cand.join(dup_ids, cand.neighbor_id == dup_ids.vec_id, "left_anti")
        .join(
            batch_dup_ids,
            cand.neighbor_id == batch_dup_ids.vec_id,
            "left_anti",
        )
        .localCheckpoint()
    )
    n_total = cand.count()
    n_adm = survivors.count()
    append_commit(
        path,
        lambda: survivors.write.mode("append")
        .partitionBy("cell")
        .parquet(path),
        note=f"admit batch {batch_id}",
        meta={**meta, "batch_ids": sorted([*seen, batch_id])},
        _before_publish=_before_publish,
    )
    return {
        "admitted": int(n_adm),
        "rejected": int(n_total - n_adm),
        "replayed": False,
    }
