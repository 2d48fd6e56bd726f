"""Round-16 session births (benched + mirrored from day one, the
standing staging pattern).

``vector_ann_ivfbq_stream_topk`` — the BQ inverted file's STREAMING
absorb (VERDICT r15 item 5, SURVEY §9 round-16 deferred): the
quantized tier's lifecycle made fully symmetric with the float IVF's.
``ivf_lifecycle.absorb_stream_increment`` has fenced continuous
ingestion into the float inverted file since round 11; this module
gives the persisted sign-bit code table (``round18_staging``'s
``vector_ann_ivfbq_merged_topk`` artifact) the same streaming face:

- **absorb_bq_stream_increment** — ``foreachBatch`` hook: each vector
  micro-batch is assigned under the FROZEN seeded quantizer, sign-bit
  encoded, and appended cell-partitioned — committed together with its
  batch-id fence in ONE manifest ``_current`` flip. foreachBatch is
  at-least-once and a replayed append would double-bin the batch's
  vectors (duplicate code rows change Hamming ranks), so committed
  batch ids are fenced IN THE MANIFEST ``meta`` exactly like the float
  absorb: files and fence state cannot disagree, a crash before the
  flip leaves sweepable garbage and the fence unrecorded, and the
  replay re-absorbs exactly once — no residual window.
- **The registry row** drains snapshot 2 (1/3 of vectors, three
  parquet files = three micro-batches under maxFilesPerTrigger=1)
  availableNow into a base file built from snapshot 1, then probes the
  committed result with the SHARED IVF×BQ probe
  (``round18_staging.probe_bq_codes`` — cell-pruned Hamming cut,
  exact-cosine rescore). Cell membership and code words are pure
  functions of the vector under frozen seeds, so the streamed file is
  row-identical to a one-shot build over the union — the full-corpus
  IVF×BQ oracle hash-match IS the conservation proof (the
  ``ivf_lifecycle`` move applied to the quantized tier's streaming
  face). Fence replay / crash-window / compaction / cross-run
  checkpoint behavior pinned in ``tests/test_round19_staging.py``,
  matching ``tests/test_ivf_lifecycle.py``'s pins.

At 100 TB this is per-crawl continuous ingestion into the artifact you
serve from: each micro-batch reads only itself plus the 8-row frozen
centers table (plan-pinned — zero old cell partitions), appends
16 bytes/vector, and the shared per-partition compaction + vacuum
bound the file count. Re-train threshold and the manifest-atomic
generation cutover are the float IVF's, documented in
``queries/ivf_lifecycle.py``.

Reference parity: ANN/streaming extensions beyond the reference's
point-lookup serving surface (``src/backend/main.py:55-65``;
``src/ingestion.py:43-49`` lands raw events with no index behind it —
SURVEY §2-extras).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.round18_staging import (
    BQM_SNAP_MOD,
    BQM_SNAP_NEW,
    build_bq_file,
    merge_vectors_into_bq,
    probe_bq_codes,
)
from cognitive_score_bigdata_spark.session_cache import session_scoped

BQS_BATCHES = 3  # snapshot 2 staged as three micro-batch files


def absorb_bq_stream_increment(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    batch_id: int,
    _before_publish=None,
) -> bool:
    """``foreachBatch`` hook: continuous vector ingestion into the BQ
    inverted file — the streaming face of the frozen-quantizer
    absorption ``merge_vectors_into_bq`` runs per snapshot, fenced the
    same way ``ivf_lifecycle.absorb_stream_increment`` fences the
    float file. The fence lives in the manifest ``meta["batch_ids"]``
    and commits in the SAME ``_current`` flip as the batch's code
    files; a replayed batch id is a no-op, a crash before the flip
    leaves only vacuum-sweepable garbage and an unrecorded fence, so
    the replay absorbs exactly once. Returns whether the batch was
    absorbed."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_manifest_meta,
    )

    meta = read_manifest_meta(path)
    seen = list(meta.get("batch_ids", []))
    if batch_id in seen:
        return False
    merge_vectors_into_bq(
        batch_df,
        path,
        note=f"BQ stream absorb batch {batch_id}",
        meta={**meta, "batch_ids": sorted([*seen, int(batch_id)])},
        _before_publish=_before_publish,
    )
    return True


def run_bq_absorb_stream(
    spark: SparkSession,
    in_dir: str,
    path: str,
    checkpoint_dir: str,
):
    """availableNow vector stream: parquet file source (one file per
    micro-batch under maxFilesPerTrigger=1) → fenced absorb per batch."""
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: absorb_bq_stream_increment(spark, b, path, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


_BQS_CACHE: dict = {}


def bq_stream_absorbed_path(spark: SparkSession, sf_dir: str) -> str:
    """Session-scoped fixture: snapshot 1 (2/3 of vectors) builds the
    committed BQ inverted file and freezes the seeded quantizer;
    snapshot 2 is staged as THREE parquet files (batch = vec_id mod 3
    within the snapshot) and drained availableNow through the fenced
    foreachBatch absorb. Returns the committed artifact path."""

    def build() -> str:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        snap1 = emb.filter(F.col("vec_id") % BQM_SNAP_MOD != BQM_SNAP_NEW)
        snap2 = emb.filter(F.col("vec_id") % BQM_SNAP_MOD == BQM_SNAP_NEW)
        work = tempfile.mkdtemp(prefix="csb_bq_stream_")
        path = os.path.join(work, "idx")
        build_bq_file(snap1, path)
        in_dir = os.path.join(work, "in")
        for b in range(BQS_BATCHES):
            # one file per batch — with maxFilesPerTrigger=1 each file
            # IS a micro-batch, deterministically
            snap2.filter(
                F.floor(F.col("vec_id") / BQM_SNAP_MOD) % BQS_BATCHES == b
            ).coalesce(1).write.mode("append").parquet(in_dir)
        q = run_bq_absorb_stream(
            spark, in_dir, path, os.path.join(work, "ckpt")
        )
        q.awaitTermination()
        return path

    return session_scoped(_BQS_CACHE, spark, (sf_dir,), build)


@register(
    "vector_ann_ivfbq_stream_topk",
    oracle=None,  # spliced below: the shared full-corpus IVF×BQ oracle
    doc="the BQ inverted file's STREAMING absorb — the quantized "
    "tier's lifecycle made symmetric with the float IVF's: an "
    "availableNow vector stream drains micro-batch-wise into the "
    "committed cell-partitioned sign-bit code table via a fenced "
    "foreachBatch absorb (frozen-quantizer assignment + encode + "
    "append, batch-id fence committed in the same manifest flip as "
    "the batch's files). The probe (shared probe_bq_codes: "
    "cell-pruned Hamming cut + exact-cosine rescore) runs FROM THE "
    "STREAM-ABSORBED FILE; frozen-seed assignment is deterministic "
    "and batch-split-independent, so the full-corpus IVF×BQ oracle "
    "hash-match IS the conservation proof; replay/crash/cross-run "
    "checkpoint pinned in tests",
)
def vector_ann_ivfbq_stream_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_index,
    )

    path = bq_stream_absorbed_path(spark, sf_dir)
    codes = read_index(spark, path)  # (neighbor_id, w0, w1, cell)
    return probe_bq_codes(spark, sf_dir, codes)


def _splice_ivfbq_stream_oracle() -> None:
    from dataclasses import replace

    from cognitive_score_bigdata_spark.queries import REGISTRY

    REGISTRY["vector_ann_ivfbq_stream_topk"] = replace(
        REGISTRY["vector_ann_ivfbq_stream_topk"],
        oracle=REGISTRY["vector_ann_ivfbq_topk"].oracle,
    )


_splice_ivfbq_stream_oracle()
