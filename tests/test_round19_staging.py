"""BQ inverted-file streaming absorb (queries/round19_staging.py):
the quantized tier's fence/crash/compaction/cross-run pins, matching
tests/test_ivf_lifecycle.py's standard for the float inverted file.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.index_manifest import (
    compact_index_parts,
    live_part_file_counts,
    part_file_counts,
    read_index,
    read_manifest,
    read_manifest_meta,
    vacuum_index,
)
from cognitive_score_bigdata_spark.plans.audit import plan_text
from cognitive_score_bigdata_spark.queries.round18_staging import (
    BQM_SNAP_MOD,
    BQM_SNAP_NEW,
    build_bq_file,
    merged_bq_path,
)
from cognitive_score_bigdata_spark.queries.round19_staging import (
    BQS_BATCHES,
    absorb_bq_stream_increment,
    bq_stream_absorbed_path,
    run_bq_absorb_stream,
)
from tests.conftest import SF_DIR


def _snapshots(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    snap1 = emb.filter(F.col("vec_id") % BQM_SNAP_MOD != BQM_SNAP_NEW)
    snap2 = emb.filter(F.col("vec_id") % BQM_SNAP_MOD == BQM_SNAP_NEW)
    return snap1, snap2


def _fresh_bq(spark, tag):
    snap1, snap2 = _snapshots(spark)
    path = tempfile.mkdtemp(prefix=f"csb_bqs_{tag}_") + "/idx"
    build_bq_file(snap1, path)
    return path, snap1, snap2


def _committed_view(spark, path):
    """(manifest version, per-vector code-row counts of the committed
    file) — the double-absorb detector: any replayed append shows up
    as a count of 2."""
    version, _ = read_manifest(path)
    counts = {
        r.neighbor_id: r["count"]
        for r in read_index(spark, path)
        .groupBy("neighbor_id")
        .count()
        .collect()
    }
    return version, counts


def test_bq_stream_absorb_replay_is_fenced(spark):
    """foreachBatch is at-least-once and a replayed append would bin
    the same vectors' code words twice (duplicate code rows change
    Hamming ranks), so a committed batch_id must be a no-op on replay:
    manifest version unchanged, committed content unchanged — the
    test_ivf_lifecycle fence pin on the quantized artifact."""
    path, _, snap2 = _fresh_bq(spark, "fence")
    b1 = snap2.filter(F.col("vec_id") % 2 == 0)
    b2 = snap2.filter(F.col("vec_id") % 2 == 1)

    assert absorb_bq_stream_increment(spark, b1, path, 7) is True
    v1, counts1 = _committed_view(spark, path)
    assert set(counts1.values()) == {1}
    assert absorb_bq_stream_increment(spark, b1, path, 7) is False  # replay
    assert _committed_view(spark, path) == (v1, counts1)
    assert absorb_bq_stream_increment(spark, b2, path, 8) is True
    v2, counts2 = _committed_view(spark, path)
    assert v2 == v1 + 1 and set(counts2.values()) == {1}
    assert len(counts2) == len(counts1) + b2.count()


def test_bq_stream_absorb_crash_window_replays_exactly_once(spark):
    """Batch files and fence state commit in ONE manifest flip: a
    crash BETWEEN the physical append and the flip leaves the
    committed view untouched (appended files = uncommitted garbage)
    and the fence unrecorded — the replay absorbs exactly once and
    vacuum sweeps the orphaned first attempt."""
    path, _, snap2 = _fresh_bq(spark, "crash")
    batch = snap2.filter(F.col("vec_id") % 2 == 0)
    v0, counts0 = _committed_view(spark, path)

    def boom():
        raise RuntimeError("simulated crash before the manifest flip")

    try:
        absorb_bq_stream_increment(
            spark, batch, path, 7, _before_publish=boom
        )
        raise AssertionError("the crash should have propagated")
    except RuntimeError:
        pass
    # committed view untouched; the appended files are orphans
    assert _committed_view(spark, path) == (v0, counts0)
    n_live = sum(live_part_file_counts(path).values())
    assert sum(part_file_counts(path).values()) > n_live

    # replay of the SAME batch id absorbs (the fence was never
    # recorded), exactly once
    assert absorb_bq_stream_increment(spark, batch, path, 7) is True
    v1, counts1 = _committed_view(spark, path)
    assert v1 == v0 + 1 and set(counts1.values()) == {1}
    assert len(counts1) == len(counts0) + batch.count()
    orphans = vacuum_index(path, keep_versions=2)
    assert orphans, "the crashed attempt's files should be swept"
    assert _committed_view(spark, path) == (v1, counts1)


def test_bq_compaction_preserves_the_batch_id_fence(spark):
    """Maintenance must not reset the replay fence: compaction
    publishes a new manifest carrying the current meta forward, so
    absorb -> compact -> replay is still a no-op."""
    path, _, snap2 = _fresh_bq(spark, "fencecomp")
    batch = snap2.filter(F.col("vec_id") % 2 == 0)
    assert absorb_bq_stream_increment(spark, batch, path, 7) is True
    compact_index_parts(spark, path, "cell", max_files_per_part=1)
    assert read_manifest_meta(path).get("batch_ids") == [7]
    v, counts = _committed_view(spark, path)
    assert absorb_bq_stream_increment(spark, batch, path, 7) is False
    assert _committed_view(spark, path) == (v, counts)


def test_bq_stream_absorb_reads_no_index_partition(spark):
    """Frozen-quantizer absorption must scan only the batch and the
    8-row centers table: no node of the appended rows' plan may
    reference the code-table path (a regression to read-union-rewrite
    shows up as a parquet scan of the index here)."""
    from cognitive_score_bigdata_spark.queries.round18_staging import (
        merge_vectors_into_bq,
    )

    path, _, snap2 = _fresh_bq(spark, "pin")
    appended = merge_vectors_into_bq(snap2, path)
    assert path not in plan_text(appended)


def test_bq_stream_drain_cross_run_checkpoint(spark, tmp_path):
    """Cross-run checkpoint: a SECOND availableNow run over the same
    drop dir with the SAME checkpoint replays nothing (source offsets
    committed); a run with a FRESH checkpoint re-delivers every file,
    and the manifest fence turns each replay into a no-op — committed
    content identical after all three runs, every vector exactly
    once."""
    snap1, snap2 = _snapshots(spark)
    path = str(tmp_path / "idx")
    build_bq_file(snap1, path)
    in_dir = str(tmp_path / "in")
    for b in range(BQS_BATCHES):
        snap2.filter(
            F.floor(F.col("vec_id") / BQM_SNAP_MOD) % BQS_BATCHES == b
        ).coalesce(1).write.mode("append").parquet(in_dir)

    ckpt = str(tmp_path / "ckpt")
    q = run_bq_absorb_stream(spark, in_dir, path, ckpt)
    q.awaitTermination(120)
    v1, counts1 = _committed_view(spark, path)
    assert set(counts1.values()) == {1}
    want = {r.vec_id for r in snap1.select("vec_id").collect()} | {
        r.vec_id for r in snap2.select("vec_id").collect()
    }
    assert set(counts1) == want

    # run 2, same checkpoint: offsets are committed, nothing replays
    q2 = run_bq_absorb_stream(spark, in_dir, path, ckpt)
    q2.awaitTermination(120)
    assert _committed_view(spark, path) == (v1, counts1)

    # run 3, FRESH checkpoint: every file re-delivers with the same
    # deterministic batch ids — the manifest fence makes each a no-op
    q3 = run_bq_absorb_stream(
        spark, in_dir, path, str(tmp_path / "ckpt2")
    )
    q3.awaitTermination(120)
    assert _committed_view(spark, path) == (v1, counts1)


def test_stream_absorbed_file_equals_merged_file(spark):
    """Conservation across ingestion modes: the stream-absorbed
    artifact and the batch-merged artifact hold identical committed
    code rows (cell, id, w0, w1) — cell membership and sign-bit words
    are pure functions of the vector under frozen seeds, so HOW the
    increment arrived (three fenced micro-batches vs one merge) cannot
    change the index."""
    stream_path = bq_stream_absorbed_path(spark, SF_DIR)
    merged_path = merged_bq_path(spark, SF_DIR)
    cols = ["cell", "neighbor_id", "w0", "w1"]
    a = sorted(
        map(tuple, read_index(spark, stream_path).select(*cols).collect())
    )
    b = sorted(
        map(tuple, read_index(spark, merged_path).select(*cols).collect())
    )
    assert a == b and len(a) > 0
