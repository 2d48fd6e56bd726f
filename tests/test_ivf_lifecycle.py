"""IVF inverted-file incremental merge (queries/ivf_lifecycle.py):
append-only absorption plan pins, frozen-centroid invariants, and the
shared manifest lifecycle (compaction + vacuum) on cell= partitions —
the same standard as tests/test_round10_merge.py for the minhash index.
"""

from __future__ import annotations

import glob
import os
import re
import tempfile

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.operators.index_manifest import (
    compact_index_parts,
    live_part_file_counts,
    part_file_counts,
    read_index,
    vacuum_index,
)
from cognitive_score_bigdata_spark.plans.audit import plan_text
from cognitive_score_bigdata_spark.queries.ivf_lifecycle import (
    IVFM_CELLS,
    build_ivf_file,
    merge_vectors_into_ivf,
    merged_ivf_path,
    snapshot_vectors,
)
from tests.conftest import SF_DIR


def _fresh_index(spark, tag):
    snap1, snap2 = snapshot_vectors(spark, SF_DIR)
    path = tempfile.mkdtemp(prefix=f"csb_ivfl_{tag}_") + "/idx"
    build_ivf_file(snap1, path, n_cells=IVFM_CELLS)
    return path, snap1, snap2


def test_merge_reads_no_index_partition(spark):
    """Frozen-centroid absorption must scan only the new batch and the
    n_cells-row centroid table: no node of the appended rows' plan may
    reference the inverted-file path (a regression to read-union-
    rewrite shows up as a parquet scan of the index here — the
    test_round10_merge pin, mirrored)."""
    path, _, snap2 = _fresh_index(spark, "pin")
    appended = merge_vectors_into_ivf(snap2, path)
    assert path not in plan_text(appended)


def test_merge_does_not_touch_centroids_or_old_partitions(spark):
    """The quantizer is FROZEN: the centroid table and every
    pre-merge cell data file must be byte-for-byte untouched by an
    absorption (name+mtime identical) — the append-only contract at
    the artifact level."""

    def sig(pattern):
        return sorted(
            (os.path.relpath(p, os.path.dirname(pattern)), os.path.getmtime(p))
            for p in glob.glob(pattern)
        )

    path, _, snap2 = _fresh_index(spark, "frozen")
    centers_before = sig(f"{path}_centers/*.parquet")
    cells_before = sig(f"{path}/cell=*/*.parquet")
    merge_vectors_into_ivf(snap2, path)
    assert sig(f"{path}_centers/*.parquet") == centers_before
    for entry in cells_before:
        assert entry in sig(f"{path}/cell=*/*.parquet"), entry


def test_merged_file_holds_every_vector_exactly_once(spark):
    """Artifact-level completeness (the IVF analogue of the minhash
    rebuild-equality, which frozen centroids make impossible at the
    assignment level — see the module docstring): the merged file holds
    each corpus vector exactly once, in exactly one cell."""
    spark_df = read_index(spark, merged_ivf_path(spark, SF_DIR))
    from cognitive_score_bigdata_spark.io import load_table

    n_corpus = load_table(spark, SF_DIR, "embeddings").count()
    per_id = spark_df.groupBy("neighbor_id").count()
    assert per_id.count() == n_corpus
    assert per_id.filter(F.col("count") != 1).count() == 0


def test_merged_file_scan_prunes_cell_partitions(spark):
    """Reads of the merged inverted file filtered to a cell subset must
    show parquet PartitionFilters — the reason the file is partitioned
    by cell at all (an n_probe < n_cells probe touches only the cells
    it ranks nearest)."""
    one_cell = read_index(spark, merged_ivf_path(spark, SF_DIR)).filter(
        F.col("cell") == 0
    )
    t = plan_text(one_cell)
    assert re.search(r"PartitionFilters: \[[^\]]*cell", t), t[:2000]


def test_cell_compaction_and_vacuum_share_the_manifest_protocol(spark):
    """The shared lifecycle on cell= partitions: after build+merge each
    cell holds 2 live file sets; compact_index_parts(part_col='cell')
    must bring the LIVE view to 1 file per cell with content conserved,
    old files retained until vacuum sweeps them (reader-atomicity of
    the commit itself is pinned protocol-level in test_round10_merge —
    same code path)."""
    path, _, snap2 = _fresh_index(spark, "compact")
    merge_vectors_into_ivf(snap2, path)
    before_live = live_part_file_counts(path)
    assert all(n >= 2 for n in before_live.values()), before_live
    before_rows = read_index(spark, path).toPandas()

    stats = compact_index_parts(spark, path, "cell", max_files_per_part=1)
    assert set(stats) == set(before_live)
    after_live = live_part_file_counts(path)
    assert all(n == 1 for n in after_live.values()), after_live
    assert all(n >= 3 for n in part_file_counts(path).values())
    deleted = vacuum_index(path, keep_versions=1)
    assert deleted and part_file_counts(path) == after_live

    after_rows = read_index(spark, path).toPandas()
    cols = sorted(c for c in before_rows.columns if c != "__c")
    a = before_rows[cols].sort_values(cols).reset_index(drop=True)
    b = after_rows[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    # vectors conserved too (list column compared via tuple canon)
    va = sorted(map(tuple, before_rows["__c"]))
    vb = sorted(map(tuple, after_rows["__c"]))
    assert va == vb


def _committed_view(spark, path):
    """(manifest version, per-vector counts of the committed index)."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_manifest,
    )

    version, _ = read_manifest(path)
    counts = {
        r.neighbor_id: r["count"]
        for r in read_index(spark, path).groupBy("neighbor_id").count().collect()
    }
    return version, counts


def test_stream_absorb_replay_is_fenced(spark):
    """foreachBatch is at-least-once and a replayed append would bin
    the same vectors twice (duplicate index rows change probe results),
    so a committed batch_id must be a no-op on replay: manifest version
    unchanged, committed content unchanged."""
    from cognitive_score_bigdata_spark.queries.ivf_lifecycle import (
        absorb_stream_increment,
    )

    path, _, snap2 = _fresh_index(spark, "fence")
    b1 = snap2.filter(F.col("vec_id") % 2 == 0)
    b2 = snap2.filter(F.col("vec_id") % 2 == 1)

    assert absorb_stream_increment(spark, b1, path, 7) is True
    v1, counts1 = _committed_view(spark, path)
    assert set(counts1.values()) == {1}
    assert absorb_stream_increment(spark, b1, path, 7) is False  # replay
    assert _committed_view(spark, path) == (v1, counts1)
    assert absorb_stream_increment(spark, b2, path, 8) is True
    v2, counts2 = _committed_view(spark, path)
    assert v2 == v1 + 1 and set(counts2.values()) == {1}
    assert len(counts2) == len(counts1) + b2.count()


def test_stream_absorb_crash_window_replays_exactly_once(spark):
    """The claim that distinguishes this fence from the MV's side-car
    ledger: batch files and fence state commit in ONE manifest flip, so
    a crash BETWEEN the physical append and the flip leaves the
    committed view untouched (appended files = uncommitted garbage) and
    the fence unrecorded — the replay then absorbs exactly once, and
    vacuum sweeps the orphaned first attempt."""
    from cognitive_score_bigdata_spark.queries.ivf_lifecycle import (
        absorb_stream_increment,
    )

    path, _, snap2 = _fresh_index(spark, "crash")
    batch = snap2.filter(F.col("vec_id") % 2 == 0)
    v0, counts0 = _committed_view(spark, path)

    def boom():
        raise RuntimeError("simulated crash before the manifest flip")

    try:
        absorb_stream_increment(spark, batch, path, 7, _before_publish=boom)
        raise AssertionError("the crash should have propagated")
    except RuntimeError:
        pass
    # committed view untouched; the appended files are orphans
    assert _committed_view(spark, path) == (v0, counts0)
    n_live = sum(live_part_file_counts(path).values())
    assert sum(part_file_counts(path).values()) > n_live

    # replay of the SAME batch id absorbs (the fence was never
    # recorded), exactly once
    assert absorb_stream_increment(spark, batch, path, 7) is True
    v1, counts1 = _committed_view(spark, path)
    assert v1 == v0 + 1 and set(counts1.values()) == {1}
    assert len(counts1) == len(counts0) + batch.count()
    orphans = vacuum_index(path, keep_versions=2)
    assert orphans, "the crashed attempt's files should be swept"
    assert _committed_view(spark, path) == (v1, counts1)


def test_compaction_preserves_the_batch_id_fence(spark):
    """Maintenance must not reset the replay fence: compaction
    publishes a new manifest, and if it dropped ``meta`` a replayed
    batch id would silently double-absorb afterwards. publish_manifest
    carries the current meta forward when the caller supplies none —
    pinned here end-to-end: absorb -> compact -> replay is still a
    no-op."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_manifest_meta,
    )
    from cognitive_score_bigdata_spark.queries.ivf_lifecycle import (
        absorb_stream_increment,
    )

    path, _, snap2 = _fresh_index(spark, "fencecomp")
    batch = snap2.filter(F.col("vec_id") % 2 == 0)
    assert absorb_stream_increment(spark, batch, path, 7) is True
    compact_index_parts(spark, path, "cell", max_files_per_part=1)
    assert read_manifest_meta(path).get("batch_ids") == [7]
    v, counts = _committed_view(spark, path)
    assert absorb_stream_increment(spark, batch, path, 7) is False
    assert _committed_view(spark, path) == (v, counts)


def test_stream_drop_dir_absorption_end_to_end(spark, tmp_path):
    """availableNow drain of a drop-dir vector stream through the
    foreachBatch hook: the committed inverted file ends holding base +
    every streamed vector exactly once, regardless of micro-batch
    split."""
    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.queries.ivf_lifecycle import (
        absorb_stream_increment,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 3 == 0)
    stream_rows = emb.filter(F.col("vec_id") % 3 != 0)
    path = str(tmp_path / "idx")
    build_ivf_file(base, path, n_cells=IVFM_CELLS)

    drop = tmp_path / "drop"
    for i in range(3):
        stream_rows.filter(F.col("vec_id") % 3 == 1 + (i % 2)).filter(
            F.col("vec_id") % 5 == i
        ).coalesce(1).write.parquet(str(drop / f"b{i}"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: absorb_stream_increment(spark, b, path, bid)
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        r.vec_id
        for i in range(3)
        for r in spark.read.parquet(str(drop / f"b{i}")).select("vec_id").collect()
    }
    got = {
        r.neighbor_id: r["count"]
        for r in read_index(spark, path).groupBy("neighbor_id").count().collect()
    }
    want = {r.vec_id for r in base.select("vec_id").collect()} | streamed
    assert set(got) == want
    assert set(got.values()) == {1}


def test_exact_probe_of_merged_file_is_brute_force(spark):
    """The conservation statement the oracle pins at the driver,
    asserted in-suite as well: n_probe = n_cells over the merged file
    equals brute-force top-k over the full corpus (rank-for-rank)."""
    from cognitive_score_bigdata_spark.queries import load_registry

    R = load_registry()
    merged = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in R["vector_ivf_merge_topk"].fn(spark, SF_DIR).collect()
    }
    exact = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in R["vector_ann_ivf_exact"].fn(spark, SF_DIR).collect()
    }
    assert merged == exact


def test_build_commit_is_the_manifest_flip(spark, monkeypatch):
    """ADVICE r11: build_ivf_file publishes the manifest LAST — a crash
    anywhere before the flip leaves NO committed index (the centers
    table already on disk is sweepable garbage, not corruption), never
    a committed index whose quantizer is missing. The committed build
    also records the centers artifact in the manifest meta."""
    import cognitive_score_bigdata_spark.queries.ivf_lifecycle as ivfl
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_manifest,
        read_manifest_meta,
    )

    snap1, _ = snapshot_vectors(spark, SF_DIR)
    path = tempfile.mkdtemp(prefix="csb_ivfl_crash_") + "/idx"

    def boom(*a, **k):
        raise RuntimeError("crash before flip")

    monkeypatch.setattr(ivfl, "publish_manifest", boom)
    try:
        build_ivf_file(snap1, path, n_cells=IVFM_CELLS)
    except RuntimeError:
        pass
    assert read_manifest(path) is None  # nothing committed
    assert os.path.exists(f"{path}_centers")  # garbage, not corruption
    monkeypatch.undo()

    path2, _, _ = _fresh_index(spark, "meta")
    assert read_manifest_meta(path2)["centers"] == f"{path2}_centers"
