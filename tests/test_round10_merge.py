"""Cross-snapshot dedup index merge (queries/round10.py): plan pins and
conservation (VERDICT r9 item 4).

The merge's scale contract is structural, so it is pinned on plans, not
timings: absorbing a snapshot must read ZERO old index partitions (LSH
bucket membership is additive — append, not read-union-rewrite), and
downstream reads of the band-partitioned index must prune partitions.
Conservation is pinned twice: the artifact level (merged index row set
== from-scratch rebuild over the snapshot union) and the result level
(pairs from the merged index == the single-shot md5 pair query), on top
of the driver's DuckDB hash-match against the full-corpus oracle.
"""

from __future__ import annotations

import re
import tempfile

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.plans.audit import plan_text
from cognitive_score_bigdata_spark.queries.round10 import (
    md5_banded_rows,
    merge_into_index,
    merged_index_path,
    snapshot_docs,
)
from tests.conftest import SF_DIR


def test_merge_reads_no_index_partition(spark):
    """The append-merge's write-side plan must scan only the new batch:
    no node may reference the index path (stronger than 'only touched
    partitions' — NOTHING old is read; a regression to read-union-
    rewrite shows up as a parquet scan of the index here)."""
    _, snap2 = snapshot_docs(spark, SF_DIR)
    path = tempfile.mkdtemp(prefix="csb_merge_pin_") + "/idx"
    md5_banded_rows(snap2.limit(50)).write.partitionBy("band").parquet(path)
    appended = merge_into_index(snap2.limit(80), path)
    assert path not in plan_text(appended)


def test_merged_index_scan_prunes_band_partitions(spark):
    """Reads of the merged index filtered to a band subset must show
    parquet PartitionFilters on band — the reason the index is
    partitioned by band at all (an incremental probe touches only the
    bands it hashes into). The registered query itself exercises this:
    its signature leg reads band=0 only."""
    from cognitive_score_bigdata_spark.queries import load_registry

    idx_path = merged_index_path(spark, SF_DIR)
    one_band = spark.read.parquet(idx_path).filter(F.col("band") == 0)
    t = plan_text(one_band)
    assert re.search(r"PartitionFilters: \[[^\]]*band", t), t[:2000]

    q = load_registry()["dedup_index_merge_pairs_md5"].fn(spark, SF_DIR)
    qt = plan_text(q)
    assert re.search(r"PartitionFilters: \[[^\]]*band[^\]]* = 0\)", qt), (
        "query's signature leg no longer prunes to band=0"
    )


def test_merged_index_equals_full_rebuild(spark):
    """Artifact-level conservation: the merged index's row set must be
    identical to a from-scratch build over snap1 UNION snap2 — the
    property that lets snapshot N+1 probe the merged index as if the
    corpus had been indexed in one shot."""
    snap1, snap2 = snapshot_docs(spark, SF_DIR)
    merged = spark.read.parquet(merged_index_path(spark, SF_DIR))
    rebuilt = md5_banded_rows(snap1.unionByName(snap2))
    cols = [c for c in rebuilt.columns]
    diff_a = merged.select(cols).exceptAll(rebuilt.select(cols))
    diff_b = rebuilt.select(cols).exceptAll(merged.select(cols))
    assert diff_a.count() == 0 and diff_b.count() == 0


def test_merged_pairs_equal_single_shot_pairs(spark):
    """Result-level conservation inside Spark (the driver pins it vs
    DuckDB): pair set + est_jaccard from the merged index == the
    single-shot dedup_minhash_pairs_md5 computation."""
    from cognitive_score_bigdata_spark.queries import load_registry

    R = load_registry()
    merged = (
        R["dedup_index_merge_pairs_md5"].fn(spark, SF_DIR).toPandas()
    )
    single = R["dedup_minhash_pairs_md5"].fn(spark, SF_DIR).toPandas()
    key = ["doc_a", "doc_b", "est_jaccard"]
    a = merged[key].sort_values(key).reset_index(drop=True)
    b = single[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b), (len(a), len(b))


def _build_small_index(spark, path, n1=120, n2=80):
    from cognitive_score_bigdata_spark.queries.round10 import (
        _list_data_files,
        publish_manifest,
    )

    snap1, snap2 = snapshot_docs(spark, SF_DIR)
    md5_banded_rows(snap1.limit(n1)).write.partitionBy("band").parquet(path)
    publish_manifest(path, _list_data_files(path), note="initial build")
    merge_into_index(snap2.limit(n2), path)


def test_compaction_reduces_files_and_conserves_content(spark):
    """After build+merge every band partition holds 2 live file sets;
    compaction must bring each touched band to one LIVE file (the
    manifest view readers resolve), leave the row set bit-identical,
    and vacuum — the only deleter — must bring the PHYSICAL counts
    down to the live set once the retention window is dropped."""
    from cognitive_score_bigdata_spark.queries.round10 import (
        band_file_counts,
        compact_index_bands,
        live_band_file_counts,
        read_index,
        vacuum_index,
    )

    path = tempfile.mkdtemp(prefix="csb_compact_") + "/idx"
    _build_small_index(spark, path)

    before_files = live_band_file_counts(path)
    assert all(n >= 2 for n in before_files.values()), before_files
    before_rows = read_index(spark, path).toPandas()

    # pruning pin: the compaction scan carries PartitionFilters on band
    touched = sorted(before_files)
    pruned = read_index(spark, path).filter(F.col("band").isin(touched))
    assert re.search(r"PartitionFilters: \[[^\]]*band", plan_text(pruned))

    stats = compact_index_bands(spark, path, max_files_per_band=1)
    assert set(stats) == set(before_files)
    after_live = live_band_file_counts(path)
    assert all(n == 1 for n in after_live.values()), after_live
    # commit deleted nothing: old files still present for in-flight
    # readers until vacuum drops the retention window
    assert all(n >= 3 for n in band_file_counts(path).values())
    deleted = vacuum_index(path, keep_versions=1)
    assert deleted, "vacuum should sweep the superseded files"
    assert band_file_counts(path) == after_live

    after_rows = read_index(spark, path).toPandas()
    cols = sorted(before_rows.columns)
    a = before_rows[cols].sort_values(cols).reset_index(drop=True)
    b = after_rows[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_compaction_commit_is_reader_atomic(spark):
    """The VERDICT-r10 seam: a reader DURING compaction (after the
    compacted files are staged, before the manifest flip) must resolve
    EXACTLY the old committed file set — old XOR new, never a hole,
    never a mix — and a crash in that window must leave the live index
    untouched with the staged files as sweepable garbage."""
    from cognitive_score_bigdata_spark.queries.round10 import (
        band_file_counts,
        compact_index_bands,
        live_band_file_counts,
        read_index,
        read_manifest,
        vacuum_index,
    )

    path = tempfile.mkdtemp(prefix="csb_compact3_") + "/idx"
    _build_small_index(spark, path, n1=100, n2=60)
    v_before, files_before = read_manifest(path)
    rows_before = read_index(spark, path).toPandas()
    cols = sorted(rows_before.columns)
    canon = lambda df: df[cols].sort_values(cols).reset_index(drop=True)  # noqa: E731

    seen = {}

    def reader_mid_compaction():
        # staged files are already physically present beside the live
        # set, yet the committed view must be byte-identical to before
        seen["manifest"] = read_manifest(path)
        seen["rows"] = read_index(spark, path).toPandas()
        assert any(
            n > live_band_file_counts(path)[b]
            for b, n in band_file_counts(path).items()
        ), "staging should have added physical files"

    compact_index_bands(
        spark, path, max_files_per_band=1, _before_publish=reader_mid_compaction
    )
    assert seen["manifest"] == (v_before, files_before)
    assert canon(seen["rows"]).equals(canon(rows_before))
    v_after, files_after = read_manifest(path)
    assert v_after == v_before + 1 and files_after != files_before
    assert canon(read_index(spark, path).toPandas()).equals(canon(rows_before))

    # crash window: a failure after staging but before the flip aborts
    # with the OLD manifest still live and content intact
    path2 = tempfile.mkdtemp(prefix="csb_compact4_") + "/idx"
    _build_small_index(spark, path2, n1=100, n2=60)
    v2, files2 = read_manifest(path2)
    rows2 = read_index(spark, path2).toPandas()

    def boom():
        raise RuntimeError("simulated crash before publish")

    try:
        compact_index_bands(spark, path2, max_files_per_band=1, _before_publish=boom)
        raise AssertionError("compaction should have propagated the crash")
    except RuntimeError:
        pass
    assert read_manifest(path2) == (v2, files2)
    assert canon(read_index(spark, path2).toPandas()).equals(canon(rows2))
    # the orphaned staged files are garbage, not corruption: vacuum
    # sweeps anything no kept manifest references
    orphans = set(vacuum_index(path2, keep_versions=2))
    assert orphans and all("compact-" in f for f in orphans), orphans
    assert canon(read_index(spark, path2).toPandas()).equals(canon(rows2))


def test_merge_after_compaction_does_not_resurrect_swept_files(spark):
    """A merge that follows a compaction must base its manifest on the
    CURRENT manifest, not a directory listing — otherwise the
    superseded (not-yet-vacuumed) files would re-enter the live set and
    double every row they hold. Full lifecycle: build -> merge ->
    compact -> merge again == from-scratch rebuild over all parts."""
    from cognitive_score_bigdata_spark.queries.round10 import (
        compact_index_bands,
        read_index,
    )

    from cognitive_score_bigdata_spark.queries.round10 import (
        _list_data_files,
        publish_manifest,
    )

    snap1, snap2 = snapshot_docs(spark, SF_DIR)
    # deterministic doc_id-range parts (limit() is not stable across
    # evaluations, and this test re-derives the corpus for the rebuild)
    part1 = snap1.filter(F.col("doc_id") < 300)
    part2 = snap2.filter(F.col("doc_id") < 300)
    part3 = snap2.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 600))
    path = tempfile.mkdtemp(prefix="csb_compact5_") + "/idx"
    md5_banded_rows(part1).write.partitionBy("band").parquet(path)
    publish_manifest(path, _list_data_files(path), note="initial build")
    merge_into_index(part2, path)
    compact_index_bands(spark, path, max_files_per_band=1)
    # second increment appended AFTER compaction, old files still on disk
    merge_into_index(part3, path)
    merged = read_index(spark, path)
    rebuilt = md5_banded_rows(part1.unionByName(part2).unionByName(part3))
    cols = rebuilt.columns
    assert merged.select(cols).exceptAll(rebuilt.select(cols)).count() == 0
    assert rebuilt.select(cols).exceptAll(merged.select(cols)).count() == 0


def test_compaction_band_subset_leaves_others_untouched(spark):
    """Partial compaction (explicit band subset) must rewrite ONLY the
    named band's files — the other partitions' files are byte-for-byte
    the ones written before (mtime+name identical), proving the
    read-union-rewrite really is per-partition."""
    import glob
    import os

    from cognitive_score_bigdata_spark.queries.round10 import (
        band_file_counts,
        compact_index_bands,
    )

    snap1, snap2 = snapshot_docs(spark, SF_DIR)
    path = tempfile.mkdtemp(prefix="csb_compact2_") + "/idx"
    md5_banded_rows(snap1.limit(100)).write.partitionBy("band").parquet(path)
    merge_into_index(snap2.limit(60), path)

    def file_sig(band):
        return sorted(
            (os.path.basename(p), os.path.getmtime(p))
            for p in glob.glob(os.path.join(path, f"band={band}", "*.parquet"))
        )

    untouched_sigs = {b: file_sig(b) for b in band_file_counts(path) if b != 0}
    stats = compact_index_bands(spark, path, bands=[0])
    assert list(stats) == [0] and stats[0][1] == 1
    for b, sig in untouched_sigs.items():
        assert file_sig(b) == sig, f"band {b} files were rewritten"


def _tiny_index(spark, tag, bands=2, rows=10):
    """A minimal band-partitioned index with a committed manifest —
    protocol fixtures that need no minhash machinery."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        _list_data_files,
        publish_manifest,
    )

    path = tempfile.mkdtemp(prefix=f"csb_proto_{tag}_") + "/idx"
    df = spark.range(rows).select(
        F.col("id"), (F.col("id") % bands).alias("band")
    )
    df.write.partitionBy("band").parquet(path)
    publish_manifest(path, _list_data_files(path), note="v1")
    return path


def test_vacuum_expires_manifests_and_stray_pointers(spark):
    """ADVICE r11: _manifest/ must not grow unboundedly — vacuum
    deletes manifests older than the newest keep_versions (never the
    one _current names) and crash-stranded _current.tmp.* pointers,
    and the committed view still resolves afterwards."""
    import glob
    import os

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        append_commit,
        read_index,
        read_manifest,
        vacuum_index,
    )

    path = _tiny_index(spark, "expire")
    for i in range(3):
        append_commit(
            path,
            lambda: spark.range(2)
            .select(F.col("id"), F.lit(0).alias("band"))
            .write.mode("append")
            .partitionBy("band")
            .parquet(path),
            note=f"a{i}",
        )
    with open(os.path.join(path, "_current.tmp.99"), "w") as f:
        f.write("m-junk")  # crash between pointer write and os.replace
    mdir = os.path.join(path, "_manifest")
    assert len(glob.glob(os.path.join(mdir, "m-*.json"))) == 4
    vacuum_index(path, keep_versions=2)
    kept = sorted(glob.glob(os.path.join(mdir, "m-*.json")))
    assert len(kept) == 2
    assert not glob.glob(os.path.join(path, "_current.tmp.*"))
    version, files = read_manifest(path)
    assert version == 4 and files  # _current's manifest survived
    assert read_index(spark, path).count() == 10 + 6


def test_compaction_explicit_dead_partition_is_skipped(spark):
    """ADVICE r11: an explicit parts override naming a partition with
    no live rows must be intersected with the live set, not fail late
    on the missing staged directory."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        append_commit,
        compact_index_parts,
        read_index,
    )

    path = _tiny_index(spark, "deadpart")
    append_commit(
        path,
        lambda: spark.range(4)
        .select(F.col("id"), (F.col("id") % 2).alias("band"))
        .write.mode("append")
        .partitionBy("band")
        .parquet(path),
    )
    before = read_index(spark, path).toPandas().sort_values("id")
    stats = compact_index_parts(spark, path, "band", parts=[0, 7])
    assert 7 not in stats and set(stats) == {0}
    after = read_index(spark, path).toPandas().sort_values("id")
    assert before.reset_index(drop=True).equals(after.reset_index(drop=True))


def test_read_index_empty_manifest_recovers_schema_or_fails_clearly(spark):
    """ADVICE r11: a committed manifest with zero live files (every
    partition replaced by an empty set) must not hand zero paths to the
    parquet reader — schema is recovered from superseded physical files
    (limit(0)), and with nothing on disk the error names the index."""
    import os

    import pytest

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        publish_manifest,
        read_index,
    )

    path = _tiny_index(spark, "emptyman")
    publish_manifest(path, [], note="replace everything with nothing")
    df = read_index(spark, path)
    assert df.count() == 0
    assert set(df.columns) == {"id", "band"}

    bare = tempfile.mkdtemp(prefix="csb_proto_bare_") + "/idx"
    os.makedirs(bare)
    publish_manifest(bare, [], note="empty from birth")
    with pytest.raises(ValueError, match="no live"):
        read_index(spark, bare)


def test_read_index_time_travel(spark):
    """Snapshot reads (Iceberg's VERSION AS OF, the reader-side face
    of the vacuum retention window): version=N resolves a RETAINED
    older manifest's exact committed content — correct by construction
    because data files are append-only between commits and vacuum is
    the sole deleter. An EXPIRED version fails naming the retained
    range instead of silently reading _current (time-traveling to the
    wrong snapshot would be a correctness bug, not a convenience)."""
    import pytest

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        append_commit,
        read_index,
        vacuum_index,
    )

    path = _tiny_index(spark, "timetravel")  # v1: 10 rows

    def add(n, band):
        append_commit(
            path,
            lambda: spark.range(n)
            .select(F.col("id"), F.lit(band).alias("band"))
            .write.mode("append")
            .partitionBy("band")
            .parquet(path),
        )

    add(2, 0)  # v2: 12 rows
    add(3, 1)  # v3: 15 rows
    assert read_index(spark, path, version=1).count() == 10
    assert read_index(spark, path, version=2).count() == 12
    assert read_index(spark, path).count() == 15

    vacuum_index(path, keep_versions=2)  # expires v1
    with pytest.raises(ValueError, match="not retained"):
        read_index(spark, path, version=1)
    assert read_index(spark, path, version=2).count() == 12
    assert read_index(spark, path, version=3).count() == 15
