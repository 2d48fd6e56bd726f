"""Zone-map file skipping on manifest-committed artifacts
(operators/index_manifest.py): per-file min/max/null stats harvested
from parquet FOOTERS at commit time, committed in the same ``_current``
flip as the file list, consumed by ``read_index(prune=(col, lo, hi))``.

What is pinned, and why it is the 100 TB contract:

- correctness is one-sided — a skip must be a PROOF of emptiness
  (pruned+filter ≡ full+filter on every layout, clustered or not,
  partial stats or none), while keeps are free (advisory IO saving);
- skipping actually happens when writers cluster on the stat column
  (``repartitionByRange`` before the write → near-disjoint per-file
  ranges), measured via ``DataFrame.inputFiles()`` — the physical scan
  opens only the surviving files;
- the stats ride the snapshot: crash before the flip leaves the old
  stats live, compaction re-harvests tracked columns for its staged
  files automatically, replace-parts drops superseded files' stats in
  the same commit, and time travel prunes against the RESOLVED
  snapshot's stats, not the current ones.

The stats source is the footer the writer already produced (no data
scan at commit), mirroring Iceberg's manifest column bounds /
Delta's file stats; at 100 TB this turns a band/cell probe that would
open every file of the partition into one that opens the two files
whose key range overlaps.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from cognitive_score_bigdata_spark.operators.index_manifest import (
    _list_data_files,
    _survives_range,
    append_commit,
    clustered_write_commit,
    compact_index_parts,
    file_column_stats,
    pruned_files,
    publish_manifest,
    read_index,
    read_manifest,
    read_manifest_stats,
    replace_parts_commit,
    vacuum_index,
)
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _build_clustered(spark, n_ranges: int = 4) -> str:
    """A two-band artifact whose files are RANGE-CLUSTERED on doc_id:
    repartitionByRange before the partitioned write gives each task a
    contiguous doc_id slice, so every (band, file) holds a tight,
    near-disjoint doc_id range — the layout zone maps pay for."""
    path = tempfile.mkdtemp(prefix="csb_zonemap_") + "/idx"
    clustered_write_commit(
        _docs(spark).withColumn("band", F.col("doc_id") % 2),
        path,
        part_col="band",
        cluster_col="doc_id",
        n_ranges=n_ranges,
        note="boot",
    )
    return path


def test_footer_stats_match_data(spark):
    """The harvested [min, max, nulls, rows] per file must equal the
    truth computed by reading each file's rows — the footer is trusted
    downstream, so pin it against the data once."""
    path = _build_clustered(spark)
    stats = read_manifest_stats(path)
    files = _list_data_files(path)
    assert set(stats) == set(files)
    for rel in files:
        t = pq.read_table(os.path.join(path, rel), columns=["doc_id"])
        vals = t.column("doc_id").to_pylist()
        mn, mx, nulls, rows = stats[rel]["doc_id"]
        assert (mn, mx) == (min(vals), max(vals))
        assert nulls == sum(v is None for v in vals)
        assert rows == len(vals)


def test_pruned_read_equals_filtered_full_read(spark):
    """One-sided correctness: for any range, pruned-scan + real filter
    must equal full-scan + real filter. Also closed under composition
    with hive partition pruning (band filter on top)."""
    path = _build_clustered(spark)
    for lo, hi in [(100, 180), (0, 0), (None, 50), (450, None), (9999, None)]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("doc_id") >= lo)
        if hi is not None:
            cond = cond & (F.col("doc_id") <= hi)
        full = sorted(
            r.doc_id
            for r in read_index(spark, path).filter(cond).select("doc_id").collect()
        )
        pruned = sorted(
            r.doc_id
            for r in read_index(spark, path, prune=("doc_id", lo, hi))
            .filter(cond)
            .select("doc_id")
            .collect()
        )
        assert pruned == full, (lo, hi)
        both = (
            read_index(spark, path, prune=("doc_id", lo, hi))
            .filter(cond & (F.col("band") == 1))
            .count()
        )
        assert both == read_index(spark, path).filter(
            cond & (F.col("band") == 1)
        ).count(), (lo, hi)


def test_clustered_write_actually_skips_files(spark):
    """The IO claim: on the range-clustered layout a narrow probe must
    open strictly fewer files than the full scan, and the physical scan
    (inputFiles) must read exactly the surviving set."""
    path = _build_clustered(spark)
    total = _list_data_files(path)
    kept = pruned_files(path, ("doc_id", 100, 140))
    assert 1 <= len(kept) < len(total)
    scan = read_index(spark, path, prune=("doc_id", 100, 140))
    opened = sorted(os.path.relpath(f.replace("file:", ""), path) for f in scan.inputFiles())
    assert opened == sorted(kept)


def test_files_without_stats_are_never_skipped(spark):
    """Unknown ⇒ kept: commit stats for only half the files; every
    unstated file must survive any prune, and results stay exact."""
    path = _build_clustered(spark)
    files = _list_data_files(path)
    half = files[: len(files) // 2]
    v, _ = read_manifest(path)
    # Re-publish with stats restricted to `half` only: carry-forward
    # would keep the full map, so build a fresh artifact-less publish
    # by writing the restriction explicitly.
    stats = {f: s for f, s in read_manifest_stats(path).items() if f in half}
    import json

    mpath = os.path.join(path, "_manifest", f"m-{v:010d}.json")
    with open(mpath) as fh:
        doc = json.load(fh)
    doc["stats"] = stats
    with open(mpath, "w") as fh:
        json.dump(doc, fh)
    kept = pruned_files(path, ("doc_id", 0, 10))
    assert set(files) - set(half) <= set(kept)
    got = (
        read_index(spark, path, prune=("doc_id", 0, 10))
        .filter(F.col("doc_id") <= 10)
        .count()
    )
    want = read_index(spark, path).filter(F.col("doc_id") <= 10).count()
    assert got == want


def test_prune_that_skips_everything_is_schema_stable(spark):
    """A probe beyond every file's range returns 0 rows with the SAME
    schema as the full scan (partition column included) — callers can
    union/join the result without special-casing."""
    path = _build_clustered(spark)
    empty = read_index(spark, path, prune=("doc_id", 10**9, None))
    assert empty.count() == 0
    assert empty.schema == read_index(spark, path).schema


def test_append_commit_harvests_stats_in_the_same_flip(spark):
    """Crash seam: an append that dies before the flip leaves version,
    file list AND stats untouched; the successful retry lands files and
    their zone maps together."""
    path = _build_clustered(spark)
    v0 = read_manifest(path)[0]
    stats0 = read_manifest_stats(path)
    new_rows = (
        _docs(spark)
        .withColumn("doc_id", F.col("doc_id") + 10000)
        .withColumn("band", F.col("doc_id") % 2)
        .limit(40)
    )

    def write():
        new_rows.write.mode("append").partitionBy("band").parquet(path)

    with pytest.raises(RuntimeError):
        append_commit(
            path,
            write,
            stats_cols=["doc_id"],
            _before_publish=lambda: (_ for _ in ()).throw(RuntimeError("crash")),
        )
    assert read_manifest(path)[0] == v0
    assert read_manifest_stats(path) == stats0
    added = append_commit(path, write, stats_cols=["doc_id"])
    stats1 = read_manifest_stats(path)
    assert all(a in stats1 and "doc_id" in stats1[a] for a in added)
    # the appended range is skippable immediately
    kept = pruned_files(path, ("doc_id", 10000, None))
    assert set(kept) <= set(added) | {
        f for f in stats1 if f not in stats0 and f not in added
    }
    assert (
        read_index(spark, path, prune=("doc_id", 10000, None))
        .filter(F.col("doc_id") >= 10000)
        .count()
        == 40
    )


def test_compaction_reharvests_tracked_columns(spark):
    """Maintenance keeps indexes skippable without re-declaring
    stats_cols: compaction auto-detects the tracked column set from the
    committed stats and harvests it for its staged files."""
    path = _build_clustered(spark)
    extra = (
        _docs(spark)
        .withColumn("band", F.col("doc_id") % 2)
        .limit(60)
    )
    append_commit(
        path,
        lambda: extra.write.mode("append").partitionBy("band").parquet(path),
        stats_cols=["doc_id"],
    )
    compact_index_parts(spark, path, "band", max_files_per_part=1)
    stats = read_manifest_stats(path)
    live = read_manifest(path)[1]
    assert live and all(f in stats and "doc_id" in stats[f] for f in live)
    # correctness after compaction, with pruning
    got = (
        read_index(spark, path, prune=("doc_id", 100, 140))
        .filter(F.col("doc_id").between(100, 140))
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") != 2)  # base + the appended 60-row overlap
        .count()
    )
    full = (
        read_index(spark, path)
        .filter(F.col("doc_id").between(100, 140))
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") != 2)
        .count()
    )
    assert got == full


def test_time_travel_prunes_against_resolved_snapshot_stats(spark):
    """``version=`` must pair the old file list with the OLD stats: a
    range only present in the current snapshot prunes to empty at the
    old version but resolves rows at the current one."""
    path = _build_clustered(spark)
    v1 = read_manifest(path)[0]
    shifted = (
        _docs(spark)
        .withColumn("doc_id", F.col("doc_id") + 10000)
        .withColumn("band", F.col("doc_id") % 2)
        .limit(30)
    )
    append_commit(
        path,
        lambda: shifted.write.mode("append").partitionBy("band").parquet(path),
        stats_cols=["doc_id"],
    )
    assert pruned_files(path, ("doc_id", 10000, None), version=v1) == []
    old = read_index(spark, path, version=v1, prune=("doc_id", 10000, None))
    assert old.count() == 0
    now = read_index(spark, path, prune=("doc_id", 10000, None)).filter(
        F.col("doc_id") >= 10000
    )
    assert now.count() == 30


def test_replace_parts_drops_superseded_stats(spark):
    """Replacing a partition's content must atomically swap its files'
    stats too — the stored map never names a dead file."""
    path = _build_clustered(spark)
    before = read_manifest_stats(path)
    replacement = (
        _docs(spark)
        .filter(F.col("doc_id") % 2 == 0)
        .withColumn("doc_id", F.col("doc_id") + 50000)
        .withColumn("band", F.lit(0))
    )
    added = replace_parts_commit(
        path,
        lambda: replacement.write.mode("append")
        .partitionBy("band")
        .parquet(path),
        part_values=[0],
        stats_cols=["doc_id"],
    )
    after = read_manifest_stats(path)
    dead = {f for f in before if f.startswith("band=0/")}
    assert dead.isdisjoint(after)
    assert all(a in after for a in added)
    # old band-0 range is gone from the live view, pruned or not
    assert (
        read_index(spark, path, prune=("doc_id", None, 49999))
        .filter((F.col("band") == 0) & (F.col("doc_id") <= 49999))
        .count()
        == 0
    )


def test_all_null_stat_column_file_is_skipped(spark):
    """A file whose stat column is entirely NULL can be proven empty
    for ANY range (range predicates never match NULL) — pinned because
    it is the one skip that happens with min=max=None."""
    path = tempfile.mkdtemp(prefix="csb_zm_null_") + "/idx"
    base = _docs(spark).withColumn("band", F.lit(0)).limit(20)
    base.coalesce(1).write.partitionBy("band").parquet(path)
    nulls = base.withColumn("doc_id", F.lit(None).cast("long"))
    nulls.coalesce(1).write.mode("append").partitionBy("band").parquet(path)
    files = _list_data_files(path)
    stats = file_column_stats(path, files, ["doc_id"])
    publish_manifest(path, files, stats=stats)
    allnull = [f for f in files if stats[f]["doc_id"][0] is None]
    assert len(allnull) == 1
    kept = pruned_files(path, ("doc_id", 0, None))
    assert allnull[0] not in kept
    got = (
        read_index(spark, path, prune=("doc_id", 0, None))
        .filter(F.col("doc_id") >= 0)
        .count()
    )
    assert got == 20


def test_zorder_cluster_skips_on_every_dimension(spark):
    """The multi-conjunct composition: cluster on a Morton code of
    (user_id, ts_us), harvest zone maps on the ORIGINAL dimensions —
    each dimension's per-file min/max stays narrow, so a prune on
    EITHER column skips files, the two-conjunct AND skips at least as
    many as its strongest member, and every variant stays exact."""
    from cognitive_score_bigdata_spark.sources.sinks import zorder_key

    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ev = events.withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    ).select("event_id", "user_id", "ts_us", "value")
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_us"), F.max("ts_us")
    ).collect()[0]
    zed = ev.withColumn(
        "zv",
        zorder_key(
            [F.col("user_id"), F.col("ts_us")], [lo_u, lo_t], [hi_u, hi_t]
        ),
    ).withColumn("band", F.lit(0))
    path = tempfile.mkdtemp(prefix="csb_zm_zorder_") + "/lake"
    clustered_write_commit(
        zed,
        path,
        part_col="band",
        cluster_col="zv",
        n_ranges=16,
        stats_cols=["user_id", "ts_us"],
    )
    total = read_manifest(path)[1]
    mid_t = (lo_t + hi_t) // 2
    u_pr = ("user_id", lo_u, lo_u + 1)
    t_pr = ("ts_us", lo_t, mid_t)
    kept_u = pruned_files(path, u_pr)
    kept_t = pruned_files(path, t_pr)
    kept_both = pruned_files(path, [u_pr, t_pr])
    assert len(kept_u) < len(total), "user_id dimension never skipped"
    assert len(kept_t) < len(total), "ts dimension never skipped"
    assert set(kept_both) == set(kept_u) & set(kept_t)
    # exactness of the ANDed prune end-to-end
    cond = (
        F.col("user_id").between(lo_u, lo_u + 1)
        & F.col("ts_us").between(lo_t, mid_t)
    )
    got = sorted(
        r.event_id
        for r in read_index(spark, path, prune=[u_pr, t_pr])
        .filter(cond)
        .select("event_id")
        .collect()
    )
    want = sorted(r.event_id for r in ev.filter(cond).select("event_id").collect())
    assert got == want


def test_sorted_compaction_restores_skipping(spark):
    """The lifecycle claim: unclustered appends degrade zone-map
    selectivity (each appended file spans the whole key range);
    sort-aware compaction (cluster_col=) rewrites touched partitions
    range-partitioned on the cluster key, re-harvests stats, and the
    same probe skips again — while conserving content exactly."""
    path = _build_clustered(spark)
    docs = _docs(spark).withColumn("band", F.col("doc_id") % 2)
    # two unclustered appends: each task sees a random doc_id mix, so
    # every appended file's [min, max] spans ~the full key space
    for k in range(2):
        append_commit(
            path,
            lambda: docs.repartition(4)
            .write.mode("append")
            .partitionBy("band")
            .parquet(path),
            note=f"unclustered append {k}",
            stats_cols=["doc_id"],
        )
    probe = ("doc_id", 100, 140)
    before_live = read_manifest(path)[1]
    kept_before = pruned_files(path, probe)
    # the appended files are unskippable: skip rate degraded
    assert len(kept_before) > len(before_live) // 2
    want = {
        r.doc_id: r["count"]
        for r in read_index(spark, path).groupBy("doc_id").count().collect()
    }
    compact_index_parts(
        spark, path, "band", max_files_per_part=1,
        cluster_col="doc_id", files_per_part=4,
    )
    after_live = read_manifest(path)[1]
    stats = read_manifest_stats(path)
    assert all(f in stats and "doc_id" in stats[f] for f in after_live)
    kept_after = pruned_files(path, probe)
    # selectivity restored: a narrow probe opens a strict minority
    assert len(kept_after) / len(after_live) < len(kept_before) / len(
        before_live
    )
    assert len(kept_after) / len(after_live) <= 0.5
    # content conserved through the sorted rewrite
    got = {
        r.doc_id: r["count"]
        for r in read_index(spark, path).groupBy("doc_id").count().collect()
    }
    assert got == want
    # and the pruned+filtered read still equals the full+filtered read
    cond = F.col("doc_id").between(100, 140)
    assert (
        read_index(spark, path, prune=probe).filter(cond).count()
        == read_index(spark, path).filter(cond).count()
    )


def test_float_columns_are_never_statted(spark):
    """The NaN hole, closed at the harvest: parquet footers compute
    float min/max IGNORING NaN (a file of [1.0, NaN] reports max=1.0,
    null_count=0) while Spark/DuckDB order NaN GREATER than every
    number — a bound-based skip could drop a file whose NaN rows match
    `col >= 5`. No footer field records NaN presence, so FLOAT/DOUBLE
    columns get NO stats (unknown ⇒ never skipped) and a float prune
    keeps every file."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    path = tempfile.mkdtemp(prefix="csb_zm_nan_") + "/idx"
    d = os.path.join(path, "band=0")
    os.makedirs(d)
    pq_mod.write_table(
        pa.table(
            {
                "v": pa.array([1.0, float("nan"), 2.0], pa.float64()),
                "k": pa.array([1, 2, 3], pa.int64()),
            }
        ),
        os.path.join(d, "a.parquet"),
    )
    files = _list_data_files(path)
    stats = file_column_stats(path, files, ["v", "k"])
    assert "v" not in stats.get(files[0], {})  # float: no bounds
    assert "k" in stats[files[0]]  # int: harvested
    publish_manifest(path, files, stats=stats)
    # a prune on the float column can never skip
    assert pruned_files(path, ("v", 5.0, None)) == files
    # and the Spark semantics the guard protects: NaN matches >= 5.0.
    # Spark's OWN parquet row-group pushdown has the same NaN hazard on
    # this pyarrow-written file (pyarrow wrote max=2.0 ignoring NaN;
    # Spark's writer would have omitted the stats) — disable it so the
    # assertion isolates OUR layer's behavior from the engine's.
    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    try:
        got = (
            read_index(spark, path, prune=("v", 5.0, None))
            .filter(F.col("v") >= 5.0)
            .count()
        )
    finally:
        spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    assert got == 1  # the NaN row — dropped wrongly if floats were statted


def test_concurrent_publish_conflicts_loudly(spark):
    """Single-writer maintenance is the deployment assumption; the
    commit now ENFORCES it (exclusive manifest create = optimistic
    CAS): a second writer that resolved the same base version fails
    with FileExistsError instead of truncating the winner's manifest
    and last-writer-winning the pointer flip — and the winner's commit
    stays fully intact."""
    import json

    path = _build_clustered(spark)
    v, files = read_manifest(path)
    # the "winner": another writer has already committed v+1 (pre-create
    # its manifest exactly as publish would)
    winner = os.path.join(path, "_manifest", f"m-{v + 1:010d}.json")
    winner_doc = {"version": v + 1, "files": files, "note": "winner", "meta": {}}
    with open(winner, "w") as fh:
        json.dump(winner_doc, fh)
    # the "loser" resolves the stale _current (still v) and races the
    # same m-{v+1} name — the REAL publish path must conflict loudly
    with pytest.raises(FileExistsError):
        publish_manifest(path, files, note="loser")
    with open(winner) as fh:
        assert json.load(fh) == winner_doc  # winner untouched
    # _current was never flipped by the failed commit
    assert read_manifest(path)[0] == v


def test_crash_orphan_recovery_via_vacuum(spark):
    """The CAS's crash story: a commit that died between manifest write
    and pointer flip strands m-{N+1}, which blocks every later commit's
    exclusive create. vacuum_index is the recovery (the error message
    names it): it deletes manifests NEWER than the committed pointer —
    and an orphan must never PROTECT files either, even at
    keep_versions=1, where it could otherwise displace the LIVE
    manifest from the keep window and lose the current snapshot."""
    path = _build_clustered(spark)
    v, files = read_manifest(path)
    import json

    orphan = os.path.join(path, "_manifest", f"m-{v + 1:010d}.json")
    with open(orphan, "w") as fh:
        json.dump(
            {"version": v + 1, "files": [], "note": "crashed", "meta": {}},
            fh,
        )
    # blocked: the next commit resolves base v and races the orphan
    with pytest.raises(FileExistsError, match="vacuum_index"):
        publish_manifest(path, files, note="retry")
    # recovery — and the orphan's empty file list must not have been
    # used as the keep set (keep_versions=1 keeps the LIVE snapshot)
    deleted = vacuum_index(path, keep_versions=1)
    assert os.path.relpath(orphan, path) in deleted
    assert read_manifest(path) == (v, files)  # live snapshot intact
    for f in files:
        assert os.path.exists(os.path.join(path, f))
    # unblocked: the retry commits cleanly at v+1
    assert publish_manifest(path, files, note="retry") == v + 1


def test_sorted_compaction_converges(spark):
    """files_per_part > max_files_per_part must not loop: the second
    nightly run finds every partition at its target shape and touches
    nothing (the trigger threshold is the larger of the two knobs)."""
    path = _build_clustered(spark)
    docs = _docs(spark).withColumn("band", F.col("doc_id") % 2)
    append_commit(
        path,
        lambda: docs.repartition(4)
        .write.mode("append")
        .partitionBy("band")
        .parquet(path),
        stats_cols=["doc_id"],
    )
    first = compact_index_parts(
        spark, path, "band", max_files_per_part=1,
        cluster_col="doc_id", files_per_part=4,
    )
    assert first  # something was over threshold and got rewritten
    second = compact_index_parts(
        spark, path, "band", max_files_per_part=1,
        cluster_col="doc_id", files_per_part=4,
    )
    assert second == {}  # converged: nothing re-touched


def test_empty_prune_keeps_everything(spark):
    """The empty AND of conjuncts is true: planners can pass their
    (possibly empty) predicate set unconditionally."""
    path = _build_clustered(spark)
    files = read_manifest(path)[1]
    assert pruned_files(path, []) == files
    assert read_index(spark, path, prune=[]).count() == read_index(
        spark, path
    ).count()


def test_part_values_prune_is_metadata_level(spark):
    """Partition pruning at PLAN time: with part_values the
    non-matching files never enter the scan relation (inputFiles ⊆ the
    matching partition's committed files — Catalyst would only have
    avoided reading their data), it composes with the zone-map prune,
    an unmatched value set is schema-stable empty, and results equal
    the full scan + partition filter."""
    path = _build_clustered(spark)
    live = read_manifest(path)[1]
    band0 = [f for f in live if f.startswith("band=0/")]
    scan = read_index(spark, path, part_values={0})
    opened = sorted(
        os.path.relpath(f.replace("file:", ""), path) for f in scan.inputFiles()
    )
    assert opened == sorted(band0)
    got = scan.filter(F.col("band") == 0).count()
    assert got == read_index(spark, path).filter(F.col("band") == 0).count()
    # composes with the zone-map prune: intersection of both file sets
    both = read_index(spark, path, prune=("doc_id", 100, 140), part_values={0})
    kept_zone = set(pruned_files(path, ("doc_id", 100, 140)))
    opened_both = {
        os.path.relpath(f.replace("file:", ""), path) for f in both.inputFiles()
    }
    assert opened_both == kept_zone & set(band0)
    assert both.filter(
        (F.col("band") == 0) & F.col("doc_id").between(100, 140)
    ).count() == read_index(spark, path).filter(
        (F.col("band") == 0) & F.col("doc_id").between(100, 140)
    ).count()
    # unmatched partition value: empty, schema identical
    none = read_index(spark, path, part_values={99})
    assert none.count() == 0
    assert none.schema == read_index(spark, path).schema


def test_point_set_lookup_opens_only_containing_files(spark):
    """prune_in, the "re-fetch these ids" lookup: on the clustered
    layout a handful of scattered ids opens only the files whose
    committed range contains one of them; the real isin filter on top
    returns exactly those rows; files without stats always survive;
    an empty id set resolves to a schema-stable empty frame."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        pruned_files_in,
    )

    path = _build_clustered(spark)
    live = read_manifest(path)[1]
    ids = [7, 250, 493]
    kept = pruned_files_in(path, "doc_id", ids)
    assert 1 <= len(kept) < len(live)
    scan = read_index(spark, path, prune_in=("doc_id", ids))
    opened = sorted(
        os.path.relpath(f.replace("file:", ""), path) for f in scan.inputFiles()
    )
    assert opened == sorted(kept)
    got = sorted(
        r.doc_id
        for r in scan.filter(F.col("doc_id").isin(ids)).select("doc_id").collect()
    )
    assert got == ids
    # composes with part_values: band=1 holds only the odd ids
    both = read_index(
        spark, path, part_values={1}, prune_in=("doc_id", ids)
    ).filter(F.col("doc_id").isin(ids) & (F.col("band") == 1))
    assert sorted(r.doc_id for r in both.collect()) == [7, 493]
    # empty id set: nothing to fetch, schema stable
    none = read_index(spark, path, prune_in=("doc_id", []))
    assert none.count() == 0
    assert none.schema == read_index(spark, path).schema


def test_string_columns_keep_lower_bound_only(spark):
    """The string-truncation hole, closed at the harvest: pyarrow
    writes max='' for long string maxima (['a', 'z'*4097] → max='',
    and ['', 'z'*4097] → min='' max='' — indistinguishable from a
    genuine all-empty file), so the string MAX is never trusted
    (stored None = unbounded above). An under-reported MIN only keeps
    extra files; an under-reported MAX would skip a matching one."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    path = tempfile.mkdtemp(prefix="csb_zm_str_") + "/idx"
    d = os.path.join(path, "band=0")
    os.makedirs(d)
    pq_mod.write_table(
        pa.table({"s": pa.array(["a", "z" * 4097], pa.string()),
                  "k": pa.array([1, 2], pa.int64())}),
        os.path.join(d, "long.parquet"),
    )
    pq_mod.write_table(
        pa.table({"s": pa.array(["b", "c"], pa.string()),
                  "k": pa.array([3, 4], pa.int64())}),
        os.path.join(d, "short.parquet"),
    )
    files = _list_data_files(path)
    stats = file_column_stats(path, files, ["s"])
    for f in files:
        assert stats[f]["s"][1] is None, f  # max never recorded
    publish_manifest(path, files, stats=stats)
    # the hazardous probe: s >= 'zz' matches the truncated file's long
    # row; a trusted max='' would have skipped it
    kept = pruned_files(path, ("s", "zz", None))
    assert "band=0/long.parquet" in kept
    got = (
        read_index(spark, path, prune=("s", "zz", None))
        .filter(F.col("s") >= "zz")
        .count()
    )
    assert got == 1
    # the safe side still skips: both files' min exceed hi='0'
    assert pruned_files(path, ("s", None, "0")) == []


def test_time_travel_rejects_crash_orphans(spark):
    """version= must honor the same committed-at-or-below-pointer rule
    vacuum applies: a manifest newer than _current was never committed
    and its files are vacuum-deletable — resolving it would serve a
    snapshot that never existed."""
    import json

    path = _build_clustered(spark)
    v, files = read_manifest(path)
    orphan = os.path.join(path, "_manifest", f"m-{v + 1:010d}.json")
    with open(orphan, "w") as fh:
        json.dump(
            {"version": v + 1, "files": files, "note": "crashed", "meta": {}},
            fh,
        )
    with pytest.raises(ValueError, match="never\\s+committed"):
        read_manifest(path, version=v + 1)
    with pytest.raises(ValueError, match="never\\s+committed"):
        read_index(spark, path, version=v + 1)
    assert read_manifest(path, version=v) == (v, files)  # committed: fine


def test_part_values_canonicalizes_spark_spellings(spark):
    """part_values drops files on MISMATCH (not conservative like zone
    maps), so caller values must be canonicalized to Spark's hive-path
    spelling: booleans → true/false, and path-escaped partition values
    are unquoted before comparison."""
    path = tempfile.mkdtemp(prefix="csb_zm_canon_") + "/idx"
    df = spark.createDataFrame(
        [(True, 1), (False, 2), (True, 3)], "flag boolean, v int"
    )
    df.write.partitionBy("flag").parquet(path)
    files = _list_data_files(path)
    publish_manifest(path, files)
    got = read_index(spark, path, part_values={True})
    assert sorted(r.v for r in got.collect()) == [1, 3]
    # escaped partition value: Spark writes ':' as %3A in the path
    path2 = tempfile.mkdtemp(prefix="csb_zm_esc_") + "/idx"
    df2 = spark.createDataFrame([("a:b", 1), ("c", 2)], "k string, v int")
    df2.write.partitionBy("k").parquet(path2)
    publish_manifest(path2, _list_data_files(path2))
    assert [
        r.v for r in read_index(spark, path2, part_values={"a:b"}).collect()
    ] == [1]


def test_survives_range_is_conservative_on_type_drift():
    """Unit pins on the skip predicate: exact boundary inclusivity and
    the incomparable-types escape hatch (schema drift ⇒ keep)."""
    assert _survives_range([10, 20, 0, 5], 20, None)  # max == lo: keep
    assert not _survives_range([10, 20, 0, 5], 21, None)
    assert _survives_range([10, 20, 0, 5], None, 10)  # min == hi: keep
    assert not _survives_range([10, 20, 0, 5], None, 9)
    assert _survives_range(["a", "m", 0, 5], 3, 7)  # str stat vs int probe
    assert not _survives_range([None, None, 5, 5], 0, 100)  # all-null
    assert not _survives_range([None, None, 0, 0], 0, 100)  # 0-row file: skip
