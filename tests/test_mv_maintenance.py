"""Incremental MV maintenance (queries/mv_maintenance.py): the merge
must be O(touched partitions) — partition pruning on the read-back,
untouched day files byte-identical after the merge — and the algebra
must absorb late data exactly. Conservation vs the full recompute is
covered by the registry parity test; these pin the LIFECYCLE."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.operators.index_manifest import (
    read_index,
    read_manifest_meta,
    vacuum_index,
)
from cognitive_score_bigdata_spark.queries.mv_maintenance import (
    _combine,
    _events_with_day,
    _state,
    merge_increment,
)
from tests.conftest import SF_DIR


def _file_snapshot(path: str) -> dict[str, tuple[int, float]]:
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime)
    return out


def test_merge_touches_only_increment_partitions(spark):
    """The scale contract: after the initial materialization, merging
    an increment that lands in 2 of N days must leave every file
    byte-identical ON DISK (same path, size, mtime — the staged-append
    commit never rewrites anything), supersede exactly the touched
    days in the LIVE (manifest) view, and stage fresh files only for
    those days."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_manifest,
    )

    ev = _events_with_day(spark, SF_DIR)
    days = sorted(r.event_day for r in ev.select("event_day").distinct().collect())
    assert len(days) >= 4, "fixture needs several days"
    touched_days = {days[0], days[-1]}
    inc = ev.filter(F.col("event_day").isin(list(touched_days)) & (F.col("event_id") % 5 == 0))
    base = ev.join(inc, "event_id", "left_anti")
    path = tempfile.mkdtemp(prefix="csb_mv_test_") + "/mv"
    _state(base).write.partitionBy("event_day").parquet(path)
    before = _file_snapshot(path)
    got_touched = merge_increment(spark, inc, path)
    assert set(got_touched) == touched_days
    after = _file_snapshot(path)
    # NOTHING on disk was rewritten — old files physically intact
    # (vacuum, not merge, deletes)
    for rel, meta in before.items():
        assert after.get(rel) == meta, f"file rewritten in place: {rel}"
    # the LIVE view: untouched days keep their original files, touched
    # days resolve ONLY to fresh staged files
    _, live = read_manifest(path)
    for rel in live:
        day = rel.split("/")[0].split("=", 1)[1]
        if day in touched_days:
            assert rel not in before, f"superseded file still live: {rel}"
        else:
            assert rel in before, f"untouched day's live file changed: {rel}"
    for day in touched_days:
        part = f"event_day={day}"
        assert any(r.startswith(part) for r in live), f"missing: {part}"


def test_merge_readback_is_partition_pruned(spark):
    """The read-back of old state must carry PartitionFilters on
    event_day — at 100 TB this is the difference between scanning the
    touched days and scanning the MV's whole history."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        _list_data_files,
        publish_manifest,
    )

    ev = _events_with_day(spark, SF_DIR)
    path = tempfile.mkdtemp(prefix="csb_mv_prune_") + "/mv"
    _state(ev).write.partitionBy("event_day").parquet(path)
    publish_manifest(path, _list_data_files(path), note="initial")
    day = ev.agg(F.max("event_day")).collect()[0][0]
    # the EXACT read shape merge_increment uses: manifest-aware scan,
    # partition column cast to string, THEN the day filter — Catalyst
    # pushes the cast-compare into PartitionFilters (verified here, not
    # assumed), so the merge read-back stays O(touched partitions)
    scan = (
        read_index(spark, path)
        .withColumn("event_day", F.col("event_day").cast("string"))
        .filter(F.col("event_day").isin([day]))
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_day" in m.group(1), plan
    # pruning is effective, not just syntactic: one partition scanned
    n_parts = scan.select("event_day").distinct().count()
    assert n_parts == 1


def test_late_data_merges_exactly(spark):
    """Hand-built late-arrival fixture: a row for an OLD day arrives in
    the increment; the merged state for that day must equal the
    full-recompute state bit for bit (the decimal-sum algebra)."""
    rows = [
        # event_id, day, type, value
        (1, "2024-01-01", "view", 1.25),
        (2, "2024-01-01", "view", 2.5),
        (3, "2024-01-02", "click", 0.75),
    ]
    late = [(4, "2024-01-01", "view", 10.125)]  # lands in day 1
    new = [(5, "2024-01-03", "view", 3.0)]
    schema = "event_id long, event_day string, event_type string, value double"
    base = spark.createDataFrame(rows, schema)
    inc = spark.createDataFrame(late + new, schema)
    path = tempfile.mkdtemp(prefix="csb_mv_late_") + "/mv"
    _state(base).write.partitionBy("event_day").parquet(path)
    touched = merge_increment(spark, inc, path)
    assert set(touched) == {"2024-01-01", "2024-01-03"}
    merged = {
        (str(r.event_day), r.event_type): (
            r.n_events,
            r.n_val,
            float(r.sum_dec),
            r.min_value,
            r.max_value,
        )
        for r in read_index(spark, path).collect()
    }
    full = {
        (r.event_day, r.event_type): (
            r.n_events,
            r.n_val,
            float(r.sum_dec),
            r.min_value,
            r.max_value,
        )
        for r in _state(base.unionByName(inc)).collect()
    }
    assert merged == full


def test_streaming_maintenance_foreachbatch(spark, tmp_path):
    """Continuous maintenance: a micro-batch stream of increments
    drained one file per trigger through merge_stream_increment must
    leave the MV identical to the full recompute over everything the
    stream delivered."""
    from cognitive_score_bigdata_spark.queries.mv_maintenance import (
        merge_stream_increment,
    )

    schema = "event_id long, event_day string, event_type string, value double"
    base = spark.createDataFrame(
        [(1, "2024-02-01", "view", 1.5), (2, "2024-02-01", "click", 2.25)],
        schema,
    )
    path = str(tmp_path / "mv")
    _state(base).write.partitionBy("event_day").parquet(path)

    drop = tmp_path / "drop"
    drop.mkdir()
    batches = [
        [(3, "2024-02-02", "view", 4.5)],
        [(4, "2024-02-01", "view", 0.125)],  # late into the old day
        [(5, "2024-02-03", "click", 7.0), (6, "2024-02-02", "view", 1.0)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(drop / f"b{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: merge_stream_increment(spark, b, path, bid)
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    everything = base.unionByName(
        spark.createDataFrame(sum(batches, []), schema)
    )
    got = {
        (str(r.event_day), r.event_type): (r.n_events, float(r.sum_dec))
        for r in read_index(spark, path).collect()
    }
    want = {
        (r.event_day, r.event_type): (r.n_events, float(r.sum_dec))
        for r in _state(everything).collect()
    }
    assert got == want


def test_stream_merge_replay_is_fenced(spark, tmp_path):
    """Re-delivery of a committed batch_id must be a no-op: aggregation
    state double-counts under replay (unlike the additive dedup index).
    The fence lives in the manifest's meta, committed with the merged
    content in one flip."""
    from cognitive_score_bigdata_spark.queries.mv_maintenance import (
        merge_stream_increment,
    )

    schema = "event_id long, event_day string, event_type string, value double"
    base = spark.createDataFrame([(1, "2024-03-01", "view", 2.0)], schema)
    path = str(tmp_path / "mv")
    _state(base).write.partitionBy("event_day").parquet(path)
    inc = spark.createDataFrame([(2, "2024-03-01", "view", 3.0)], schema)

    assert merge_stream_increment(spark, inc, path, 7) is True
    assert read_manifest_meta(path).get("batch_ids") == [7]
    snap = {
        (str(r.event_day), r.event_type): (r.n_events, float(r.sum_dec))
        for r in read_index(spark, path).collect()
    }
    assert snap[("2024-03-01", "view")] == (2, 5.0)
    # replay: same batch id again — fenced, state unchanged
    assert merge_stream_increment(spark, inc, path, 7) is False
    again = {
        (str(r.event_day), r.event_type): (r.n_events, float(r.sum_dec))
        for r in read_index(spark, path).collect()
    }
    assert again == snap


def test_merge_commit_is_reader_atomic_and_crash_safe(spark, tmp_path):
    """The upgrade over rounds ≤11's dynamic partition overwrite +
    side-car ledger (which had a documented residual window): (a) a
    reader DURING the merge — after the merged day files are staged,
    before the manifest flip — resolves the byte-identical OLD MV;
    (b) a crash in that window leaves the live MV untouched and the
    fence unrecorded, so replaying the SAME batch merges exactly once;
    (c) vacuum sweeps the crashed attempt's staged files."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_manifest,
    )
    from cognitive_score_bigdata_spark.queries.mv_maintenance import (
        merge_stream_increment,
    )

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        _list_data_files,
        publish_manifest,
    )

    schema = "event_id long, event_day string, event_type string, value double"
    base = spark.createDataFrame(
        [(1, "2024-04-01", "view", 2.0), (2, "2024-04-02", "click", 1.0)],
        schema,
    )
    path = str(tmp_path / "mv")
    _state(base).write.partitionBy("event_day").parquet(path)
    # reader-atomicity holds from the first PUBLISHED manifest on (a
    # legacy plain-directory MV's first merge bootstraps one, but a
    # reader racing THAT bootstrap directory-scans staged files too —
    # which is why maintained_mv_path publishes at build time)
    publish_manifest(path, _list_data_files(path), note="initial")
    inc = spark.createDataFrame([(3, "2024-04-01", "view", 3.5)], schema)

    def view():
        return {
            (str(r.event_day), r.event_type): (r.n_events, float(r.sum_dec))
            for r in read_index(spark, path).collect()
        }

    before = view()
    seen = {}

    def reader_mid_merge():
        seen["view"] = view()
        seen["manifest"] = read_manifest(path)

    merge_increment(spark, inc, path, _before_publish=reader_mid_merge)
    assert seen["view"] == before  # old XOR new, never a mix
    assert seen["manifest"][0] == 1  # still the initial manifest
    after = view()
    assert after[("2024-04-01", "view")] == (2, 5.5)

    # crash window: staged but never published
    path2 = str(tmp_path / "mv2")
    _state(base).write.partitionBy("event_day").parquet(path2)
    publish_manifest(path2, _list_data_files(path2), note="initial")
    before2 = {
        (str(r.event_day), r.event_type): (r.n_events, float(r.sum_dec))
        for r in read_index(spark, path2).collect()
    }

    def boom():
        raise RuntimeError("simulated crash before the manifest flip")

    try:
        merge_increment(spark, inc, path2, _before_publish=boom)
        raise AssertionError("crash should propagate")
    except RuntimeError:
        pass
    view2 = {
        (str(r.event_day), r.event_type): (r.n_events, float(r.sum_dec))
        for r in read_index(spark, path2).collect()
    }
    assert view2 == before2
    assert read_manifest_meta(path2).get("batch_ids") is None
    # replay of the same logical batch through the STREAM hook merges
    # exactly once (fence was never recorded)
    assert merge_stream_increment(spark, inc, path2, 9) is True
    final = {
        (str(r.event_day), r.event_type): (r.n_events, float(r.sum_dec))
        for r in read_index(spark, path2).collect()
    }
    assert final[("2024-04-01", "view")] == (2, 5.5)
    swept = vacuum_index(path2, keep_versions=2)
    assert swept, "crashed attempt's staged files should be swept"
    assert {
        (str(r.event_day), r.event_type): (r.n_events, float(r.sum_dec))
        for r in read_index(spark, path2).collect()
    } == final


def test_combine_is_merge_order_insensitive(spark):
    """Splitting the same rows 3 ways and combining in any grouping
    must give identical state — the property the decimal sum buys and
    a double sum would not."""
    ev = _events_with_day(spark, SF_DIR).limit(600)
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    one = {
        (r.event_day, r.event_type): (r.n_events, float(r.sum_dec))
        for r in _state(ev).collect()
    }
    staged = _combine(
        _combine(
            _state(parts[0]).unionByName(_state(parts[1]))
        ).unionByName(_state(parts[2]))
    )
    two = {
        (r.event_day, r.event_type): (r.n_events, float(r.sum_dec))
        for r in staged.collect()
    }
    assert one == two
