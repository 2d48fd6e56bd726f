"""Streaming pipeline tests (SURVEY §2.9 T1-T7, §3.1): deterministic
file-source micro-batches exercising enrichment, routing, dual sink,
event-time latest-state, duplicate suppression, and idempotent re-merge."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from cognitive_score_bigdata_spark.streaming.pipeline import (
    EVENT_SCHEMA,
    enrich,
    route,
    run_ingest_pipeline,
    upsert_latest_state,
    write_raw_batch,
)

BASE_TS = 1_700_000_000.0


def _tracking(user, ts, hr, steps=100, cal=5, event_id=None):
    return {
        "user_id": user,
        "device_id": f"dev_{user[:8]}",
        "schema": "tracking_v1",
        "cognitive_predict": False,
        "steps": steps,
        "distance": 0.02,
        "heart_rate": hr,
        "calories": cal,
        "timestamp": str(ts),
        "event_id": event_id or f"ev-{user}-{ts}",
    }


def _manual(user, ts):
    return {
        "user_id": user,
        "device_id": f"phone_{user[:8]}",
        "schema": "manual_entry_v1",
        "cognitive_predict": True,
        "sleep_duration": 7.5,
        "stress_level": 4,
        "caffeine_intake": 100,
        "screen_time": 3.2,
        "timestamp": str(ts),
        "event_id": f"ev-m-{user}-{ts}",
    }


def _write_batch(dir_, name, events):
    path = os.path.join(dir_, name)
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    d = {
        k: str(tmp_path / k) for k in ("input", "raw", "state", "chk", "chk2")
    }
    os.makedirs(d["input"])
    return d


def _run(spark, d):
    q = run_ingest_pipeline(
        spark, d["input"], d["raw"], d["state"], d["chk"], available_now=True
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_dual_sink_and_event_time_state(spark, dirs):
    events = [
        _tracking("alice", BASE_TS + 100, hr=70),
        _tracking("alice", BASE_TS + 300, hr=90),  # newest for alice
        _tracking("alice", BASE_TS + 200, hr=80),  # out of order
        _tracking("bob", BASE_TS + 50, hr=65),
        _manual("alice", BASE_TS + 400),  # manual entry: not state material
        {**_tracking("ghost", BASE_TS + 10, hr=99), "user_id": None},  # dropped
        _tracking("carol", BASE_TS + 10, hr=75, event_id="dup-1"),
        _tracking("carol", BASE_TS + 10, hr=75, event_id="dup-1"),  # duplicate
    ]
    _write_batch(dirs["input"], "batch1.json", events)
    _run(spark, dirs)

    # Cold path: raw lake is date-partitioned and keeps BOTH shapes
    raw = spark.read.parquet(dirs["raw"])
    assert "ingest_date" in raw.columns
    assert raw.filter(F.col("schema") == "manual_entry_v1").count() == 1
    # duplicate event_id suppressed before both sinks (T5)
    assert raw.filter(F.col("event_id") == "dup-1").count() == 1

    # Hot path: one row per user, event-time latest (not arrival order)
    state = spark.read.parquet(dirs["state"])
    rows = {r["user_id"]: r for r in state.collect()}
    assert set(rows) == {"alice", "bob", "carol"}  # null key dropped (P3)
    assert float(rows["alice"]["heart_rate"]) == 90.0  # ts+300 wins, not +200
    assert rows["alice"]["bucket"] is not None


def test_cross_batch_state_merge(spark, dirs):
    _write_batch(
        dirs["input"], "b1.json", [_tracking("alice", BASE_TS + 1000, hr=88)]
    )
    _run(spark, dirs)
    # second batch: one LATE event for alice (must lose) + one new user
    _write_batch(
        dirs["input"],
        "b2.json",
        [
            _tracking("alice", BASE_TS + 500, hr=60),
            _tracking("dave", BASE_TS + 2000, hr=77),
        ],
    )
    q = run_ingest_pipeline(
        spark, dirs["input"], dirs["raw"], dirs["state"], dirs["chk"]
    )
    q.awaitTermination(120)

    state = spark.read.parquet(dirs["state"])
    rows = {r["user_id"]: r for r in state.collect()}
    assert set(rows) == {"alice", "dave"}
    assert float(rows["alice"]["heart_rate"]) == 88.0  # late data lost (event time)
    assert float(rows["dave"]["heart_rate"]) == 77.0


def test_upsert_idempotent_replay(spark, dirs):
    """Replaying the same micro-batch must leave the state unchanged
    (foreachBatch may redeliver after failure)."""
    batch = enrich(
        spark.createDataFrame(
            [_tracking("erin", BASE_TS + 10, hr=81)], schema=EVENT_SCHEMA
        )
    )
    upsert_latest_state(spark, batch, dirs["state"])
    first = sorted(map(str, spark.read.parquet(dirs["state"]).collect()))
    upsert_latest_state(spark, batch, dirs["state"])  # replay
    second = sorted(map(str, spark.read.parquet(dirs["state"]).collect()))
    assert first == second


def test_raw_batch_idempotent_replay(spark, dirs):
    """Replaying a raw-lake micro-batch write must not duplicate rows
    (failure between the write and the checkpoint commit redelivers),
    while distinct batch_ids accumulate."""
    batch = enrich(
        spark.createDataFrame(
            [_tracking("erin", BASE_TS + 10, hr=81)], schema=EVENT_SCHEMA
        )
    )
    write_raw_batch(batch, 0, dirs["raw"])
    write_raw_batch(batch, 0, dirs["raw"])  # replay of the same batch
    assert spark.read.parquet(dirs["raw"]).count() == 1
    write_raw_batch(batch, 1, dirs["raw"])  # a genuinely new batch
    assert spark.read.parquet(dirs["raw"]).count() == 2


def test_routing_and_enrichment(spark):
    incomplete = {
        "user_id": "zoe",
        "device_id": "dev_zoe",
        "schema": "tracking_v1",
        "cognitive_predict": False,
        "steps": 5,
        "distance": 0.01,
        "heart_rate": 100,
        "calories": 2,
        # no timestamp, no event_id → P9 must default both
    }
    df = enrich(
        spark.createDataFrame(
            [incomplete, _manual("yan", BASE_TS)], schema=EVENT_SCHEMA
        )
    )
    shapes = route(df)
    assert shapes["tracking_v1"].count() == 1
    assert shapes["manual_entry_v1"].count() == 1
    row = shapes["tracking_v1"].collect()[0]
    assert row["event_id"] is not None and row["ts"] is not None


def test_stateful_latest_state_stream(spark, tmp_path):
    """applyInPandasWithState latest-state (T4 state-store form): state
    survives across separate availableNow runs via the checkpoint, and
    event-time ordering beats arrival order."""
    import json
    import os

    from cognitive_score_bigdata_spark.streaming.pipeline import (
        enrich,
        read_event_stream,
    )
    from cognitive_score_bigdata_spark.streaming.stateful import (
        latest_state_stream,
    )

    input_dir, out_dir, chk = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "chk"),
    )
    os.makedirs(input_dir)

    def run_batch(events):
        n = len(os.listdir(input_dir))
        with open(f"{input_dir}/b{n}.json", "w") as f:
            for e in events:
                f.write(json.dumps(e) + "\n")
        stream = latest_state_stream(enrich(read_event_stream(spark, input_dir)))

        def sink(batch, _):
            batch.write.mode("append").parquet(out_dir)

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", chk)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch([_tracking("u1", BASE_TS + 300, hr=90)])
    # second run: LATE event for u1 (must lose to checkpointed state)
    # plus a new user
    run_batch(
        [
            _tracking("u1", BASE_TS + 100, hr=60),
            _tracking("u2", BASE_TS + 400, hr=70),
        ]
    )

    out = spark.read.parquet(out_dir)
    # latest emitted row per user is the final state
    latest = {
        r["user_id"]: r
        for r in out.orderBy("ts_micros")
        .groupBy("user_id")
        .agg(
            F.max_by(F.struct("heart_rate", "ts_micros"), "ts_micros").alias("s")
        )
        .select("user_id", "s.heart_rate", "s.ts_micros")
        .collect()
    }
    assert latest["u1"]["heart_rate"] == 90.0  # late event did not regress state
    assert latest["u2"]["heart_rate"] == 70.0


def test_watermark_drops_late_events(spark, tmp_path):
    """T5/T6 in true streaming mode: with a 10-minute watermark and
    1-file micro-batches, an event arriving after its window's state was
    finalized AND evicted is dropped; append mode emits each finalized
    window exactly once.

    Spark semantics pinned here: a late row landing in the same batch
    where its window is finalized is still aggregated (state not yet
    evicted); only post-eviction arrivals are dropped — so the late file
    arrives one batch after the window's emission.
    """
    from cognitive_score_bigdata_spark.streaming.pipeline import (
        enrich,
        read_event_stream,
    )
    from cognitive_score_bigdata_spark.streaming.windows import (
        windowed_event_counts,
    )

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(input_dir)

    HOUR = 3600.0
    # file order = arrival order (one file per micro-batch); the file
    # source orders by modification time, so pin distinct mtimes or the
    # "late" file may be picked up before the watermark advances
    _write_batch(
        input_dir, "b0.json", [_tracking("u1", BASE_TS + 0 * HOUR, hr=70)]
    )
    _write_batch(
        input_dir,
        "b1.json",
        [_tracking("u1", BASE_TS + 2 * HOUR, hr=71)],  # advances watermark
    )
    _write_batch(
        input_dir,
        "b2.json",
        # advances further; first window is emitted+evicted this batch
        [_tracking("u1", BASE_TS + 2.5 * HOUR, hr=72)],
    )
    _write_batch(
        input_dir,
        "b3.json",
        [
            # hours-late event for the long-evicted first window → drop
            _tracking("u1", BASE_TS + 60, hr=73, event_id="late-1"),
            _tracking("u1", BASE_TS + 3 * HOUR, hr=74),
        ],
    )
    now = 1_700_000_000
    for i, name in enumerate(["b0.json", "b1.json", "b2.json", "b3.json"]):
        os.utime(f"{input_dir}/{name}", (now + 10 * i, now + 10 * i))

    events = enrich(
        read_event_stream(spark, input_dir, max_files_per_trigger=1)
    )
    counts = windowed_event_counts(
        events, duration="5 minutes", watermark="10 minutes"
    )

    def sink(batch, _):
        batch.write.mode("append").parquet(out_dir)

    q = (
        counts.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.read.parquet(out_dir).collect()
    by_window = {r["window_start"]: r["n_events"] for r in out}
    first_window = min(by_window)
    # the late event did NOT land in the first (already-finalized) window
    assert by_window[first_window] == 1
    # and each finalized window was emitted exactly once
    assert len(out) == len(by_window)


def test_parse_events_permissive_dead_letter_split(spark):
    """One malformed producer must not poison the batch: valid rows
    parse and keep their fields, garbage rows land in the dead-letter
    frame with their raw payload intact (for quarantine + replay), and
    rows missing the partition key (user_id) are quarantined too."""
    import json as _json

    import pyspark.sql.functions as F

    from cognitive_score_bigdata_spark.streaming.pipeline import (
        parse_events_permissive,
    )

    good = _json.dumps(
        {
            "user_id": "alice",
            "device_id": "d1",
            "schema": "tracking_v1",
            "cognitive_predict": False,
            "steps": 100,
            "timestamp": "1700000000.0",
        }
    )
    no_key = _json.dumps({"device_id": "d2", "schema": "tracking_v1"})
    garbage = "{not json at all"
    raw = spark.createDataFrame(
        [(good,), (no_key,), (garbage,)], "value string"
    )

    ok, dead = parse_events_permissive(raw)
    ok_rows = ok.collect()
    assert len(ok_rows) == 1 and ok_rows[0]["user_id"] == "alice"
    assert ok_rows[0]["steps"] == 100
    assert "_corrupt_record" not in ok.columns

    dead_rows = {r["raw_payload"] for r in dead.collect()}
    assert dead_rows == {no_key, garbage}


def test_aggregate_maintenance_counts_and_replay(spark, tmp_path):
    """Incremental aggregate view: per-(user, day) counts/sums over the
    backlog equal the batch answer, and a full replay (fresh checkpoint)
    leaves the view unchanged — per-epoch partial overwrite, associative
    fold."""
    from cognitive_score_bigdata_spark.streaming.aggregates import (
        compact_aggregate_partials,
        read_aggregate_view,
        run_aggregate_maintenance,
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    events = [
        _tracking("alice", BASE_TS + 10, 70, steps=100),
        _tracking("alice", BASE_TS + 20, 71, steps=50),
        _tracking("bob", BASE_TS + 30, 80, steps=30),
        # next day (+86400s)
        _tracking("alice", BASE_TS + 86_500, 72, steps=10),
    ]
    with open(os.path.join(in_dir, "b1.json"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    partials = str(tmp_path / "partials")
    expected = {
        ("alice", "2023-11-14"): (2, 150),
        ("bob", "2023-11-14"): (1, 30),
        ("alice", "2023-11-15"): (1, 10),
    }

    def view_dict():
        return {
            (r["user_id"], str(r["day"])): (r["n_events"], r["sum_steps"])
            for r in read_aggregate_view(spark, partials).collect()
        }

    for run in (1, 2):  # run 2 = full replay with a new checkpoint
        q = run_aggregate_maintenance(
            spark, in_dir, partials, str(tmp_path / f"ckpt{run}")
        )
        q.awaitTermination(300)
        assert view_dict() == expected, f"run {run}"

    compacted = str(tmp_path / "compacted")
    compact_aggregate_partials(spark, partials, compacted)
    got = {
        (r["user_id"], str(r["day"])): (r["n_events"], r["sum_steps"])
        for r in read_aggregate_view(spark, compacted).collect()
    }
    assert got == expected


def test_transition_stream_state_carries_across_batches(spark, tmp_path):
    """Order-sensitive stateful streaming (streaming/transitions.py):
    with a two-file time-split drained one file per trigger, the
    boundary transition (a user's last event of batch 1 -> first event
    of batch 2) must come from the STATE STORE, and the full emitted
    set must equal the batch lag-window answer."""
    import json
    import os
    import time as _time

    from cognitive_score_bigdata_spark.streaming.transitions import (
        transition_stream,
    )

    rows = [
        # user 1: a->b in file1, then b->c, c->a in file2 (boundary b->c)
        (1, "a", 100, 1), (1, "b", 200, 2),
        (1, "c", 300, 3), (1, "a", 400, 4),
        # user 2: single event in file1, one more in file2 (boundary d->e)
        (2, "d", 150, 5), (2, "e", 250, 6),
    ]
    f1 = [r for r in rows if r[2] < 250]
    f2 = [r for r in rows if r[2] >= 250]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, batch in enumerate((f1, f2)):
        p = in_dir / f"part-{i}.json"
        p.write_text(
            "\n".join(
                json.dumps(
                    {
                        "user_id": u,
                        "event_type": t,
                        "ts_us": ts,
                        "event_id": e,
                    }
                )
                for u, t, ts, e in batch
            )
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        _time.sleep(0.05)
    got = transition_stream(
        spark,
        str(in_dir),
        str(tmp_path / "ckpt"),
        query_name="csb_markov_test_carry",
        max_files_per_trigger=1,
    )
    pairs = {
        (r["user_id"], r["prev_type"], r["next_type"])
        for r in got.collect()
    }
    # batch answer: lag over (user, ts, id)
    expect = set()
    by_user: dict = {}
    for u, t, ts, e in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
        if u in by_user:
            expect.add((u, by_user[u], t))
        by_user[u] = t
    assert pairs == expect == {
        (1, "a", "b"), (1, "b", "c"), (1, "c", "a"), (2, "d", "e"),
    }


def test_transition_stream_late_batch_does_not_regress_state(
    spark, tmp_path
):
    """A micro-batch wholly OLDER than the stored last event (late
    arrival across batches) must not overwrite the carried state: the
    next on-time batch chains off the max (ts_us, event_id) seen so
    far, not off the late batch's tail (ADVICE r5: state.update was
    unconditional, so one late batch corrupted all future boundaries).
    The late batch's own EMISSION is still the documented cross-batch
    reorder limit — only state monotonicity is pinned here."""
    import json
    import os
    import time as _time

    from cognitive_score_bigdata_spark.streaming.transitions import (
        transition_stream,
    )

    files = [
        [(1, "a", 100, 1), (1, "b", 200, 2)],  # on-time: state -> b@200
        [(1, "x", 50, 0)],  # LATE: entirely before b@200
        [(1, "c", 300, 3)],  # on-time: must chain b->c, NOT x->c
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, batch in enumerate(files):
        p = in_dir / f"part-{i}.json"
        p.write_text(
            "\n".join(
                json.dumps(
                    {
                        "user_id": u,
                        "event_type": t,
                        "ts_us": ts,
                        "event_id": e,
                    }
                )
                for u, t, ts, e in batch
            )
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        _time.sleep(0.05)
    got = transition_stream(
        spark,
        str(in_dir),
        str(tmp_path / "ckpt"),
        query_name="csb_markov_test_late",
        max_files_per_trigger=1,
    )
    pairs = {(r["prev_type"], r["next_type"]) for r in got.collect()}
    assert ("b", "c") in pairs  # chained off the non-regressed state
    assert ("x", "c") not in pairs  # the late tail did NOT become state
