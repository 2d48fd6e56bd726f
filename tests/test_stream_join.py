"""Stream-stream interval join (streaming/joins.py): inner matches emit
with the interval bound enforced; unmatched requests emit as left-outer
null rows only after the watermark proves no match can arrive."""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.streaming.joins import (
    interval_join_readings,
)
from cognitive_score_bigdata_spark.streaming.pipeline import (
    enrich,
    read_event_stream,
    route,
)
from tests.test_streaming import BASE_TS, _manual, _tracking


def _write_files(dir_, batches):
    """One file per micro-batch with strictly increasing mtimes (file
    sources order by mtime; equal stamps make batch order random)."""
    os.makedirs(dir_, exist_ok=True)
    for i, events in enumerate(batches):
        path = os.path.join(dir_, f"b{i}.json")
        with open(path, "w") as f:
            for e in events:
                f.write(json.dumps(e) + "\n")
        t = time.time() + i * 2
        os.utime(path, (t, t))


def test_interval_join_matches_and_outer_nulls(spark, tmp_path):
    input_dir, out_dir, chk = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "chk"),
    )
    # Batch 1: alice reads hr at +0s and +540s; request at +600s -> both
    # qualify (within 10 min). bob requests at +600s with his only
    # reading 20 min earlier -> no match, must emit as nulls.
    # Batch 2: a flush event advances the watermark candidate
    # (wm = max_ts - 10 min > bob's request + join interval); the
    # watermark itself applies one batch LATER, so batch 3 carries
    # another flush under the advanced watermark — that's the batch in
    # which the outer row is evicted and emitted.
    _write_files(
        input_dir,
        [
            [
                _tracking("alice", BASE_TS, hr=70),
                _tracking("alice", BASE_TS + 540, hr=90),
                _tracking("bob", BASE_TS - 1200, hr=65),
                _manual("alice", BASE_TS + 600),
                _manual("bob", BASE_TS + 600),
            ],
            # the stream-stream watermark is the MIN across both input
            # branches — flush batches must advance BOTH shapes
            [
                _tracking("carol", BASE_TS + 4000, hr=80),
                _manual("carol", BASE_TS + 4000),
            ],
            [
                _tracking("carol", BASE_TS + 8000, hr=81),
                _manual("carol", BASE_TS + 8000),
            ],
        ],
    )

    events = enrich(read_event_stream(spark, input_dir, max_files_per_trigger=1))
    shapes = route(events)
    joined = interval_join_readings(
        shapes["tracking_v1"], shapes["manual_entry_v1"]
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive

    out = spark.read.parquet(out_dir)
    alice = out.filter(F.col("m_user_id") == "alice").collect()
    assert sorted(r.t_heart_rate for r in alice) == [70, 90]
    assert all(r.t_ts <= r.m_ts for r in alice)

    bob = out.filter(F.col("m_user_id") == "bob").collect()
    assert len(bob) == 1
    assert bob[0].t_heart_rate is None and bob[0].t_ts is None
