"""SCD2 incremental maintenance: the merge path must be value-identical
to a from-scratch rebuild (batch parity), a replayed batch must be a
no-op (idempotence), and untouched keys must pass through unrewritten."""

from __future__ import annotations

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.scd2 import scd2_build, scd2_merge
from tests.conftest import SF_DIR

SPLIT = "2024-01-15 00:00:00"


def _frames_equal(a, b) -> bool:
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    return ka == kb


def test_merge_equals_full_rebuild(spark):
    ev = load_table(spark, SF_DIR, "events")
    e1 = ev.filter(F.col("ts") < SPLIT)
    e2 = ev.filter(F.col("ts") >= SPLIT)
    merged = scd2_merge(scd2_build(e1), e2)
    full = scd2_build(ev)
    assert _frames_equal(merged, full), "incremental != batch rebuild"


def test_merge_replay_idempotent(spark):
    ev = load_table(spark, SF_DIR, "events")
    e1 = ev.filter(F.col("ts") < SPLIT)
    e2 = ev.filter(F.col("ts") >= SPLIT)
    once = scd2_merge(scd2_build(e1), e2)
    twice = scd2_merge(once, e2)
    assert _frames_equal(once, twice), "replaying the batch changed history"


def test_merge_prunes_untouched_keys(spark):
    ev = load_table(spark, SF_DIR, "events")
    hist = scd2_build(ev.filter(F.col("ts") < SPLIT))
    batch = ev.filter(
        (F.col("ts") >= SPLIT) & (F.col("user_id") % 7 == 0)
    )
    merged = scd2_merge(hist, batch)
    untouched_before = hist.filter(F.col("user_id") % 7 != 0)
    untouched_after = merged.filter(F.col("user_id") % 7 != 0)
    assert _frames_equal(untouched_before, untouched_after)


def test_merge_new_key_starts_at_version_one(spark):
    ev = load_table(spark, SF_DIR, "events")
    known = ev.filter(F.col("user_id") != 3)
    newcomer = ev.filter(F.col("user_id") == 3)
    merged = scd2_merge(scd2_build(known), newcomer)
    v1 = (
        merged.filter(F.col("user_id") == 3)
        .agg(F.min("version"))
        .first()[0]
    )
    assert v1 == 1
    assert _frames_equal(merged, scd2_build(ev))


def test_merge_drops_late_events(spark):
    ev = load_table(spark, SF_DIR, "events")
    hist = scd2_build(ev)  # open intervals start at each key's last change
    # replaying the FULL stream: everything predates or equals the open
    # valid_from except events inside the open interval, all of which
    # carry the current status -> no changes anywhere
    merged = scd2_merge(hist, ev)
    assert _frames_equal(merged, hist)
