"""Operator-library tests: as-of join against a naive reference
formulation, salted join/agg equivalence to unsalted plans, and the two
latest-per-key variants agreeing with each other."""

from __future__ import annotations

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.joins import (
    asof_join,
    latest_per_key,
    latest_per_key_agg,
)
from cognitive_score_bigdata_spark.operators.skew import (
    salted_join,
    salted_two_stage_agg,
)
from tests.conftest import SF_DIR


def test_asof_matches_naive_formulation(spark):
    """Union-tag as-of join == (range join + max_by) on real data."""
    events = load_table(spark, SF_DIR, "events")
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("rts"), F.col("value").alias("rvalue")
    )

    got = {
        (r["event_id"], r["rts"], r["rvalue"])
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts"
        ).collect()
    }

    naive = (
        left.join(right, "user_id", "left")
        .filter((F.col("rts") <= F.col("ts")) | F.col("rts").isNull())
        .groupBy("event_id")
        .agg(
            F.max_by(F.struct("rts", "rvalue"), "rts").alias("m"),
        )
        .select("event_id", "m.rts", "m.rvalue")
    )
    # left rows with no match at all are absent from the naive inner
    # filter path; re-add them via the original left side
    matched = {r["event_id"]: (r["rts"], r["rvalue"]) for r in naive.collect()}
    expected = set()
    for r in left.collect():
        rts, rvalue = matched.get(r["event_id"], (None, None))
        expected.add((r["event_id"], rts, rvalue))
    assert got == expected


def test_asof_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 50), (3, "v", 10)],
        "id long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("u", 100, "exact"), ("u", 60, "older"), ("u", 101, "future")],
        "k string, ts long, tag string",
    )
    rows = {
        r["id"]: r["tag"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["tag"], suffix="_r"
        ).collect()
    }
    assert rows[1] == "exact"  # <= is inclusive
    assert rows[2] is None  # only future/older-than-50? 60>50, 100>50 → none ≤ 50
    assert rows[3] is None  # key with no right rows at all


def test_asof_tied_right_ts_deterministic(spark):
    """Two right rows sharing (key, right_ts): the greatest payload
    struct must win regardless of partition layout, so repeated runs
    under different parallelism agree."""
    left = spark.createDataFrame([(1, "u", 100)], "id long, k string, ts long")
    right = spark.createDataFrame(
        [("u", 90, "aaa"), ("u", 90, "zzz")], "k string, ts long, tag string"
    )
    winners = set()
    for n in (1, 2, 8):
        rows = asof_join(
            left.repartition(n), right.repartition(n), on="k",
            left_ts="ts", right_ts="ts", right_cols=["tag"],
        ).collect()
        winners.add(rows[0]["tag"])
    assert winners == {"zzz"}


def test_latest_per_key_variants_agree(spark):
    events = load_table(spark, SF_DIR, "events")
    via_window = {
        (r["user_id"], r["ts"], r["value"])
        for r in latest_per_key(events, "user_id", "ts", tiebreak="event_id")
        .select("user_id", "ts", "value")
        .collect()
    }
    via_agg = {
        (r["user_id"], r["ts"], r["value"])
        for r in latest_per_key_agg(events, "user_id", "ts", ["value"])
        .select("user_id", "ts", "value")
        .collect()
    }
    assert via_window == via_agg


def test_salted_join_equals_plain(spark):
    events = load_table(spark, SF_DIR, "events").withColumnRenamed(
        "user_id", "c_custkey"
    )
    customer = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name"
    )
    plain = {
        (r["event_id"], r["c_name"])
        for r in events.join(customer, "c_custkey").select(
            "event_id", "c_name"
        ).collect()
    }
    salted = {
        (r["event_id"], r["c_name"])
        for r in salted_join(
            events, customer, on="c_custkey", unique_col="event_id", n_salts=7
        ).select("event_id", "c_name").collect()
    }
    assert salted == plain


def test_salted_two_stage_agg_equals_plain(spark):
    events = load_table(spark, SF_DIR, "events")
    plain = {
        (r["event_type"], r["n"], r["users"])
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
        )
        .collect()
    }
    two_stage = {
        (r["event_type"], r["n"], r["users"])
        for r in salted_two_stage_agg(
            events,
            keys=["event_type"],
            unique_col="event_id",
            partial_aggs=[
                F.count(F.lit(1)).alias("pn"),
                F.collect_set("user_id").alias("pu"),
            ],
            final_aggs=[
                F.sum("pn").alias("n"),
                F.size(F.array_distinct(F.flatten(F.collect_list("pu")))).cast(
                    "bigint"
                ).alias("users"),
            ],
            n_salts=5,
        ).collect()
    }
    assert two_stage == plain


def test_percentile_approx_brackets_exact(spark):
    """approx_percentile must land within the exact p40-p60 band."""
    li = load_table(spark, SF_DIR, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
            F.expr("percentile(l_extendedprice, 0.4)").alias("lo"),
            F.expr("percentile(l_extendedprice, 0.6)").alias("hi"),
        )
        .collect()
    )
    for r in rows:
        assert r["lo"] <= r["approx"] <= r["hi"]


def test_rolling_fingerprint_order_sensitive(spark):
    from cognitive_score_bigdata_spark.functions.text import (
        rolling_fingerprint,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", rolling_fingerprint("text").alias("fp")
        ).collect()
    }
    assert fps[1] == fps[3]  # identical text → identical fingerprint
    assert fps[1] != fps[2]  # permuted tokens → different fingerprint


def test_fan_out_restores_parallelism_and_noops_when_wide(spark):
    from cognitive_score_bigdata_spark.io import fan_out

    narrow = spark.range(1000).coalesce(1)
    fanned = fan_out(narrow)
    assert (
        fanned.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert fanned.count() == 1000

    # already-wide input must pass through without an extra shuffle
    wide = spark.range(1000).repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    assert fan_out(wide) is wide


def test_pandas_udaf_gmean_matches_numpy(spark):
    """Grouped-agg pandas UDF must equal the local numpy geometric mean
    per group (tolerance: float summation order differs)."""
    import numpy as np

    from cognitive_score_bigdata_spark.queries import load_registry
    from tests.conftest import SF_DIR

    fn = load_registry()["agg_pandas_udaf_gmean"].fn
    got = {r["event_type"]: r["gmean_value"] for r in fn(spark, SF_DIR).collect()}

    from cognitive_score_bigdata_spark.io import load_table
    import pyspark.sql.functions as F

    rows = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value") > 0)
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        exact = float(np.exp(np.mean(np.log(np.array(vals)))))
        assert abs(got[t] - exact) / exact < 1e-9, (t, got[t], exact)
