"""Sink tests: bucketed tables must join WITHOUT a shuffle (the
co-located join guarantee), partitioned writes must prune."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.plans.audit import plan_text
from cognitive_score_bigdata_spark.sources.sinks import (
    write_bucketed,
    write_partitioned,
)
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    users = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))

    write_bucketed(
        events, "ev_bucketed", str(tmp_path / "ev"), "user_id", 8, "user_id"
    )
    write_bucketed(
        users, "us_bucketed", str(tmp_path / "us"), "user_id", 8, "user_id"
    )
    try:
        a = spark.table("ev_bucketed")
        b = spark.table("us_bucketed")
        joined = a.join(b.hint("merge"), "user_id")
        text = plan_text(joined)
        assert "SortMergeJoin" in text
        assert "Exchange" not in text, "bucketed join must not shuffle"
        # and it still returns the right answer
        assert joined.count() == events.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS us_bucketed")


def test_partitioned_write_prunes(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").withColumn(
        "ingest_date", F.to_date("ts")
    )
    path = str(tmp_path / "lake")
    write_partitioned(events, path, ["ingest_date"])

    lake = spark.read.parquet(path)
    one_day = lake.filter(F.col("ingest_date") == "2024-01-05")
    text = plan_text(one_day)
    assert "PartitionFilters" in text and "2024-01-05" in text
    expected = events.filter(F.col("ingest_date") == "2024-01-05").count()
    assert one_day.count() == expected
