"""Full-system integration: every subsystem of the engine chained the
way the reference deploys them (SURVEY §3):

CSV seed ETL → relational tables          (§3.1 cold load, db_loader)
simulator → streaming ingest → raw lake + latest state   (§3.1 hot path)
ML train → streaming scoring → scores table              (§3.2)
dashboard query over the produced tables                 (§3.3)
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from cognitive_score_bigdata_spark.ml.pipeline import train
from cognitive_score_bigdata_spark.sources.cpms_etl import run_etl
from cognitive_score_bigdata_spark.sources.fixtures import generate_cpms_csvs
from cognitive_score_bigdata_spark.sources.simulator import (
    gen_manual_entry_events,
    gen_tracking_events,
    write_event_files,
)
from cognitive_score_bigdata_spark.streaming.pipeline import run_ingest_pipeline
from cognitive_score_bigdata_spark.streaming.scoring import score_stream


def test_full_cpms_pipeline(spark, tmp_path):
    root = str(tmp_path)

    # ---- cold load: CSVs → relational parquet (§3.1 batch ETL)
    csv_dir, table_dir = f"{root}/csv", f"{root}/tables"
    expected = generate_cpms_csvs(csv_dir, n_users=20, seed=7)
    counts = run_etl(
        spark,
        f"{csv_dir}/users.csv",
        f"{csv_dir}/cognitive_scores.csv",
        f"{csv_dir}/tracking_risks.csv",
        table_dir,
    )
    assert counts["users"] == 20
    assert counts["cognitive_scores"] == expected["owned_scores"]

    # ---- hot path: simulated stream → raw lake + latest state
    drop_dir = f"{root}/drop"
    os.makedirs(drop_dir)
    tracking = gen_tracking_events(spark, n=60, n_users=6, seed=1)
    manual = gen_manual_entry_events(spark, n=12, n_users=6, seed=2)
    write_event_files(tracking, drop_dir, files=3)
    write_event_files(manual, drop_dir, files=1)

    q = run_ingest_pipeline(
        spark, drop_dir, f"{root}/raw", f"{root}/state", f"{root}/chk_ingest"
    )
    q.awaitTermination(180)

    raw = spark.read.parquet(f"{root}/raw")
    assert raw.count() == 72  # both shapes land in the lake
    state = spark.read.parquet(f"{root}/state")
    assert state.count() == 6  # one snapshot per simulated user
    # event-time latest: each user's snapshot is their max event ts
    expected_latest = (
        raw.filter(F.col("schema") == "tracking_v1")
        .groupBy("user_id")
        .agg(F.max("ts").alias("ts"))
    )
    mismatched = (
        state.select("user_id", "ts")
        .exceptAll(expected_latest.select("user_id", "ts"))
        .count()
    )
    assert mismatched == 0

    # ---- serving path: model + streaming scoring over the same stream
    model = train(spark, seed=11)
    q2 = score_stream(
        spark,
        model,
        drop_dir,
        f"{root}/state",
        f"{root}/scores",
        f"{root}/chk_score",
    )
    q2.awaitTermination(180)
    scores = spark.read.parquet(f"{root}/scores")
    assert scores.count() == 12  # every manual entry scored, nothing else
    rows = scores.collect()
    assert all(40 <= r["score"] <= 100 for r in rows)

    # ---- dashboard (§3.3) over the produced tables: the flagship shape
    users = spark.read.parquet(f"{table_dir}/users")
    cs = spark.read.parquet(f"{table_dir}/cognitive_scores")
    tr = spark.read.parquet(f"{table_dir}/tracking_risks")
    dashboard = (
        cs.join(F.broadcast(users), "user_id")
        .join(tr, ["user_id", "timestamp"], "left")
        .select(
            "user_id",
            "cognitive_score",
            "timestamp",
            F.coalesce("heart_rate", F.lit(0)).alias("heart_rate"),
            F.when(F.col("cognitive_score") < 50, "Critical")
            .otherwise("Normal")
            .alias("status"),
        )
        .orderBy(F.desc("timestamp"))
        .limit(50)
    )
    top = dashboard.collect()
    assert 0 < len(top) <= 50
    assert {r["status"] for r in top} <= {"Critical", "Normal"}
    stats = cs.agg(
        F.count(F.when(F.col("cognitive_score") < 50, 1)).alias("critical"),
        F.avg("cognitive_score").alias("avg_score"),
    ).collect()[0]
    assert stats["critical"] >= 0 and 1 <= stats["avg_score"] <= 100
