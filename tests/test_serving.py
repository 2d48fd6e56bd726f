"""Serving-edge tests: the dashboard payload contract
(main.py:133-173 parity — shapes, thresholds, null handling, string
timestamps, int truncation)."""

from __future__ import annotations

import datetime

from cognitive_score_bigdata_spark.serving import dashboard_stats


def test_dashboard_payload_contract(spark):
    users = spark.createDataFrame(
        [("u1", datetime.date(1990, 1, 1), "Keto"),
         ("u2", datetime.date(1985, 5, 5), "Vegan")],
        "user_id string, date_of_birth date, diet_type string",
    )
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    cs = spark.createDataFrame(
        [
            ("c1", "u1", "e1", ts, 42),                      # critical
            ("c2", "u2", "e2", ts.replace(hour=13), 88),     # normal
            ("c3", "u1", "e3", ts.replace(hour=14), 49),     # critical
        ],
        "cs_id string, user_id string, event_id string, "
        "timestamp timestamp, cognitive_score int",
    )
    tr = spark.createDataFrame(
        [("t1", "u1", "e1", ts, 95)],  # exact-ts match only for c1
        "tr_id string, user_id string, event_id string, "
        "timestamp timestamp, heart_rate int",
    )

    payload = dashboard_stats(users, cs, tr)

    assert payload["critical_alerts"] == 2
    assert payload["avg_cognitive_score"] == int((42 + 88 + 49) / 3)
    checks = payload["recent_checks"]
    assert len(checks) == 3
    assert checks[0]["timestamp"] > checks[-1]["timestamp"]  # recency order
    by_id = {(c["user_id"], c["cognitive_score"]): c for c in checks}
    assert by_id[("u1", 42)]["heart_rate"] == 95  # joined at exact ts
    assert by_id[("u1", 49)]["heart_rate"] == 0  # null → 0 default
    assert by_id[("u1", 42)]["status"] == "Critical"
    assert by_id[("u2", 88)]["status"] == "Normal"
    assert isinstance(checks[0]["timestamp"], str)  # JSON edge: strings


def test_dashboard_empty_tables(spark):
    users = spark.createDataFrame(
        [], "user_id string, date_of_birth date, diet_type string"
    )
    cs = spark.createDataFrame(
        [],
        "cs_id string, user_id string, event_id string, "
        "timestamp timestamp, cognitive_score int",
    )
    tr = spark.createDataFrame(
        [],
        "tr_id string, user_id string, event_id string, "
        "timestamp timestamp, heart_rate int",
    )
    payload = dashboard_stats(users, cs, tr)
    assert payload == {
        "recent_checks": [],
        "critical_alerts": 0,
        "avg_cognitive_score": 0,
    }
