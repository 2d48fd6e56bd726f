"""JDBC sink (S9) — driver-jar-free tests.

No JDBC driver jar ships in this sandbox, so an actual write can't
reach a database. What CAN be pinned: the exact option contract, and
that ``write_jdbc`` drives Spark's real JDBC source far enough that the
ONLY failure is the missing driver class — proving url/dbtable/driver
options all reached the connector.
"""

from __future__ import annotations

import pytest

from cognitive_score_bigdata_spark.ml.pipeline import append_score_sinks
from cognitive_score_bigdata_spark.sources.sinks import jdbc_options, write_jdbc

URL = "jdbc:postgresql://localhost:5432/cpms"


def test_jdbc_options_contract():
    opts = jdbc_options(URL, "cognitive_scores", user="cpms", password="x")
    assert opts == {
        "url": URL,
        "dbtable": "cognitive_scores",
        "driver": "org.postgresql.Driver",
        "batchsize": "10000",
        "isolationLevel": "READ_COMMITTED",
        "user": "cpms",
        "password": "x",
    }


def test_write_jdbc_reaches_driver_lookup(spark):
    df = spark.createDataFrame([("u1", 80)], "user_id string, score int")
    with pytest.raises(Exception) as exc:
        write_jdbc(df, URL, "cognitive_scores")
    # the failure must be the missing driver CLASS, not option parsing
    assert "org.postgresql.Driver" in str(exc.value)


def test_append_score_sinks_jdbc_mode(spark):
    df = spark.createDataFrame([("u1", 80)], "user_id string, score int")
    with pytest.raises(ValueError, match="jdbc_url"):
        append_score_sinks(df, "/tmp/x", mode="jdbc")
    with pytest.raises(Exception) as exc:
        append_score_sinks(df, "/tmp/x", mode="jdbc", jdbc_url=URL)
    assert "org.postgresql.Driver" in str(exc.value)


# ---------------------------------------------------------------------------
# Opt-in integration path: set JDBC_URL (e.g.
#   JDBC_URL='jdbc:postgresql://host:5432/db' JDBC_USER=u JDBC_PASSWORD=p
# with the matching driver jar on the Spark classpath) to exercise the
# real database round trip. Skips cleanly when no endpoint exists — the
# sandbox has neither a database nor a driver jar.
# ---------------------------------------------------------------------------

import os
import uuid

JDBC_URL = os.environ.get("JDBC_URL")


@pytest.mark.skipif(
    not JDBC_URL,
    reason="set JDBC_URL (+driver jar on the classpath) to run the "
    "live-database S9 round trip",
)
def test_write_jdbc_round_trip_live(spark):
    """S9 against a live database: append rows, read them back through
    the same connector, byte-compare."""
    table = f"csb_it_{uuid.uuid4().hex[:8]}"
    creds = {
        k: v
        for k, v in {
            "user": os.environ.get("JDBC_USER"),
            "password": os.environ.get("JDBC_PASSWORD"),
        }.items()
        if v is not None
    }
    df = spark.createDataFrame(
        [("u1", 80), ("u2", 45)], "user_id string, score int"
    )
    write_jdbc(df, JDBC_URL, table, **creds)
    back = (
        spark.read.format("jdbc")
        .options(**jdbc_options(JDBC_URL, table, **creds))
        .load()
    )
    got = {(r["user_id"], r["score"]) for r in back.collect()}
    assert got == {("u1", 80), ("u2", 45)}
