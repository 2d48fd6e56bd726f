"""Kafka edge (S2/S4) — broker-free tests.

The connector jar isn't in this sandbox, so the final ``.load()/.start()``
can't run; everything up to it can. These tests pin (a) the exact source/
sink option dicts the reference topology implies, (b) the wire-format
transformations on static Kafka-shaped frames: parse round-trips the
ingestion payload, the sink frame keys by user_id exactly like the
reference's ``PartitionKey: user_id`` (``src/ingestion.py:45-49``).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.streaming.kafka import (
    kafka_sink_options,
    kafka_source_options,
    parse_kafka_events,
    to_kafka_frame,
)
from cognitive_score_bigdata_spark.streaming.pipeline import EVENT_SCHEMA, enrich

EVENT = {
    "user_id": "alice",
    "device_id": "dev1",
    "schema": "tracking_v1",
    "cognitive_predict": False,
    "steps": 1200,
    "distance": 0.9,
    "heart_rate": 72,
    "calories": 55,
    "timestamp": "1700000000.0",
    "event_id": "ev-1",
}


def test_source_options_match_reference_consumer_contract():
    opts = kafka_source_options("broker:9092", "cpms-events",
                                max_offsets_per_trigger=10)
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "cpms-events"
    # hot_path_processor.tf:79-84: LATEST starting position, batch size 10
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "10"
    assert opts["failOnDataLoss"] == "false"


def test_sink_options():
    opts = kafka_sink_options("broker:9092", "cpms-events", "/tmp/chk")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "cpms-events",
        "checkpointLocation": "/tmp/chk",
    }


def test_parse_kafka_events_round_trip(spark):
    frames = spark.createDataFrame(
        [
            (b"alice", json.dumps(EVENT).encode()),
            (b"bob", b"not json at all"),  # dead-letterable, not fatal
        ],
        "key binary, value binary",
    )
    rows = {r["__kafka_key"]: r for r in parse_kafka_events(frames).collect()}
    good = rows["alice"]
    assert good["user_id"] == "alice" and good["heart_rate"] == 72
    assert good["schema"] == "tracking_v1"
    assert rows["bob"]["user_id"] is None  # unparseable -> nulls, stream lives


def test_sink_frame_keys_by_user_id_and_round_trips(spark):
    events = enrich(spark.createDataFrame([EVENT], schema=EVENT_SCHEMA))
    frame = to_kafka_frame(events.drop("ts", "ingest_date"))
    row = frame.collect()[0]
    assert bytes(row["key"]) == b"alice"  # PartitionKey = user_id
    body = json.loads(bytes(row["value"]))
    assert body["event_id"] == "ev-1" and body["steps"] == 1200
    # and the sink frame parses back through the source path
    back = parse_kafka_events(frame).collect()[0]
    assert back["user_id"] == "alice" and back["calories"] == 55


def test_full_wire_loop_preserves_event_set(spark):
    """events → kafka frame → parse = identity on the event columns."""
    evts = [
        {**EVENT, "user_id": f"u{i}", "event_id": f"e{i}", "steps": i}
        for i in range(20)
    ]
    df = spark.createDataFrame(evts, schema=EVENT_SCHEMA)
    looped = parse_kafka_events(to_kafka_frame(df)).drop("__kafka_key")
    assert sorted(map(str, looped.select(*df.columns).collect())) == sorted(
        map(str, df.collect())
    )
    # keys: one distinct key per user -> broker partitions by user
    keys = to_kafka_frame(df).select(F.col("key").cast("string")).distinct()
    assert keys.count() == 20


# ---------------------------------------------------------------------------
# Opt-in integration path: set KAFKA_BOOTSTRAP=host:9092 (with the
# spark-sql-kafka connector jar on the classpath) to exercise the
# broker-attached S2/S4 path. Skips cleanly in the sandbox, which has
# neither a broker nor the connector jar.
# ---------------------------------------------------------------------------

import os
import uuid

import pytest

KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")


@pytest.mark.skipif(
    not KAFKA_BOOTSTRAP,
    reason="set KAFKA_BOOTSTRAP=host:port (+ spark-sql-kafka jar on the "
    "classpath) to run the broker-attached S2/S4 round trip",
)
def test_kafka_round_trip_with_real_broker(spark):
    """S4 write keyed by user_id → S2/S6 read + wire parse, against a
    live broker: the exact path the sandbox can only test broker-free."""
    from cognitive_score_bigdata_spark.streaming.kafka import (
        kafka_source_options,
        parse_kafka_events,
        to_kafka_frame,
    )

    topic = f"csb-it-{uuid.uuid4().hex[:8]}"
    events = spark.createDataFrame([EVENT], EVENT_SCHEMA)
    (
        to_kafka_frame(events)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    opts = kafka_source_options(KAFKA_BOOTSTRAP, topic)
    opts["startingOffsets"] = "earliest"  # batch read-back of what we wrote
    frames = spark.read.format("kafka").options(**opts).load()
    parsed = parse_kafka_events(frames).collect()
    assert len(parsed) == 1
    row = parsed[0]
    assert row["user_id"] == "alice" and row["event_id"] == "ev-1"
