"""Kafka edge for the CPMS hot path (S2 source / S4 sink parity).

The reference's hot path is a real broker: API-GW → ingestion Lambda →
Kinesis stream with 1 shard, records keyed by ``user_id``
(``/root/reference/src/ingestion.py:43-49``, ``hot_path.tf:2-10``), then a
micro-batch consumer (``src/stream_processor.py:12-54``). The Spark-native
equivalent is the built-in ``kafka`` Structured Streaming connector; this
module provides the full construction path:

- :func:`kafka_source_options` / :func:`kafka_sink_options` — the exact
  option dicts, pure functions so tests pin them without a broker;
- :func:`parse_kafka_events` — Kafka wire frame (key/value binary) →
  typed event columns, the moral twin of the file source's schema read;
- :func:`to_kafka_frame` — events → (key, value) wire frame, key =
  ``user_id`` exactly like the reference's ``PartitionKey=user_id``;
- :func:`read_event_stream_kafka` / :func:`write_stream_kafka` — wire the
  above to ``readStream``/``writeStream``.

The parse/serialize transformations are plain DataFrame ops, so they are
fully testable on static Kafka-shaped frames; only the final
``.format("kafka").load()/.start()`` needs the connector jar
(``org.apache.spark:spark-sql-kafka-0-10_2.13``) on the cluster
classpath — absent from this sandbox, so those calls are exercised only
up to construction. Everything downstream (enrich → dedup → dual sink,
``pipeline.py``) is source-agnostic and unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter

from cognitive_score_bigdata_spark.streaming.pipeline import EVENT_SCHEMA


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 1000,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Source options mirroring the reference consumer's contract:
    LATEST starting position and a bounded batch size
    (``hot_path_processor.tf:79-84``: starting_position LATEST,
    batch_size 10 → ``maxOffsetsPerTrigger``)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_sink_options(
    bootstrap_servers: str, topic: str, checkpoint_dir: str
) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def parse_kafka_events(frames: DataFrame) -> DataFrame:
    """Kafka wire frames → typed event rows.

    ``value`` holds the JSON event body (what the ingestion Lambda PUTs,
    ``ingestion.py:43-49``); ``key`` holds the partition key (user_id) and
    is kept as ``__kafka_key`` for the key-partitioning test. Unparseable
    bodies yield null event columns rather than failing the stream
    (dead-letter routing can filter ``user_id IS NULL``).
    """
    return frames.select(
        F.col("key").cast("string").alias("__kafka_key"),
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e"),
    ).select("__kafka_key", "e.*")


def to_kafka_frame(events: DataFrame) -> DataFrame:
    """Events → Kafka (key, value) frame; key = user_id, so all of one
    user's records land in one partition and per-user ordering holds —
    the reference's ``PartitionKey: user_id`` (``ingestion.py:45-49``)."""
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*events.columns)).cast("binary").alias("value"),
    )


def read_event_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 1000,
) -> DataFrame:
    """S5/S2 over a real broker. Requires the kafka connector jar on the
    classpath; plan shape past the source matches the file-source path."""
    reader = spark.readStream.format("kafka").options(
        **kafka_source_options(
            bootstrap_servers, topic, starting_offsets, max_offsets_per_trigger
        )
    )
    return parse_kafka_events(reader.load())


def write_stream_kafka(
    events: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
) -> DataStreamWriter:
    """S4: stream sink keyed by user_id. Returns the configured writer
    (caller ``.start()``s it — needs the connector jar)."""
    return (
        to_kafka_frame(events)
        .writeStream.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers, topic, checkpoint_dir))
    )
