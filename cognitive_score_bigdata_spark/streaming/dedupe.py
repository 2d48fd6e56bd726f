"""Streaming exact-dedup gate via ``dropDuplicatesWithinWatermark``.

The online dual of the batch exact-dedup operator: a continuously-
ingesting corpus pipeline drops re-crawled duplicates AT INGEST, keyed
by content hash, holding state only within the watermark horizon — the
Spark 3.5+ operator built exactly for this (state per key is evicted
once the event-time watermark passes key-arrival + delay, so state size
is bounded by the duplicate-arrival window, not the corpus).

Determinism contract: the OUTPUT KEY SET equals ``SELECT DISTINCT key``
over the drained input whenever every duplicate pair arrives within the
watermark delay of each other (true here by fixture construction:
event times span less than the delay). Which PHYSICAL row survives is
first-arrival — that's why the operator emits the key alone; the
surviving row's other columns would be arrival-order-dependent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_IN_SCHEMA = "key string, ts_s long"


def dedup_stream(
    spark: SparkSession,
    in_dir: str,
    checkpoint_dir: str,
    query_name: str,
    delay: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain ``in_dir`` (JSON: key, ts_s epoch-seconds) availableNow,
    keeping the FIRST arrival per key within the watermark horizon;
    returns the memory-sink table of admitted keys."""
    reader = spark.readStream.schema(_IN_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.json(in_dir)
    out = (
        src.withColumn("ts", F.timestamp_seconds(F.col("ts_s")))
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["key"])
        .select("key")
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
        raise TimeoutError(
            "dedup_stream: availableNow drain exceeded 300s — the memory "
            "sink would be PARTIAL; raise the timeout for this scale "
            "instead of consuming a half-drained table"
        )
    return spark.table(query_name)
