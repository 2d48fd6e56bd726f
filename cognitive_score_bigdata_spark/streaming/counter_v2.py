"""Running per-key counters on Spark 4's state API v2
(``transformWithStateInPandas`` + typed ``ValueState``).

The v1 operators in this package (``transitions.py``, ``admission.py``,
``sketches.py``) use ``applyInPandasWithState`` — one opaque state
tuple per key. The v2 API this module exercises is its successor:
named, typed state variables per key (value/list/map state), timers,
and TTL, backed by the same state store. The simplest useful v2
operator is the monotone per-key event counter: each micro-batch adds
its row count to the key's ``ValueState`` and emits the RUNNING total,
so the emission stream is a change-log of the counter.

Determinism contract: the counter is a sum of non-negative
increments, so its FINAL value per key is batch-split-invariant — any
drain of the same files ends at the batch ``COUNT(*)`` per key;
``MAX(running)`` over the change-log recovers it regardless of the
micro-batch split.

ENVIRONMENT GATE: the v2 API's state-server protocol needs
``google.protobuf`` (``pyspark/sql/streaming/proto/StateMessage_pb2``),
which this container does not ship — the driver worker dies with
``ImportError: cannot import name 'descriptor'`` before ``init``
runs. The operator is therefore NOT a registry row here; its test is
``importorskip``-gated exactly like the live Kafka/JDBC round trips,
and it activates unchanged on any cluster with protobuf installed
(every standard Spark 4 distribution). Requires the RocksDB state
store provider (set by :func:`counter_stream`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_IN_SCHEMA = "user_id long, event_id long"
_OUT_SCHEMA = "user_id long, running bigint"


class _RunningCounter(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", "n bigint")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n = sum(len(pdf) for pdf in rows)
        prev = self._count.get()[0] if self._count.exists() else 0
        total = int(prev + n)
        self._count.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "running": [total]})

    def close(self) -> None:
        pass


def counter_stream(
    spark: SparkSession,
    in_dir: str,
    checkpoint_dir: str,
    query_name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain ``in_dir`` (JSON: user_id, event_id) availableNow, keeping
    one bigint ValueState per user; returns the memory-sink change-log
    of running totals (one row per (user, micro-batch)).

    Conf hygiene: the RocksDB provider is required only for THIS query
    (typed state variables are not implemented on the HDFS-backed
    store), so the prior providerClass is saved and restored after the
    drain — a later v1 streaming query in the same session must not
    silently inherit the switch."""
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        reader = spark.readStream.schema(_IN_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", max_files_per_trigger
            )
        src = reader.json(in_dir)
        out = src.groupBy("user_id").transformWithStateInPandas(
            _RunningCounter(),
            outputStructType=_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
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
                "counter_stream: availableNow drain exceeded 300s — the "
                "memory sink would be PARTIAL; raise the timeout for this "
                "scale instead of consuming a half-drained table"
            )
    finally:
        # the provider is read at query START, so restoring after the
        # availableNow drain cannot affect this query's state store
        if prev_provider is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev_provider)
    return spark.table(query_name)
