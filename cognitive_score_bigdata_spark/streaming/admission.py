"""Stateful streaming admission control: per-key quota over a stream.

A continuously-ingesting corpus pipeline needs the dual of
deduplication: an upper bound on how much any one domain/source may
contribute, enforced online. This module implements it as
``applyInPandasWithState`` keyed by source — the state is ONE integer
(admitted count) per source, so state size is bounded by the key
population no matter how much data streams through.

Ordering contract (mirrors streaming/transitions.py): within a
micro-batch the state function sorts by ``doc_id``, so a single
``availableNow`` drain admits exactly the first-``cap`` docs per source
in doc_id order — the same set as the batch ``ROW_NUMBER() OVER
(PARTITION BY source ORDER BY doc_id) <= cap`` query, which is what
lets the registry row hash-match a plain SQL oracle. Across
micro-batches the counter carries: a source that admitted k docs in
batch 1 admits at most cap-k more afterwards, regardless of file
split. Admission is first-come-first-served by arrival order across
batches (the online semantics); the cross-batch counter-carry is
pinned in tests with a two-file split.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_IN_SCHEMA = "doc_id long, source string"
_OUT_SCHEMA = "doc_id long, source string"
_STATE_SCHEMA = "n_admitted long"


def _admit(cap: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = [pdf for pdf in pdfs if not pdf.empty]
        if not rows:
            return
        batch = pd.concat(rows).sort_values("doc_id")
        used = state.get[0] if state.exists else 0
        room = cap - used
        if room > 0:
            out = batch.iloc[:room][["doc_id", "source"]]
            if not out.empty:
                yield out
            used += min(room, len(batch))
        state.update((int(used),))

    return fn


def admission_stream(
    spark: SparkSession,
    in_dir: str,
    checkpoint_dir: str,
    query_name: str,
    cap: int = 10,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain ``in_dir`` (JSON: doc_id, source) availableNow, admitting
    at most ``cap`` docs per source across the whole stream; returns
    the memory-sink table of admitted rows."""
    reader = spark.readStream.schema(_IN_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.json(in_dir)
    out = src.groupBy("source").applyInPandasWithState(
        _admit(cap),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
            "admission_stream: availableNow drain exceeded 300s — the "
            "memory sink would be PARTIAL; raise the timeout for this "
            "scale instead of consuming a half-drained table"
        )
    return spark.table(query_name)
