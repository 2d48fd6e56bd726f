"""Streaming sketch maintenance: HLL registers as a streaming aggregate.

HyperLogLog's register table is a MAX-merge per (group, bucket) — an
associative, commutative, idempotent statistic — which makes it the
textbook fit for a Structured Streaming aggregation: micro-batches
update per-bucket maxima incrementally, replays can't corrupt them
(max is idempotent), and the final state after draining a source equals
the batch computation exactly. That last property is what the registry
query ``streaming_hll_users`` exploits: run availableNow over the
events table, read the register state, finalize — and hash-match the
SAME DuckDB oracle as the batch query ``sketch_hll_md5_users``.

State size is bounded by groups × m registers (here 5 × 64 rows) no
matter how much data streams through — the streaming-state story HLL
was invented for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_EVENT_SCHEMA = "user_id long, event_type string"


def hll_register_stream(
    spark: SparkSession,
    in_dir: str,
    checkpoint_dir: str,
    m: int = 64,
    rho_cap: int = 32,
    query_name: str = "csb_hll_registers",
) -> DataFrame:
    """Drain ``in_dir`` (JSON events) availableNow, maintaining HLL
    registers per (event_type, bucket); returns the final register
    table from the memory sink.

    Hash/bucket/rho arithmetic matches the batch query exactly: 60-bit
    md5 int, bucket = low 6 bits, rho = trailing zeros of the rest + 1
    via the all-integer bit_count((x & -x) - 1) trick, capped.
    """
    src = spark.readStream.schema(_EVENT_SCHEMA).json(in_dir)
    hv = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
    )
    parts = src.select(
        "event_type",
        hv.alias("hv"),
    ).select(
        "event_type",
        F.col("hv").bitwiseAND(F.lit(m - 1)).alias("bucket"),
        F.shiftright("hv", 6).alias("rest"),
    )
    rho = parts.select(
        "event_type",
        "bucket",
        F.when(F.col("rest") == 0, F.lit(rho_cap))
        .otherwise(
            F.least(
                F.bit_count((F.col("rest").bitwiseAND(-F.col("rest"))) - 1)
                + 1,
                F.lit(rho_cap),
            )
        )
        .alias("r"),
    )
    regs = rho.groupBy("event_type", "bucket").agg(
        F.max("r").cast("bigint").alias("reg")
    )
    q = (
        regs.writeStream.outputMode("complete")
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
            "hll_register_stream: availableNow drain exceeded 300s — "
            "the register table would be PARTIAL; raise the timeout for "
            "this scale instead of consuming a half-drained state"
        )
    return spark.table(query_name)
