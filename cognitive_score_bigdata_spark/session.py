"""SparkSession factory with scale-oriented defaults.

Single place where execution posture is configured so every entry point
(tests, bench, driver harness) runs the same way:

- AQE on (adaptive shuffle coalescing + skew-join splitting — the event
  stream is keyed by ``user_id`` and naturally skewed at scale, see
  reference ``src/ingestion.py:48``).
- Shuffle partitions sized from ``SPARK_GRAFT_CPUS`` (local mode); on a
  real cluster this is overridden by AQE's coalescing anyway.
- Arrow enabled for any pandas interchange (fast ``toPandas`` and
  vectorized pandas UDFs).
- ``nanosAsLong`` legacy flag: the driver testdata parquet stamps
  TIMESTAMP(NANOS) which vanilla Spark refuses to read.
- Session timezone pinned to UTC so timestamp semantics are deterministic
  and match the DuckDB oracle (which reads the same parquet naively).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(
    app_name: str = "cognitive-score-bigdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
