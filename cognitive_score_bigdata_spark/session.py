"""SparkSession factory with scale-oriented defaults.

Single place where execution posture is configured so every entry point
(tests, bench, driver harness) runs the same way:

- AQE on (adaptive shuffle coalescing + skew-join splitting — the event
  stream is keyed by ``user_id`` and naturally skewed at scale, see
  reference ``src/ingestion.py:48``).
- Shuffle partitions sized from the DATA (``scaled_shuffle_partitions``
  — ~2 MB of source parquet per partition, derived from
  ``SPARK_GRAFT_SF_DIR``; override with
  ``SPARK_GRAFT_SHUFFLE_PARTITIONS``), falling back to core count when
  no data-size hint exists. See the long comment at the function.
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


# Scale-aware shuffle partitioning (r17, VERDICT r16 item 4 / guide §2.2):
# size post-shuffle partitions from the DATA, not the core count. A fixed
# partitions=cpus made the whole bench ANTI-scale — the driver's r16 runs
# measured 295.3 s at 32 cores vs 215.9 s at 8 on identical code, because
# at sf0.1 every shuffle carries a few MB and 32 reduce tasks (plus 32
# state-store commits per streaming drain, plus 32-partition eager
# checkpoints per graph iteration) are pure per-task overhead. Byte-based
# AQE coalescing (parallelismFirst=false) recovered only half the gap in
# the r17 interleaved sweep (base 20.5 s / AQE-64m 16.8 / sp8 13.3 over
# 10 queries) because coalescing cannot reach localCheckpoint boundaries
# or state-store partitioning. Derivation: ~2 MB of source parquet per
# partition (≈ 8x parquet→in-memory expansion × a 16 MB post-shuffle
# floor, explode-heavy queries expand further), clamped to [2, 4096].
# At sf0.1 (17.5 MB) this gives 9 — the measured optimum plateau [4, 8]
# across 19 queries incl. the emit-bound tail (sweep totals: sp32 66.8 s,
# sp8 46.5, sp4 48.2); at sf0.01 it gives 2; at 100 TB it saturates the
# clamp and the operator overrides via SPARK_GRAFT_SHUFFLE_PARTITIONS /
# spark.sql.shuffle.partitions anyway. Same value at every core count,
# so the driver's 8-core scaling run measures parallelism, not
# partition-count drift.
_SHUFFLE_BYTES_PER_PARTITION = 2 * 1024 * 1024


def scaled_shuffle_partitions(cpus: int) -> int:
    env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    if not sf_dir or not os.path.isdir(sf_dir):
        return cpus  # no data-size hint: keep the legacy core-count default
    total = 0
    for root, _dirs, files in os.walk(sf_dir):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    if total <= 0:
        return cpus
    n = -(-total // _SHUFFLE_BYTES_PER_PARTITION)  # ceil div
    return int(max(2, min(n, 4096)))


def get_spark(
    app_name: str = "cognitive-score-bigdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or scaled_shuffle_partitions(cpus)

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
