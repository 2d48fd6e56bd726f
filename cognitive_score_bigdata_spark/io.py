"""Table loading for the driver testdata and derived tables.

Testdata parquet (``/root/testdata/sf*/``) stamps TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong`` most columns surface as
``timestamp_ntz`` but some (``events.ts``) surface as raw nano-epoch
longs. ``load_table`` normalizes those to ``timestamp_ntz`` so queries and
the DuckDB oracle (which reads nanos natively) see identical instants —
the generators emit microsecond-resolution values, so the ns→µs conversion
is lossless.
"""

from __future__ import annotations

import logging
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns that the nanosAsLong flag leaves as raw nano-epoch longs.
_NANO_LONG_COLUMNS = {"events": ("ts",)}


def _nanos_long_to_ntz(col: str):
    # Integer nanos → integer micros → TIMESTAMP_LTZ → NTZ (identity under
    # the UTC session tz). Must be integer DIV: nano-epochs (~1.7e18)
    # exceed double's 53-bit mantissa, so `/ 1000` would round off ±1µs.
    return F.timestamp_micros(F.expr(f"`{col}` DIV 1000")).cast(T.TimestampNTZType())


def _ensure_nanos_readable(spark: SparkSession) -> None:
    """Sessions not built by our factory (e.g. the driver's) raise
    PARQUET_TYPE_ILLEGAL on events.parquet's TIMESTAMP(NANOS) column,
    and a non-UTC session timezone would skew the ns→NTZ conversion
    (it passes through an LTZ cast). Both confs are runtime-settable,
    so self-heal here."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception as exc:  # locked down (e.g. spark-connect policy)
        # reads may still work if the session was pre-configured; log so
        # a PARQUET_TYPE_ILLEGAL failure downstream is diagnosable
        logging.getLogger(__name__).debug(
            "could not self-heal nanos confs (session locked down): %s", exc
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing timestamp physical types."""
    _ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_LONG_COLUMNS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, _nanos_long_to_ntz(col))
    return df


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Ensure enough partitions for expensive per-row compute.

    Local parquet testdata is a single row group per file, so scans come
    up as ONE input partition and everything before the first shuffle
    (shingling, hashing, Arrow batches) runs on one core. Round-robin
    repartition to ``defaultParallelism × multiplier`` fixes that for the
    cost of shuffling the (small) raw rows. On a real cluster the scan
    already yields >= parallelism splits and this is a no-op — the
    condition, not the repartition, is the scale-safe part.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_events_time_range(
    spark: SparkSession, sf_dir: str, start_iso: str, end_iso: str
) -> DataFrame:
    """Events in [start, end) with the range predicate PUSHED to the scan.

    ``load_table`` converts the nano-epoch long eagerly, and a filter on
    the converted timestamp cannot push through ``timestamp_micros`` to
    the parquet reader. Here the bound is translated to nanos and applied
    to the raw long column first — ``PushedFilters:
    [GreaterThanOrEqual(ts,...), LessThan(ts,...)]`` on the scan, row
    groups outside the range never decompress — then converted.
    """
    from datetime import datetime, timezone

    def nanos(iso: str) -> int:
        dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000 + dt.microsecond * 1_000

    _ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.filter(
            (F.col("ts") >= F.lit(nanos(start_iso)))
            & (F.col("ts") < F.lit(nanos(end_iso)))
        ).withColumn("ts", _nanos_long_to_ntz("ts"))
    else:
        df = df.filter(
            (F.col("ts") >= F.lit(start_iso).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(end_iso).cast("timestamp_ntz"))
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
