"""Table sinks: partitioned, bucketed, and append writers.

Bucketing is the Spark substitute for the reference's PK indexes and
Kinesis key-partitioning (SURVEY §4): two tables bucketed by the same
key and count join WITHOUT a shuffle — at 100 TB, pre-bucketing the
event lake and the user dimension by ``user_id`` turns every per-user
join/aggregation from a full shuffle into a bucket-local merge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Date/key-partitioned parquet — partition pruning on read (the
    raw-lake layout, implements ingestion.py:32-33's stated intent)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed parquet table registered in the session catalog.

    Reads of two tables bucketed identically on the join key produce a
    shuffle-free (no Exchange) sort-merge join; ``sortBy`` additionally
    pre-sorts within buckets so even the Sort node drops.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def append_rows(df: DataFrame, path: str) -> None:
    """S9 relational append sink (the INSERT INTO path,
    main.py:113-124) — blind append, readers see atomic files."""
    df.write.mode("append").parquet(path)
