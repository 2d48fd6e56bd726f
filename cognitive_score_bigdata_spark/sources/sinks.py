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


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str = "org.postgresql.Driver",
    batchsize: int = 10_000,
    isolation_level: str = "READ_COMMITTED",
) -> dict[str, str]:
    """JDBC option dict for the reference's Postgres edge (UserDB,
    ``main.tf:89-104``; per-prediction INSERT ``src/backend/main.py:
    113-124``; bulk load ``scripts/db_loader.py:94-158``).

    ``batchsize`` makes the executor-side INSERT a real batch write (the
    reference's loader commits per-CSV; 10k-row batches are the moral
    equivalent at scale). A pure builder so tests pin the contract
    without a database or driver jar on the classpath.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "driver": driver,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    **kwargs,
) -> None:
    """S9 over a real database: ``df.write.format("jdbc")``.

    Executors open parallel connections (one per partition) and batch
    INSERTs — ``df.repartition(n)`` upstream controls write concurrency
    against the database. Requires a JDBC driver jar on the cluster
    classpath (e.g. ``org.postgresql:postgresql``); this sandbox ships
    none, so tests drive construction + option plumbing and assert the
    driver-lookup failure is the only thing standing.
    """
    df.write.format("jdbc").options(**jdbc_options(url, table, **kwargs)).mode(
        mode
    ).save()
