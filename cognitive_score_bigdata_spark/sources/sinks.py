"""Table sinks: partitioned, bucketed, and append writers.

Bucketing is the Spark substitute for the reference's PK indexes and
Kinesis key-partitioning (SURVEY §4): two tables bucketed by the same
key and count join WITHOUT a shuffle — at 100 TB, pre-bucketing the
event lake and the user dimension by ``user_id`` turns every per-user
join/aggregation from a full shuffle into a bucket-local merge.
"""

from __future__ import annotations

import os

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


def write_sorted_lake(
    df: DataFrame,
    path: str,
    range_col: str,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` +
    ``sortWithinPartitions`` on ``range_col`` before writing.

    Each output file then covers a narrow, (near-)disjoint slice of the
    column's domain, so its parquet footer min/max statistics become
    selective: a predicate on ``range_col`` skips whole files / row
    groups at scan time instead of decompressing them. This is the lake
    layout for the dominant access pattern (time-range queries over an
    events table): at 100 TB, clustering by event time is the difference
    between reading one day and reading every file that interleaves all
    days. The sort inside each file additionally tightens per-row-group
    stats (parquet writes one stats block per row group, not per file).

    ``repartitionByRange`` samples the column to build balanced range
    bounds — skew in ``range_col`` yields uneven files only as far as
    sampling misses it; unlike hash bucketing, identical values always
    co-locate.
    """
    out = (
        df.repartitionByRange(n_files, range_col)
        if n_files
        else df.repartitionByRange(range_col)
    )
    out.sortWithinPartitions(range_col).write.mode(mode).parquet(path)


def compact_small_files(
    spark,
    path: str,
    target_rows_per_file: int,
    out_path: str | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_rows_per_file`` files.

    Streaming micro-batches and over-parallel writers leave lakes as
    thousands of KB-sized files; at scale, scan scheduling and footer
    reads then dominate I/O (the classic small-file problem). Rewriting
    with a row-count-derived partition count restores healthy file
    sizes. Returns the number of files written. In-place compaction
    (``out_path=None``) stages through a temp dir only conceptually —
    here it requires an explicit ``out_path`` so a failed rewrite can
    never destroy the source (rename-into-place is the lake engine's
    job; this operator stays side-effect-safe).
    """
    if out_path is None:
        raise ValueError(
            "compact_small_files writes to a NEW path (out_path); "
            "in-place compaction would destroy the source on failure"
        )
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def zorder_key(cols: list, mins: list, maxs: list, bits: int = 10):
    """Z-value (Morton code) expression: interleave the bits of each
    column's min/max-scaled bucket id. Pure shift/mask arithmetic —
    whole-stage-codegen, no UDF. ``cols`` are Columns cast to double;
    scaling is linear between the observed min/max (the skew caveat: a
    heavily skewed column wastes z-bits on empty ranges; rank-based
    scaling via percentile boundaries fixes that at the cost of a
    quantile pass)."""
    n = len(cols)
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi) - float(lo)
        frac = (c.cast("double") - float(lo)) / span if span > 0 else F.lit(0.0)
        b = F.least(
            F.greatest(F.floor(frac * (1 << bits)).cast("long"), F.lit(0)),
            F.lit((1 << bits) - 1),
        )
        scaled.append(b)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, b in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + d
            )
    return z


def write_zordered_lake(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustering: range-partition + sort on the
    Z-value of ``cols`` before writing.

    ``write_sorted_lake`` makes footer min/max selective on ONE column;
    the Z-curve's locality makes every file's min/max span narrow on
    EVERY participating column simultaneously, so predicates on any of
    them (or both) skip files — the layout for a lake with two dominant
    access patterns (e.g. per-user and per-time over the same events
    table). This is the same layout OPTIMIZE ZORDER BY produces in lake
    engines, built from public API: one min/max aggregate, a Morton-code
    expression, repartitionByRange + sortWithinPartitions.

    Columns must be numeric/timestamp (cast to double for scaling).
    """
    casted = [F.col(c).cast("double") for c in cols]
    row = df.agg(
        *[F.min(c).alias(f"lo{i}") for i, c in enumerate(casted)],
        *[F.max(c).alias(f"hi{i}") for i, c in enumerate(casted)],
    ).first()
    mins = [row[f"lo{i}"] for i in range(len(cols))]
    maxs = [row[f"hi{i}"] for i in range(len(cols))]
    z = zorder_key(casted, mins, maxs, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


class AuditFailure(ValueError):
    """Raised when a staged write fails its publish audit; the staging
    directory is left in place for inspection, the live table untouched."""


def publish_with_audit(
    df: DataFrame,
    path: str,
    audits: list,
    staging_suffix: str = "__staging",
) -> dict:
    """Write-audit-publish: stage, validate, then atomically promote.

    The lake-pipeline safety pattern: ``df`` is materialized to
    ``<path><staging_suffix>`` first, every audit callback runs against
    the STAGED data (``audit(staged_df) -> (ok: bool, detail: str)``),
    and only if all pass does the staging directory move into place
    (single ``rename`` — atomic on POSIX and HDFS; on S3 the move is a
    manifest/pointer swap, same contract). A failed audit raises
    :class:`AuditFailure` and leaves the live table byte-identical to
    what readers were already seeing — bad data is quarantined in
    staging, never half-visible. Replaces the write-then-hope mode
    where a malformed batch poisons downstream readers mid-write.
    """
    import shutil

    staging = path + staging_suffix
    spark = df.sparkSession
    df.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    results = []
    for check in audits:
        ok, detail = check(staged)
        results.append({"audit": getattr(check, "__name__", "audit"),
                        "ok": bool(ok), "detail": detail})
        if not ok:
            raise AuditFailure(
                f"publish aborted, staging kept at {staging}: {detail}"
            )
    old = path + "__retired"
    if os.path.exists(path):
        shutil.move(path, old)
    shutil.move(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    return {"published": path, "audits": results}
