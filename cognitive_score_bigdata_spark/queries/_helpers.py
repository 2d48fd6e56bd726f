"""Shared building blocks for oracle-parity queries.

Floating-point aggregation order differs between Spark (partial aggs over
shuffled partitions) and DuckDB (single-node scan order), so a plain
``SUM(double)`` hash-mismatches in the low bits. Both engines sum exactly
over DECIMAL, so every double aggregate here is routed through a
``DECIMAL(28,6)`` accumulator and cast back to double — bit-identical
results regardless of plan shape, partitioning, or scale factor.

Integer-typed computed columns are widened to BIGINT on the Spark side
because DuckDB surfaces most integer-producing functions (COUNT, YEAR,
RANK, ...) as INT64 and the driver compares schemas.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEC = "decimal(28,6)"


def shared_stage(df: DataFrame) -> DataFrame:
    """Materialize a subtree that 2+ plan branches consume, so it is
    computed once instead of once per consumer (guide §2.4 — the r16
    duplicated-subtree cuts; each call site documents what was planned
    twice and the measured win).

    Default primitive: ``localCheckpoint(eager=False)``. Cluster caveat
    (VERDICT r16 item 2, guide §5): localCheckpoint blocks are
    executor-LOCAL and unreplicated, and lineage is truncated — at
    100 TB an executor loss mid-query makes the job unrecoverable, and
    the cut replaces the pruned parquet scan with ``Scan ExistingRDD``,
    so any pushdown/pruning must already sit BELOW the cut (true for
    every call site: each one cuts a post-filter/post-project subtree;
    verified in plans/r16). For cluster posture set
    ``SPARK_GRAFT_SHARED_STAGE=persist``: ``persist(MEMORY_AND_DISK)``
    keeps recomputable lineage (executor loss ⇒ recompute, not abort)
    at the cost of one extra analysis of the subtree per consumer —
    the partitions still compute once. Local bench keeps the default so
    the driver's numbers stay comparable round-over-round.
    """
    if os.environ.get("SPARK_GRAFT_SHARED_STAGE") == "persist":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=False)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive SUM over doubles (exact decimal accumulator)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-insensitive AVG: exact decimal sum, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def bigint(col: Column) -> Column:
    return col.cast("bigint")
