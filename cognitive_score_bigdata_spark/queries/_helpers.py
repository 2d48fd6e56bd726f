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

import pyspark.sql.functions as F
from pyspark.sql import Column

DEC = "decimal(28,6)"


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
