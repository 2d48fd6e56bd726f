"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dashboard query (reference
``src/backend/main.py:139-151``) on sf0.001; ``queries`` /``oracle_sql``
expose the full operator registry of cognitive_score_bigdata_spark for
the driver's DuckDB-parity correctness harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cognitive_score_bigdata_spark.queries import load_registry  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_registry()
    return registry["flagship_dashboard"].fn(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in load_registry().items()
        if spec.oracle is not None
    }
