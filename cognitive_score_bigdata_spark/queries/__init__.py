"""Query registry: every operator the engine claims, with its oracle.

Each :class:`QuerySpec` pairs a PySpark implementation (``fn(spark,
sf_dir) -> DataFrame``) with the ANSI-SQL string a DuckDB oracle runs on
the same parquet tables. The driver's correctness harness compares the two
by row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- double aggregations go through an exact ``DECIMAL(28,6)`` accumulator on
  both sides (addition order then can't perturb low bits);
- top-k orderings always carry a unique tiebreaker column.

Specs with ``oracle=None`` are genuinely non-SQL-expressible (streaming
state, LSH, iterative algorithms); the driver records a weaker rows-only
check for those.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query implementation to the global registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: they register) and return.

    Import order is load-bearing: the driver's correctness harness checks
    the first 50 registry entries per round, so modules rotate each round
    to give every query a driver-verified row.  Round 1 covered
    aggregations/analytics/analytics_tpch/corpus/dedup_similarity/
    extensions (50 queries); round 2 fronted the other 50 of that era.
    ROUND 3 TODO: front the modules added during round 2 — multimodal_real,
    ann_exact, tpch_rest, textclean, vector_crossover, spandedup, sketches,
    quality, corpus_pipeline, sharding, ann_pq, and the round-2 additions
    inside dedup_similarity (dedup_cluster_docs_star, vector_ann_ivf_exact
    via ann_exact, dedup_incremental_newbatch) — none of which have a
    driver row yet (~26 queries); fill the rest of the 50-entry window
    with the oldest previously-verified modules.
    """
    from cognitive_score_bigdata_spark.queries import (  # noqa: F401
        flagship,
        joins,
        projections,
        windows,
        windows_time,
        windows_extra,
        scalar_funcs,
        setops,
        subqueries,
        textops,
        timeseries,
        vectorops,
        multimodal_q,
        mlops,
        aggregations,
        analytics,
        analytics_tpch,
        corpus,
        dedup_similarity,
        extensions,
        # round-2 additions: must stay after the current 50-entry driver
        # window; rotate forward next round
        multimodal_real,
        ann_exact,
        tpch_rest,
        textclean,
        vector_crossover,
        spandedup,
        sketches,
        quality,
        corpus_pipeline,
        sharding,
        ann_pq,
    )

    return REGISTRY
