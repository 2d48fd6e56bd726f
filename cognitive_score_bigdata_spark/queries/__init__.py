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
    extensions (50); round 2 fronted the other 50 of that era.  ROUND 3
    window: round3_additions (18 new queries) + the 11 modules added
    during round 2 (24 queries, previously zero driver rows) +
    dedup_similarity (8 incl. 2 previously unverified) = 50, the last
    four slots having been re-taken from r1-verified analytics_tpch
    fillers by the four late round-3 additions (holdout split, data
    validation, centroids, SCD2) — those fillers keep their r1 rows, so
    after round 3 EVERY registry query still has at least one driver row
    cumulatively.  ROUND 4 TODO: front queries/round4_staging.py (15
    locally-green queries built late in round 3: event-analytics
    battery, exact-k stratified sample, IVFADC ANN, source-overlap
    matrix, forward as-of, SCD2 merge, time-grain rollup) AND
    queries/round4_staging2.py (27 more: bucketed co-located join +
    bucketed aggregate, DPP, the graph family [PageRank, triangle
    count, min-label CC, Bellman-Ford SSSP, k-core], systematic
    weighted sampling, overlap chunking, Levenshtein linkage, market
    basket, table profiling, MAD anomalies, containment near-dup,
    interval overlap, hierarchy rollup, time-RANGE window, trend
    regression, TWAP, hourly OHLC, equi-depth deciles, session
    conversion, prefix-filter similarity join, n-gram novelty, and the
    auditable-sketch family: KMV, md5-SimHash, md5-MinHash, md5-HLL,
    streaming HLL) plus any round-4 additions, then
    fill the remaining window slots with the stalest modules —
    corpus/extensions/aggregations and analytics_tpch (r1-verified, not
    re-checked since) — keeping the total window at exactly the first
    50 entries.  If staging exceeds the window, prioritize the
    auditable sketches and the co-location/DPP plan-pinned queries
    (they upgrade previously-weak check classes), and carry the rest to
    round 5.
    """
    from cognitive_score_bigdata_spark.queries import (  # noqa: F401
        # --- round-3 driver window: first 50 registry entries ---
        round3_additions,  # new this round; each entry pushes one
        # already-r1-verified filler out of the window tail
        multimodal_real,  # 3
        ann_exact,  # 1
        tpch_rest,  # 4
        textclean,  # 3
        vector_crossover,  # 2
        spandedup,  # 1
        sketches,  # 1
        quality,  # 3
        corpus_pipeline,  # 2
        sharding,  # 3
        ann_pq,  # 1
        dedup_similarity,  # 8 (2 unverified + 6 oldest r1-verified)
        analytics_tpch,  # 13 (r1-verified)
        analytics,  # 5 (r1-verified)  -> cumulative 50
        # --- outside the window this round ---
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
        corpus,
        extensions,
        round4_staging,  # added after the r3 window froze; front in r4
        round4_staging2,  # ditto (co-location, PageRank, sampling, chunking)
    )

    return REGISTRY
