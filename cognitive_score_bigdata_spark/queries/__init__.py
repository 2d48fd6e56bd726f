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


# The driver's correctness harness checks the FIRST 50 registry entries
# per round; this explicit list IS the round-4 window (rounds 1-3 steered
# the window by module import order; with single queries now needing
# slots — the two r2-red fixes live in modules whose siblings are already
# verified — an explicit name list is the honest mechanism).
#
# Composition (per VERDICT r3 "Next round" #1): the two r2-red fixes
# first (agg_collect_sorted / scalar_array_funcs — the only formally red
# rows, fixed in r3, need a green driver row to close), then the
# round4_staging oracle battery (14), co-location/DPP plan-pinned trio,
# graph family (7), auditable-sketch family (6), the two exact
# similarity joins (containment after its round-4 blocking fix +
# prefix-filter — the recall-guarantee proofs), the three verdict-
# mandated oracle upgrades (IVFADC exact mode, SemDeDup exact mode, BPE
# under a merge-table-literal oracle), and 13 highest-novelty staging2
# entries (check-classes with no verified sibling: multiset setops,
# interval/fuzzy joins, time-RANGE frame, k-fold, chunking, systematic
# sampling, novelty, dedup-rate, DAU/WAU, basket, profiling).
#
# Carried to round 5 (16 — all in families with driver-verified
# siblings): vector_ann_ivfpq_topk (rows-only; the exact-mode sibling
# below carries the machinery's hash row), anomaly_daily_mad,
# hierarchy_rollup_to_root, agg_trend_slope_by_type,
# timeseries_twap_per_user / _ohlc_hourly / _max_drawdown,
# agg_equidepth_deciles, events_session_conversion /
# _pareto_user_deciles / _weekday_profile, agg_weighted_median_by_source,
# agg_corr_value_hour, agg_gini_value, quality_benford_digits,
# quality_independence_residuals. Front these 16 in round 5, then refill
# with the stalest r1-verified modules.
ROUND4_WINDOW = [
    # r2-red fixes (VERDICT "What's wrong" #1)
    "agg_collect_sorted",
    "scalar_array_funcs",
    # round4_staging oracle battery
    "events_funnel_conversion",
    "events_retention_cohort",
    "agg_histogram_value",
    "agg_mode_event_type_daily",
    "agg_exact_median_by_type",
    "anomaly_daily_zscore",
    "corpus_bigram_topk",
    "sample_stratified_exact_k",
    "corpus_source_overlap",
    "quality_rank_normalize",
    "agg_percentile_bands",
    "join_asof_forward",
    "scd2_incremental_merge",
    "agg_time_grain_rollup",
    # co-location / DPP plan-pinned trio
    "join_bucketed_colocated",
    "agg_bucketed_no_shuffle",
    "scan_dpp_partitioned_join",
    # graph family
    "graph_pagerank_copurchase",
    "graph_pagerank_weighted",
    "graph_triangle_count",
    "graph_minlabel_components",
    "graph_sssp_copurchase",
    "graph_kcore_copurchase",
    "graph_clustering_topk",
    # auditable-sketch family
    "sketch_kmv_distinct_users",
    "dedup_simhash_pairs_md5",
    "dedup_minhash_pairs_md5",
    "sketch_hll_md5_users",
    "streaming_hll_users",
    "sketch_kmv_overlap3",
    # exact similarity joins (containment carries the round-4 fix)
    "text_containment_neardup",
    "text_prefix_filter_join",
    # verdict-mandated oracle upgrades (r3 items #6 and #9)
    "vector_ann_ivfpq_exact",
    "dedup_semantic_exact",
    "corpus_bpe_encode",
    # highest-novelty staging2 (no driver-verified sibling class)
    "join_fuzzy_levenshtein",
    "join_interval_overlap",
    "setop_intersect_all",
    "setop_except_all",
    "window_trailing_30d_range",
    "text_novelty_score",
    "ml_kfold_assignment",
    "corpus_dedup_rate_by_source",
    "corpus_overlap_chunks",
    "sample_weighted_systematic",
    "events_dau_wau_stickiness",
    "market_basket_pairs",
    "profile_table_stats",
]


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: they register) and return
    the registry reordered so :data:`ROUND4_WINDOW` comes first.

    History: round 1 covered aggregations/analytics/analytics_tpch/
    corpus/dedup_similarity/extensions (50); round 2 fronted the other
    50 of that era; round 3 fronted round3_additions + the round-2
    modules (CORRECTNESS_r03: 38 green, 12 rows-only, 0 red).  Round 4
    fronts the 61 never-driver-checked staging queries (less 16 carried,
    see ROUND4_WINDOW comment) plus the two r2-red fixes and the three
    verdict-mandated oracle upgrades.
    """
    from cognitive_score_bigdata_spark.queries import (  # noqa: F401
        aggregations,
        analytics,
        analytics_tpch,
        ann_exact,
        ann_pq,
        corpus,
        corpus_pipeline,
        dedup_similarity,
        extensions,
        flagship,
        joins,
        mlops,
        multimodal_q,
        multimodal_real,
        projections,
        quality,
        round3_additions,
        round4_staging,
        round4_staging2,
        scalar_funcs,
        setops,
        sharding,
        sketches,
        spandedup,
        subqueries,
        textclean,
        textops,
        timeseries,
        tpch_rest,
        vector_crossover,
        vectorops,
        windows,
        windows_extra,
        windows_time,
    )

    missing = [n for n in ROUND4_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"ROUND4_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in ROUND4_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
