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
# per round; this explicit list IS the round-5 window (VERDICT r4 "Next
# round" #1: front the 16 carried never-checked queries so every one of
# the 206+ registered queries has a driver CORRECTNESS row, then refill
# with the stalest r1-verified queries — their rows were recorded on
# 4-round-old code).
#
# Round-6 rotation plan (for the next session): front the 4 round-5
# staged rows (graph_pagerank_bucketed, analytics_skyline_parts,
# events_markov_transitions, streaming_markov_transitions — all locally
# green at sf0.001+sf0.01), then the 5 r1 rows this window dropped
# (agg_median, window_percentiles, scalar_regexp_replace, agg_rollup,
# agg_cube), then the stalest r2-verified-only modules (windows/setops/
# scalar_funcs/projections era — see CORRECTNESS_r02).
#
# Composition: the 16 round-4 carries first (closing the last
# verification debt — after this window, 0 registry queries have never
# been driver-checked), then the new round-5 production-posture
# composition row (`dedup_pipeline_blocked_verify`, VERDICT r4 #3), then
# 33 refills from the 38 stalest hash-green r1 rows. The five r1 rows
# left out (`agg_median`, `window_percentiles`, `scalar_regexp_replace`,
# `agg_rollup`, `agg_cube`) each have a STRONGER or equal sibling
# verified in r2-r4 on the same machinery (`agg_exact_median_by_type`,
# `agg_percentile_bands`, `scalar_string_funcs`/`scalar_array_funcs`,
# `agg_grouping_sets` — the generalization that subsumes rollup/cube —
# all green in r4 or refreshed here).
ROUND5_WINDOW = [
    # the 16 round-4 carries (queries never driver-checked before)
    "vector_ann_ivfpq_topk",
    "anomaly_daily_mad",
    "hierarchy_rollup_to_root",
    "agg_trend_slope_by_type",
    "timeseries_twap_per_user",
    "timeseries_ohlc_hourly",
    "timeseries_max_drawdown",
    "agg_equidepth_deciles",
    "events_session_conversion",
    "events_pareto_user_deciles",
    "events_weekday_profile",
    "agg_weighted_median_by_source",
    "agg_corr_value_hour",
    "agg_gini_value",
    "quality_benford_digits",
    "quality_independence_residuals",
    # round-5 addition: the production near-dup composition (VERDICT #3)
    "dedup_pipeline_blocked_verify",
    # stalest r1-verified refills (driver rows recorded in round 1 only)
    "agg_filtered_count",
    "agg_group_q1",
    "agg_latest_per_key",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_variance_manual",
    "agg_pivot_event_types",
    "analytics_q3_shipping",
    "analytics_q4_exists_priority",
    "analytics_q5_region_volume",
    "analytics_q6_selective",
    "analytics_q7_volume",
    "analytics_q8_market_share",
    "analytics_q9_profit",
    "analytics_q10_returns",
    "analytics_q11_share",
    "analytics_q12_priority_mix",
    "analytics_q13_custdist",
    "analytics_q14_promo",
    "analytics_q15_top_supplier",
    "analytics_q17_small_qty",
    "analytics_q18_large_orders",
    "analytics_q19_disjunctive",
    "analytics_q22_dormant",
    "join_lookup_latest_state",
    "join_posexplode",
    "join_salted_skew",
    "corpus_vocab_topk",
    "corpus_tfidf_topterm",
    "corpus_filter_funnel",
    "scalar_string_advanced",
    "scalar_interval",
    "scan_time_range_pruned",
]


# Why each rows-only (oracle=None) query CANNOT be value-hash-checked
# against DuckDB, and which driver-VERIFIED sibling pins the same
# machinery (VERDICT r4 item 4: every rows-only entry must name its
# coverage or be retired). Appended to the spec doc at load time;
# completeness pinned by tests/test_oracle_parity.py.
ROWS_ONLY_RATIONALE: dict[str, str] = {
    "vector_ann_ivfpq_topk": "probe mode is approximate by design "
    "(n_probe<n_cells drops true neighbors); machinery hash-verified by "
    "sibling vector_ann_ivfpq_exact (driver r4, n_probe=n_cells), "
    "recall>=0.7 pinned in test_pq",
    "agg_approx_distinct": "HLL estimate is engine-specific (different "
    "register layouts); exact sibling agg_distinct is driver-verified, "
    "error bound pinned in tests",
    "vector_ann_lsh_neardup": "sign-LSH recall is probabilistic (plane "
    "draws differ per engine); exact sibling vector_cosine_neardup "
    "(driver-verified) defines the target set, recall pinned in tests",
    "vector_ann_ivf_topk": "probe mode approximate; exact sibling "
    "vector_ann_ivf_exact (driver r2, n_probe=n_cells) hash-verifies "
    "the same build/probe machinery",
    "dedup_minhash_pairs": "fast path on xxhash64 (JVM-internal hash, "
    "no DuckDB equivalent); the IDENTICAL shingle->min->band->bucket "
    "machinery is hash-verified by sibling dedup_minhash_pairs_md5 "
    "(driver r4, md5 two-hash scheme)",
    "dedup_simhash_pairs": "fast path on xxhash64; sketch/blocking/"
    "Hamming-verify machinery hash-verified by sibling "
    "dedup_simhash_pairs_md5 (driver r4)",
    "dedup_cluster_docs_star": "iterative contraction with data-"
    "dependent round count (not a pure function SQL can unroll); "
    "label parity vs union-find pinned in tests, fixed-iteration "
    "sibling graph_minlabel_components is driver-verified (r4)",
    "dedup_incremental_newbatch": "xxhash64 LSH banding (see "
    "dedup_minhash_pairs); banding math verified via the md5 sibling, "
    "index round-trip + planted-copy recovery pinned in tests",
    "vector_ann_pq_topk": "ADC scores are approximations; the "
    "codebook/encode/LUT machinery is hash-verified by sibling "
    "vector_ann_ivfpq_exact (driver r4), recall pinned in test_pq",
    "dedup_cluster_docs": "clusters over xxhash64-LSH candidates (see "
    "dedup_minhash_pairs); exact-jaccard sibling dedup_cluster_exact "
    "(driver r3) hash-verifies the clustering composition",
    "vector_kmeans_cluster_sizes": "MLlib KMeans float iterations are "
    "engine-specific; k-means-as-partitioner machinery hash-verified "
    "via dedup_semantic_exact (driver r4, n_cells=1) and the IVF exact "
    "modes",
    "sample_stratified": "sampleBy's per-row RNG stream has no DuckDB "
    "equivalent; deterministic sibling sample_stratified_exact_k "
    "(driver r4) hash-verifies exact-k stratified selection",
    "agg_percentile_approx": "KLL-sketch quantiles are estimator-"
    "specific; exact siblings agg_exact_median_by_type / "
    "agg_percentile_bands (driver r4) are hash-verified, error bound "
    "pinned in tests",
    "sample_seeded": "F9 parity row: Bernoulli sampling rides Spark's "
    "per-partition RNG stream (engine-specific by nature); "
    "deterministic sibling sample_weighted_systematic (driver r4) "
    "hash-verifies exact weighted selection",
    "ml_score_batch": "GBT transform is model inference, not SQL; the "
    "deterministic serving prefix is hash-verified by sibling "
    "ml_feature_assembly (driver r3), model path pinned in test_ml",
    "dedup_semantic_pairs": "probe mode prunes by approximate cell "
    "assignment; sibling dedup_semantic_exact (driver r4, n_cells=1 = "
    "exhaustive) hash-verifies the Gram-matmul pair machinery, planted "
    "near-dups pinned in tests",
    "sketch_hll_group_users": "Datasketches HLL register values are "
    "library-specific; sibling sketch_hll_md5_users (driver r4) "
    "hash-verifies md5-auditable HLL register maintenance end-to-end, "
    "merge+bounds pinned in test_sketches",
    "sketch_theta_user_overlap": "Datasketches theta internals are "
    "library-specific; sibling sketch_kmv_overlap3 (driver r4) "
    "hash-verifies the KMV/theta-style set-algebra machinery",
    "agg_pandas_udaf_gmean": "geometric mean goes through exp/log "
    "transcendentals (cross-engine ulp drift by design of the check); "
    "the row exists for the grouped pandas-UDAF API surface, Arrow "
    "batch shape pinned in tests",
}


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: they register) and return
    the registry reordered so :data:`ROUND5_WINDOW` comes first.

    History: round 1 covered aggregations/analytics/analytics_tpch/
    corpus/dedup_similarity/extensions (50); round 2 fronted the other
    50 of that era; round 3 fronted round3_additions + the round-2
    modules (CORRECTNESS_r03: 38 green, 12 rows-only, 0 red).  Round 4
    fronted the staging backlog + the two r2-red fixes + three oracle
    upgrades (CORRECTNESS_r04: 50/50 green).  Round 5 fronts the 16
    carried never-checked queries + the new composition row + the 33
    stalest r1 rows — after this window every registered query has a
    driver CORRECTNESS row, none older than round 2.
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
        round5,
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

    missing = [n for n in ROUND5_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"ROUND5_WINDOW names not registered: {missing}")
    from dataclasses import replace

    for n, why in ROWS_ONLY_RATIONALE.items():
        spec = REGISTRY.get(n)
        if spec is not None and spec.oracle is None and why not in spec.doc:
            REGISTRY[n] = replace(spec, doc=f"{spec.doc} [rows-only: {why}]")
    ordered = {n: REGISTRY[n] for n in ROUND5_WINDOW}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
