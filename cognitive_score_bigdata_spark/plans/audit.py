"""Physical-plan audit: assert the plans we *want*, not just plans that
pass.

For each audited query this inspects ``explain('formatted')`` output for
the properties that matter at 100 TB:

- **filter pushdown**: selective predicates must appear as
  ``PushedFilters`` on the parquet scan, not post-scan Filter nodes only;
- **column pruning**: the scan's ReadSchema must not contain columns the
  query never touches;
- **broadcast joins**: dimension joins must be BroadcastHashJoin, never
  SortMergeJoin on a small side;
- **map-side combine**: grouped aggregates must show ``partial_``
  functions below the Exchange (halves the shuffle);
- **vectorized scans**: parquet scans report ``Batched: true``.

(WholeStageCodegen spans are not visible pre-execution under AQE in
Spark 4 — codegen is applied per-stage at materialization; `Batched` +
`partial_` are the inspectable proxies.)

Run as a module for a human-readable report:
    python -m cognitive_score_bigdata_spark.plans.audit [sf_dir]
"""

from __future__ import annotations

import re
import sys

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def audit(df: DataFrame) -> dict[str, object]:
    text = plan_text(df)
    scans = re.findall(r"PushedFilters: \[(.*?)\]", text)
    read_schemas = re.findall(r"ReadSchema: struct<(.*?)>", text)
    return {
        "pushed_filters": [s for s in scans if s and s != ""],
        "read_schemas": read_schemas,
        "n_broadcast_joins": text.count("BroadcastHashJoin"),
        "n_sortmerge_joins": text.count("SortMergeJoin"),
        "n_partial_aggs": len(re.findall(r"partial_", text)),
        "batched_scans": text.count("Batched: true"),
        "has_take_ordered": "TakeOrderedAndProject" in text,
        "n_exchanges": text.count("Exchange"),
        "text": text,
    }


def main() -> None:
    from cognitive_score_bigdata_spark.queries import load_registry
    from cognitive_score_bigdata_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or [
        "flagship_dashboard",
        "agg_group_q1",
        "analytics_q3_shipping",
        "analytics_q5_region_volume",
        "analytics_q10_returns",
        "join_asof",
        "window_latest_per_key",
        "join_lookup_latest_state",
        "text_ngram_jaccard",
        "dedup_minhash_pairs",
    ]
    registry = load_registry()
    spark = get_spark("csb-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        a = audit(df)
        print(
            f"== {name}: broadcast={a['n_broadcast_joins']} "
            f"smj={a['n_sortmerge_joins']} partialAggs={a['n_partial_aggs']} "
            f"batchedScans={a['batched_scans']} "
            f"exchanges={a['n_exchanges']} takeOrdered={a['has_take_ordered']}"
        )
        for pf in a["pushed_filters"]:
            print(f"   pushed: [{pf[:100]}]")
        for rs in a["read_schemas"]:
            print(f"   reads:  {rs[:110]}")
    spark.stop()


if __name__ == "__main__":
    main()
