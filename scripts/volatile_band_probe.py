#!/usr/bin/env python
"""Five-run variance band for the volatile Python-stage trio
(VERDICT r9 item 2 — the round's one weak mark).

`vector_ann_ivfpq_topk` moved 2.64 -> 3.78 s between r8 and r9 on
untouched code; the graph family had a five-run band to prove such
moves are run-to-run variance, the mapInPandas-heavy family did not.
This probe records that band: FIVE fresh JVM sessions (subprocess per
run — a stopped SparkContext reuses the gateway JVM, so in-process
restarts would share JIT/code-cache state and understate variance),
each replaying exactly the bench.py session warm-ups that precede the
trio (codegen path via flagship_stats, Arrow worker pool, and the
once-per-corpus PQ/IVF index builds bench warms), then timing each
trio query once with a forced GC before it — the same protocol as a
bench.py headline row.

Usage:
    python scripts/volatile_band_probe.py            # 5 runs, band JSON
    python scripts/volatile_band_probe.py q1 q2 ...  # band other queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 ...      # default sf0.1

Output: one JSON line {"runs": [...], "band": {name: [min, max]}}.
The band is referenced from SURVEY.md next to the graph family's and
from bench_config — a driver number inside its band is non-actionable
by construction.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIO = [
    "vector_ann_ivfpq_topk",
    "text_prefix_filter_join",
    "dedup_simhash_pairs",
]
N_RUNS = 5

# Once-per-corpus artifact builds bench.py warms before each target —
# the band must measure the query, not its index build (bench order).
WARM_FOR = {
    "vector_ann_ivfpq_topk": ["vector_ann_pq_topk", "vector_ann_ivfpq_topk"],
    "search_hybrid_rrf": ["text_bm25_topk"],
    "search_hybrid_rrf_ivf": ["text_bm25_topk", "vector_ann_ivf_topk"],
    "search_mmr_rerank_ivf": ["vector_ann_ivf_topk"],
    "vector_ivf_merge_topk": ["vector_ivf_merge_topk"],
    "agg_incremental_mv_merge": ["agg_incremental_mv_merge"],
    "dedup_index_merge_pairs_md5": ["dedup_index_merge_pairs_md5"],
    # r12/r13: the seeded-cell assignment table is the session artifact
    # both the blocked-pair row and the incremental probe read (bench
    # warms dedup_semantic_pairs_seeded); the ensemble row and the BPE
    # pipeline warm nothing by design — composition IS the timed cost
    "dedup_semantic_pairs_seeded": ["dedup_semantic_pairs_seeded"],
    "dedup_semantic_incremental": ["dedup_semantic_pairs_seeded"],
    # r14 staging: the clustered-artifact publish is once-per-corpus
    # (bench warms it); the leakage-splits row warms nothing, mirroring
    # the ensemble row it composes — composition IS the timed cost
    "scan_zonemap_range_agg": ["scan_zonemap_range_agg"],
    # r13 births: the seeded-centroid IVF index is once-per-corpus
    # (bench warms it); the md5 theta row warms nothing — one pass over
    # events IS the timed cost
    "vector_ann_ivf_topk_seeded": ["vector_ann_ivf_topk_seeded"],
    # r14 staging: clustered publish + delete rewrite are once-per-
    # corpus commits (bench warms them); the timed row is the fetch
    "scan_delete_rewrite_fetch": ["scan_delete_rewrite_fetch"],
    # r16 staging: publish + upsert rewrite / evolved append / SQ8
    # fit+encode are once-per-corpus commits or index builds (bench
    # warms them); the timed rows are the feed read, the evolved live
    # scan, and the asymmetric probe
    "scan_changes_feed": ["scan_changes_feed"],
    "scan_schema_evolution_agg": ["scan_schema_evolution_agg"],
    "vector_ann_sq8_topk": ["vector_ann_sq8_topk"],
    "agg_mv_apply_changes": ["scan_changes_feed"],
    "vector_ann_ivfsq_topk": [
        "vector_ann_ivf_topk_seeded",
        "vector_ann_sq8_topk",
    ],
    "scan_merge_upsert_agg": ["scan_merge_upsert_agg"],
    # r17 staging: the admission fixture (seed index + fenced drain)
    # is once-per-corpus (bench warms it); the timed row is the
    # admitted-corpus ensemble + splits. The md5 banded index build is
    # the incremental row's warmed artifact, as the xxhash64 one was.
    "curation_stream_training_set": ["curation_stream_training_set"],
    "dedup_incremental_newbatch": ["dedup_incremental_newbatch"],
    "scan_merge_evolved_agg": ["scan_merge_evolved_agg"],
    "vector_ann_bq_topk": [],
}


def _targets() -> list[str]:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    return names or TRIO


def one_run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cognitive_score_bigdata_spark.queries import load_registry
    from cognitive_score_bigdata_spark.session import get_spark

    from bench import materialize  # the r10 noop-sink materializer

    targets = _targets()
    registry = load_registry()
    spark = get_spark("volatile-band")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's session warm-ups relevant to the targets, in bench order
    materialize(registry["flagship_stats"].fn(spark, sf_dir))
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    for t in targets:
        for warm in WARM_FOR.get(t, []):
            materialize(registry[warm].fn(spark, sf_dir))
    def noise_probe() -> float:
        # bench.py's fixed synthetic reference job, verbatim: the
        # host-speed denominator that makes bands transfer across hosts
        # (VERDICT r10 item 4 — the r10 driver host ran BELOW three raw
        # band floors simply by being faster than the recording host)
        spark._jvm.System.gc()  # noqa: SLF001
        t0 = time.perf_counter()
        (
            spark.range(50_000_000)
            .selectExpr("id % 997 AS k", "id")
            .groupBy("k")
            .agg({"id": "sum"})
            .count()
        )
        return round(time.perf_counter() - t0, 3)

    probes = [noise_probe()]
    out: dict[str, float] = {}
    for name in targets:
        spark._jvm.System.gc()  # noqa: SLF001 — same protocol as bench.time_one
        t0 = time.perf_counter()
        materialize(registry[name].fn(spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    probes.append(noise_probe())
    # two samples (pre/post target block) -> mean as the run's host
    # speed; stored under a dunder key so the band loop skips it
    out["__probe"] = round(sum(probes) / len(probes), 3)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    targets = _targets()
    runs: list[dict[str, float]] = []
    for i in range(N_RUNS):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", *targets],
            capture_output=True,
            text=True,
            check=True,
        )
        row = json.loads(proc.stdout.strip().splitlines()[-1])
        runs.append(row)
        print(f"run {i + 1}/{N_RUNS}: {row}", file=sys.stderr)
    band = {
        name: [min(r[name] for r in runs), max(r[name] for r in runs)]
        for name in targets
    }
    # probe-normalized band (seconds per probe-second): divide each
    # run's value by ITS OWN run's host-speed probe, then min/max —
    # the form that transfers across hosts (VERDICT r10 item 4)
    band_norm = {
        name: [
            round(min(r[name] / r["__probe"] for r in runs), 2),
            round(max(r[name] / r["__probe"] for r in runs), 2),
        ]
        for name in targets
    }
    print(
        json.dumps(
            {
                "runs": runs,
                "band": band,
                "band_normalized": band_norm,
                "probes": [r["__probe"] for r in runs],
            }
        )
    )


if __name__ == "__main__":
    if "--one" in sys.argv:
        one_run()
    else:
        main()
