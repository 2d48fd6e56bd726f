#!/usr/bin/env python
"""Round-5 probe (VERDICT r4 item 2): the bucketed-edge graph iteration
path in the simulated >2M-node regime.

§9h established that the per-iteration rank broadcast holds through
32×/640k nodes but dies at the ~2M-node broadcast ceiling, where
Catalyst would re-shuffle the 100 TB-scale EDGE list every iteration.
This probe measures the now-implemented fallback
(``pagerank_fixed_point(..., edge_buckets=N)``) against both
alternatives at the replica scale, with
``spark.sql.autoBroadcastJoinThreshold=-1`` forcing the beyond-ceiling
planner behavior:

- **broadcast** — today's default (explicit hint): the layout that is
  unavailable beyond the ceiling (the broadcast build itself OOMs);
  timed as the baseline the fallback must approach.
- **smj-unbucketed** — what the loop degrades to beyond the ceiling
  WITHOUT the fallback: no hint, broadcast off → every iteration
  sort-merge-shuffles the edge list (the §9h doom scenario, inlined
  here since the library API never builds this shape on purpose).
- **bucketed** — ``edge_buckets=32``: one bucketBy(src) write, then
  per-iteration shuffles move only the rank table.

Reports wall time (bucketed includes the one-time bucket write, also
reported separately), executed-plan join/exchange counts, and verifies
all three modes return identical ranks.

Run: python scripts/graph_bucketed_probe.py [factors... default: 8 32]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cognitive_score_bigdata_spark.operators.graph import (  # noqa: E402
    PR_BASE,
    PR_INIT,
    bucketize_edges,
    pagerank_fixed_point,
)
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402
from scripts.scaleup_study import build_replica  # noqa: E402

PR_ITERS = 5


def _edges(spark, d):
    from cognitive_score_bigdata_spark.queries.round4_staging2 import (
        copurchase_pairs,
    )

    pairs = copurchase_pairs(spark, d)
    return pairs.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst")
    ).unionAll(
        pairs.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    )


def _smj_unbucketed(edges, n_iters):
    """The beyond-ceiling doom shape: identical loop, no broadcast hint,
    no bucketing — each iteration re-shuffles the edge list for the SMJ."""
    edges = edges.select(
        "src", "dst", F.lit(1).cast("bigint").alias("__w")
    ).localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.sum("__w").alias("d"))
    ed = edges.join(deg, "src").localCheckpoint(eager=False)
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(PR_INIT).cast("bigint").alias("rank_micro"),
    )
    for _ in range(n_iters):
        contrib = ed.join(ranks, ranks.node == ed.src).select(
            F.col("dst"),
            F.expr("(rank_micro * 17 * __w) div (20 * d)").alias("c"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                (F.lit(PR_BASE) + F.sum("c")).cast("bigint").alias("rank_micro")
            )
            .select(F.col("dst").alias("node"), "rank_micro")
        )
    return ranks


def _run(label, df):
    t0 = time.perf_counter()
    rows = df.collect()
    wall = time.perf_counter() - t0
    ex = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    print(
        f"  {label:16s} wall={wall:7.2f}s rows={len(rows)} "
        f"BHJ={ex.count('BroadcastHashJoin')} "
        f"SMJ={ex.count('SortMergeJoin')} "
        f"shuffles={ex.count('Exchange hashpartitioning')}"
    )
    return frozenset(tuple(r) for r in rows), wall


def main() -> None:
    factors = [int(a) for a in sys.argv[1:] if a.isdigit()] or [8, 32]
    spark = get_spark("csb-graph-bkt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for factor in factors:
        d = build_replica(spark, factor)
        edges = _edges(spark, d)
        n_nodes = edges.select("src").distinct().count()
        n_edges = edges.count()
        print(f"\n== factor {factor}: nodes={n_nodes} edges={n_edges} "
              "(autoBroadcastJoinThreshold=-1)")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            base, _ = _run(
                "broadcast",
                pagerank_fixed_point(edges, n_iters=PR_ITERS),
            )
            smj, _ = _run("smj-unbucketed", _smj_unbucketed(edges, PR_ITERS))
            t0 = time.perf_counter()
            w = F.lit(1).cast("bigint").alias("__w")
            pre = edges.select("src", "dst", w)
            deg = pre.groupBy("src").agg(F.sum("__w").alias("d"))
            bucketize_edges(pre.join(deg, "src"), "src", 32)
            bwrite = time.perf_counter() - t0
            print(f"  (one-time bucket write of the folded edge table: "
                  f"{bwrite:.2f}s — amortized across iterations AND queries)")
            bkt, _ = _run(
                "bucketed",
                pagerank_fixed_point(edges, n_iters=PR_ITERS, edge_buckets=32),
            )
            assert base == smj == bkt, "modes disagree on ranks!"
            print("  all three modes: identical ranks")

            # the other two fixpoints, broadcast vs bucketed
            from cognitive_score_bigdata_spark.operators.graph import (
                minlabel_components,
                sssp_fixed_rounds,
            )

            half = edges.filter(F.col("src") < F.col("dst"))
            ml_b, _ = _run("minlabel bcast", minlabel_components(half, 8))
            ml_k, _ = _run(
                "minlabel bucketed",
                minlabel_components(half, 8, edge_buckets=32),
            )
            assert ml_b == ml_k, "minlabel modes disagree!"
            es = edges.select(
                "src", "dst",
                (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1)
                .cast("bigint").alias("w"),
            )
            ss_b, _ = _run("sssp bcast", sssp_fixed_rounds(es, 6))
            ss_k, _ = _run(
                "sssp bucketed", sssp_fixed_rounds(es, 6, edge_buckets=32)
            )
            assert ss_b == ss_k, "sssp modes disagree!"
            print("  minlabel + sssp: identical across modes")
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.stop()


if __name__ == "__main__":
    main()
