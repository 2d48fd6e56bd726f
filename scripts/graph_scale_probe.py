#!/usr/bin/env python
"""Round-4 probe (VERDICT r3 item 8): do the graph fixpoints keep their
per-iteration broadcast joins at 8x/32x replica scale, under AQE?

The copurchase edge list is support-skewed and the rank/distance table
grows with node count; the plan property that makes the §9d slopes hold
is that each power/relaxation iteration BROADCASTS the |nodes|-sized
rank vector into the (huge) edge list, never sort-merge-shuffling the
edges per iteration. If the rank table ever outgrows the broadcast
threshold, Catalyst/AQE silently flips those joins to SMJ and the
iteration cost becomes iterations x full edge shuffles.

This probe builds the §9d key-shifted replicas (disjoint subgraphs per
replica — nodes AND edges grow ~linearly), then for each factor:

- static plan audit (BroadcastHashJoin / SortMergeJoin counts);
- executes the query and re-audits the EXECUTED plan (AQE's final
  answer, not the optimizer's guess);
- reports the rank-table row count vs the broadcast threshold.

Run: python scripts/graph_scale_probe.py [factors...] [query names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cognitive_score_bigdata_spark.plans.audit import audit  # noqa: E402
from cognitive_score_bigdata_spark.queries import load_registry  # noqa: E402
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402
from scripts.scaleup_study import build_replica  # noqa: E402

TARGETS = ["graph_pagerank_copurchase", "graph_sssp_copurchase"]


def main() -> None:
    factors = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 32]
    names = [a for a in sys.argv[1:] if not a.isdigit()] or TARGETS
    spark = get_spark("csb-graph-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    print(f"autoBroadcastJoinThreshold = {threshold}")

    for factor in factors:
        d = build_replica(spark, factor)
        # node count = distinct parts in the co-purchase pair table
        from cognitive_score_bigdata_spark.queries.round4_staging2 import (
            copurchase_pairs,
        )

        pairs = copurchase_pairs(spark, d)
        n_nodes = (
            pairs.selectExpr("p1 AS n")
            .union(pairs.selectExpr("p2 AS n"))
            .distinct()
            .count()
        )
        n_edges = pairs.count()
        print(f"\n== factor {factor}: nodes={n_nodes} edges={n_edges}")
        for name in names:
            df = registry[name].fn(spark, d)
            a = audit(df)
            t0 = time.perf_counter()
            df.count()
            wall = time.perf_counter() - t0
            executed = (
                df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
            )
            print(
                f"  {name}: static BHJ={a['n_broadcast_joins']} "
                f"SMJ={a['n_sortmerge_joins']}; executed "
                f"BHJ={executed.count('BroadcastHashJoin')} "
                f"SMJ={executed.count('SortMergeJoin')}; wall={wall:.2f}s"
            )

    spark.stop()


if __name__ == "__main__":
    main()
