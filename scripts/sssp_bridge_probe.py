#!/usr/bin/env python
"""Round-5 SSSP scale probe on a star-bridged replica graph.

The §9d key-shifted replicas are DISJOINT subgraphs — fine for
PageRank/CC (every node computes every round) but degenerate for
single-source shortest paths, whose cost scales with the REACHABLE
edge set. This probe links replica 0's minimum node to every replica's
minimum (both directions, weight computed like any other edge), so the
whole graph is live from relaxation round 2 and rounds 3-6 exercise
the full edge set — the realistic full-graph regime.

Measures broadcast vs bucketed-edge mode with
autoBroadcastJoinThreshold=-1 and value-checks the distance sets are
identical. Results recorded in SURVEY §9j (32×: broadcast 18.2 s vs
bucketed 26.1 s — SSSP is the fixpoint where broadcast keeps winning
below the ceiling; see the layout rule there).

Run: SPARK_GRAFT_DRIVER_MEM=32g python scripts/sssp_bridge_probe.py [factors... default 8 32]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cognitive_score_bigdata_spark.operators.graph import (  # noqa: E402
    sssp_fixed_rounds,
)
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402
from scripts.scaleup_study import build_replica  # noqa: E402


def main() -> None:
    factors = [int(a) for a in sys.argv[1:] if a.isdigit()] or [8, 32]
    spark = get_spark("csb-sssp-bridge")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for factor in factors:
        d = build_replica(spark, factor)
        from cognitive_score_bigdata_spark.queries.round4_staging2 import (
            copurchase_pairs,
        )

        pairs = copurchase_pairs(spark, d)
        half = pairs.select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
        edges = half.unionAll(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        gmin = edges.agg(F.min("src")).first()[0]
        # replica shift = max id / factor rounded up (the key-shift
        # modulus build_replica used); bridge gmin <-> every replica min
        n_base = edges.agg(F.max("src")).first()[0] // factor + 1
        bridges = spark.createDataFrame(
            [(gmin, gmin + k * n_base) for k in range(1, factor)]
            + [(gmin + k * n_base, gmin) for k in range(1, factor)],
            "src long, dst long",
        )
        es = (
            edges.unionByName(bridges)
            .select(
                "src",
                "dst",
                (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1)
                .cast("bigint")
                .alias("w"),
            )
        )
        base = None
        for label, kw in (("bcast", {}), ("bucketed", {"edge_buckets": 32})):
            t0 = time.perf_counter()
            rows = sssp_fixed_rounds(es, 6, **kw).collect()
            wall = time.perf_counter() - t0
            print(
                f"factor {factor} {label:9s} wall={wall:7.2f}s "
                f"reached={len(rows)}",
                flush=True,
            )
            got = frozenset(map(tuple, rows))
            if base is None:
                base = got
            else:
                assert got == base, "modes disagree on distances!"
        print(f"factor {factor}: identical distances across modes")
    spark.stop()


if __name__ == "__main__":
    main()
