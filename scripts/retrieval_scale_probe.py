#!/usr/bin/env python
"""Exact-vs-IVF crossover for the retrieval candidate-generation leg.

The round-11 staged retrieval pair (`search_hybrid_rrf`,
`search_mmr_rerank`) uses the brute-force cosine leg for its candidate
pool — the oracle-exact choice. Its docstrings claim "brute force here,
the IVF/PQ family at 100 TB". This probe turns that claim into a
measured crossover: the query set is a modulus class (Q grows with N),
so the exact leg is O(Q·N) ~ N²/97 while the IVF leg is
O(Q·N·n_probe/n_cells) plus a once-per-corpus build — at some factor
the exact leg's quadratic term must dominate, and that factor is the
operational switch point a 100 TB operator needs to know.

Method: the §9d replica harness (key-shifted embeddings, /tmp replica
dirs, reused across probes); per factor, time (best-of-2 after a warm
run) the exact leg vs the IVF probe at n_cells ~ sqrt(N) (the standard
inverted-file sizing), n_probe=4, both materialized through the
noop sink. The IVF build is warmed OUT of the timed probe — it is a
once-per-corpus artifact, same lifecycle as the registry's index
builds. IVF recall is approximate (that is the trade; the registry
keeps the exact sibling hash-green and the probe modes rows-only).

Run: python scripts/retrieval_scale_probe.py  [factors: default 1 8 32]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402

CAND_K = 30  # the MMR pool size — the pool both compositions feed on
N_PROBE = 4


def main() -> None:
    factors = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 32]
    spark = get_spark("retrieval-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from bench import materialize
    from cognitive_score_bigdata_spark.operators.similarity import (
        ivf_build,
        ivf_probe,
    )
    from cognitive_score_bigdata_spark.queries.retrieval import (
        QUERY_MOD,
        _cosine_ranked,
    )
    from scripts.scaleup_study import build_replica

    rows = []
    for f in factors:
        d = build_replica(spark, f) if f != 1 else os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        n_q = emb.filter(F.col("vec_id") % QUERY_MOD == 1).count()
        n_cells = max(16, int(math.sqrt(n)))

        def timed(mk) -> float:
            best = float("inf")
            for _ in range(2):
                spark._jvm.System.gc()  # noqa: SLF001
                t0 = time.perf_counter()
                materialize(mk())
                best = min(best, time.perf_counter() - t0)
            return round(best, 2)

        # warm both paths once (codegen + the IVF build artifact)
        materialize(_cosine_ranked(emb, CAND_K))
        index = ivf_build(emb, n_cells=n_cells)
        queries = emb.filter(F.col("vec_id") % QUERY_MOD == 1)
        materialize(ivf_probe(index, queries, k=CAND_K, n_probe=N_PROBE))

        exact_s = timed(lambda: _cosine_ranked(emb, CAND_K))
        ivf_s = timed(
            lambda: ivf_probe(index, queries, k=CAND_K, n_probe=N_PROBE)
        )
        rows.append((f, n, n_q, n_cells, exact_s, ivf_s))
        print(
            f"  {f}x: N={n} Q={n_q} cells={n_cells} "
            f"exact={exact_s}s ivf={ivf_s}s",
            file=sys.stderr,
        )

    print("| factor | N | Q | n_cells | exact leg | IVF probe | ratio |")
    print("|---|---|---|---|---|---|---|")
    for f, n, n_q, c, e, i in rows:
        print(f"| {f}x | {n} | {n_q} | {c} | {e}s | {i}s | {e / i:.1f}x |")


if __name__ == "__main__":
    main()
