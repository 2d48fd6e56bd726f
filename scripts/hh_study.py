#!/usr/bin/env python
"""Heavy-hitter study (SURVEY §9): Misra–Gries sketch + exact verify vs
the naive full-vocabulary aggregation, on a wide-vocab skewed stream.

Corpus: 20M tokens, Zipf-ish via u^6 warping of a uniform hash — one
token owns ~7% of the stream, the tail is millions of near-singletons
(the realistic shape of web-scale token/domain/url frequency).

Both paths compute the SAME exact answer (items with share > φ):

- naive: ``groupBy(token)`` over the whole stream, filter by share —
  the aggregation domain is the full vocabulary, so the shuffle carries
  (and the reducers hash) millions of singleton groups that can never
  qualify;
- sketch: per-partition MG summaries (bounded k·P rows) → broadcast
  candidates → one counting aggregate whose domain is candidates+1
  (the NULL tail group).

Reported: wall time AND the number of distinct groups each final
aggregation materializes — the quantity that scales with vocabulary in
the naive plan and with k·P in the sketch plan. On one machine the
shuffle is memory-speed, so wall-clock differences are muted; the
group-count ratio is the scale signal.

Run: ``python scripts/hh_study.py`` (serial). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from cognitive_score_bigdata_spark.operators.sketches import (  # noqa: E402
    heavy_hitters_exact,
    mg_candidates,
)
from cognitive_score_bigdata_spark.session import get_spark  # noqa: E402

N_ROWS = 20_000_000
N_KEYS = 10_000_000
PHI = 0.005
K = 256


def build_stream(spark):
    u = F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1_000_000.0
    tok_id = F.floor(F.pow(u, F.lit(6.0)) * N_KEYS).cast("long")
    return spark.range(N_ROWS).select(
        F.concat(F.lit("t"), tok_id.cast("string")).alias("tok")
    )


def naive(stream):
    counts = stream.groupBy("tok").agg(F.count(F.lit(1)).alias("n_occurrences"))
    total = F.sum("n_occurrences").over(Window.partitionBy())
    return (
        counts.withColumn("_n_total", total)
        .filter(F.col("n_occurrences") > PHI * F.col("_n_total"))
        .select(
            "tok",
            "n_occurrences",
            (F.col("n_occurrences") / F.col("_n_total")).alias("share"),
        )
    )


def main() -> None:
    spark = get_spark("hh-study")
    spark.sparkContext.setLogLevel("ERROR")
    stream = build_stream(spark).persist()
    stream.count()
    # warm the Arrow pool so the sketch's first pandas stage isn't
    # charged interpreter startup
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    results = {}
    # group-domain sizes (the scale signal)
    vocab = stream.distinct().count()
    n_cands = mg_candidates(stream, "tok", K).count()
    results["naive_group_domain"] = vocab
    results["sketch_group_domain"] = n_cands + 1

    for name, fn in [
        ("naive_full_groupby", lambda: naive(stream)),
        (
            "mg_sketch_verify",
            lambda: heavy_hitters_exact(stream, "tok", phi=PHI, k=K),
        ),
    ]:
        best, rows = None, None
        for _ in range(2):
            spark._jvm.System.gc()  # noqa: SLF001
            t0 = time.perf_counter()
            rows = sorted(
                (r[0], r["n_occurrences"]) for r in fn().collect()
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {"sec": round(best, 2), "heavy_hitters": len(rows)}
        results.setdefault("answers", []).append(rows)

    a, b = results.pop("answers")
    assert a == b, "paths disagree"
    results["answers_identical"] = True
    stream.unpersist()
    print(
        json.dumps(
            {
                "metric": "heavy_hitter_study",
                "n_rows": N_ROWS,
                "phi": PHI,
                "k": K,
                **results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
