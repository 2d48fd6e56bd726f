"""Frequency sketches: distributed Misra–Gries heavy hitters.

The classic problem at corpus scale: find every token/domain/url with
frequency share > φ without aggregating the full item domain (a
``groupBy(item)`` over 100 TB of tokens shuffles the whole vocabulary;
the long tail is billions of singletons that are pure shuffle waste).

Two-pass design (Misra–Gries 1982; mergeable-summaries form of Agarwal
et al. 2013):

1. **Sketch pass** — the JVM hashes values to int64 (``xxhash64``),
   then ``mapInPandas`` keeps a k-counter Misra–Gries summary per
   partition (per Arrow batch: vectorized ``value_counts``, merged into
   the running summary, then reduced back to k counters by subtracting
   the (k+1)-th largest count — the mergeable-summary reduction).
   Sketching in hash space halves the Arrow transfer; collisions only
   merge counts upward, preserving the guarantee that any item with
   partition frequency > n_p/(k+1) survives its partition's summary —
   so any item with *global* frequency > n/(k+1) survives at least one
   partition. Output: ≤ partitions × k candidate rows — trivially small.
2. **Exact verify pass** — broadcast the candidate set back over the
   stream; one hash aggregation counts ONLY candidate items (everything
   else collapses into a single NULL group, which doubles as the exact
   total-count — one shuffle, one pass, no second job for n). Filter
   ``count > φ·n``.

Because the second pass is exact, the final answer is deterministic and
independent of partitioning — the sketch only prunes. Correct whenever
k ≥ 1/φ - 1 (asserted).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

MG_SCHEMA = "item long, est bigint"


def _mg_reduce(counters: dict[str, int], k: int) -> dict[str, int]:
    """Shrink a count map to ≤ k entries (mergeable-summary reduction):
    subtract the (k+1)-th largest count from everything, drop ≤ 0."""
    if len(counters) <= k:
        return counters
    pivot = sorted(counters.values(), reverse=True)[k]
    return {i: c - pivot for i, c in counters.items() if c > pivot}


def _mg_partial(col: str, k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item, cnt in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            counters = _mg_reduce(counters, k)
        yield pd.DataFrame(
            {"item": list(counters.keys()), "est": list(counters.values())}
        )

    return gen


def mg_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries over ``xxhash64(col)``,
    merged: (item: int64 hash, est) with est ≥ true_count - n/(k+1).

    The sketch runs in HASH space: the JVM hashes each value to a long
    before the Arrow hop, so the Python pass ships fixed-width ints
    instead of strings (measured 2× faster end-to-end on a 20M-token
    stream, scripts/hh_study.py). A hash collision only MERGES two
    items' counts — estimates only grow, so the candidate-superset
    guarantee (every item with global freq > n/(k+1) survives) still
    holds; the exact verify pass downstream works on real values and
    discards any phantom candidates."""
    return (
        items.select(F.xxhash64(F.col(col)).alias("item"))
        .mapInPandas(_mg_partial("item", k), schema=MG_SCHEMA)
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )


def heavy_hitters_exact(
    items: DataFrame, col: str, phi: float, k: int = 64
) -> DataFrame:
    """All items with frequency share > ``phi``, exactly.

    Returns (item, n_occurrences, share) — deterministic regardless of
    partitioning: the MG sketch only prunes the aggregation domain, the
    counts that decide membership are exact.
    """
    if k < 1.0 / phi - 1:
        raise ValueError(
            f"k={k} too small for phi={phi}: need k >= 1/phi - 1 "
            f"({1.0 / phi - 1:.0f}) or heavy hitters can be missed"
        )
    cands = mg_candidates(items, col, k).select(F.col("item").alias("__h"))
    # Left join on the hash: candidate rows keep their REAL value (so
    # the exact counts below are per-token, immune to sketch-space hash
    # collisions), the entire tail maps to one NULL group — per-candidate
    # exact counts AND the exact stream total from the same aggregation.
    tagged = items.join(
        F.broadcast(cands), F.xxhash64(items[col]) == cands["__h"], "left"
    ).select(
        F.when(F.col("__h").isNotNull(), items[col]).alias("item")
    )
    counts = tagged.groupBy("item").agg(F.count(F.lit(1)).alias("n_occurrences"))
    # Stream total as a global window over `counts` (candidates+1 rows,
    # trivially small) — a separate .agg() would re-execute the whole
    # verify subtree a second time since Spark doesn't dedupe shared
    # subplans without an explicit cache.
    total = F.sum("n_occurrences").over(Window.partitionBy())
    return (
        counts.withColumn("_n_total", total)
        .filter(F.col("item").isNotNull())
        .filter(F.col("n_occurrences") > phi * F.col("_n_total"))
        .select(
            "item",
            "n_occurrences",
            (F.col("n_occurrences") / F.col("_n_total")).alias("share"),
        )
    )


def hll_group_cardinality(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """Mergeable distinct counts: (group_col, approx_distinct, is_total).

    Per-group Datasketches HLL sketches (``hll_sketch_agg``, register
    max is commutative → the estimate is deterministic and independent
    of partitioning or arrival order), plus an ALL row produced by
    MERGING the group sketches (``hll_union_agg``) — the property that
    matters at 100 TB: per-partition/per-day sketches are tiny persisted
    artifacts, and any rollup is a register-wise max over them instead
    of a rescan of the raw data. ``approx_count_distinct`` (HLL++) gives
    one number; Datasketches gives a reusable, mergeable artifact.
    """
    per_group = df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("__sk")
    )
    groups = per_group.select(
        F.col(group_col).cast("string").alias(group_col),
        F.hll_sketch_estimate("__sk").cast("bigint").alias("approx_distinct"),
        F.lit(False).alias("is_total"),
    )
    total = per_group.agg(F.hll_union_agg("__sk").alias("__u")).select(
        F.lit("ALL").alias(group_col),
        F.hll_sketch_estimate("__u").cast("bigint").alias("approx_distinct"),
        F.lit(True).alias("is_total"),
    )
    return groups.unionByName(total)


def theta_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Set-operation sketches: approximate |A|, |B|, |A ∩ B|, |A ∪ B| of
    two groups' value sets in ONE pass over the data (theta sketches
    support intersection, which HLL cannot).

    The corpus-prep question this answers at scale: "how many users/
    domains/documents appear in BOTH snapshots" without a self-join of
    the raw data — each side becomes a bounded sketch, the set algebra
    runs on the sketches."""
    sk = (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .groupBy(group_col)
        .agg(F.theta_sketch_agg(value_col).alias("__sk"))
    )
    both = sk.agg(
        F.theta_sketch_estimate(
            F.theta_intersection_agg(F.col("__sk"))
        ).cast("bigint").alias("n_intersection"),
        F.theta_sketch_estimate(F.theta_union_agg(F.col("__sk")))
        .cast("bigint")
        .alias("n_union"),
        F.max(
            F.when(
                F.col(group_col) == group_a,
                F.theta_sketch_estimate(F.col("__sk")),
            )
        ).cast("bigint").alias("n_a"),
        F.max(
            F.when(
                F.col(group_col) == group_b,
                F.theta_sketch_estimate(F.col("__sk")),
            )
        ).cast("bigint").alias("n_b"),
    )
    return both.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        "n_a",
        "n_b",
        "n_intersection",
        "n_union",
    )
