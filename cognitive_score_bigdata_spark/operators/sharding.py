"""Distributed global prefix sum and token-budget output sharding.

The last stage of a training-data pipeline writes the cleaned corpus as
shards of roughly equal TOKEN count (trainer inputs are token-budgeted,
not row-budgeted). Shard assignment is a running sum over a global
document order — which naively is ``SUM() OVER (ORDER BY ...)`` with no
partition key: Spark executes that as a SINGLE-partition window, i.e.
the whole corpus through one task.

The scalable form is the classic two-pass prefix sum:

1. range-partition by the order column (so partition p's rows all sort
   before partition p+1's) and compute per-partition totals — one tiny
   row per partition;
2. collect those totals (numPartitions rows — bounded by cluster size,
   not data), exclusive-prefix them on the driver, broadcast back;
3. global exclusive prefix = partition offset + local windowed running
   sum within each partition — fully parallel.

The result is identical to the single-partition window for any
partition count (tested), so the DuckDB oracle stays a plain
``SUM() OVER (ORDER BY ...)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def global_exclusive_prefix_sum(
    df: DataFrame, order_col: str, value_col: str, out_col: str = "prefix"
) -> DataFrame:
    """Add ``out_col`` = sum of ``value_col`` over all rows strictly
    before this one in ``order_col`` order — without a global sort or a
    single-partition window. ``order_col`` must be unique."""
    ranged = (
        df.repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    totals = (
        ranged.groupBy("__pid")
        .agg(F.sum(value_col).alias("__ptotal"))
        .collect()
    )
    offsets, acc = {}, 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__ptotal"]
    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(value_col).over(w), F.lit(0))
    return (
        ranged.join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, (F.col("__offset") + local).cast("bigint"))
        .drop("__pid", "__offset")
    )


def token_budget_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(order_col, n_tokens, shard): contiguous-by-order shard ids where
    each shard holds ~``tokens_per_shard`` tokens (a document never
    splits; shard boundaries land at the first doc whose starting offset
    crosses the budget). Downstream: ``.write.partitionBy('shard')``."""
    sized = docs.select(
        order_col,
        F.size(F.split(F.col(text_col), " +")).cast("bigint").alias("n_tokens"),
    )
    with_prefix = global_exclusive_prefix_sum(
        sized, order_col, "n_tokens", out_col="__start"
    )
    return with_prefix.select(
        order_col,
        "n_tokens",
        F.floor(F.col("__start") / F.lit(tokens_per_shard))
        .cast("bigint")
        .alias("shard"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents back-to-back into fixed-``seq_len`` token training
    sequences, splitting a document wherever it crosses a sequence
    boundary (GPT-style packing, no padding between docs).

    For each document, its tokens occupy the global half-open range
    [start, start + n) (start from the distributed prefix sum); the
    document overlaps sequences floor(start/L) .. floor((start+n-1)/L)
    and contributes one output row per overlapped sequence with the
    in-document token sub-range — all plain integer arithmetic + one
    explode, no extra shuffle beyond the prefix sum's.

    Output: (order_col, seq_id, doc_tok_start, doc_tok_end) where the
    sub-range is [doc_tok_start, doc_tok_end) within the document.
    """
    sized = docs.select(
        order_col,
        F.size(F.split(F.col(text_col), " +")).cast("bigint").alias("n_tokens"),
    )
    with_start = global_exclusive_prefix_sum(
        sized, order_col, "n_tokens", out_col="__start"
    )
    first_seq = F.floor(F.col("__start") / seq_len)
    last_seq = F.floor((F.col("__start") + F.col("n_tokens") - 1) / seq_len)
    seq = F.explode(F.sequence(first_seq, last_seq)).alias("seq_id")
    # intersection of [start, start+n) with [seq*L, (seq+1)*L), shifted
    # into document-local coordinates
    lo = F.greatest(F.col("seq_id") * seq_len, F.col("__start"))
    hi = F.least((F.col("seq_id") + 1) * seq_len, F.col("__start") + F.col("n_tokens"))
    return (
        with_start.select(order_col, "n_tokens", "__start", seq)
        .select(
            order_col,
            "seq_id",
            (lo - F.col("__start")).cast("bigint").alias("doc_tok_start"),
            (hi - F.col("__start")).cast("bigint").alias("doc_tok_end"),
        )
    )


def systematic_weighted_sample(
    df: DataFrame, weight_col: str, order_col: str, k: int
) -> DataFrame:
    """Systematic (cumulative-weight stride) weighted sampling.

    Deterministic: a row is selected iff an integer multiple of
    ``step = total_weight div k`` falls inside its cumulative-weight
    interval ``(cum - w, cum]`` along the ``order_col`` ordering.
    Inclusion probability is proportional to weight; a row with
    ``w >= step`` is always selected (and counts once — this is row
    selection, not replacement). All arithmetic is integer, so the
    selected set is bit-reproducible across engines, partitionings and
    reruns — the property pow/ln-based priority sampling cannot give.

    Returns the input rows plus ``cum`` (BIGINT cumulative weight),
    computed with :func:`global_exclusive_prefix_sum` — two distributed
    passes over range partitions, never a single-partition window (the
    round-9 §9r window-skew audit found the original formulation
    carried TWO of those: the cumsum and the global-total frame). The
    total reaches the driver as one scalar aggregate, the same bounded
    driver state the prefix-sum helper itself uses; the selection
    stride is then a literal, so the filter is map-only.

    CONTRACT (ADVICE r9): this is NOT a lazy transformation — building
    the result triggers two driver actions (the total-weight aggregate
    here and the prefix-sum helper's per-partition totals collect), so
    call it where an action is acceptable, not inside plan-construction
    hot paths.  And ``order_col`` MUST be unique: the prefix-sum form
    assigns each row a distinct cumulative interval, so duplicate order
    keys would make selection depend on intra-key placement (the old
    window form merely had nondeterministic tie order).  Uniqueness is
    asserted for the registry caller in
    ``tests/test_round4_sampling.py::test_weighted_order_col_unique``.

    ALIASING CAVEAT: systematic sampling is only weight-proportional
    when the traversal order is uncorrelated with the weights. If the
    weights are periodic along ``order_col`` with a period that divides
    the stride, selection aliases onto fixed positions (e.g. weights
    [9,1,1,...,1] repeating with block weight == step select ONLY the
    block-final light row — measured in
    ``tests/test_round4_sampling.py::test_periodic_weights_alias``).
    When weights may correlate with the natural order, pass a
    hash-scrambled ordering column (``md5(key)``) — the standard
    random-order fix, kept deterministic here.
    """
    w = df.withColumn("__w", F.col(weight_col).cast("bigint"))
    total = w.agg(F.sum("__w")).collect()[0][0] or 0
    step = int(total) // int(k)
    if step == 0:
        # fewer weight units than samples: the stride is undefined
        # (the window form's `div 0` null filtered every row — keep
        # the empty-result contract explicit)
        return w.filter(F.lit(False)).withColumn(
            "cum", F.lit(None).cast("bigint")
        ).drop("__w")
    pre = global_exclusive_prefix_sum(w, order_col, "__w", out_col="__pre")
    sel = pre.withColumn(
        "cum", (F.col("__pre") + F.col("__w")).cast("bigint")
    )
    return sel.filter(
        F.expr(f"(cum div {step}) > ((cum - __w) div {step})")
    ).drop("__w", "__pre")
