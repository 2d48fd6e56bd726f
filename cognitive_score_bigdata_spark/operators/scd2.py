"""SCD type-2 dimension maintenance: full build + incremental merge.

``scd2_build`` derives a complete validity-interval history from a raw
event stream (the shape of ``queries/round3_additions.scd2_user_event_history``,
factored here so batch build, incremental merge, and their equivalence
test share one definition).

``scd2_merge`` is the production form: fold a NEW batch of events into an
EXISTING history table without touching unaffected keys or re-reading
closed intervals — the lakehouse dimension-maintenance op. Invariants:

- **batch parity**: merge(build(e1), e2) == build(e1 ∪ e2) for any
  time-split — the incremental path is value-pinned against the batch
  rebuild, the same discipline as streaming/aggregates' batch parity.
- **replay idempotence**: merging the same batch twice is a no-op
  (already-applied events re-arrive as non-changes and are dropped by
  change detection).
- **key pruning**: history rows whose key has no batch event pass
  through untouched (an anti-join, not a rewrite) — at 100 TB the merge
  cost scales with the BATCH's key set, not the dimension's.

Scale shape: one hash exchange on the key for the rebuilt segment; the
affected-key filter is a broadcast semi/anti join (batch key sets are
small relative to the dimension); closed history is never re-derived.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_COLS = ["status", "valid_from", "valid_to", "is_current", "version"]


def scd2_build(
    events: DataFrame,
    key: str = "user_id",
    status_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Full SCD2 history from raw events: collapse to change rows (lag),
    then derive [valid_from, valid_to) intervals, is_current, version —
    all three window functions share one exchange on ``key``."""
    ev = events.select(
        key,
        F.col(status_col).alias("status"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak).alias("__tb"),
    )
    w = Window.partitionBy(key).orderBy("ts", "__tb")
    chg = ev.withColumn("prev", F.lag("status").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("status"))
    )
    return chg.select(
        key,
        "status",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )


def scd2_merge(
    history: DataFrame,
    batch: DataFrame,
    key: str = "user_id",
    status_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Fold a batch of new events into an existing SCD2 history.

    Late events (ts earlier than the open interval's valid_from) are
    dropped — SCD2 history is append-only in event time; a true
    rewind requires rebuilding the key from raw events (``scd2_build``).
    """
    akeys = batch.select(key).distinct()
    hist_keep = history.join(akeys, key, "left_anti")
    hist_aff = history.join(F.broadcast(akeys), key, "semi")
    closed = hist_aff.filter(~F.col("is_current"))
    open_rows = hist_aff.filter(F.col("is_current"))

    # Seed each affected key's rebuild with its open row: the seed
    # carries the current status (so equal-status batch events are
    # non-changes) and the version base. Sorting: the seed's __tb is
    # null, and nulls sort FIRST ascending — at an equal timestamp the
    # seed precedes any real event, exactly as the open row preceded
    # them in the full history.
    seed = open_rows.select(
        key,
        "status",
        F.col("valid_from").alias("ts"),
        F.lit(None).cast("long").alias("__tb"),
        F.col("version").alias("__v0"),
    )
    new_ev = (
        batch.select(
            key,
            F.col(status_col).alias("status"),
            F.col(ts_col).alias("ts"),
            F.col(tiebreak).cast("long").alias("__tb"),
        )
        # drop late arrivals: anything before the open interval started
        .join(
            F.broadcast(
                open_rows.select(key, F.col("valid_from").alias("__open_from"))
            ),
            key,
            "left",
        )
        .filter(
            F.col("__open_from").isNull()
            | (F.col("ts") >= F.col("__open_from"))
        )
        .drop("__open_from")
        .withColumn("__v0", F.lit(None).cast("bigint"))
    )

    w = Window.partitionBy(key).orderBy(
        F.col("ts").asc(), F.col("__tb").asc_nulls_first()
    )
    merged = seed.unionByName(new_ev)
    chg = merged.withColumn("prev", F.lag("status").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("status"))
    )
    # version = open row's version + changes since it; keys new to the
    # dimension have no seed, so their chain numbers from 1
    base = Window.partitionBy(key)
    rebuilt = (
        chg.withColumn("__rn", F.row_number().over(w))
        .withColumn("__base", F.max("__v0").over(base))
        .select(
            key,
            "status",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
            (
                F.coalesce(F.col("__base"), F.lit(1)) + F.col("__rn") - 1
            )
            .cast("bigint")
            .alias("version"),
        )
    )
    return hist_keep.unionByName(closed.unionByName(rebuilt))
