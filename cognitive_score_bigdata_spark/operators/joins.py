"""Join-shaped operators: as-of join and latest-per-key.

The reference joins wearable snapshots to score events on *exact*
timestamp equality (``src/backend/main.py:147-148``) — the stated intent
("heart rate at score time") is an **as-of** join, which Spark has no
native operator for. A naive implementation (equi-join on key plus
``r.ts <= l.ts`` range predicate, then max-per-left-row) degenerates to
O(n·m) work per key at scale. :func:`asof_join` instead uses the
union-tag formulation: one shuffle, one sort, linear scan — the same plan
shape Spark uses for windowed aggregation, so it survives a 100× scale-up
as long as single keys fit a partition (salt upstream if a key is
pathologically hot).

``latest_per_key`` is the reference's DynamoDB ``Limit=1,
ScanIndexForward=False`` read (``src/backend/main.py:55-65``) and the
stream processor's per-batch last-write-wins reduce
(``src/stream_processor.py:32-40``), generalized and made event-time
deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_TS = "__asof_ts"
_SIDE = "__asof_is_right"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join (inclusive): for each left row, attach the right row
    with the greatest ``right_ts <= left_ts`` per key
    (``direction="backward"``, the default) or the smallest ``right_ts
    >= left_ts`` (``direction="forward"`` — the "next reading after"
    lookup: next maintenance slot, next price tick, next event).

    Unmatched left rows are kept with nulls (left-outer semantics).
    Right columns are renamed with ``suffix`` if they collide with left
    column names; ``right_ts`` always appears as ``{right_ts}{suffix}``.

    Plan shape: unionByName → single shuffle on ``on`` → per-partition
    sort → running ``last(ignorenulls)`` — no range join, no cartesian
    blow-up per key. ``forward`` is the same plan with the scan order
    reversed: descending timestamps mean the running "last seen right
    row" at a left row is the nearest FUTURE one.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = [c for c in (right_cols or right.columns) if c not in keys]

    payload_fields = [F.col(c).alias(c) for c in right_cols if c != right_ts]
    payload_fields.append(F.col(right_ts).alias(right_ts))
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.struct(*payload_fields).alias(_PAYLOAD),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )

    # Right rows sort *before* left rows at equal timestamps so the
    # inclusive (<=) match is visible to the left row. The payload struct
    # is the final sort key: without it, two right rows sharing (key,
    # right_ts) reach last() in partition-layout order and the winner
    # changes across runs — with it, the greatest payload struct wins the
    # tie deterministically (struct comparison is field-wise, total).
    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col(_SIDE).desc(), F.col(_PAYLOAD).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r, allowMissingColumns=True).withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )

    out = merged.filter(F.col(_SIDE) == 0)
    taken = set(left.columns)
    for c in right_cols:
        name = c if c not in taken else f"{c}{suffix}"
        out = out.withColumn(name, F.col(f"{_PAYLOAD}.{c}"))
    return out.drop(_TS, _SIDE, _PAYLOAD)


def latest_per_key(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per key: the greatest ``order_col`` (W1 semantics).

    Window ``row_number() == 1`` keeps the *whole* row; when only a few
    columns are needed prefer :func:`latest_per_key_agg`, which Catalyst
    plans as a partial-aggregating hash agg (map-side combine, smaller
    shuffle) instead of a full sort.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Latest-per-key as an aggregate: ``max_by`` over the order column.

    Equivalent to :func:`latest_per_key` projected to ``keys + value_cols
    + [order_col]`` when ``(keys, order_col)`` is unique; cheaper at scale
    because partial aggregation halves the shuffle.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    aggs = [F.max_by(F.col(c), F.col(order_col)).alias(c) for c in value_cols]
    aggs.append(F.max(order_col).alias(order_col))
    return df.groupBy(*keys).agg(*aggs)
