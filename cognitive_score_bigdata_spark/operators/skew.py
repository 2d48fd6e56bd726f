"""Skew mitigation: salted joins and two-stage aggregation.

The CPMS event stream is keyed by ``user_id`` (reference
``src/ingestion.py:48``); real user populations are Zipfian, so at 100 TB
a handful of keys can dwarf every shuffle partition. AQE's skew-join
splitting handles sort-merge joins it can observe; these helpers cover
the cases it can't — broadcast-ineligible hash joins against replicable
small-to-medium tables, and high-cardinality-output aggregations.

Salting is deterministic here (hash of a unique column, never ``rand``)
so results are reproducible and retry-stable.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_SALT = "__salt"


def with_salt(df: DataFrame, unique_col: str, n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts) from a unique column's hash."""
    return df.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int")
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the left side has skewed join keys.

    The skewed side is salted by a unique column; the small side is
    replicated n_salts× (explode of a literal range) so every
    (key, salt) bucket finds its match. Shuffle then distributes each
    hot key over n_salts partitions instead of one.

    ``small`` must be small enough to replicate n_salts× (it usually is:
    if it were broadcastable you wouldn't need salting; if it's huge,
    use AQE skew-join handling instead).
    """
    keys = [on] if isinstance(on, str) else list(on)
    left = with_salt(skewed, unique_col, n_salts)
    right = small.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    out = left.join(right, [*keys, _SALT], how)
    return out.drop(_SALT)


def salted_two_stage_agg(
    df: DataFrame,
    keys: Sequence[str],
    unique_col: str,
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Aggregate with a salted pre-stage: groupBy(keys+salt) first, then
    groupBy(keys) over the partials.

    Catalyst's map-side partial aggregation already covers most skew for
    algebraic aggregates; this explicit form is for compositions where
    the partial state per key is large (collect-style, exact distinct)
    and a single reducer per hot key would spill.

    ``partial_aggs`` produce intermediate columns; ``final_aggs`` must
    re-aggregate those intermediates (caller names both sides).
    """
    salted = with_salt(df, unique_col, n_salts)
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
