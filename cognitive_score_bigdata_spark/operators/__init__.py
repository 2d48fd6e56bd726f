"""Reusable distributed operators the DataFrame API lacks first-class.

Everything here is a composition of built-in Spark operators (one shuffle
where one is required, broadcast where a side is small) — no RDDs, no
row-at-a-time Python in hot paths.
"""

from cognitive_score_bigdata_spark.operators.joins import (
    asof_join,
    latest_per_key,
    latest_per_key_agg,
)

__all__ = ["asof_join", "latest_per_key", "latest_per_key_agg"]
