"""Session-scoped build-artifact cache.

Several queries reuse expensive per-(session, dataset) build artifacts —
bucketed tables, ANN codebooks/code tables, BM25 postings, k-means
centroids — the way production reuses an index file: pay the build once,
probe many times. Those caches were keyed by ``id(spark)``, which is
unsafe: after a SparkSession is garbage-collected, CPython can reuse the
id, handing a *new* session a persisted DataFrame bound to a stopped
SparkContext. Key by ``sparkContext.applicationId`` instead — unique per
context for the process lifetime, never recycled.

Eviction: on first build under a new applicationId, entries recorded
under any other applicationId are dropped (their sessions are gone or
irrelevant; the JVM-side persisted blocks died with their context, so
dropping the Python references is the whole cleanup).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession


def session_scoped(
    store: dict,
    spark: SparkSession,
    key: tuple,
    build: Callable[[], Any],
) -> Any:
    """Return ``store[(appId,)+key]``, building (and caching) on miss.

    On miss, entries belonging to other applicationIds are evicted
    before the build runs.
    """
    app = spark.sparkContext.applicationId
    full = (app, *key)
    if full not in store:
        for stale in [k for k in store if k[0] != app]:
            del store[stale]
        store[full] = build()
    return store[full]
