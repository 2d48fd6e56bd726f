"""Registry entry for the §3.2 serving/ML path, end-to-end.

The reference's predict flow (``src/backend/main.py:84-127``) is: fetch
latest wearable snapshot → merge with form features → model inference →
threshold → persist. The test suite covers each stage; this entry runs
the WHOLE path as one batch plan inside the driver's harness (rows-only:
GBT inference values aren't SQL-expressible, and the simulator's seeded
``rand`` is partition-layout dependent — stable within a run, which is
what a rows-only check needs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.ml.pipeline import (
    latest_form_features,
    score_requests,
    train,
)
from cognitive_score_bigdata_spark.operators.joins import latest_per_key_agg
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.sources.simulator import (
    gen_manual_entry_events,
    gen_tracking_events,
)
from cognitive_score_bigdata_spark.streaming.pipeline import enrich

# Serving scores with a LOADED model artifact — the reference hits an
# already-deployed endpoint per request (main.py:96-103); it does not
# retrain per query. One train per session, keyed weakly by session.
_MODEL_CACHE: dict[tuple, object] = {}


def _serving_model(spark: SparkSession):
    from cognitive_score_bigdata_spark.session_cache import session_scoped

    # a new session invalidates the old JVM model; session_scoped evicts
    # other-session entries on rebuild
    return session_scoped(_MODEL_CACHE, spark, (), lambda: train(spark))


@register(
    "ml_score_batch",
    oracle=None,  # model inference — not SQL; path semantics pinned in test_ml
    doc="§3.2 serving path as one batch plan: simulated event streams → "
    "event-time latest state + latest form features → broadcast lookup "
    "join → MLlib pipeline transform → threshold classification "
    "(main.py:84-127, with the predict-path fix of SURVEY §2.10)",
)
def ml_score_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    tracking = enrich(gen_tracking_events(spark, n=200, n_users=10))
    manual = enrich(gen_manual_entry_events(spark, n=40, n_users=10))

    latest_state = latest_per_key_agg(
        tracking, "user_id", "ts", ["heart_rate", "steps", "calories"]
    )
    form = latest_form_features(
        manual.withColumn("schema", F.lit("manual_entry_v1"))
    )
    # form events carry no reaction_time / memory_test_score (the
    # reference's acknowledged gap, gen_score_requests.py:87-88): leave
    # them null — the pipeline's Imputer fills the training median
    requests = (
        form.select(
            "user_id",
            "sleep_duration",
            "stress_level",
            "caffeine_intake",
            "screen_time",
        )
        .withColumn("exercise_frequency", F.lit("Moderate"))
        .withColumn("reaction_time", F.lit(None).cast("double"))
        .withColumn("memory_test_score", F.lit(None).cast("double"))
    )

    model = _serving_model(spark)
    return score_requests(model, requests, latest_state).select(
        "user_id", "score", "status"
    )
