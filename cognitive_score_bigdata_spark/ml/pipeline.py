"""Cognitive-score ML pipeline: feature assembly, training, batch scoring.

Rebuilds the reference serving path (SURVEY §3.2) on MLlib:

- U2 feature assembly (``src/backend/main.py:36-44,87-93``): live
  wearable snapshot (heart_rate, steps, calories) merged with form
  features (sleep_duration, stress_level, caffeine_intake, screen_time,
  exercise_frequency, reaction_time, memory_test_score) →
  Imputer + StringIndexer/OneHotEncoder + VectorAssembler.
- U1 model inference (``main.py:96-103``): the reference calls a mock
  SageMaker endpoint returning ``randint(40, 100)``
  (``setup_model.py:32-35``); here a real MLlib regressor is trained on
  synthetic data with a known relation, then ``PipelineModel.transform``
  scores whole DataFrames (vectorized, distributed) instead of one HTTP
  call per request.
- J3 lookup join (``main.py:87-93``): requests ⋈ latest wearable state,
  broadcast (the state table is one row per user — always the small side
  vs a scoring batch).
- P5 threshold (``main.py:106``): score < 50 → 'Critical'.
- S11 model artifact save/load (``setup_model.py:41-58``).

Also closes the reference's acknowledged gap
(``gen_score_requests.py:87-88``): score requests carrying only
``user_id`` source their form features from the latest
``manual_entry_v1`` event per user (W1 pattern) instead of failing
validation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    Imputer,
    OneHotEncoder,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame, SparkSession

NUM_FEATURES = [
    "heart_rate",
    "steps",
    "calories",
    "sleep_duration",
    "stress_level",
    "caffeine_intake",
    "screen_time",
    "reaction_time",
    "memory_test_score",
]
CAT_FEATURES = ["exercise_frequency"]
EXERCISE_LEVELS = ["None", "Light", "Moderate", "Heavy"]
LABEL = "cognitive_score"
CRITICAL_THRESHOLD = 50


def build_pipeline(seed: int = 42) -> Pipeline:
    """Imputer → StringIndexer → OneHotEncoder → VectorAssembler → GBT."""
    imputed = [f"{c}_imp" for c in NUM_FEATURES]
    stages = [
        Imputer(strategy="median", inputCols=NUM_FEATURES, outputCols=imputed),
        StringIndexer(
            inputCol="exercise_frequency",
            outputCol="exercise_idx",
            handleInvalid="keep",
        ),
        OneHotEncoder(inputCol="exercise_idx", outputCol="exercise_vec"),
        VectorAssembler(
            inputCols=imputed + ["exercise_vec"], outputCol="features"
        ),
        GBTRegressor(
            featuresCol="features",
            labelCol=LABEL,
            maxDepth=4,
            maxIter=20,
            seed=seed,
        ),
    ]
    return Pipeline(stages=stages)


def synth_training_frame(
    spark: SparkSession, n: int = 4000, seed: int = 42
) -> DataFrame:
    """Deterministic synthetic training table with a known signal.

    The reference's 'model' is pure noise (``setup_model.py:34``); to
    have something learnable and testable we synthesize scores from a
    plausible relation (sleep ↑, stress ↓, screen time ↓, memory ↑) plus
    seeded noise, clipped to the reference's 40-100 output range.
    """
    df = spark.range(n).withColumnRenamed("id", "row_id")
    r = lambda salt: F.rand(seed + salt)  # noqa: E731
    df = df.select(
        "row_id",
        F.concat(F.lit("user-"), (F.col("row_id") % 500).cast("string")).alias(
            "user_id"
        ),
        (60 + (r(1) * 70)).alias("heart_rate"),
        (r(2) * 15000).alias("steps"),
        (500 + r(3) * 2500).alias("calories"),
        (4 + r(4) * 5).alias("sleep_duration"),
        (1 + F.floor(r(5) * 10)).cast("int").alias("stress_level"),
        (F.floor(r(6) * 3) * 100).cast("int").alias("caffeine_intake"),
        (1 + r(7) * 11).alias("screen_time"),
        (150 + r(8) * 300).alias("reaction_time"),
        (F.floor(r(9) * 101)).cast("int").alias("memory_test_score"),
        F.element_at(
            F.array(*[F.lit(x) for x in EXERCISE_LEVELS]),
            (F.floor(r(10) * 4) + 1).cast("int"),
        ).alias("exercise_frequency"),
    )
    signal = (
        F.lit(55.0)
        + 4.0 * (F.col("sleep_duration") - 6.5)
        - 2.5 * (F.col("stress_level") - 5)
        - 1.2 * (F.col("screen_time") - 6)
        + 0.25 * (F.col("memory_test_score") - 50)
        - 0.02 * (F.col("reaction_time") - 300)
        + (r(11) * 6 - 3)
    )
    return df.withColumn(
        LABEL,
        F.greatest(F.lit(40.0), F.least(F.lit(100.0), signal)),
    )


def train(spark: SparkSession, seed: int = 42) -> PipelineModel:
    return build_pipeline(seed).fit(synth_training_frame(spark, seed=seed))


def latest_form_features(events: DataFrame) -> DataFrame:
    """The predict-path fix: latest manual_entry_v1 event per user
    supplies the form features (W1 pattern over the event table)."""
    manual = events.filter(F.col("schema") == "manual_entry_v1")
    return (
        manual.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct(
                    "sleep_duration",
                    "stress_level",
                    "caffeine_intake",
                    "screen_time",
                ),
                F.col("ts"),
            ).alias("f")
        )
        .select("user_id", "f.*")
    )


def score_requests(
    model: PipelineModel,
    requests: DataFrame,
    latest_state: DataFrame,
) -> DataFrame:
    """§3.2 batch scoring: requests ⋈ latest state (broadcast) →
    transform → threshold. Returns (user_id, score, status, scored_at).

    Request-provided columns win over state columns only where the state
    is missing (the reference merges dicts with request fields taking
    precedence, ``main.py:90-93``; requests here carry no live fields, so
    coalesce order is state-then-default).
    """
    state = latest_state.select(
        "user_id",
        F.col("heart_rate").cast("double").alias("heart_rate"),
        F.col("steps").cast("double").alias("steps"),
        F.col("calories").cast("double").alias("calories"),
    )
    joined = requests.join(F.broadcast(state), "user_id", "left")
    # P7 defaults mirror the reference's default item (main.py:63-65)
    joined = joined.na.fill({"heart_rate": 0.0, "steps": 0.0, "calories": 0.0})
    scored = model.transform(joined)
    return scored.select(
        "user_id",
        F.floor(
            F.greatest(F.lit(40.0), F.least(F.lit(100.0), F.col("prediction")))
        )
        .cast("int")
        .alias("score"),
        F.when(F.col("prediction") < CRITICAL_THRESHOLD, "Critical")
        .otherwise("Normal")
        .alias("status"),
        F.current_timestamp().alias("scored_at"),
    )


def append_score_sinks(
    scored: DataFrame,
    out_dir: str,
    mode: str = "parquet",
    jdbc_url: str | None = None,
    jdbc_table: str = "cognitive_scores",
    **jdbc_kwargs,
) -> None:
    """S9: append scored rows to the cognitive_scores-shaped table.

    ``mode="parquet"`` (default) appends to the lake table;
    ``mode="jdbc"`` writes to the reference's relational edge
    (``src/backend/main.py:113-124``) via :func:`sources.sinks.write_jdbc`
    — needs a driver jar on the cluster classpath.
    """
    if mode == "jdbc":
        from cognitive_score_bigdata_spark.sources.sinks import write_jdbc

        if not jdbc_url:
            raise ValueError("mode='jdbc' needs jdbc_url")
        write_jdbc(scored, jdbc_url, jdbc_table, mode="append", **jdbc_kwargs)
        return
    scored.write.mode("append").parquet(f"{out_dir}/cognitive_scores_out")
