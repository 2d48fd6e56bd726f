"""Batch ETL: CPMS CSV seed data → relational parquet tables.

Spark-native rebuild of the reference loader (``scripts/db_loader.py``):

- S1   typed CSV scans with explicit schemas (``db_loader.py:90-97``)
- F6   stringified Python-list ID arrays → ``array<string>``
       (``db_loader.py:99-108``: ``ast.literal_eval`` over values like
       ``"['id1', 'id2']"``)
- J4   ownership resolution: explode parent arrays → child→owner map
       (``db_loader.py:85-112``)
- P4   FK integrity: children without an owner are dropped — the inner
       join to the ownership map *is* the semi filter
       (``db_loader.py:121-129,138-155``)
- P6   ``hearth_rate`` → ``heart_rate`` rename (``db_loader.py:64,152``)
- F10  ISO-8601 timestamp parse (``data/cognitive_scores.csv:2``)
- S10  DDL → partitioned parquet writes instead of Postgres CREATE TABLE
       (``db_loader.py:40-77``); Spark has no FK enforcement, so
       integrity is join-time by construction.

The reference loads row-by-row with executemany per 1000 rows; here each
table is one distributed job — scan → explode → shuffle on the child id →
write, which is the shape that survives 100 TB (the ownership map is
usually small enough to broadcast; Spark's AQE decides).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

USERS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("date_of_birth", T.DateType(), True),
        T.StructField("diet_type", T.StringType(), True),
        T.StructField("cognitive_scores", T.StringType(), True),
        T.StructField("risk_trackings", T.StringType(), True),
    ]
)

SCORES_SCHEMA = T.StructType(
    [
        T.StructField("cs_id", T.StringType(), False),
        T.StructField("event_id", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("cognitive_score", T.IntegerType(), True),
    ]
)

RISKS_SCHEMA = T.StructType(
    [
        T.StructField("tr_id", T.StringType(), False),
        T.StructField("event_id", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("steps", T.IntegerType(), True),
        T.StructField("distance", T.DoubleType(), True),
        T.StructField("hearth_rate", T.IntegerType(), True),  # source typo, P6
        T.StructField("calories", T.IntegerType(), True),
        T.StructField("risk_metric", T.StringType(), True),
    ]
)


def parse_id_array(col) -> F.Column:
    """F6: ``"['id1', 'id2']"`` → array<string>.

    Single-quoted Python literals are rewritten to JSON before
    ``from_json``. IDs are uuid4 hex (no embedded apostrophes), which the
    reference's ``ast.literal_eval`` also silently relies on.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.from_json(F.regexp_replace(c, "'", '"'), "array<string>"),
        F.array().cast("array<string>"),
    )


def read_users(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.csv(path, header=True, schema=USERS_SCHEMA)
    return df.withColumn(
        "cognitive_scores", parse_id_array("cognitive_scores")
    ).withColumn("risk_trackings", parse_id_array("risk_trackings"))


def ownership_map(users: DataFrame, array_col: str, child_key: str) -> DataFrame:
    """J4: one (child_key, user_id) row per owned child id."""
    return users.select(
        F.col("user_id").alias("owner_user_id"),
        F.explode(array_col).alias(child_key),
    )


def load_cognitive_scores(
    spark: SparkSession, users: DataFrame, path: str
) -> DataFrame:
    scores = spark.read.csv(path, header=True, schema=SCORES_SCHEMA)
    owners = ownership_map(users, "cognitive_scores", "cs_id")
    # Inner join = P4 integrity filter: orphan children are dropped, as in
    # db_loader.py:121-129 ("skip rows whose id has no owning user").
    return (
        scores.join(F.broadcast(owners), "cs_id", "inner")
        .withColumnRenamed("owner_user_id", "user_id")
        .select("cs_id", "user_id", "event_id", "timestamp", "cognitive_score")
    )


def load_tracking_risks(
    spark: SparkSession, users: DataFrame, path: str
) -> DataFrame:
    risks = spark.read.csv(path, header=True, schema=RISKS_SCHEMA)
    owners = ownership_map(users, "risk_trackings", "tr_id")
    return (
        risks.join(F.broadcast(owners), "tr_id", "inner")
        .withColumnRenamed("owner_user_id", "user_id")
        .withColumnRenamed("hearth_rate", "heart_rate")  # P6
        .select(
            "tr_id",
            "user_id",
            "event_id",
            "timestamp",
            "steps",
            "distance",
            "heart_rate",
            "calories",
            "risk_metric",
        )
    )


def run_etl(
    spark: SparkSession,
    users_csv: str,
    scores_csv: str,
    risks_csv: str,
    out_dir: str,
) -> dict[str, int]:
    """Full loader job: CSVs → three parquet tables under ``out_dir``.

    Children are written partitioned by score/event date — implementing
    the date-partition intent the reference comments about but never
    ships (``src/ingestion.py:32-33``) — so downstream time-ranged scans
    prune partitions.
    """
    users = read_users(spark, users_csv)
    scores = load_cognitive_scores(spark, users, scores_csv)
    risks = load_tracking_risks(spark, users, risks_csv)

    users_flat = users.select("user_id", "date_of_birth", "diet_type")
    users_flat.write.mode("overwrite").parquet(f"{out_dir}/users")
    (
        scores.withColumn("score_date", F.to_date("timestamp"))
        .write.mode("overwrite")
        .partitionBy("score_date")
        .parquet(f"{out_dir}/cognitive_scores")
    )
    (
        risks.withColumn("event_date", F.to_date("timestamp"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(f"{out_dir}/tracking_risks")
    )
    return {
        "users": spark.read.parquet(f"{out_dir}/users").count(),
        "cognitive_scores": spark.read.parquet(
            f"{out_dir}/cognitive_scores"
        ).count(),
        "tracking_risks": spark.read.parquet(f"{out_dir}/tracking_risks").count(),
    }
