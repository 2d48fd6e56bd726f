"""Round-3 query additions, imported FIRST so each gets a driver row.

The driver's correctness harness checks the first 50 registry entries per
round; this module sits at the head of ``load_registry``'s import list so
every query added this round is inside the window (each addition pushes
one already-r1-verified filler out of the tail — the right trade).

Contents:

- ``ml_feature_assembly`` — the deterministic portion of the §3.2 serving
  path (reference ``src/backend/main.py:55-93``: latest-state lookup join
  + form-feature merge + P7 defaults + U3 threshold) as an oracle-checked
  query, leaving only the GBT ``transform`` itself rows-only in
  ``ml_score_batch``.
- ``text_rolling_fingerprint`` — moved from ``queries/textops.py`` and
  upgraded from rows-only to a full DuckDB oracle (the token hash is now
  md5-derived, portable to any engine; see ``functions/text.token_hash``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.functions import text as TX
from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register


@register(
    "ml_feature_assembly",
    oracle="""
    WITH latest AS (
      SELECT user_id,
             arg_max(value, ts) FILTER (WHERE event_type = 'view')
               AS hr_proxy,
             arg_max(value, ts) FILTER (WHERE event_type = 'click')
               AS steps_proxy,
             arg_max(value, ts) FILTER (WHERE event_type = 'error')
               AS cal_proxy
      FROM events
      WHERE event_type IN ('view', 'click', 'error')
      GROUP BY user_id
    ),
    form AS (
      SELECT user_id, arg_max(value, ts) AS form_value, MAX(ts) AS form_ts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT f.user_id, f.form_value, f.form_ts,
           COALESCE(l.hr_proxy, CAST(0 AS DOUBLE)) AS hr_proxy,
           COALESCE(l.steps_proxy, CAST(0 AS DOUBLE)) AS steps_proxy,
           COALESCE(l.cal_proxy, CAST(0 AS DOUBLE)) AS cal_proxy,
           CASE WHEN f.form_value < 50 THEN 'Critical' ELSE 'Normal' END
             AS status
    FROM form f LEFT JOIN latest l ON f.user_id = l.user_id
    """,
    doc="§3.2 feature assembly, the deterministic serving-path prefix "
    "(main.py:55-93): per-user latest live readings across three event "
    "channels (J5/W1 as a two-level aggregate — latest per (user, "
    "channel), then a conditional pivot), broadcast-merged with the "
    "latest form event (J3), null state defaulted to 0 (P7), threshold "
    "status (U3/P5). Only the model transform itself stays rows-only "
    "(ml_score_batch)",
)
def ml_feature_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # latest reading per (user, channel): one shuffle on the composite
    # key, map-side combine; the per-user pivot then reuses the same
    # hash partitioning (user_id is a prefix of the grouping key).
    per_channel = (
        events.filter(F.col("event_type").isin("view", "click", "error"))
        .groupBy("user_id", "event_type")
        .agg(F.max_by("value", "ts").alias("v"))
    )
    chan = lambda t: F.max(  # noqa: E731 — one row per channel, max = value
        F.when(F.col("event_type") == t, F.col("v"))
    )
    latest = per_channel.groupBy("user_id").agg(
        chan("view").alias("hr_proxy"),
        chan("click").alias("steps_proxy"),
        chan("error").alias("cal_proxy"),
    )
    form = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max_by("value", "ts").alias("form_value"),
            F.max("ts").alias("form_ts"),
        )
    )
    return form.join(latest, "user_id", "left").select(
        "user_id",
        "form_value",
        "form_ts",
        F.coalesce("hr_proxy", F.lit(0.0)).alias("hr_proxy"),
        F.coalesce("steps_proxy", F.lit(0.0)).alias("steps_proxy"),
        F.coalesce("cal_proxy", F.lit(0.0)).alias("cal_proxy"),
        F.when(F.col("form_value") < 50, "Critical")
        .otherwise("Normal")
        .alias("status"),
    )


@register(
    "text_rolling_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split_regex(text, ' +'),
                 t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)
                      % 2147483647)),
             (acc, t) -> (acc * 31 + t) % 2147483647
           ) AS rolling_fp
    FROM documents
    """,
    doc="order-sensitive polynomial rolling hash over the token stream "
    "(content fingerprint that distinguishes permuted documents, unlike "
    "md5-of-body on normalized text). Token hash is md5-derived (first "
    "15 hex chars as a 60-bit long mod 2^31-1) so the fold is exact on "
    "both engines; list_prepend(0, ...) gives DuckDB's seedless "
    "list_reduce the same initial accumulator as Spark's aggregate",
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.rolling_fingerprint("text").alias("rolling_fp")
    )
