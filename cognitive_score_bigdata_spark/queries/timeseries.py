"""Time-series operators Spark lacks as built-ins: gap-filled resample
and bounded-interval range self-join.

The reference's tables are timestamped event streams (SURVEY §1:
``tracking_risks``/``cognitive_scores``/the Kinesis stream); dashboards
over those need per-period counts *including empty periods* and
"events close in time" correlation — both classic warehouse asks with
no single DataFrame primitive:

- **gap-fill**: the observed span is materialized once (1-row agg →
  ``sequence`` → explode → broadcast), the key×period grid is a
  broadcast cross join against the distinct-key side, and observed
  counts left-join onto it. Nothing here scales with raw event count
  except the pre-aggregated counts table.
- **range join**: the naive θ-join (``|ta-tb| <= w``) is O(n²) per key;
  binning event times to width-w buckets and exploding one side to its
  two adjacent bins turns it into an equi-join on (key, bin) whose
  candidates are only same-neighborhood pairs — the standard
  interval-bucketing trick (what Databricks' range-join hint does under
  the hood), expressible in open-source Spark with explode + equi-join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register

WINDOW_S = 60


@register(
    "timeseries_gapfill_daily",
    oracle="""
    WITH span AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events),
    days AS (
      SELECT CAST(unnest(generate_series(
               CAST((SELECT d0 FROM span) AS TIMESTAMP),
               CAST((SELECT d1 FROM span) AS TIMESTAMP),
               INTERVAL 1 DAY)) AS DATE) AS day),
    counts AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2)
    SELECT u.user_id, d.day,
           COALESCE(c.n_events, 0) AS n_events
    FROM (SELECT DISTINCT user_id FROM events) u
    CROSS JOIN days d
    LEFT JOIN counts c ON c.user_id = u.user_id AND c.day = d.day
    """,
    doc="gap-filled daily resample: per-user daily event counts with "
    "zero rows for silent days — sequence/explode span grid broadcast "
    "against distinct keys, counts left-joined on",
)
def timeseries_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    users = ev.select("user_id").distinct()
    counts = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        users.crossJoin(F.broadcast(days))
        .join(counts, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        )
    )


@register(
    "range_join_time_binned",
    oracle=f"""
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {WINDOW_S} * 1000000
    """,
    doc="bounded range self-join: same-user event pairs within 60s — "
    "time-binned to width-w buckets, one side exploded to adjacent "
    "bins, equi-join on (user, bin) + exact residual filter; candidates "
    "are O(neighborhood) instead of O(n²) per key",
)
def range_join_time_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        # unix_micros requires TIMESTAMP (not NTZ); the session tz is
        # pinned UTC, so the cast is an identity relabel
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    bin_ = (F.col("us") / F.lit(WINDOW_S * 1_000_000)).cast("bigint")
    # explode side a to its own and the NEXT bin: a pair within w whose
    # members straddle a bin boundary meets where the earlier event is
    # promoted; same-bin pairs meet in their shared bin
    a = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("id_a"),
        F.col("us").alias("us_a"),
        F.explode(F.array(bin_, bin_ + 1)).alias("bin"),
    )
    b = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("id_b"),
        F.col("us").alias("us_b"),
        bin_.alias("bin"),
    )
    gap = F.abs(F.col("us_a") - F.col("us_b"))
    # normalize AFTER the join: filtering on exploded-side id < other-side
    # id would drop boundary pairs whose later event has the smaller id
    # (only the earlier event's explosion reaches the later event's bin)
    return (
        a.join(b, ["user_id", "bin"])
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (gap <= WINDOW_S * 1_000_000)
        )
        .select(
            "user_id",
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            gap.alias("gap_us"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
