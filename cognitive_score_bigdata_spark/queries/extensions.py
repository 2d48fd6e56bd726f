"""Coverage extensions: pivot, posexplode, percentile windows, advanced
strings, interval arithmetic, pruned time-range scans, salted-skew join
(result-identical to its plain equivalent — the oracle *is* the plain
join), and seeded sampling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import (
    load_events_time_range,
    load_table,
)
from cognitive_score_bigdata_spark.operators.skew import salted_join
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import sql_dsum

EVENT_TYPES = ["click", "view", "error", "purchase", "signup"]
# spliced as SQL literals into the pivot oracle below — a quote in a
# future entry would silently alter the oracle (the _sql_in class,
# ADVICE r8); fail loudly at import instead.  ValueError, not assert:
# asserts vanish under `python -O` (ADVICE r9).
if any("'" in t for t in EVENT_TYPES):
    raise ValueError(f"EVENT_TYPES must not contain quotes: {EVENT_TYPES!r}")


@register(
    "agg_pivot_event_types",
    oracle="""
    SELECT user_id,
           {cols}
    FROM events GROUP BY user_id
    """.format(
        cols=",\n           ".join(
            sql_dsum(f"CASE WHEN event_type = '{t}' THEN value END", t)
            for t in EVENT_TYPES
        )
    ),
    doc="pivot (wide aggregation): per-user value sums by event type; "
    "explicit value list keeps the plan single-pass (no distinct scan)",
)
def agg_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
        )
    )


@register(
    "join_posexplode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
           UNNEST(embedding) AS component
    FROM embeddings
    WHERE vec_id < 50
    """,
    doc="U4 positional explode: array element with its ordinal "
    "(db_loader.py:102-108 ownership arrays are ordered)",
)
def join_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "component")
    )


@register(
    "window_percentiles",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    doc="percent_rank / cume_dist — rank-ratio analytics (deterministic "
    "integer-ratio doubles, engine-portable)",
)
def window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "scalar_string_advanced",
    oracle="""
    SELECT event_id,
           regexp_extract(event_type, '([aeiou]+)', 1) AS first_vowels,
           lpad(CAST(user_id AS VARCHAR), 6, '0') AS uid_padded,
           reverse(event_type) AS et_rev,
           repeat(event_type, 2) AS et_twice,
           CAST(strpos(event_type, 'c') AS BIGINT) AS c_pos,
           translate(event_type, 'aeiou', 'AEIOU') AS et_caps_vowels,
           trim(concat('  ', event_type, '  ')) AS et_trimmed
    FROM events
    """,
    doc="F7 extended string surface: regexp_extract, lpad, reverse, "
    "repeat, instr/strpos, translate, trim",
)
def scalar_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.regexp_extract("event_type", "([aeiou]+)", 1).alias("first_vowels"),
        F.lpad(F.col("user_id").cast("string"), 6, "0").alias("uid_padded"),
        F.reverse("event_type").alias("et_rev"),
        F.repeat("event_type", 2).alias("et_twice"),
        F.instr(F.col("event_type"), "c").cast("bigint").alias("c_pos"),
        F.translate("event_type", "aeiou", "AEIOU").alias("et_caps_vowels"),
        F.trim(F.concat(F.lit("  "), F.col("event_type"), F.lit("  "))).alias(
            "et_trimmed"
        ),
    )


@register(
    "scalar_interval",
    oracle="""
    SELECT event_id, ts,
           ts + INTERVAL '1 day' AS ts_plus_day,
           ts - INTERVAL '2 hours' AS ts_minus_2h,
           ts + INTERVAL '90 minutes' AS ts_plus_90m
    FROM events
    """,
    doc="F1/F12 interval arithmetic on event time",
)
def scalar_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts_plus_day"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("ts_minus_2h"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
    )


@register(
    "scan_time_range_pruned",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts < TIMESTAMP '2024-01-12 00:00:00'
    """,
    doc="time-range scan with the bound pushed onto the raw nano-epoch "
    "column (row groups outside the range never decompress) — the "
    "partition-pruning pattern for the cold-path event lake",
)
def scan_time_range_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events_time_range(
        spark, sf_dir, "2024-01-10 00:00:00", "2024-01-12 00:00:00"
    ).select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "join_salted_skew",
    oracle="""
    SELECT e.event_id, e.user_id, e.value, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
    doc="skew-salted join (operators/skew.py): deterministic salt on the "
    "skewed side, n-fold replication of the small side — result-"
    "identical to the plain equi-join, which is the oracle",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withColumnRenamed("user_id", "c_custkey")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return salted_join(
        events, customer, on="c_custkey", unique_col="event_id", n_salts=8
    ).select(
        "event_id",
        F.col("c_custkey").alias("user_id"),
        "value",
        "c_name",
        "c_mktsegment",
    )


@register(
    "agg_median",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_linenumber, 0.5) AS median_lineno
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="exact median (interpolated percentile) — safe cross-engine on "
    "integer-valued inputs where midpoints are exactly representable",
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_linenumber, 0.5)").alias("median_lineno"),
        )
    )


@register(
    "agg_percentile_approx",
    oracle=None,  # t-digest/GK sketches are engine-specific
    doc="approx_percentile — the sketch that replaces exact sort-based "
    "quantiles at 100 TB; bounds vs exact pinned in tests",
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias(
                "approx_median_price"
            ),
        )
    )


@register(
    "scalar_regexp_replace",
    oracle="""
    SELECT event_id,
           regexp_replace(event_type, '[aeiou]', '_', 'g') AS devoweled,
           regexp_replace(event_type, '^(.)', 'X', 'g') AS head_masked
    FROM events
    """,
    doc="global regexp_replace — Spark is always global; DuckDB needs "
    "the explicit 'g' flag (a documented cross-engine trap)",
)
def scalar_regexp_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.regexp_replace("event_type", "[aeiou]", "_").alias("devoweled"),
        F.regexp_replace("event_type", "^(.)", "X").alias("head_masked"),
    )


@register(
    "sample_seeded",
    oracle=None,  # engine RNGs differ; determinism within Spark is tested
    doc="Bernoulli sampling with a fixed seed — corpus subsampling for "
    "training-data pipelines; per-partition deterministic",
)
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .sample(fraction=0.1, seed=42)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )
