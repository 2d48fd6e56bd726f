"""Statistical profiles over events/documents: robust anomaly
flags, distribution statistics, event cohort profiles, data-quality
audits (split out of ``round4_staging2.py`` in round 16 — registry
keys unchanged).

Everything is expression-only over one or two scans — integer-exact
or DECIMAL accumulators where cross-engine agreement needs it; the
per-query doc= blurbs carry the plan and 100 TB notes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register

# ---------------------------------------------------------------------------
# profile_table_stats
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@register(
    "profile_table_stats",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders"""
        for c in _PROFILE_COLS
    ),
    doc="table profiling (the ANALYZE/data-quality summary every "
    "warehouse job starts with): per-column row/null/distinct counts "
    "for orders, computed in ONE scan — all 6x3 aggregates in a single "
    "groupBy().agg(...) (Catalyst expands the multi-distinct into one "
    "Expand + two-phase agg), then stack() unpivots the 1-row wide "
    "result to one row per column. The oracle spells it as 6 UNION ALL "
    "scans; the Spark side deliberately does NOT — at 100 TB one scan "
    "vs six is the whole game",
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = orders.groupBy().agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_expr}) AS "
        "(column_name, n_nulls, n_distinct)",
        "n_rows",
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# anomaly_daily_mad
# ---------------------------------------------------------------------------

MAD_K = 3  # flag days with |x - median| > K * MAD


@register(
    "anomaly_daily_mad",
    oracle=f"""
    WITH counts AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY n, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM counts
    ),
    med AS (
      SELECT event_type, n AS med FROM ranked WHERE rn = (cnt + 1) // 2
    ),
    dev AS (
      SELECT c.event_type, c.day, c.n, m.med,
             CAST(abs(c.n - m.med) AS BIGINT) AS dev
      FROM counts c JOIN med m USING (event_type)
    ),
    rdev AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY dev, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM dev
    ),
    mad AS (
      SELECT event_type, dev AS mad FROM rdev WHERE rn = (cnt + 1) // 2
    )
    SELECT d.event_type, d.day, d.n, d.med, a.mad, d.dev
    FROM dev d JOIN mad a USING (event_type)
    WHERE d.dev > {MAD_K} * a.mad
    """,
    doc="robust daily anomaly flags via median absolute deviation: "
    "per-type daily counts, median by lower-nearest-rank selection, "
    "MAD = same selection over |x - med|, flag dev > 3*MAD. Entirely "
    "integer arithmetic (counts, ranks, absolute deviations) — exact "
    "cross-engine with no moments, which is the point: one 1000x spike "
    "day shifts a mean/stddev z-score enough to mask itself (and a "
    "second spike), but moves the median not at all. Complements "
    "anomaly_daily_zscore's moment-based score; both are two window "
    "passes over a day-level table that is tiny next to the scan",
)
def anomaly_daily_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def _lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col, "day")
        cw = Window.partitionBy("event_type")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("cnt", F.count(F.lit(1)).over(cw))
            .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
            .select("event_type", F.col(col).alias(out))
        )

    med = _lower_median(counts, "n", "med")
    dev = counts.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("n") - F.col("med")).cast("bigint")
    )
    mad = _lower_median(dev, "dev", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > MAD_K * F.col("mad"))
        .select("event_type", "day", "n", "med", "mad", "dev")
    )


# ---------------------------------------------------------------------------
# agg_trend_slope_by_type
# ---------------------------------------------------------------------------


@register(
    "agg_trend_slope_by_type",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE)
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept
    FROM s
    """,
    doc="per-group least-squares trend line (daily volume vs epoch day) "
    "in ONE aggregation pass: slope = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) "
    "from four BIGINT sufficient-statistic sums — x and y are integers, "
    "so every accumulator is exact and the only floating point is the "
    "final division over identical operands (identical IEEE result "
    "cross-engine). The single-pass sufficient-statistics shape is how "
    "regression/trend detection runs at 100 TB: no per-group iteration, "
    "no driver fitting, just a partial-agg-friendly groupBy",
)
def agg_trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("bigint").alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "event_type",
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


# ---------------------------------------------------------------------------
# agg_equidepth_deciles
# ---------------------------------------------------------------------------


@register(
    "agg_equidepth_deciles",
    oracle="""
    WITH t AS (
      SELECT value, event_id,
             ntile(10) OVER (ORDER BY value, event_id) AS decile
      FROM events
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM t GROUP BY decile
    """,
    doc="equi-depth histogram via NTILE(10): each bucket holds the same "
    "row count and the (lo, hi] bounds trace the empirical deciles — "
    "the complement of agg_histogram_value's equi-WIDTH bins, and the "
    "exact audit for approx_percentile-derived bucketing. event_id "
    "tiebreak makes bucket assignment deterministic for duplicate "
    "values. The global NTILE is a single total-order sort; at 100 TB "
    "the production form is approx quantile cuts + a broadcast "
    "range-bin join (quality_rank_normalize shows the per-group "
    "rank-percentile variant that avoids the global sort entirely)",
)
def agg_equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    t = ev.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("value", "event_id"))
    )
    return t.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


# ---------------------------------------------------------------------------
# events_session_conversion
# ---------------------------------------------------------------------------


@register(
    "events_session_conversion",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, sid,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM (SELECT user_id, ts, event_type,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked)
      GROUP BY user_id, sid
    )
    SELECT CASE WHEN n_events <= 2 THEN 'short'
                WHEN n_events <= 5 THEN 'medium'
                ELSE 'long' END AS session_len,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST((SUM(converted) * 1000000) // COUNT(*) AS BIGINT)
             AS conv_micro
    FROM sess
    GROUP BY 1
    """,
    doc="session-level conversion by session length (the do-longer-"
    "sessions-convert product question): 30-min-gap sessionization, a "
    "per-session converted flag (MAX over an indicator — "
    "order-insensitive), then length-bucketed conversion in integer "
    "micro-units. Composes the session window with conditional "
    "aggregation; two keyed exchanges total (sessionize, bucket-agg) "
    "and the session table is already tiny relative to the scan",
)
def events_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.streaming.windows import session

    ev = load_table(spark, sf_dir, "events")
    sess = session(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        ],
    )
    bucket = (
        F.when(F.col("n_events") <= 2, "short")
        .when(F.col("n_events") <= 5, "medium")
        .otherwise("long")
    )
    return (
        sess.groupBy(bucket.alias("session_len"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("converted").cast("bigint").alias("n_converted"),
        )
        .select(
            "session_len",
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            "n_converted",
            F.expr("(n_converted * 1000000) div n_sessions")
            .cast("bigint")
            .alias("conv_micro"),
        )
    )


# ---------------------------------------------------------------------------
# agg_weighted_median_by_source
# ---------------------------------------------------------------------------


@register(
    "agg_weighted_median_by_source",
    oracle="""
    WITH w AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n_chars) OVER (PARTITION BY source) AS total
      FROM documents
    )
    SELECT source,
           MIN(n_chars) FILTER (2 * cum >= total) AS weighted_median_chars,
           CAST(MAX(total) AS BIGINT) AS total_chars
    FROM w GROUP BY source
    """,
    doc="weighted median document length per source: the n_chars value "
    "at which the cumulative character mass crosses half the total — "
    "lower-weighted-nearest-rank selection via the integer predicate "
    "2*cum >= total, so a handful of giant documents can't drag the "
    "'typical length' the way a weighted MEAN lets them. Same exact "
    "prefix-sum machinery as the systematic sampler; one keyed window "
    "+ one aggregate. MIN FILTER picks the crossing row without a "
    "second window pass",
)
def agg_weighted_median_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cum_w = Window.partitionBy("source").orderBy(
        "n_chars", "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot_w = Window.partitionBy("source")
    w = docs.select(
        "source",
        "n_chars",
        F.sum("n_chars").over(cum_w).alias("cum"),
        F.sum("n_chars").over(tot_w).alias("total"),
    )
    return w.groupBy("source").agg(
        F.min(F.when(2 * F.col("cum") >= F.col("total"), F.col("n_chars")))
        .alias("weighted_median_chars"),
        F.max("total").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# ml_kfold_assignment / agg_corr_value_hour
# ---------------------------------------------------------------------------

KFOLDS = 5


@register(
    "ml_kfold_assignment",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, source, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS UBIGINT) % {KFOLDS} AS fold
      FROM documents
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM f GROUP BY fold
    """,
    doc="deterministic k-fold assignment (k=5) by hash-mod of the "
    "document id — the cross-validation prep that must be reproducible "
    "across engines, reruns, and cluster sizes (a random split is "
    "none of those); per-fold size/mass/source stats let a consumer "
    "check balance before training. Same md5->60-bit mechanism as the "
    "holdout split (corpus_train_holdout_split), generalized to k "
    "ways; embarrassingly parallel, one aggregate",
)
def ml_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fold = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(KFOLDS),
    )
    return (
        docs.withColumn("fold", fold.cast("bigint"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
    )


@register(
    "agg_corr_value_hour",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS x,
             CAST(CAST(value AS DECIMAL(19,6)) * 1000 AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM d GROUP BY event_type
    )
    SELECT event_type, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             AS pearson_r
    FROM s
    """,
    doc="Pearson correlation (value vs hour-of-day, per event type) "
    "from one-pass integer sufficient statistics: y in exact "
    "micro-units, all five sums exact, and the only floating point is "
    "division and sqrt over identical operands — sqrt is CORRECTLY "
    "ROUNDED by IEEE 754 (unlike ln/exp/pow), so the result is "
    "bit-identical cross-engine and the correlation earns a hash row "
    "where corr()'s streaming covariance (update-order-dependent) "
    "could not. Near-zero r expected: value is hour-independent in "
    "this data, which is itself the check a feature-screening job "
    "wants",
)
def agg_corr_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("x"),
        # milli-units: y^2 sums stay under 2^63, so BOTH engines keep
        # exact int64 all the way (micro-units pushed syy past 2^63,
        # where DuckDB's hugeint->double two-step rounding can diverge)
        (F.col("value").cast("decimal(19,6)") * 1000)
        .cast("bigint")
        .alias("y"),
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    dx = F.sqrt(
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    dy = F.sqrt(
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return s.select("event_type", "n", (num / dx / dy).alias("pearson_r"))


# ---------------------------------------------------------------------------
# agg_gini_value
# ---------------------------------------------------------------------------


@register(
    "agg_gini_value",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(19,6)) * 1000 AS BIGINT) AS y,
             event_id
      FROM events
    ),
    r AS (
      SELECT event_type, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY y, event_id) AS BIGINT) AS i
      FROM d
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(i * y) AS BIGINT) AS siy
      FROM r GROUP BY event_type
    )
    SELECT event_type, n,
           (2.0 * CAST(siy AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
    FROM s
    """,
    doc="Gini coefficient of event value per type (the concentration/"
    "inequality metric: 0 = uniform, ->1 = one event carries all the "
    "mass — the long-tail diagnostic for monetization or token-count "
    "distributions): rank-weighted sum formula G = 2*Sum(i*y_i)/(n*Sum y) "
    "- (n+1)/n over milli-unit integer values, exact sums, final "
    "arithmetic over identical operands. One keyed sort-window + one "
    "aggregate; event_id tiebreak makes ranks (and thus Sum(i*y)) "
    "deterministic under duplicate values",
)
def agg_gini_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        (F.col("value").cast("decimal(19,6)") * 1000)
        .cast("bigint")
        .alias("y"),
        "event_id",
    )
    r = d.withColumn(
        "i",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("y", "event_id"))
        .cast("bigint"),
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("i") * F.col("y")).cast("bigint").alias("siy"),
    )
    gini = (
        F.lit(2.0)
        * F.col("siy").cast("double")
        / (F.col("n").cast("double") * F.col("sy").cast("double"))
    ) - (F.col("n").cast("double") + F.lit(1.0)) / F.col("n").cast("double")
    return s.select("event_type", "n", gini.alias("gini"))


# ---------------------------------------------------------------------------
# quality_benford_digits / corpus_dedup_rate_by_source
# ---------------------------------------------------------------------------


@register(
    "quality_benford_digits",
    oracle="""
    SELECT CAST(substr(CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR),
                       1, 1) AS BIGINT) AS first_digit,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE value > 0
    GROUP BY 1
    """,
    doc="first-significant-digit profile of event values (the Benford "
    "forensics screen: organic magnitudes lean on small leading "
    "digits, fabricated or clipped data does not): digits extracted "
    "integer-only — value x100 floored to an integer, first character "
    "of its decimal rendering — so no log10 crosses the engines. "
    "Output is raw counts; the consumer compares against log10(1+1/d) "
    "downstream. One map-side-combined aggregate over the scan",
)
def quality_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    first_digit = F.substring(
        F.floor(F.col("value") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    return ev.groupBy(first_digit.alias("first_digit")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@register(
    "corpus_dedup_rate_by_source",
    oracle="""
    WITH h AS (
      SELECT source, md5(text) AS d FROM documents
    ),
    g AS (
      SELECT source, d, CAST(COUNT(*) AS BIGINT) AS c
      FROM h GROUP BY source, d
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_redundant,
           CAST(((SUM(c) - COUNT(*)) * 1000000) // SUM(c) AS BIGINT)
             AS dup_rate_micro
    FROM g GROUP BY source
    """,
    doc="per-source exact-duplication report (the provenance screen a "
    "corpus intake runs before committing crawl budget: a source with "
    "30% redundancy needs dedup upstream, not more crawling): content "
    "digests grouped per source, redundancy = docs minus distinct "
    "digests, rate in integer micro-units. Two hash aggregates, both "
    "map-side combinable; at 100 TB the digest groupBy is the same "
    "single shuffle the exact-dedup pass already pays, so the report "
    "is free when piggybacked on it",
)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select("source", F.md5("text").alias("d")).groupBy(
        "source", "d"
    ).agg(F.count(F.lit(1)).alias("c"))
    return g.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (F.sum("c") - F.count(F.lit(1))).cast("bigint").alias("n_redundant"),
        F.expr("((sum(c) - count(1)) * 1000000) div sum(c)")
        .cast("bigint")
        .alias("dup_rate_micro"),
    )


# ---------------------------------------------------------------------------
# events_dau_wau_stickiness
# ---------------------------------------------------------------------------


@register(
    "events_dau_wau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    cover AS (
      SELECT DISTINCT user_id, day + CAST(g.i AS INTEGER) AS day
      FROM ud, UNNEST(range(7)) AS g(i)
    ),
    wau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM cover GROUP BY day
    )
    SELECT d.day, d.dau, w.wau,
           CAST((d.dau * 1000000) // w.wau AS BIGINT) AS stickiness_micro
    FROM dau d JOIN wau w ON w.day = d.day
    """,
    doc="DAU/WAU stickiness per day (the product-engagement ratio): "
    "WAU(D) = distinct users active in [D-6, D], computed by "
    "EXPLODING each (user, day) into the 7 future days it covers and "
    "distinct-counting per day — the binning trick that turns a "
    "distinct-over-sliding-range (which window frames cannot express "
    "over DISTINCT) into two plain hash aggregates with 7x fan-out. "
    "Integer micro-unit ratio; only days with DAU > 0 emit (inner "
    "join), so the ratio is always well-defined",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    ).distinct()
    wau = cover.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(dau * 1000000) div wau")
            .cast("bigint")
            .alias("stickiness_micro"),
        )
    )


# ---------------------------------------------------------------------------
# events_pareto_user_deciles
# ---------------------------------------------------------------------------


@register(
    "events_pareto_user_deciles",
    oracle="""
    WITH uc AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ),
    t AS (
      SELECT n_events,
             ntile(10) OVER (ORDER BY n_events DESC, user_id) AS decile,
             SUM(n_events) OVER () AS total
      FROM uc
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST((SUM(n_events) * 1000000) // MAX(total) AS BIGINT)
             AS share_micro
    FROM t GROUP BY decile
    """,
    doc="Pareto activity curve: users ranked by event count into "
    "deciles (busiest first, user_id tiebreak), each decile's share of "
    "total events in integer micro-units — the who-produces-the-load "
    "report behind capacity planning and the skew intuition the salted "
    "join exists for. The per-user aggregate shrinks the sort input to "
    "|users| rows, so the global NTILE sorts the small table, never "
    "the event stream; complements agg_gini_value's scalar score with "
    "the full curve",
)
def events_pareto_user_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    t = uc.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.desc("n_events"), "user_id")),
    ).withColumn("total", F.sum("n_events").over(Window.partitionBy()))
    return t.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.expr("(sum(n_events) * 1000000) div max(total)")
        .cast("bigint")
        .alias("share_micro"),
    )


# ---------------------------------------------------------------------------
# events_weekday_profile
# ---------------------------------------------------------------------------


@register(
    "events_weekday_profile",
    oracle="""
    SELECT event_type,
           CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value)
             AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="weekday activity profile per event type (ISO day-of-week 1 = "
    "Monday ... 7 = Sunday): counts + exact-decimal average value. "
    "Day-numbering is a cross-engine trap worth one registered query: "
    "Spark's dayofweek() is 1 = Sunday while DuckDB's dayofweek() is "
    "0 = Sunday — the only pair that agrees is Spark "
    "weekday()+1 == DuckDB isodow(), which this query pins. One "
    "map-side-combined aggregate over the scan",
)
def events_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.queries._helpers import davg

    ev = load_table(spark, sf_dir, "events")
    # weekday(): 0 = Monday; +1 aligns with DuckDB isodow (1 = Monday)
    dow = (F.weekday(F.col("ts").cast("timestamp")) + 1).cast("bigint")
    return ev.groupBy("event_type", dow.alias("dow")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        davg("value", "avg_value"),
    )


# ---------------------------------------------------------------------------
# quality_independence_residuals
# ---------------------------------------------------------------------------


@register(
    "quality_independence_residuals",
    oracle="""
    WITH o AS (
      SELECT event_type,
             CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS rt FROM o GROUP BY 1),
    c AS (SELECT dow, CAST(SUM(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS total FROM o)
    SELECT o.event_type, o.dow, o.obs,
           CAST(((o.obs * n.total - r.rt * c.ct) * 1000000)
                // (r.rt * c.ct) AS BIGINT) AS residual_micro
    FROM o JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
    """,
    doc="contingency-table independence residuals for event_type x "
    "weekday: relative deviation of each observed cell from the "
    "independence expectation (O*N - R*C)/(R*C) in integer micro-units "
    "— the screen behind a chi-square test without the chi-square's "
    "float accumulation (every operation is BIGINT, so the whole "
    "residual table hash-matches). Row/column marginals broadcast "
    "back onto the cell table; a large |residual| row is a "
    "day-of-week effect worth a look. The O*N and R*C products go "
    "through DECIMAL(38,0) on the Spark side — two event-count "
    "multiplies pass int64 long before 100 TB, and the DuckDB oracle "
    "is already HUGEINT-exact",
)
def quality_independence_residuals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dow = (F.weekday(F.col("ts").cast("timestamp")) + 1).cast("bigint")
    o = ev.groupBy("event_type", dow.alias("dow")).agg(
        F.count(F.lit(1)).cast("bigint").alias("obs")
    )
    o = o.localCheckpoint(eager=False)  # reused: cells + three marginals
    r = o.groupBy("event_type").agg(F.sum("obs").cast("bigint").alias("rt"))
    c = o.groupBy("dow").agg(F.sum("obs").cast("bigint").alias("ct"))
    n = o.groupBy().agg(F.sum("obs").cast("bigint").alias("total"))
    return (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow",
            "obs",
            # obs*total and rt*ct multiply two event counts (~1e24 at
            # 100 TB) — DECIMAL(38,0) keeps the Spark side exact where
            # BIGINT would wrap silently against the HUGEINT oracle
            # (the fam_micro overflow class, ADVICE r8). The residual
            # can be negative; decimal `div` truncates toward zero
            # exactly like the BIGINT div (and DuckDB //) it replaces.
            F.expr(
                "((CAST(obs AS DECIMAL(38,0)) * total"
                " - CAST(rt AS DECIMAL(38,0)) * ct) * 1000000)"
                " div (CAST(rt AS DECIMAL(38,0)) * ct)"
            )
            .cast("bigint")
            .alias("residual_micro"),
        )
    )
