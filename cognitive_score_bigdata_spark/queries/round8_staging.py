"""Round-8 staging: two more pretraining-curation gates (registered and
benched from day one, driver window in their birth-round rotation —
the same staging pattern as rounds 4-6).

- ``curation_dsir_importance_topk``: DSIR-style data selection (Xie et
  al. 2023, "Data Selection for Language Models via Importance
  Resampling") — score every crawl document by how much its hashed
  n-gram feature distribution looks like a TARGET domain relative to
  the raw crawl, then keep the top-K. The published method scores with
  sums of log(p_target/p_raw) over hashed features; logs are
  transcendental (cross-engine ulp drift), so this implementation uses
  the integer RATIO in micro-units per bucket — a deterministic,
  bit-reproducible importance proxy with the same ordering intuition
  (buckets over-represented in the target score high). Same md5
  bucket idiom as the CMS/KMV/MinHash md5 family, so the DuckDB
  oracle hash-checks the full feature -> weight -> score -> top-K
  path.

- ``corpus_token_budget_epochs``: token-weighted mixture planning —
  given per-source token counts, a uniform target mixture and a total
  token budget, compute each source's share, flattening weight, and
  the repeat factor (epochs) needed to fill its slice of the budget,
  with the 4-epoch cap from data-constrained scaling (Muennighoff et
  al. 2023: value of repeated data decays fast past ~4 epochs). The
  token-weighted sibling of ``corpus_mix_rebalance`` (doc-count
  shares): budgets are spent in tokens, not documents.

The reference has no corpus surface (its documents are wearable
events; `/root/reference/src/backend/main.py` serves scores) — these
extend the brief's LLM-pipeline battery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register

# ---------------------------------------------------------------------------
# curation_dsir_importance_topk
# ---------------------------------------------------------------------------

DSIR_B = 1024  # hashed-feature buckets
DSIR_TOPK = 50
DSIR_SCALE = 1_000_000  # ratio micro-units
DSIR_TARGET = "src0"  # the target-domain slice (same stand-in as the
# contamination screen: src0 plays "benchmark"/"target")

# 56-bit md5 prefix (positive in Spark's signed long and DuckDB's
# UBIGINT alike) mod B — the established md5-auditable bucket idiom
_DSIR_BUCKET_SQL = "CAST(('0x' || substr(md5(t), 1, 14)) AS UBIGINT) % {b}"

_DSIR_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(string_split_regex(text, ' +')) AS t
      FROM documents
    ),
    b AS (
      SELECT doc_id, source,
             {_DSIR_BUCKET_SQL.format(b=DSIR_B)} AS bucket
      FROM tok
    ),
    raw AS (SELECT bucket, COUNT(*) AS c FROM b GROUP BY bucket),
    tgt AS (
      SELECT bucket, COUNT(*) AS c FROM b
      WHERE source = '{DSIR_TARGET}' GROUP BY bucket
    ),
    w AS (
      SELECT r.bucket,
             CAST((COALESCE(t.c, 0) + 1) * {DSIR_SCALE} // (r.c + 1)
                  AS BIGINT) AS wt
      FROM raw r LEFT JOIN tgt t USING (bucket)
    )
    SELECT b.doc_id, b.source, CAST(SUM(w.wt) AS BIGINT) AS score
    FROM b JOIN w USING (bucket)
    WHERE b.source <> '{DSIR_TARGET}'
    GROUP BY b.doc_id, b.source
    ORDER BY score DESC, b.doc_id
    LIMIT {DSIR_TOPK}
"""


@register(
    "curation_dsir_importance_topk",
    oracle=_DSIR_ORACLE,
    doc="DSIR-style importance selection (Xie et al. 2023): hash every "
    f"token into {DSIR_B} md5 buckets, estimate the target-vs-raw "
    "bucket ratio with +1 smoothing in integer micro-units, score each "
    "non-target doc by the sum of its tokens' bucket weights, keep the "
    f"top {DSIR_TOPK} (doc_id tiebreak). Integer ratios replace the "
    "paper's log-ratios so both engines agree bit-for-bit — same "
    "determinism posture as the md5 sketch family. Scale shape: token "
    "explode is map-only; raw/target bucket counts are map-side-"
    f"combinable aggregates bounded at {DSIR_B} cells regardless of "
    "corpus size; the weight table BROADCASTS back into the token "
    "stream; the per-doc score is one map-side-combinable sum. At "
    "100 TB the only full-corpus shuffle is the doc_id score "
    "aggregate — the same shape as the contamination screen",
)
def curation_dsir_importance_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", F.explode(F.split("text", " +")).alias("t")
    )
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 14), 16, 10).cast("long")
        % DSIR_B
    )
    bt = docs.select("doc_id", "source", bucket.alias("bucket"))
    raw = bt.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tgt = (
        bt.filter(F.col("source") == DSIR_TARGET)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    w = raw.join(tgt, "bucket", "left").select(
        "bucket",
        F.expr(
            f"CAST((coalesce(tc, 0) + 1) * {DSIR_SCALE} div (rc + 1) "
            "AS BIGINT)"
        ).alias("wt"),
    )
    return (
        bt.filter(F.col("source") != DSIR_TARGET)
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.sum("wt").cast("bigint").alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(DSIR_TOPK)
    )


# ---------------------------------------------------------------------------
# corpus_token_budget_epochs
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 10_000_000  # total training-token budget
EPOCH_CAP_MICRO = 4_000_000  # 4-epoch repeat cap (Muennighoff 2023)
# pre-multiplied in Python: budget * micro-scale = 1e13 parses as a
# BIGINT literal in both dialects, while `10000000 * 1000000` folds as
# int32 x int32 and overflows under Spark's ANSI mode
BUDGET_MICRO = TOKEN_BUDGET * DSIR_SCALE

_BUDGET_ORACLE = f"""
    WITH per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split_regex(text, ' +'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_src
      FROM per
    )
    SELECT p.source, p.n_docs, p.n_tokens,
           CAST(p.n_tokens * {DSIR_SCALE} // t.total AS BIGINT)
             AS share_micro,
           CAST(t.total * {DSIR_SCALE} // (t.n_src * p.n_tokens)
                AS BIGINT) AS weight_micro,
           CAST({BUDGET_MICRO} // (t.n_src * p.n_tokens) AS BIGINT)
             AS epochs_micro,
           CAST(LEAST({BUDGET_MICRO} // (t.n_src * p.n_tokens),
                      {EPOCH_CAP_MICRO}) AS BIGINT)
             AS epochs_capped_micro
    FROM per p CROSS JOIN tot t
"""


@register(
    "corpus_token_budget_epochs",
    oracle=_BUDGET_ORACLE,
    doc="token-weighted mixture/budget planning: per source, its token "
    "share, the weight that flattens the mix to uniform, and the "
    f"repeat factor (epochs, micro-units) to fill a 1/n slice of a "
    f"{TOKEN_BUDGET}-token budget — capped at 4 epochs per the "
    "data-constrained-scaling result that repeated data stops paying "
    "past ~4 passes (Muennighoff et al. 2023). Token counts come from "
    "one map-side-combinable aggregate over size(split(text)); the "
    "totals join is an |sources|-row broadcast. The token-weighted "
    "sibling of corpus_mix_rebalance: budgets are spent in tokens, "
    "not documents, and the two rankings genuinely differ when doc "
    "length varies by source. Overflow bound (same class as "
    "market_rule_lift's documented bound): total*1e6 fits BIGINT while "
    "the corpus holds < ~9.2e12 tokens; past that (a full 100 TB "
    "crawl is ~2.5e13) drop the micro scale to 1e3 or route the "
    "product through the DECIMAL(28,6) accumulator",
)
def corpus_token_budget_epochs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    per = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size(F.split("text", " +")))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
    )
    epochs = F.expr(
        f"CAST({BUDGET_MICRO} div (n_src * n_tokens) AS BIGINT)"
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr(f"CAST(n_tokens * {DSIR_SCALE} div total AS BIGINT)").alias(
            "share_micro"
        ),
        F.expr(
            f"CAST(total * {DSIR_SCALE} div (n_src * n_tokens) AS BIGINT)"
        ).alias("weight_micro"),
        epochs.alias("epochs_micro"),
        F.least(epochs, F.lit(EPOCH_CAP_MICRO).cast("bigint")).alias(
            "epochs_capped_micro"
        ),
    )


# ---------------------------------------------------------------------------
# proj_unpivot_metrics — DataFrame.unpivot / melt (wide -> long)
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
    WITH long AS (
      SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT metric,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(val AS DECIMAL(28,6))) AS DOUBLE) AS sum_val
    FROM long GROUP BY metric
"""


@register(
    "proj_unpivot_metrics",
    oracle=_UNPIVOT_ORACLE,
    doc="wide->long reshape via DataFrame.unpivot (the melt operator, "
    "Spark 3.4+ API surface): four lineitem measure columns unpivot "
    "into (metric, val) rows, then one map-side-combinable aggregate "
    "per metric. The unpivot itself is a narrow Expand (each input row "
    "emits 4 rows map-side, no shuffle) — the plan-shape that makes "
    "reshaping free at 100 TB; doubles are summed through the "
    "DECIMAL(28,6) accumulator so both engines agree bit-for-bit",
)
def proj_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.queries._helpers import dsum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("val", "sum_val"),
    )


# ---------------------------------------------------------------------------
# agg_listagg_nations — listagg WITHIN GROUP (Spark 4 API surface)
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
    SELECT r.r_name AS region,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
"""


@register(
    "agg_listagg_nations",
    oracle=_LISTAGG_ORACLE,
    doc="ordered string aggregation via listagg ... WITHIN GROUP "
    "(ORDER BY ...) — new in Spark 4, the ANSI form of "
    "string_agg/group_concat; deterministic because the within-group "
    "order is total (unique names). Scale caveat carried in the "
    "operator choice itself: listagg materializes the whole group in "
    "one string, so it belongs on BOUNDED group cardinalities "
    "(dimension rollups like this 25-nations-per-region one) — for "
    "unbounded groups use the top-K/window operators instead",
)
def agg_listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations"),
        )
    )


# ---------------------------------------------------------------------------
# streaming_dedup_watermark — dropDuplicatesWithinWatermark gate
# ---------------------------------------------------------------------------

_SDW_ORACLE = """
    SELECT DISTINCT md5(text) AS key FROM documents
"""

_SDW_STREAM_IN: dict = {}


def _sdw_stream_indir(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    from cognitive_score_bigdata_spark.session_cache import session_scoped

    def build() -> str:
        in_dir = os.path.join(
            tempfile.mkdtemp(prefix="csb_stream_sdw_"), "in"
        )
        # event times span doc_id % 100 seconds << the 10-minute
        # watermark delay, so no key's state expires mid-drain and the
        # admitted key set is batch-split-invariant (= exact DISTINCT)
        (
            load_table(spark, sf_dir, "documents")
            .select(
                F.md5("text").alias("key"),
                (F.lit(1_700_000_000) + F.col("doc_id") % 100)
                .cast("long")
                .alias("ts_s"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .json(in_dir)
        )
        return in_dir

    return session_scoped(_SDW_STREAM_IN, spark, (sf_dir,), build)


@register(
    "streaming_dedup_watermark",
    oracle=_SDW_ORACLE,
    doc="streaming exact-dedup at ingest via "
    "dropDuplicatesWithinWatermark (Spark 3.5+ operator surface, "
    "streaming/dedupe.py): the online dual of text_exact_dedup — "
    "re-crawled duplicates are dropped AT INGEST, keyed by content "
    "md5, with per-key state evicted once the event-time watermark "
    "passes (state is bounded by the duplicate-arrival window, not "
    "the corpus — the property that makes streaming dedup viable on "
    "an unbounded crawl). Emits the KEY only: the admitted key set is "
    "batch-split-invariant and equals batch DISTINCT (hash-checked); "
    "which physical row survives is first-arrival by design. Fifth "
    "streaming row under the full value-hash check",
)
def streaming_dedup_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from cognitive_score_bigdata_spark.streaming.dedupe import dedup_stream

    in_dir = _sdw_stream_indir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="csb_stream_sdw_run_")
    name = f"csb_sdw_{abs(hash(work)) % 10**8}"
    keys = dedup_stream(
        spark, in_dir, os.path.join(work, "ckpt"), query_name=name
    )
    # bounded output (|distinct keys| rows): eager-checkpoint, then
    # reclaim the memory-sink view and per-run checkpoint dir
    out = keys.select("key").localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    shutil.rmtree(work, ignore_errors=True)
    return out
