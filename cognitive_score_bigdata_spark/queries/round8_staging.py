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
