"""Round-10 staging: two audits over the round-9 linear quality scorer,
built and benched ahead of their driver birth-window (the
round8_staging pattern — staged rows front the NEXT round's window).

- ``curation_scorer_oov_audit``: per-source out-of-vocabulary rate
  under the scorer's top-V cut. A bounded-vocabulary scorer silently
  scores OOV tokens 0; a source whose token mass is largely OOV gets a
  meaningless score, so the audit that must ship WITH the scorer is
  "how much of each source does the vocabulary actually cover" — the
  fastText/CCNet coverage check.

- ``curation_scorer_length_bias``: score-decile x length calibration.
  The classic failure of learned quality filters is learning document
  LENGTH instead of quality (Gopher and GPT-3 appendix discussions);
  the audit buckets docs into score deciles and reports length stats
  per decile — a flat profile clears the scorer, a monotone one
  convicts it. Deciles come from the cumulative window over the
  DISTINCT-score histogram (the keep-matrix tertile machinery at finer
  grain); score_micro's domain is bounded by construction ([0, 1e6]),
  so the histogram window input is bounded at ANY corpus size.

Reference parity: the reference (an AWS scoring stack) has no
crawl-curation layer; these extend the LLM-pipeline battery per the
build brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.round9 import (
    SCORER_CTES,
    scorer_doc_scores,
    scorer_tokens,
    scorer_weights,
)

# ---------------------------------------------------------------------------
# curation_scorer_oov_audit
# ---------------------------------------------------------------------------

_OOV_ORACLE = f"""
    WITH {SCORER_CTES}
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN w.tok IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov,
           CAST((SUM(CASE WHEN w.tok IS NULL THEN 1 ELSE 0 END)
                   // COUNT(*)) * 1000000
                + ((SUM(CASE WHEN w.tok IS NULL THEN 1 ELSE 0 END)
                      % COUNT(*)) * 1000000) // COUNT(*)
                AS BIGINT) AS oov_micro
    FROM toks t LEFT JOIN w USING (tok)
    GROUP BY t.source
"""


@register(
    "curation_scorer_oov_audit",
    oracle=_OOV_ORACLE,
    doc="per-source out-of-vocabulary rate under the round-9 scorer's "
    "top-V cut: token instances whose token misses the weight table, "
    "as count + exact integer micro rate (decomposed floor(n*1e6/d) — "
    "per-source token mass is unbounded at corpus scale, same guard "
    "as fam_micro). The coverage check that must ship with any "
    "bounded-vocabulary quality model: a source scored mostly by the "
    "OOV default isn't scored at all. 100 TB shape: same scan -> "
    "explode -> broadcast weight join as the scorer itself, one "
    "map-side-combinable (source) agg, no UDF/Python/Window",
)
def curation_scorer_oov_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = scorer_tokens(docs)
    w = scorer_weights(toks)
    return (
        toks.join(F.broadcast(w), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("w_micro").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.expr(
                "(sum(CASE WHEN w_micro IS NULL THEN 1 ELSE 0 END)"
                " div count(1)) * 1000000"
                " + ((sum(CASE WHEN w_micro IS NULL THEN 1 ELSE 0 END)"
                " % count(1)) * 1000000) div count(1)"
            )
            .cast("bigint")
            .alias("oov_micro"),
        )
    )


# ---------------------------------------------------------------------------
# curation_scorer_length_bias
# ---------------------------------------------------------------------------

N_BANDS = 10

_LENGTH_BIAS_ORACLE = f"""
    WITH {SCORER_CTES},
    per AS (
      SELECT s.doc_id, s.score_micro, d.n_chars
      FROM scored s JOIN documents d USING (doc_id)
    ),
    hist AS (
      SELECT score_micro, COUNT(*) AS c FROM per GROUP BY score_micro
    ),
    cum AS (
      SELECT score_micro,
             SUM(c) OVER (ORDER BY score_micro) AS cum,
             SUM(c) OVER () AS n
      FROM hist
    ),
    thr AS (
      SELECT {", ".join(
        f"MIN(CASE WHEN cum >= ({d} * n + {N_BANDS - 1}) // {N_BANDS} "
        f"THEN score_micro END) AS t{d}"
        for d in range(1, N_BANDS)
      )}
      FROM cum
    )
    SELECT CAST(CASE
             {" ".join(
               f"WHEN p.score_micro <= t.t{d} THEN {d}"
               for d in range(1, N_BANDS)
             )}
             ELSE {N_BANDS} END AS INTEGER) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_chars) // COUNT(*) AS BIGINT) AS avg_chars,
           CAST(MIN(p.score_micro) AS BIGINT) AS min_score_micro,
           CAST(MAX(p.score_micro) AS BIGINT) AS max_score_micro
    FROM per p CROSS JOIN thr t
    GROUP BY band
"""


@register(
    "curation_scorer_length_bias",
    oracle=_LENGTH_BIAS_ORACLE,
    doc=f"score-decile x length calibration for the round-9 scorer: "
    f"docs bucketed into {N_BANDS} equal-count score bands (thresholds "
    "= cumulative window over the DISTINCT-score HISTOGRAM — the "
    "keep-matrix tertile machinery at decile grain; score_micro's "
    "domain is [0, 1e6] BY CONSTRUCTION, so the histogram the window "
    "sorts is bounded at any corpus size, unlike a quantile over raw "
    "values), each band reporting doc count, mean n_chars, and its "
    "score span. A monotone avg_chars profile convicts the scorer of "
    "learning length instead of quality (the Gopher/GPT-3 filter "
    "failure). 100 TB shape: per-doc scores from the broadcast weight "
    "join; ONE-row threshold table cross-joined back (broadcast, "
    "9 scalars); per-band agg map-side combinable; avg via sum div "
    "count (sum(n_chars) wraps only past ~9.2e15 chars per band)",
)
def curation_scorer_length_bias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    per = scorer_doc_scores(docs).join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    hist = per.groupBy("score_micro").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("score_micro").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    # both windows run over the DISTINCT-score histogram, whose size is
    # bounded by the score domain (1e6 + 1 rows worst case) — never the
    # per-doc table (the §9r bounded-input class)
    cum = hist.select(
        "score_micro",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    thr = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"({d} * n + {N_BANDS - 1}) div {N_BANDS}"),
                    F.col("score_micro"),
                )
            ).alias(f"t{d}")
            for d in range(1, N_BANDS)
        ]
    )
    band = F.lit(N_BANDS)
    for d in range(N_BANDS - 1, 0, -1):
        band = F.when(
            F.col("score_micro") <= F.col(f"t{d}"), d
        ).otherwise(band)
    return (
        per.crossJoin(F.broadcast(thr))
        .withColumn("band", band.cast("int"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("sum(n_chars) div count(1)")
            .cast("bigint")
            .alias("avg_chars"),
            F.min("score_micro").cast("bigint").alias("min_score_micro"),
            F.max("score_micro").cast("bigint").alias("max_score_micro"),
        )
    )
