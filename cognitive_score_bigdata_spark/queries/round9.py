"""Round-9 additions: two curation-shaped gates (VERDICT r8 item 4).

- ``curation_quality_linear_scorer``: the learned-quality-filter shape
  of the GPT-3 / CCNet pipelines (Brown et al. 2020 §Appendix A;
  Wenzek et al. 2020): a linear bag-of-words classifier whose weight
  table BROADCASTS, scoring every document JVM-side, then a per-source
  keep-rate audit. The "training" here is the classic logistic-
  regression proxy reduced to its exact-arithmetic core: weight(token)
  = P(reference-class | token) in integer micro units, estimated from
  a designated reference-source subset of the corpus itself (CCNet
  trains against Wikipedia; the fixture's stand-in is a literal source
  list). Composes with ``curation_quality_keep_matrix`` — that row
  gates on corpus-internal familiarity, this one on resemblance to a
  curated reference.

- ``curation_compliance_span_bridge``: applies round 8's compliance
  verdicts at ``text_chunk_dedup``'s span granularity (VERDICT r8 item
  4b): for every span occurrence that span-dedup would STRIP (not the
  corpus-wide first occurrence), attribute it to the compliance
  verdict of the doc that holds the span's CANONICAL copy. Rows where
  ``win_verdict != 'kept'`` are exactly the spans whose only surviving
  copy sits in deny-listed content — the text a joint
  compliance-then-dedup pipeline silently loses, which a
  dedup-then-compliance ordering would have kept from a clean doc.
  Joins two driver-green machineries (round8 verdicts, spandedup
  chunking) under ONE oracle.

Reference parity: the reference (an AWS scoring stack,
/root/reference/src/backend/main.py) has no crawl-curation layer;
these extend the LLM-pipeline battery per the build brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.round8 import (
    VERDICT_CTES,
    _sql_in,
    with_compliance_verdict,
)
from cognitive_score_bigdata_spark.queries.spandedup import CHUNK, _chunks

# ---------------------------------------------------------------------------
# curation_quality_linear_scorer
# ---------------------------------------------------------------------------

# The "curated reference" class the scorer is trained against (CCNet's
# Wikipedia stand-in). Literal source names, spliced with escaping.
REF_SOURCES = ("src0", "src1", "src2", "src3", "src4")

# Vocabulary cap: top-V tokens by corpus frequency (ties broken by
# token text). Deliberately SMALLER than the fixture's distinct-token
# count so the cut is exercised — out-of-vocabulary tokens score 0,
# exactly like a hashed-feature fastText model's pruned tail. At
# 100 TB this bound is what keeps the weight table broadcastable.
TOP_V = 24

# Keep threshold on the per-doc mean token weight, in micro units of
# P(ref | token). 500000 would be class-balanced chance for an evenly
# split corpus; the fixture's reference class is 5/20 sources, so
# chance sits near 250000 and 260000 cuts roughly the top half
# (sf0.01 median 259852, spread 250806..271193 — non-trivial and
# stable across SFs because the generator vocabulary is fixed).
QUALITY_MIN_MICRO = 260_000

# The tokenize -> class-count -> top-V weight -> per-doc score CTE
# chain, shared verbatim by this query's oracle and the round-10
# staged scorer audits (OOV rate, length-bias calibration).
SCORER_CTES = f"""
    toks AS (
      SELECT doc_id, source,
             unnest(string_split_regex(text, ' +')) AS tok
      FROM documents
    ),
    cls AS (
      SELECT tok,
             CAST(SUM(CASE WHEN source IN ({_sql_in(REF_SOURCES)})
                           THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
             CAST(COUNT(*) AS BIGINT) AS c_all
      FROM toks GROUP BY tok
    ),
    w AS (
      SELECT tok,
             CAST(c_ref * 1000000 // c_all AS BIGINT) AS w_micro
      FROM cls
      ORDER BY c_all DESC, tok
      LIMIT {TOP_V}
    ),
    scored AS (
      SELECT t.doc_id, t.source,
             CAST(SUM(COALESCE(w.w_micro, 0)) // COUNT(*) AS BIGINT)
               AS score_micro
      FROM toks t LEFT JOIN w USING (tok)
      GROUP BY t.doc_id, t.source
    )
"""

_SCORER_ORACLE = f"""
    WITH {SCORER_CTES}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score_micro > {QUALITY_MIN_MICRO}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(SUM(score_micro) // COUNT(*) AS BIGINT)
             AS avg_score_micro,
           CAST(MIN(score_micro) AS BIGINT) AS min_score_micro,
           CAST(MAX(score_micro) AS BIGINT) AS max_score_micro
    FROM scored GROUP BY source
"""


def scorer_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, source, tok): one row per token INSTANCE."""
    return docs.select(
        "doc_id",
        "source",
        F.explode(F.split("text", " +")).alias("tok"),
    )


def scorer_weights(toks: DataFrame) -> DataFrame:
    """(tok, w_micro): the top-V vocabulary weight table.

    top-V by frequency -> TakeOrderedAndProject (per-partition top-V
    then a driver merge of V-row heaps — no global sort, no
    single-partition window). c_ref <= c_all so w_micro is in
    [0, 1e6]; the multiply overflows only past ~9.2e12 reference-
    class occurrences of ONE token, far beyond any curated reference
    corpus (the full-corpus analogue is guarded in
    curation_quality_keep_matrix's fam_micro).
    """
    cls = toks.groupBy("tok").agg(
        F.sum(
            F.when(F.col("source").isin(*REF_SOURCES), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("c_ref"),
        F.count(F.lit(1)).cast("bigint").alias("c_all"),
    )
    return (
        cls.orderBy(F.desc("c_all"), F.asc("tok"))
        .limit(TOP_V)
        .select(
            "tok",
            F.expr("c_ref * 1000000 div c_all")
            .cast("bigint")
            .alias("w_micro"),
        )
    )


def scorer_doc_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, source, score_micro): per-doc mean token weight via
    the broadcast weight join; every term non-negative, so div
    truncation == floor == DuckDB //."""
    toks = scorer_tokens(docs)
    w = scorer_weights(toks)
    return (
        toks.join(F.broadcast(w), "tok", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.expr("sum(coalesce(w_micro, 0)) div count(1)")
            .cast("bigint")
            .alias("score_micro")
        )
    )


@register(
    "curation_quality_linear_scorer",
    oracle=_SCORER_ORACLE,
    doc="broadcast linear quality scorer (VERDICT r8 item 4a, the "
    "GPT-3/CCNet learned-filter shape): token weight = P(reference "
    "class | token) in exact integer micro units over the top-"
    f"{TOP_V}-by-frequency vocabulary (deterministic tiebreak, cut "
    "EXERCISED — the fixture has more distinct tokens than the cap; "
    "out-of-vocab tokens score 0), per-doc score = mean token weight "
    "via one broadcast join + one map-side-combinable agg, then the "
    f"per-source keep-rate audit at > {QUALITY_MIN_MICRO}. 100 TB "
    "shape: the weight build is one linear agg + TakeOrderedAndProject "
    "(distributed top-V, never a single-partition rank window); the "
    "scoring pass is scan -> explode -> BROADCAST hash join (<= "
    f"{TOP_V} rows) -> two map-side-combinable aggs; no UDF, no "
    "Python, all-integer so the hash check is exact. In production "
    "the weight table is a trained artifact loaded once; deriving it "
    "in-query keeps the oracle self-contained",
)

def curation_quality_linear_scorer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    scored = scorer_doc_scores(docs)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("score_micro") > QUALITY_MIN_MICRO, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_keep"),
        # plain sum — no multiply to wrap: score_micro <= 1e6, so the
        # per-source sum stays in BIGINT until ~9.2e12 docs per source
        F.expr("sum(score_micro) div count(1)")
        .cast("bigint")
        .alias("avg_score_micro"),
        F.min("score_micro").cast("bigint").alias("min_score_micro"),
        F.max("score_micro").cast("bigint").alias("max_score_micro"),
    )


# ---------------------------------------------------------------------------
# curation_compliance_span_bridge
# ---------------------------------------------------------------------------

_BRIDGE_ORACLE = f"""
    WITH {VERDICT_CTES},
    toks AS (
      SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
             array_to_string(t[(u.i*{CHUNK}+1):(u.i*{CHUNK}+{CHUNK})],
                             ' ') AS chunk
      FROM toks,
           UNNEST(range(CAST(ceil(len(t)/{CHUNK}.0) AS BIGINT))) AS u(i)
    ),
    tagged AS (
      SELECT c.doc_id, c.pos, c.chunk, v.source, v.verdict
      FROM chunks c JOIN verdicts v USING (doc_id)
    ),
    win AS (
      SELECT source, chunk,
             row_number() OVER w AS rn,
             first_value(verdict) OVER w AS win_verdict
      FROM tagged
      WINDOW w AS (PARTITION BY chunk ORDER BY doc_id, pos)
    )
    SELECT source, win_verdict,
           CAST(COUNT(*) AS BIGINT) AS n_stripped,
           CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_chunks
    FROM win WHERE rn > 1
    GROUP BY source, win_verdict
"""


@register(
    "curation_compliance_span_bridge",
    oracle=_BRIDGE_ORACLE,
    doc="compliance x span-dedup attribution bridge (VERDICT r8 item "
    f"4b): every {CHUNK}-token span occurrence that text_chunk_dedup "
    "strips (not the corpus-wide first occurrence) is attributed to "
    "the compliance verdict of the doc holding the span's CANONICAL "
    "copy, grouped per (occurrence source, winner verdict). "
    "win_verdict != 'kept' rows measure the text a compliance-then-"
    "dedup pipeline loses outright (only surviving copy was in denied "
    "content) vs what dedup-then-compliance keeps. 100 TB shape: "
    "verdicts are the round-8 map-only expressions stamped on each "
    "doc row BEFORE chunk explosion (zero extra join); winner and "
    "per-(chunk, source) occurrence counts come from two MAP-SIDE-"
    "COMBINABLE aggregates (min-struct winner, the span_study "
    "skew-immune form) rather than a window — a row_number window "
    "cannot use the WindowGroupLimit rewrite here (it needs the "
    "non-winner rows), so a hot boilerplate chunk would ship every "
    "occurrence to ONE reducer (the §9f failure mode); the agg form "
    "collapses hot chunks to one partial row per map task, and the "
    "winner join is between two already-distinct-keyed sides (hot "
    "chunk = |sources| rows, AQE-splittable). The oracle keeps the "
    "window formulation: same first-occurrence spec, independent "
    "implementation",
)
def curation_compliance_span_bridge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
    )
    tagged = _chunks(
        with_compliance_verdict(docs), carry=("source", "verdict")
    )
    # corpus-wide winner per chunk: min over (doc_id, pos, ...) — the
    # struct compares doc_id then pos, and (doc_id, pos) is unique, so
    # verdict/source never tie-break; identical to first_value over
    # ORDER BY doc_id, pos. Partial min merges map-side.
    winners = tagged.groupBy("chunk").agg(
        F.min(F.struct("doc_id", "pos", "verdict", "source")).alias("w")
    ).select(
        "chunk",
        F.col("w.verdict").alias("win_verdict"),
        F.col("w.source").alias("win_source"),
    )
    per_cs = tagged.groupBy("chunk", "source").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    # stripped occurrences this (chunk, source) contributes = all of
    # them minus the winner occurrence if the winner sits in this
    # source; each surviving row is ONE distinct (chunk, source) pair,
    # so the per-group chunk count is a plain count
    joined = per_cs.join(winners, "chunk").withColumn(
        "n_stripped_cs",
        F.col("n_occ")
        - F.when(F.col("source") == F.col("win_source"), 1).otherwise(0),
    )
    return (
        joined.filter(F.col("n_stripped_cs") > 0)
        .groupBy("source", "win_verdict")
        .agg(
            F.sum("n_stripped_cs").cast("bigint").alias("n_stripped"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        )
    )
