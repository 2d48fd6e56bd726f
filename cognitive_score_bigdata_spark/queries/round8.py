"""Round-8 additions: two curation-shaped gates (VERDICT r7 item 5).

- ``curation_quality_keep_matrix``: the CCNet final-stage shape
  (Wenzek et al. 2020): per-source LANGUAGE-MODEL-FAMILIARITY tertiles
  (head / middle / tail — here the exact char-trigram familiarity of
  ``text_charngram_familiarity`` instead of float perplexity, so the
  hash check is exact) CROSSED with a Gopher-style repetition flag
  (duplicate-2-gram fraction from ``quality_repetition_signals``) into
  the per-(source, band) keep matrix a curation run signs off on
  before committing the corpus. Composes two driver-green rows under
  ONE oracle.

- ``curation_compliance_source_filter``: robots/licence-style
  crawl-compliance gate — host blocklist + robots ``Disallow``-style
  path-prefix rules + licence allowlist, applied with first-match
  precedence as PURE string expressions over the same derived
  pseudo-URLs as ``curation_url_canonical_hostdedup`` (round7.py).
  The gate every compliant crawl pipeline runs BEFORE any text
  processing; pairs with the canonicalization row.

Reference parity: the reference has no crawl-curation layer (its ETL
is CSV->Postgres, src/ingestion.py); these extend the LLM-pipeline
battery per the build brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import shared_stage
from cognitive_score_bigdata_spark.queries.round6 import _grams
from cognitive_score_bigdata_spark.queries.round7 import _URL_DERIVE_SQL

# ---------------------------------------------------------------------------
# curation_quality_keep_matrix
# ---------------------------------------------------------------------------

# Repetition gate: docs whose duplicate-2-gram fraction exceeds 4%
# fail (median of the corpus is ~2.7%, p75 ~4.6% — the cut is
# non-trivial and stable across SFs).
REP_MAX_MICRO = 40_000

_KEEP_ORACLE = f"""
    WITH tris AS (
      SELECT doc_id,
             unnest(list_transform(range(length(text) - 2),
                    i -> substring(text, CAST(i + 1 AS INTEGER), 3))) AS tri
      FROM documents WHERE length(text) >= 3
    ),
    tcnt AS (
      SELECT tri, CAST(COUNT(*) AS BIGINT) AS c FROM tris GROUP BY tri
    ),
    fam AS (
      SELECT t.doc_id,
             CAST(SUM(c.c) * 1000000 // COUNT(*) AS BIGINT) AS fam_micro
      FROM tris t JOIN tcnt c USING (tri)
      GROUP BY t.doc_id
    ),
    tg AS (
      SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS g
      FROM (SELECT doc_id, string_split_regex(text, ' +') AS ts
            FROM documents),
           UNNEST(range(1, len(ts))) AS r(i)
      WHERE len(ts) >= 2
    ),
    rep AS (
      SELECT doc_id,
             CAST((COUNT(*) - COUNT(DISTINCT g)) * 1000000 // COUNT(*)
                  AS BIGINT) AS dup2g_micro
      FROM tg GROUP BY doc_id
    ),
    per AS (
      SELECT d.source, f.fam_micro, r.dup2g_micro
      FROM documents d
      JOIN fam f USING (doc_id) JOIN rep r USING (doc_id)
    ),
    hist AS (
      SELECT source, fam_micro, COUNT(*) AS c
      FROM per GROUP BY source, fam_micro
    ),
    cum AS (
      SELECT source, fam_micro,
             SUM(c) OVER (PARTITION BY source ORDER BY fam_micro) AS cum,
             SUM(c) OVER (PARTITION BY source) AS n
      FROM hist
    ),
    thr AS (
      SELECT source,
             MIN(CASE WHEN cum >= (n + 2) // 3 THEN fam_micro END) AS t1,
             MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN fam_micro END) AS t2
      FROM cum GROUP BY source
    )
    SELECT p.source,
           CAST(CASE WHEN p.fam_micro <= t.t1 THEN 3
                     WHEN p.fam_micro <= t.t2 THEN 2
                     ELSE 1 END AS INTEGER) AS fam_band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN p.dup2g_micro > {REP_MAX_MICRO}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_fail,
           CAST(SUM(CASE WHEN p.fam_micro > t.t1
                          AND p.dup2g_micro <= {REP_MAX_MICRO}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
    FROM per p JOIN thr t USING (source)
    GROUP BY p.source, fam_band
"""


@register(
    "curation_quality_keep_matrix",
    oracle=_KEEP_ORACLE,
    doc="CCNet final-stage keep matrix (VERDICT r7 item 5a, Wenzek et "
    "al. 2020 shape): per-source familiarity tertiles (band 1 = head "
    "= most corpus-like, 3 = tail) x Gopher repetition flag "
    f"(dup-2-gram fraction > {REP_MAX_MICRO} micro fails) -> per "
    "(source, band): doc count, repetition failures, and the docs a "
    "head+middle AND rep-pass policy keeps. Composes the driver-green "
    "text_charngram_familiarity (exact integer familiarity instead of "
    "float perplexity) and quality_repetition_signals rows under ONE "
    "oracle. 100 TB shape: two token/trigram explodes with map-side-"
    "combinable per-doc aggregates, tertile thresholds from the "
    "(source, fam_micro) HISTOGRAM with the cumulative window over "
    "DISTINCT values only (never a per-row NTILE — the "
    "quality_length_quantile_audit skew argument), and the "
    "|sources|-row threshold table BROADCASTS back. Docs with <3 "
    "chars or <2 tokens have no familiarity/repetition signal and "
    "drop out of the matrix (inner joins on both sides)",
)
def curation_quality_keep_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # per-doc exact familiarity (text_charngram_familiarity machinery)
    tri_arr = F.transform(
        F.sequence(F.lit(1), F.length("text") - 2),
        lambda i: F.col("text").substr(i, F.lit(3)),
    )
    tris = (
        docs.filter(F.length("text") >= 3)
        .select("doc_id", F.explode(tri_arr).alias("tri"))
        # reused: corpus trigram counts + the per-doc familiarity join —
        # without the cut the corpus-sized explode plans (and runs)
        # twice (r16 plan audit: 16 scans / 50 Exchanges in one query).
        # Storage footprint (ADVICE r16): rows ≈ total corpus text chars
        # (one per trigram instance) — at large SF this cut pins a
        # corpus-text-sized intermediate in executor storage; the trade
        # is one full explode+shuffle pass of the same volume.
    )
    tris = shared_stage(tris)
    tcnt = tris.groupBy("tri").agg(F.count(F.lit(1)).alias("c"))
    fam = (
        tris.join(tcnt, "tri")
        .groupBy("doc_id")
        .agg(
            # NOT sum(c) * 1000000 div count(1): Spark's BIGINT multiply
            # wraps silently (non-ANSI) while DuckDB's SUM promotes to
            # HUGEINT, so per-doc trigram-frequency mass > ~9.2e12 —
            # reachable at 100 TB where corpus-wide trigram counts are
            # ~1e10 — would diverge the engines and corrupt the band
            # assignment (ADVICE r8). (s div n)*M + ((s mod n)*M) div n
            # == floor(s*M/n) exactly, and the only multiply left is
            # bounded by n*M (< 2^63 unless one doc holds 9e12 trigrams).
            F.expr(
                "(sum(c) div count(1)) * 1000000"
                " + ((sum(c) % count(1)) * 1000000) div count(1)"
            )
            .cast("bigint")
            .alias("fam_micro")
        )
    )
    # per-doc duplicate-2-gram fraction (quality_repetition_signals)
    toks = docs.select("doc_id", F.split("text", " +").alias("ts"))
    tg = toks.filter(F.size("ts") >= 2).select(
        "doc_id", F.explode(_grams("ts", 2)).alias("g")
    )
    rep = tg.groupBy("doc_id").agg(
        # here the multiplicand is bounded by the doc's OWN 2-gram
        # count, so the micro scaling is exact for any doc under
        # ~9.2e12 tokens — no global-count mass like fam_micro above
        F.expr(
            "(count(1) - count(DISTINCT g)) * 1000000 div count(1)"
        )
        .cast("bigint")
        .alias("dup2g_micro")
    )
    per = (
        docs.select("doc_id", "source")
        .join(fam, "doc_id")
        .join(rep, "doc_id")
        .select("source", "fam_micro", "dup2g_micro")
        # reused: the tertile histogram AND the final matrix join —
        # without the cut the entire fam+rep composition executes twice.
        # |docs|-bounded (3 narrow columns per doc) — cheap at any scale.
    )
    per = shared_stage(per)
    # per-source tertile thresholds over the DISTINCT-value histogram
    hist = per.groupBy("source", "fam_micro").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("fam_micro")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "source",
        "fam_micro",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(Window.partitionBy("source")).alias("n"),
    )
    thr = cum.groupBy("source").agg(
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n + 2) div 3"), F.col("fam_micro")
            )
        ).alias("t1"),
        F.min(
            F.when(
                F.col("cum") >= F.expr("(2 * n + 2) div 3"),
                F.col("fam_micro"),
            )
        ).alias("t2"),
    )
    banded = per.join(F.broadcast(thr), "source").select(
        "source",
        "dup2g_micro",
        F.when(F.col("fam_micro") <= F.col("t1"), 3)
        .when(F.col("fam_micro") <= F.col("t2"), 2)
        .otherwise(1)
        .cast("int")
        .alias("fam_band"),
        (F.col("fam_micro") > F.col("t1")).alias("above_tail"),
    )
    rep_ok = F.col("dup2g_micro") <= REP_MAX_MICRO
    return banded.groupBy("source", "fam_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(~rep_ok, 1).otherwise(0))
        .cast("bigint")
        .alias("n_rep_fail"),
        F.sum(F.when(F.col("above_tail") & rep_ok, 1).otherwise(0))
        .cast("bigint")
        .alias("n_keep"),
    )


# ---------------------------------------------------------------------------
# curation_compliance_source_filter
# ---------------------------------------------------------------------------

# Host blocklist (canonical form: lowercase, www. stripped), robots
# Disallow-style path prefixes, and the licences a commercial-use
# training run may ingest. Literal rule sets on BOTH sides — at scale
# these are a broadcast rule table; at 3+2+2 entries inlining them
# keeps the gate a pure map-only expression pass.
DENY_HOSTS = ("src4.example.com", "src7.example.com", "src13.example.com")
DENY_PATH_PREFIXES = ("/docs/1", "/docs/3")
ALLOW_LICENSES = ("cc-by", "cc0")

# Deterministic licence tag derived from doc_id — the metadata column
# a real crawl carries; shared with the oracle verbatim.
_LICENSE_SQL = (
    "CASE doc_id % 4 WHEN 0 THEN 'cc-by' WHEN 1 THEN 'cc-by-nc' "
    "WHEN 2 THEN 'cc0' ELSE 'all-rights-reserved' END"
)

def _sql_in(vals: tuple[str, ...]) -> str:
    """Inline a literal IN-list, doubling single quotes so a future
    rule entry containing ' cannot break (or silently alter) the
    oracle SQL it is spliced into (ADVICE r8). DENY_PATH_PREFIXES is
    spliced through starts_with below with the same escaping."""
    return ", ".join("'" + v.replace("'", "''") + "'" for v in vals)


def _sql_lit(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"

# The (doc_id, source, verdict) derivation as a reusable CTE chain:
# round 8's per-source gate aggregates it directly; round 9's span
# bridge (queries/round9.py) joins it under the chunk window. One
# definition, two oracles.
VERDICT_CTES = f"""
    raw AS (
      SELECT doc_id, source,
             {_URL_DERIVE_SQL.format(str_t="VARCHAR")} AS url,
             {_LICENSE_SQL} AS licence
      FROM documents
    ),
    parts AS (
      SELECT doc_id, source, licence,
             split_part(split_part(url, '#', 1), '://', 2) AS rest
      FROM raw
    ),
    hp AS (
      SELECT doc_id, source, licence, rest,
             split_part(rest, '/', 1) AS hostport
      FROM parts
    ),
    feat AS (
      SELECT doc_id, source, licence,
             CASE WHEN starts_with(lower(split_part(hostport, ':', 1)),
                                   'www.')
                  THEN substr(lower(split_part(hostport, ':', 1)), 5)
                  ELSE lower(split_part(hostport, ':', 1)) END AS host,
             split_part(substr(rest, length(hostport) + 1), '?', 1)
               AS path
      FROM hp
    ),
    verdicts AS (
      SELECT doc_id, source,
             CASE
               WHEN host IN ({_sql_in(DENY_HOSTS)}) THEN 'denied_host'
               WHEN {" OR ".join(
                 f"starts_with(path, {_sql_lit(p)})"
                 for p in DENY_PATH_PREFIXES
               )} THEN 'denied_path'
               WHEN licence NOT IN ({_sql_in(ALLOW_LICENSES)})
                 THEN 'denied_licence'
               ELSE 'kept'
             END AS verdict
      FROM feat
    )
"""

_COMPLIANCE_ORACLE = f"""
    WITH {VERDICT_CTES}
    SELECT source, verdict,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS sample_doc
    FROM verdicts GROUP BY source, verdict
"""


def with_compliance_verdict(docs: DataFrame) -> DataFrame:
    """Append the compliance ``verdict`` column to a documents frame.

    Pure map-only string expressions (zero join, zero UDF) mirroring
    :data:`VERDICT_CTES` exactly — the single implementation behind
    this module's per-source gate and round 9's span-level bridge.
    Intermediate columns are dropped; all input columns pass through.
    """
    raw = docs.withColumns(
        {
            "__url": F.expr(_URL_DERIVE_SQL.format(str_t="STRING")),
            "__licence": F.expr(_LICENSE_SQL),
        }
    )
    parts = raw.withColumn(
        "__rest",
        F.expr("split_part(split_part(__url, '#', 1), '://', 2)"),
    )
    hp = parts.withColumn(
        "__hostport", F.expr("split_part(__rest, '/', 1)")
    )
    host0 = F.lower(F.expr("split_part(__hostport, ':', 1)"))
    feat = hp.withColumns(
        {
            "__host": F.when(
                host0.startswith("www."),
                F.expr("substr(lower(split_part(__hostport, ':', 1)), 5)"),
            ).otherwise(host0),
            "__path": F.expr(
                "split_part(substr(__rest, length(__hostport) + 1), '?', 1)"
            ),
        }
    )
    path_denied = F.lit(False)
    for p in DENY_PATH_PREFIXES:
        path_denied = path_denied | F.col("__path").startswith(p)
    verdict = (
        F.when(F.col("__host").isin(*DENY_HOSTS), "denied_host")
        .when(path_denied, "denied_path")
        .when(~F.col("__licence").isin(*ALLOW_LICENSES), "denied_licence")
        .otherwise("kept")
    )
    return feat.withColumn("verdict", verdict).drop(
        "__url", "__licence", "__rest", "__hostport", "__host", "__path"
    )


@register(
    "curation_compliance_source_filter",
    oracle=_COMPLIANCE_ORACLE,
    doc="robots/licence crawl-compliance gate (VERDICT r7 item 5b): "
    "host blocklist -> robots Disallow path-prefix rules -> licence "
    "allowlist, first-match precedence, over the SAME derived "
    "pseudo-URLs as curation_url_canonical_hostdedup (host "
    "canonicalized: lowercase + www. strip; path = first '/'..'?' "
    "span; licence tag derived from doc_id, shared with the oracle). "
    "Output: per (source, verdict) doc count + smallest example "
    "doc_id. 100 TB shape: map-only string expressions (split_part "
    "first-occurrence semantics on both sides, zero UDF, zero join — "
    "the rule sets inline; a larger rule table would broadcast) "
    "feeding ONE map-side-combinable aggregate on (source, verdict). "
    "The gate runs BEFORE text processing, so its cost bounds the "
    "whole pipeline's compliance overhead",
)

def curation_compliance_source_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        with_compliance_verdict(docs)
        .groupBy("source", "verdict")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("sample_doc"),
        )
    )
