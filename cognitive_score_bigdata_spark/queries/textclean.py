"""Training-corpus cleaning operators (round 2+): PII scrubbing,
benchmark-contamination detection, repeated-token collapse.

These are the text-hygiene stages of an LLM data pipeline that sit
between raw scrape and dedup: strip personal data, drop documents that
contain evaluation-benchmark content, normalize pathological repetition.
All three are linear single-pass expressions (regexp / broadcast
semi-match / array fold) — no shuffle besides the final aggregate, so
they run at scan speed on a 100 TB corpus.

The synthetic documents contain no real PII/benchmark text, so each
query deterministically CONSTRUCTS its dirty input from doc_id — the
same arithmetic is repeated in the DuckDB oracle, so the whole
scrub/detect/collapse transformation is hash-checked row-for-row.

Registered after the driver's current 50-entry window (rotate forward
next round).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import bigint

EMAIL_RE = r"[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-'
                  || CAST(1000 + doc_id % 9000 AS VARCHAR) AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(length(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
               AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '[EMAIL]',
               'g'), '{PHONE_RE}', '[PHONE]', 'g')) AS scrubbed_md5
    FROM dirty
    """,
    doc="PII scrubbing: email/phone redaction with per-doc counts — "
    "deterministically injected PII so redaction is oracle-checked via "
    "the scrubbed text's md5; pure regexp expressions, scan-speed linear",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "[EMAIL]"),
        PHONE_RE,
        "[PHONE]",
    )
    return dirty.select(
        "doc_id",
        bigint(F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), 0)))
        .alias("n_emails"),
        bigint(F.size(F.regexp_extract_all(F.col("text"), F.lit(PHONE_RE), 0)))
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "text_contamination_check",
    oracle="""
    WITH snippets AS (
      SELECT array_to_string(string_split(text, ' ')[1:5], ' ') AS snip
      FROM documents WHERE doc_id % 97 = 0
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_snippets_hit
    FROM documents d JOIN snippets s
      ON position(s.snip IN d.text) > 0
    GROUP BY d.doc_id
    """,
    doc="benchmark-contamination check: flag documents containing any "
    "snippet from a (small) benchmark set as a substring — benchmark "
    "side broadcast, corpus side one scan; at 100 TB the benchmark set "
    "stays driver-small (eval suites are KBs) so this shape holds",
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    snippets = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select(
            F.array_join(F.slice(F.split("text", " "), 1, 5), " ").alias("snip")
        )
    )
    return (
        docs.join(
            F.broadcast(snippets),
            F.expr("position(snip IN text) > 0"),
        )
        .groupBy("doc_id")
        .agg(bigint(F.count(F.lit(1))).alias("n_snippets_hit"))
    )


def collapse_tokens(ws: F.Column) -> F.Column:
    """Run-length-collapsed token structs (w, i) from a token array —
    shared by the single-op query and the composed corpus pipeline."""
    indexed = F.transform(ws, lambda w, i: F.struct(w.alias("w"), i.alias("i")))
    return F.filter(
        indexed,
        # F.get is 0-based and null out-of-bounds, so i=0 compares the
        # first token to NULL and coalesce keeps it (no ANSI index error)
        lambda s: F.coalesce(s.w != F.get(ws, s.i - 1), F.lit(True)),
    )


def collapsed_text(ws: F.Column) -> F.Column:
    return F.array_join(F.transform(collapse_tokens(ws), lambda s: s.w), " ")


@register(
    "text_collapse_repeats",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), tok AS (
      -- parallel unnests zip in DuckDB; no WITH ORDINALITY /
      -- generate_subscripts in this build
      SELECT doc_id, CAST(i AS INTEGER) AS i, tk,
             ws[CAST(i AS INTEGER) - 1] AS prev
      FROM (SELECT doc_id, ws, unnest(ws) AS tk,
                   unnest(range(1, len(ws) + 1)) AS i
            FROM words)
    )
    SELECT doc_id,
           CAST(MAX(i) AS BIGINT) AS n_tokens_before,
           CAST(COUNT(*) FILTER (i = 1 OR tk <> prev) AS BIGINT)
               AS n_tokens_after,
           md5(string_agg(tk, ' ' ORDER BY i)
               FILTER (i = 1 OR tk <> prev)) AS collapsed_md5
    FROM tok GROUP BY doc_id
    """,
    doc="repeated-token collapse (run-length normalization of "
    "pathological repetition like 'batch batch batch'): one array fold "
    "per document, no explode/shuffle on the Spark side — the collapsed "
    "text's md5 is oracle-matched against a subscripted SQL rebuild",
)
def text_collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ws = F.split(F.col("text"), " ")
    kept = collapse_tokens(ws)
    return docs.select(
        "doc_id",
        bigint(F.size(ws)).alias("n_tokens_before"),
        bigint(F.size(kept)).alias("n_tokens_after"),
        F.md5(F.array_join(F.transform(kept, lambda s: s.w), " ")).alias(
            "collapsed_md5"
        ),
    )
