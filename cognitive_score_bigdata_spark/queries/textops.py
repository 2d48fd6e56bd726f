"""Text-analysis queries over the documents table (training-data
pipeline operators: token stats, quality scoring, language ID,
fingerprinting, exact dedup, n-gram Jaccard similarity).

These are the SQL-expressible members; MinHash-LSH / SimHash live in
operators/dedup.py with rows-only checks (sketches aren't portable SQL).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.functions import text as TX
from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS char_len,
           CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split_regex(text, ' +'))) AS BIGINT)
             AS n_distinct_tokens
    FROM documents
    """,
    doc="token counting (whitespace tokenizer) — token-budget accounting "
    "for corpus prep",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        TX.char_len("text").alias("char_len"),
        TX.token_count("text").alias("n_tokens"),
        TX.distinct_token_count("text").alias("n_distinct_tokens"),
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(len(list_distinct(string_split_regex(text, ' +'))) AS DOUBLE)
             / len(string_split_regex(text, ' +')) AS uniq_ratio,
           0.5 * (CAST(len(list_distinct(string_split_regex(text, ' +'))) AS DOUBLE)
                  / len(string_split_regex(text, ' +')))
           + 0.5 * least(CAST(len(string_split_regex(text, ' +')) AS DOUBLE)
                         / 100.0, 1.0) AS quality
    FROM documents
    """,
    doc="document quality scoring (type-token ratio + length prior) — "
    "the filter stage of a pretraining-data pipeline",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        TX.uniq_ratio("text").alias("uniq_ratio"),
        TX.quality_score("text").alias("quality"),
    )


@register(
    "text_lang_id",
    oracle="""
    SELECT doc_id, lang,
           CASE
             WHEN ' ' || text || ' ' LIKE '% the %'
               OR ' ' || text || ' ' LIKE '% and %'
               OR ' ' || text || ' ' LIKE '% of %' THEN 'en'
             WHEN ' ' || text || ' ' LIKE '% der %'
               OR ' ' || text || ' ' LIKE '% und %'
               OR ' ' || text || ' ' LIKE '% die %' THEN 'de'
             WHEN ' ' || text || ' ' LIKE '% le %'
               OR ' ' || text || ' ' LIKE '% et %'
               OR ' ' || text || ' ' LIKE '% les %' THEN 'fr'
             WHEN ' ' || text || ' ' LIKE '% el %'
               OR ' ' || text || ' ' LIKE '% y %'
               OR ' ' || text || ' ' LIKE '% los %' THEN 'es'
             ELSE 'und'
           END AS lang_guess
    FROM documents
    """,
    doc="language ID (stopword-hit heuristic) next to the labeled lang "
    "column for accuracy eval",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", TX.lang_guess("text").alias("lang_guess")
    )


@register(
    "text_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_md5,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="exact deduplication: hash-groupBy on content fingerprint, "
    "keep min doc_id — one shuffle on the digest, no text comparison",
)
def text_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(TX.fingerprint("text").alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "text_token_count_bpe",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
                AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
    doc="BPE-ish regex token counting (letter runs / digit runs / "
    "punctuation) — the pre-tokenizer split a byte-pair tokenizer sees",
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.bpe_ish_token_count("text").alias("n_bpe_tokens")
    )


# text_rolling_fingerprint moved to queries/round3_additions.py (upgraded
# to a full DuckDB oracle and placed inside the driver's 50-entry window).


@register(
    "text_ngram_jaccard",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, source,
             unnest(string_split_regex(text, ' +')) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM tok a JOIN tok b
        ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.8
    """,
    doc="n-gram (unigram-set) Jaccard near-dup pairs within a source "
    "partition — the exact counterpart the MinHash-LSH path approximates",
)
def text_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Token-set pairs within a source block, verified with array_intersect
    # on pre-deduped token arrays. A token-posting self-join (the obvious
    # formulation, and what the oracle SQL does) shuffles
    # Σ_{token,source} df(token)² rows — quadratic blow-up whenever the
    # vocabulary is shared, which is exactly the near-dup case. Here the
    # block join ships each doc's token array once and the intersection
    # runs JVM-side per pair; on huge corpora, swap the source block for
    # MinHash-LSH buckets (dedup_minhash_pairs) — same verify stage.
    docs = load_table(spark, sf_dir, "documents")
    # fan_out: tokenization is the only pre-shuffle compute; single-row-
    # group local files would otherwise run it on one core.
    toks = (
        fan_out(docs)
        .select(
            "doc_id",
            "source",
            F.array_distinct(TX.tokens("text")).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
        # both join sides consume this — materialize the tokenize once
        .localCheckpoint(eager=False)
    )
    a = toks.select(
        F.col("source"),
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("na"),
    )
    b = toks.select(
        F.col("source"),
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("nb"),
    )
    n_common = F.size(F.array_intersect("toks_a", "toks_b"))
    jac = n_common.cast("double") / (F.col("na") + F.col("nb") - n_common)
    # Length filter (exact): J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so pairs
    # whose size ratio falls below the threshold can't qualify — an
    # integer predicate evaluated before any array intersection, and the
    # dominant pruner on size-diverse corpora (8x scale-up: 62s → the
    # intersect runs only on ratio-surviving pairs).
    size_ok = (
        F.least(F.col("na"), F.col("nb")).cast("double")
        / F.greatest(F.col("na"), F.col("nb"))
        >= 0.8
    )
    return (
        a.join(b, "source")
        .filter((F.col("doc_a") < F.col("doc_b")) & size_ok)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )
