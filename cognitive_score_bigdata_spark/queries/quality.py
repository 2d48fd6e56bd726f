"""Rule-based corpus quality filtering and boilerplate detection.

``text_gopher_rules`` is the composite rule filter every pretraining
pipeline runs before anything expensive (the Gopher/MassiveText and C4
recipe: word-count bounds, mean-word-length bounds, type-token ratio,
single-token domination). All rules are integer/ratio arithmetic over
the token array — pure built-in expressions, evaluated narrow in one
scan, no shuffle at all; at 100 TB this stage is I/O-bound, exactly as
it should be.

``text_boilerplate_ngrams`` finds verbatim n-grams shared by many
documents (navigation chrome, license headers, template text) — the
corpus-side signal span-dedup and quality filters act on. Per-document
DISTINCT shingles (narrow) → one hash-agg shuffle on the n-gram →
document-frequency filter. Linear; the n-gram agg is the same shape as
word-count, with partial aggregation below the exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.functions import text as TX
from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import shared_stage

# Gopher-style bounds, scaled to the testdata's ~20-token documents.
MIN_WORDS, MAX_WORDS = 5, 5_000
MIN_MWL, MAX_MWL = 2.0, 12.0
MIN_TTR = 0.3
MAX_TOP_SHARE = 0.35

NGRAM = 3
MIN_DF = 3

# Self-contained SQL predicate over a `text` column — the WHERE-clause
# form of the rules, reused by the composed corpus pipeline's oracle.
_T = "string_split_regex(text, ' +')"
GOPHER_WHERE_SQL = (
    f"len({_T}) BETWEEN {MIN_WORDS} AND {MAX_WORDS}"
    f" AND CAST(list_sum(list_transform({_T}, x -> length(x))) AS DOUBLE)"
    f"     / len({_T}) BETWEEN {MIN_MWL} AND {MAX_MWL}"
    f" AND CAST(len(list_distinct({_T})) AS DOUBLE) / len({_T}) >= {MIN_TTR}"
    f" AND CAST(list_max(list_transform(list_distinct({_T}),"
    f"       x -> len(list_filter({_T}, y -> y = x)))) AS DOUBLE)"
    f"     / len({_T}) <= {MAX_TOP_SHARE}"
)


def _top_token_count(toks: F.Column) -> F.Column:
    """Max occurrence count of any single token, as the longest equal-run
    of the SORTED token array — one O(n log n) sort + one O(n) fold per
    row. The obvious ``transform(array_distinct, x -> size(filter(...)))``
    form is O(distinct × n) of *interpreted* higher-order-function evals
    (~13.7k per 21-token doc) and measured 2.1 s for 500 rows; this form
    is ~40 ms."""
    srt = F.array_sort(toks)
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc.prev, acc.run + F.lit(1)).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc.best, run).alias("best")
        )

    return F.aggregate(srt, acc0, step, lambda acc: acc.best)


def gopher_keep() -> F.Column:
    """The composite keep-predicate over a `text` column (Spark side of
    GOPHER_WHERE_SQL)."""
    toks = F.split(F.col("text"), " +")
    n_words = F.size(toks)
    mwl = (
        F.aggregate(
            F.transform(toks, F.length), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).cast("double")
        / F.size(toks)
    )
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    top_share = _top_token_count(toks).cast("double") / F.size(toks)
    return (
        n_words.between(MIN_WORDS, MAX_WORDS)
        & mwl.between(MIN_MWL, MAX_MWL)
        & (ttr >= MIN_TTR)
        & (top_share <= MAX_TOP_SHARE)
    )


@register(
    "text_gopher_rules",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(string_split_regex(text, ' +'),
                                          x -> length(x))) AS DOUBLE)
               / len(string_split_regex(text, ' +')) AS mean_word_len,
             CAST(len(list_distinct(string_split_regex(text, ' +'))) AS DOUBLE)
               / len(string_split_regex(text, ' +')) AS ttr,
             CAST(list_max(list_transform(
                    list_distinct(string_split_regex(text, ' +')),
                    x -> len(list_filter(string_split_regex(text, ' +'),
                                         y -> y = x)))) AS DOUBLE)
               / len(string_split_regex(text, ' +')) AS top_token_share
      FROM documents
    )
    SELECT doc_id, n_words, mean_word_len, ttr, top_token_share,
           (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS})
           AND (mean_word_len BETWEEN {MIN_MWL} AND {MAX_MWL})
           AND ttr >= {MIN_TTR}
           AND top_token_share <= {MAX_TOP_SHARE} AS keep
    FROM feats
    """,
    doc="Gopher/C4 rule composite: word-count bounds, mean word length, "
    "type-token ratio, single-token domination — one narrow scan, "
    "no shuffle",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.col("text"), " +")
    n_words = F.size(toks).cast("bigint")
    # Integer sum → double division on both sides: bit-deterministic.
    mwl = (
        F.aggregate(
            F.transform(toks, F.length), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).cast("double")
        / F.size(toks)
    )
    top_share = _top_token_count(toks).cast("double") / F.size(toks)
    feats = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        TX.uniq_ratio("text").alias("ttr"),
        top_share.alias("top_token_share"),
    )
    keep = (
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("mean_word_len").between(MIN_MWL, MAX_MWL)
        & (F.col("ttr") >= MIN_TTR)
        & (F.col("top_token_share") <= MAX_TOP_SHARE)
    )
    return feats.withColumn("keep", keep)


@register(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[(u.i+1):(u.i+{NGRAM})], ' ') AS ngram
      FROM toks, UNNEST(range(CAST(len(t) - {NGRAM - 1} AS BIGINT))) AS u(i)
      WHERE len(t) >= {NGRAM}
    )
    SELECT ngram, CAST(COUNT(*) AS BIGINT) AS df
    FROM grams GROUP BY ngram HAVING COUNT(*) >= {MIN_DF}
    """,
    doc=f"boilerplate detection: sliding {NGRAM}-gram shingles, distinct "
    f"per doc, document frequency >= {MIN_DF} — per-doc dedup narrow, "
    "one hash-agg shuffle on the n-gram",
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.col("text"), " +")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - NGRAM),
            lambda i: F.array_join(F.slice(toks, i + 1, NGRAM), " "),
        )
    )
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return (
        docs.filter(F.size(toks) >= NGRAM)
        .select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= MIN_DF)
    )


@register(
    "text_charngram_familiarity",
    oracle="""
    WITH tris AS (
      SELECT doc_id,
             unnest(list_transform(range(length(text) - 2),
                    i -> substring(text, CAST(i + 1 AS INTEGER), 3))) AS tri
      FROM documents WHERE length(text) >= 3
    ), cnt AS (
      SELECT tri, COUNT(*) AS c FROM tris GROUP BY tri
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(c.c) AS BIGINT) AS familiarity_mass,
           CAST(SUM(c.c) AS DOUBLE) / COUNT(*) AS familiarity
    FROM tris t JOIN cnt c USING (tri)
    GROUP BY t.doc_id
    """,
    doc="char-trigram LM familiarity (the CCNet perplexity-filter shape "
    "with exact cross-engine parity: integer corpus-count mass per doc "
    "over trigram count, one double division at the end instead of "
    "order-sensitive float log sums) — low scores flag text unlike the "
    "corpus; one count agg + one count join, both linear",
)
def text_charngram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tri_arr = F.transform(
        F.sequence(F.lit(1), F.length("text") - 2),
        lambda i: F.col("text").substr(i, F.lit(3)),
    )
    tris = (
        docs.filter(F.length("text") >= 3)
        .select("doc_id", F.explode(tri_arr).alias("tri"))
        # reused: global trigram counts + the per-doc mass join — the
        # cut stops the corpus-sized explode running twice (r16).
        # Storage footprint (ADVICE r16): rows ≈ total corpus text chars
        # (one per trigram instance) — a corpus-text-sized intermediate
        # in executor storage, traded against re-running the same-sized
        # explode+shuffle a second time.
    )
    tris = shared_stage(tris)
    counts = tris.groupBy("tri").agg(F.count(F.lit(1)).alias("c"))
    return (
        tris.join(counts, "tri")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("c").alias("familiarity_mass"),
            (F.sum("c").cast("double") / F.count(F.lit(1))).alias("familiarity"),
        )
    )
