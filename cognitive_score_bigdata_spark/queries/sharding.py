"""Registry entry for token-budget output sharding.

The oracle is the naive single-partition form (``SUM() OVER (ORDER
BY)``) — fine for DuckDB on test data; the Spark side runs the two-pass
distributed prefix sum (operators/sharding.py) and must produce the
identical assignment for any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.sharding import token_budget_shards
from cognitive_score_bigdata_spark.queries import register

TOKENS_PER_SHARD = 2_000


@register(
    "corpus_shard_assignment",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(floor(COALESCE(SUM(n_tokens) OVER (
                  ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / {TOKENS_PER_SHARD}) AS BIGINT) AS shard
    FROM sized
    """,
    doc=f"token-budget output sharding (~{TOKENS_PER_SHARD} tokens/shard, "
    "docs never split): two-pass distributed prefix sum — per-partition "
    "totals, driver prefix of numPartitions rows, broadcast offsets + "
    "local windows — vs the oracle's single-partition running sum",
)
def corpus_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return token_budget_shards(docs, TOKENS_PER_SHARD)


SEQ_LEN = 512


@register(
    "corpus_pack_sequences",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n
      FROM documents
    ), pos AS (
      -- SUM() OVER returns HUGEINT in DuckDB; pin BIGINT for range()
      SELECT doc_id, n,
             CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS s
      FROM sized
    ), seqs AS (
      SELECT doc_id, n, s, unnest(range(s // {SEQ_LEN}, (s + n - 1) // {SEQ_LEN} + 1)) AS seq_id
      FROM pos
    )
    SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(greatest(seq_id * {SEQ_LEN}, s) - s AS BIGINT) AS doc_tok_start,
           CAST(least((seq_id + 1) * {SEQ_LEN}, s + n) - s AS BIGINT) AS doc_tok_end
    FROM seqs
    """,
    doc=f"GPT-style sequence packing into {SEQ_LEN}-token training rows "
    "(docs split at sequence boundaries): distributed prefix sum + "
    "boundary-overlap explode, pure integer arithmetic, no extra "
    "shuffle beyond the prefix sum's",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.sharding import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, SEQ_LEN)


@register(
    "corpus_source_mixture",
    oracle="""
    WITH per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split_regex(text, ' +'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), weighted AS (
      SELECT *, CAST(sqrt(n_tokens) AS DECIMAL(28,6)) AS w FROM per_source
    )
    SELECT source, n_docs, n_tokens,
           CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE) AS mix_share
    FROM weighted
    """,
    doc="temperature-based source mixing (alpha = 0.5, i.e. sqrt "
    "up-weighting of small sources — the multilingual/multi-source "
    "rebalancing recipe): per-source token counts, sqrt weights through "
    "the exact DECIMAL accumulator so the share is cross-engine "
    "deterministic; one aggregation, weights are a driver-size table",
)
def corpus_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    per_source = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " +")))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    w = F.sqrt(F.col("n_tokens")).cast("decimal(28,6)")
    total_w = F.sum(w).over(Window.partitionBy())
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        (w.cast("double") / total_w.cast("double")).alias("mix_share"),
    )
