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
