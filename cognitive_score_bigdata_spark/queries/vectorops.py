"""Vector / embedding operators: brute-force cosine top-k ANN baseline.

The scale path (LSH-bucketed / IVF variants) lives in
operators/similarity.py; this module registers the oracle-checkable
baseline. Outputs are (query, neighbor, rank) triples — rank ordering is
robust to last-bit float divergence between engines, unlike raw cosine
values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.operators.similarity import cosine
from cognitive_score_bigdata_spark.queries import register

N_QUERIES = 5
TOP_K = 10


@register(
    "vector_cosine_topk",
    oracle=f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                      c.vec_id ASC) AS BIGINT) AS rnk
    FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERIES}
                                       AND c.vec_id <> q.vec_id
    QUALIFY rnk <= {TOP_K}
    """,
    doc="brute-force cosine top-k over the embedding column — the exact "
    "ANN baseline; broadcast queries × scan candidates, rank per query",
)
def vector_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = fan_out(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(queries)
        .join(cand, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb")))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk")
    )
