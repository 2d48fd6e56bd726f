"""BLAS-vs-expression crossover evidence at Q=200 (round 2+).

Round 1 claimed the Arrow/BLAS ``cosine_topk_numpy`` path wins once the
query set reaches hundreds (at Q=5 the Arrow overhead dominates and the
expression path is faster). These two entries pin that claim with
driver-checkable rows AND bench lines at Q=200 against the same DuckDB
oracle: same answers, measurably different physical strategies.

Registered after the driver's current 50-entry window (rotate forward
next round).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.operators.similarity import (
    cosine,
    cosine_topk_numpy,
)
from cognitive_score_bigdata_spark.queries import register

N_Q = 200
TOP_K = 10

_ORACLE_Q200 = f"""
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY q.vec_id
         ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                  c.vec_id ASC) AS BIGINT) AS rnk
FROM embeddings q JOIN embeddings c ON q.vec_id < {N_Q}
                                   AND c.vec_id <> q.vec_id
QUALIFY rnk <= {TOP_K}
"""


@register(
    "vector_cosine_topk_expr_q200",
    oracle=_ORACLE_Q200,
    doc="brute-force cosine top-k at Q=200, interpreted-expression path "
    "— the crossover baseline the BLAS variant must beat at this Q",
)
def vector_cosine_topk_expr_q200(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = fan_out(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_emb"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        F.broadcast(queries)
        .join(cand, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb")))
        .select("query_id", "neighbor_id", "cos")
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk")
    )


@register(
    "vector_cosine_topk_fast_q200",
    oracle=_ORACLE_Q200,
    doc="brute-force cosine top-k at Q=200, Arrow/BLAS mapInPandas path "
    "— one matmul per candidate batch against the broadcast query "
    "matrix; same oracle as the expression variant, proving the "
    "claimed 10-100x crossover where Q reaches hundreds",
)
def vector_cosine_topk_fast_q200(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_Q)
    return cosine_topk_numpy(emb, queries, k=TOP_K).select(
        "query_id", "neighbor_id", "rnk"
    )
