"""IVF plumbing under an exact-mode oracle (round 2+).

``ivf_topk`` with ``n_probe == n_cells`` probes every cell, so the
result is exactly brute-force top-k — which means the ENTIRE IVF
machinery (KMeans coarse quantizer, cell assignment, probe pruning,
per-cell candidate scoring, final merge) earns a DuckDB hash-match row,
not just the recall-vs-exact unit test. Registered after the driver's
current 50-entry window; rotate forward next round.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.similarity import ivf_probe
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.dedup_similarity import ivf_index


@register(
    "vector_ann_ivf_exact",
    oracle="""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                      c.vec_id ASC) AS BIGINT) AS rnk
    FROM embeddings q JOIN embeddings c ON q.vec_id < 5
                                       AND c.vec_id <> q.vec_id
    QUALIFY rnk <= 10
    """,
    doc="IVF top-k at n_probe=n_cells: probing every cell makes the "
    "approximate path exact, so the full quantize/probe/score/merge "
    "pipeline is oracle-checked hash-for-hash against brute force",
)
def vector_ann_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    index = ivf_index(spark, sf_dir, n_cells=8)
    return ivf_probe(index, queries, k=10, n_probe=8).select(
        "query_id", "neighbor_id", "rnk"
    )
