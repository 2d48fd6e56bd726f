"""Registry entries for the frequency-sketch operators.

``sketch_heavy_hitter_tokens`` earns a full hash-match oracle even
though a sketch is involved: the Misra–Gries pass only PRUNES the
aggregation domain (operators/sketches.py), membership is decided by
exact counts, so the result set is deterministic and plain SQL can
express it (token counts vs a scalar total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.operators.sketches import heavy_hitters_exact
from cognitive_score_bigdata_spark.queries import register

PHI = 0.034
K = 64


@register(
    "sketch_heavy_hitter_tokens",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(text, ' +')) AS item FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM tok)
    SELECT item,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) AS DOUBLE) / MAX(tot.n) AS share
    FROM tok, tot
    GROUP BY item
    HAVING COUNT(*) > {PHI} * MAX(tot.n)
    """,
    doc=f"tokens with corpus share > {PHI}: Misra–Gries sketch pass "
    "prunes the vocabulary, broadcast exact-verify pass decides — no "
    "full-vocabulary shuffle, deterministic result (k={K} counters)",
)
def sketch_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(F.split(F.col("text"), " +")).alias("tok")
    )
    return heavy_hitters_exact(toks, "tok", phi=PHI, k=K)
