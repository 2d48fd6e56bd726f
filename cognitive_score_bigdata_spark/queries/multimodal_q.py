"""Registry entries for the multimodal binary-column path.

Payloads are derived deterministically from the documents table (UTF-8
bytes of the text column), so the WHOLE Arrow pipeline — binary column
into ``mapInPandas``, batched decode-stub, typed metadata out — is
oracle-comparable row-for-row against DuckDB's ``sha256``/
``octet_length`` on the same source. Only the metadata columns are
oracle-checked; the stub feature histogram is pinned by unit tests
(tests/test_dedup_similarity.py) instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.operators.multimodal import (
    extract_features,
)
from cognitive_score_bigdata_spark.queries import register


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return fan_out(docs).select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


@register(
    "multimodal_extract_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
    doc="binary-column decode/featurize plumbing: payload bytes through "
    "an Arrow-batched mapInPandas stage, typed metadata out — metadata "
    "oracle-checked end to end, codec stubbed (no image/audio libs here)",
)
def multimodal_extract_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    media = _media_table(spark, sf_dir)
    return extract_features(media, decoder="fake").select(
        "media_id", "media_type", "n_bytes", "sha256"
    )

