"""The composed corpus-cleaning pipeline, end to end under ONE oracle.

Individual cleaning operators (Gopher rule filter, repeat collapse,
exact dedup) each carry their own oracle; production runs them as one
chained job. This query pins the COMPOSITION: quality-filter → collapse
repeats → hash-dedup the collapsed text, with the final (md5, keeper,
copy-count) groups hash-matched against a CTE-for-CTE SQL rebuild — so
a stage reordering or a subtly changed intermediate schema can't pass.

Because the synthetic corpus has no exact duplicates at test SFs, the
input deterministically REPLICATES every 7th document under a shifted
doc_id (the textclean module's construct-your-own-dirty-input pattern);
the dedup stage then visibly collapses those groups to n_copies = 2.

Scale shape: filter and collapse are narrow expressions fused into the
scan stage; the only shuffle is the final hash-aggregate on the
collapsed digest — at 100 TB this pipeline is one linear pass + one
dedup-width shuffle, which is the point of running the stages chained
instead of materializing each.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.quality import (
    GOPHER_WHERE_SQL,
    gopher_keep,
)
from cognitive_score_bigdata_spark.queries.textclean import collapsed_text

_SHIFT = 1_000_000


@register(
    "corpus_clean_pipeline",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_SHIFT} AS doc_id, text
      FROM documents WHERE doc_id % 7 = 0
    ),
    kept AS (
      SELECT doc_id, text FROM corpus WHERE {GOPHER_WHERE_SQL}
    ),
    words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM kept),
    tok AS (
      SELECT doc_id, CAST(i AS INTEGER) AS i, tk,
             ws[CAST(i AS INTEGER) - 1] AS prev
      FROM (SELECT doc_id, ws, unnest(ws) AS tk,
                   unnest(range(1, len(ws) + 1)) AS i
            FROM words)
    ),
    collapsed AS (
      SELECT doc_id,
             string_agg(tk, ' ' ORDER BY i) FILTER (i = 1 OR tk <> prev)
               AS ctext
      FROM tok GROUP BY doc_id
    )
    SELECT md5(ctext) AS text_md5,
           MIN(doc_id) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM collapsed GROUP BY md5(ctext)
    """,
    doc="composed cleaning pipeline (Gopher filter → repeat collapse → "
    "exact dedup) hash-checked end-to-end; narrow stages fuse into the "
    "scan, one dedup shuffle total",
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Replicate every 7th doc via explode, not UNION ALL — a union's
    # branches each scan (and fan_out-shuffle) the source; the explode
    # replicates rows inside the one narrow pass.
    doc_ids = F.when(
        F.col("doc_id") % 7 == 0,
        F.array(F.col("doc_id"), F.col("doc_id") + _SHIFT),
    ).otherwise(F.array(F.col("doc_id")))
    corpus = (
        fan_out(load_table(spark, sf_dir, "documents"))
        .select(F.explode(doc_ids).alias("doc_id"), "text")
    )
    return (
        corpus.filter(gopher_keep())
        # md5 computed in the projection, not the groupBy key: grouping
        # on an expression re-inlines the whole upstream HOF chain into
        # the aggregate's key evaluation (measured ~1.6× slower).
        .select(
            "doc_id",
            F.md5(collapsed_text(F.split(F.col("text"), " "))).alias("text_md5"),
        )
        .groupBy("text_md5")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "streaming_corpus_clean",
    oracle=f"""
    SELECT DISTINCT md5(text) AS text_md5
    FROM documents WHERE {GOPHER_WHERE_SQL}
    """,
    doc="the Structured Streaming corpus pipeline (file source, Gopher "
    "filter, watermark, dropDuplicatesWithinWatermark digest state, "
    "parquet sink) run availableNow over the documents table — the kept "
    "digest SET is deterministic and hash-matches plain SQL, so the "
    "stateful streaming path itself earns an oracle row",
)
def streaming_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from cognitive_score_bigdata_spark.streaming.corpus import (
        corpus_clean_batch_parity,
    )

    work = tempfile.mkdtemp(prefix="csb_stream_parity_")
    return corpus_clean_batch_parity(spark, sf_dir, work)
