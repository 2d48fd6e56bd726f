"""Streaming corpus ingest: the LLM-pipeline cleaning operators applied
at the stream edge instead of in batch.

A crawl pipeline doesn't land its corpus and then clean it — documents
arrive continuously and duplicates (re-crawls, mirrors) cluster in
time. This module runs the same operators the batch registry exposes
(Gopher rule filter, content-digest exact dedup) inside Structured
Streaming:

- quality filtering is stateless — a narrow filter on the micro-batch;
- exact dedup is stateful — ``dropDuplicatesWithinWatermark`` on the
  content digest keeps each digest's state only until the watermark
  passes it, so state size is bounded by the dedup horizon instead of
  growing with the corpus (the batch registry's ``text_exact_dedup``
  is the unbounded-horizon equivalent).

At 100 TB/day the digest state shuffles by md5 — uniformly distributed
by construction, no skew story needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from cognitive_score_bigdata_spark.queries.quality import gopher_keep

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("crawl_ts", T.StringType()),  # ISO8601
    ]
)


def read_document_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = 10
) -> DataFrame:
    """Micro-batch document source (file drop-dir stand-in, same
    contract as the event stream's S5 source)."""
    reader = spark.readStream.format("json").schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(input_dir)


def clean_document_stream(
    docs: DataFrame, dedup_horizon: str = "10 minutes"
) -> DataFrame:
    """Quality-filter + watermarked exact dedup on the content digest.

    Emits (doc_id, text, source, crawl_ts, text_md5) for documents that
    (a) pass the Gopher rules and (b) are the first occurrence of their
    content digest within the watermark horizon. A re-crawled duplicate
    arriving inside ``dedup_horizon`` is dropped; one arriving later is
    a new document by design (bounded state — the horizon IS the
    contract, not an approximation of forever)."""
    return (
        docs.withColumn("crawl_ts", F.to_timestamp("crawl_ts"))
        .filter(F.col("text").isNotNull() & gopher_keep())
        .withColumn("text_md5", F.md5(F.col("text")))
        .withWatermark("crawl_ts", dedup_horizon)
        .dropDuplicatesWithinWatermark(["text_md5"])
    )


def run_corpus_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    dedup_horizon: str = "10 minutes",
):
    """End-to-end: stream → clean → parquet append, availableNow (drains
    the backlog then stops — the batch-driven test/backfill mode)."""
    cleaned = clean_document_stream(
        read_document_stream(spark, input_dir), dedup_horizon
    )
    return (
        cleaned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


_PARITY_STREAM_IN: dict = {}


def _parity_stream_indir(spark: SparkSession, sf_dir: str) -> str:
    """Session-cached JSON export of documents — the stream SOURCE is a
    fixture (in production the drop directory already exists). Caching
    it keeps the timed registry row measuring the drain + digest-state
    maintenance, not the one-time export — the same pattern (and
    rationale) as ``sketches_md5._hll_stream_indir``; r17 aligned this
    row with it (the export was silently re-running every bench rep)."""
    import os
    import tempfile

    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.session_cache import session_scoped

    def build() -> str:
        in_dir = os.path.join(
            tempfile.mkdtemp(prefix="csb_stream_parity_in_"), "in"
        )
        (
            load_table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                "text",
                "source",
                F.lit("2024-01-01T10:00:00").alias("crawl_ts"),
            )
            .write.mode("overwrite")
            .json(in_dir)
        )
        return in_dir

    return session_scoped(_PARITY_STREAM_IN, spark, (sf_dir,), build)


def corpus_clean_batch_parity(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> DataFrame:
    """Drive the FULL streaming pipeline (file source → quality filter →
    watermark → digest dedup state → parquet sink) over the batch
    documents table, availableNow, and return the kept digests.

    Exists so the streaming machinery itself earns a DuckDB hash-match
    row in the driver's correctness harness: projecting to the content
    digest makes the output SET deterministic (which doc_id survives a
    digest is arrival-order-dependent; the digest set is not), and
    DuckDB recomputes it as ``SELECT DISTINCT md5(text) ... WHERE
    <gopher rules>`` — no streaming semantics in the oracle, but the
    entire stateful path runs under the check.
    """
    import os

    in_dir = _parity_stream_indir(spark, sf_dir)
    out_dir = os.path.join(work_dir, "out")
    ckpt = os.path.join(work_dir, "ckpt")
    q = run_corpus_ingest(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(300)
    return spark.read.parquet(out_dir).select("text_md5")


def run_streaming_dedup_probe(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    clean_dir: str,
    duplog_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
):
    """Streaming NEAR-dup gate: every arriving micro-batch is probed
    against the persisted corpus minhash index; near-dups of the
    existing corpus are quarantined to a duplicate log, fresh documents
    append to the clean lake.

    This composes the incremental-dedup operator (signatures for the
    corpus computed once, batch side broadcast into the band-bucket
    join — ``operators/dedup.dedup_incremental``) with the stream edge:
    the batch is small by construction (one trigger's files), which is
    exactly the regime the incremental probe is designed for. Contrast
    with ``clean_document_stream``'s digest dedup: that catches exact
    re-crawls inside the watermark horizon with bounded state; this
    catches NEAR-duplicates of the whole historical corpus with state
    externalized to the persisted index. A production pipeline runs
    both, in that order (digest first — it's cheaper).
    """
    from cognitive_score_bigdata_spark.operators.dedup import (
        dedup_incremental,
        load_minhash_index,
    )

    index = load_minhash_index(spark, index_path)

    def probe_batch(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.filter(F.col("text").isNotNull()).persist()
        pairs = dedup_incremental(
            batch, index, threshold=threshold, id_col="doc_id"
        ).persist()
        dup_ids = pairs.select(
            F.col("new_id").alias("doc_id")
        ).distinct()
        # Replay-idempotent epoch writes (same contract as
        # write_raw_batch): a batch replayed after a failure between
        # these writes and the checkpoint commit overwrites exactly its
        # own __epoch=N/ partition instead of appending duplicates.
        (
            pairs.withColumn("__epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(duplog_dir)
        )
        (
            batch.join(dup_ids, "doc_id", "left_anti")
            .withColumn("__epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(clean_dir)
        )
        pairs.unpersist()
        batch.unpersist()

    return (
        read_document_stream(spark, input_dir)
        .writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
