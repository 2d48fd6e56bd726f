"""Span-level (chunk) exact deduplication over the documents table.

Document-level dedup (``text_exact_dedup``, MinHash/SimHash) drops whole
near-identical documents; the complementary pretraining-data operator is
*intra-corpus span removal* — find token spans that occur verbatim
anywhere earlier in the corpus and strip the repeats while keeping the
rest of each document (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better", which removes duplicate 50-token spans via
a suffix array). A suffix array is a single-machine construction; the
Spark-native equivalent used here is fixed-width chunking:

1. tokenize, group tokens into fixed ``CHUNK`` - width spans (narrow,
   per-row compute — no shuffle);
2. one partial-aggregated shuffle on chunk content computing
   ``min(struct(doc_id, pos))`` — the corpus-wide *first* occurrence of
   every distinct span (deterministic winner, skew-immune: hot spans
   collapse map-side, see :func:`chunk_dedup`);
3. one shuffle by doc_id to reassemble the surviving spans in document
   order, left-joined to per-doc totals.

Two linear shuffles total, no self-join, no quadratic stage — the same
shape at 100 TB, where the chunk-hash shuffle dominates; there you'd ship
``xxhash64(chunk)+doc_id+pos`` through step 2 and rejoin winners to the
chunk text co-partitioned by doc_id, trading a third narrow shuffle for
not moving text twice. At test scale the text fits the shuffle, so the
simpler exact-on-content form is used (and matches the oracle exactly —
no hash-collision caveat).

Reference parity note: the reference (an AWS scoring stack) has no
corpus operators; this module belongs to the brief's LLM-pipeline
extension surface next to textops/textclean.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register

CHUNK = 3  # tokens per span; small because testdata docs are ~20 tokens


_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents
),
chunks AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         array_to_string(t[(u.i*{CHUNK}+1):(u.i*{CHUNK}+{CHUNK})], ' ') AS chunk
  FROM toks, UNNEST(range(CAST(ceil(len(t)/{CHUNK}.0) AS BIGINT))) AS u(i)
),
ranked AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
  FROM chunks
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
       COALESCE(string_agg(chunk, ' ' ORDER BY pos) FILTER (rn = 1), '')
         AS cleaned_text
FROM ranked GROUP BY doc_id
"""


def _chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, chunk): fixed-width token spans, computed narrow."""
    toks = F.split(F.col("text"), " +")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK))).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * CHUNK + 1, CHUNK), " "),
    )
    return docs.select(
        "doc_id", F.posexplode(spans).alias("pos", "chunk")
    ).withColumn("pos", F.col("pos").cast("bigint"))


def chunk_dedup(docs: DataFrame) -> DataFrame:
    """Span dedup over any (doc_id, text) frame: per doc, n_chunks /
    n_kept / cleaned_text with corpus-wide duplicate spans removed.

    The corpus-wide winner per span is ``min(struct(doc_id, pos))`` —
    deliberately an AGGREGATION, not a ``row_number() over (partition by
    chunk)`` window: both are one shuffle on the chunk, but the window
    must co-locate and sort every occurrence of a hot span in one task
    (boilerplate appearing in 30% of documents = one straggler sorting
    30% of the corpus), while the aggregate collapses hot spans to one
    row per map task via partial aggregation before anything shuffles.
    Winner rows ARE the kept spans, so no join back to the occurrence
    table is needed; per-doc totals come from a second narrow aggregate
    joined on doc_id.
    """
    chunks = _chunks(docs)
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    winners = chunks.groupBy("chunk").agg(
        F.min(F.struct("doc_id", "pos")).alias("w")
    )
    kept = winners.groupBy(F.col("w.doc_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("w.pos").alias("pos"), "chunk"))
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


@register(
    "text_chunk_dedup",
    oracle=_ORACLE,
    doc="span-level exact dedup: corpus-wide first occurrence of every "
    f"{CHUNK}-token chunk survives, documents reassembled from surviving "
    "spans — the distributed form of suffix-array span dedup "
    "(Lee et al. 2022); two linear shuffles, no self-join",
)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_dedup(fan_out(load_table(spark, sf_dir, "documents")))
