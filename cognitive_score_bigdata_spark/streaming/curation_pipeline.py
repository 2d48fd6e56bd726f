"""Stream-to-training-set curation pipeline (VERDICT r12 item 5): the
brief's full ingestion path composed from its three separately-proven
stages —

    stream ──availableNow──▶ semantic admission ──▶ ensemble dedup
           (manifest-fenced)   (admitted corpus)      over ADMITTED docs
                                                          │
                                              leakage-safe splits ──▶

The stage contracts this composition relies on (each pinned by its own
battery):

- **admission** (``streaming/semantic_admission.py``): at-least-once
  foreachBatch with the batch-id fence in the manifest flip — after the
  drain the committed index IS the admitted corpus, and it is already
  the seeded-cell candidate table ``(neighbor_id, __c, cell)``, i.e.
  exactly the SemDeDup quantization artifact the ensemble's semantic
  leg needs. No re-assignment pass: the admission state doubles as the
  dedup index.
- **ensemble dedup** (``queries/round13_staging.py``): three evidence
  legs (md5-MinHash, winnowing, seeded-cell cosine) closed under
  min-label connected components. The lexical/substring legs are
  pairwise, so the admitted subgraph's edges are the full-graph edges
  with BOTH endpoints admitted — a semi-join restriction, no leg
  recompute for the subset.
- **splits** (``queries/round14_staging.py``): the split unit is the
  CLUSTER, so near-dup documents can never straddle train/eval.

doc_id == vec_id is the corpus contract (the embedding of document d
carries vec_id d — the testdata shape and the production convention
this repo uses throughout the embedding families).

At 100 TB each arrow keeps its stage's plan: the admission probe is
cell-pruned O(batch), the legs are banded/blocked candidate
generation, CC is the bounded hybrid finish, the split is one narrow
projection. The composition adds only the admitted-endpoint semi-joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.index_manifest import read_index
from cognitive_score_bigdata_spark.streaming.semantic_admission import (
    admit_stream_batch,
)


def drain_admission_stream(
    spark: SparkSession,
    batches_glob: str,
    index_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
    timeout_s: int = 300,
) -> None:
    """availableNow drain of a parquet drop directory through the
    manifest-fenced admission gate — one micro-batch per dropped file
    by default, replay-safe by the fence."""
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(batches_glob)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: admit_stream_batch(spark, b, index_path, bid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def admitted_training_splits(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """(doc_id, cluster_id, split) over the ADMITTED corpus: ensemble
    dedup clusters restricted to admitted documents, split by the
    leakage-safe cluster hash. Call after :func:`drain_admission_stream`
    (or any sequence of ``admit_stream_batch`` commits)."""
    from cognitive_score_bigdata_spark.operators.dedup import (
        connected_components,
    )
    from cognitive_score_bigdata_spark.operators.similarity import (
        IvfIndex,
        semantic_dedup_pairs,
    )
    from cognitive_score_bigdata_spark.queries.dedup_md5 import (
        dedup_minhash_pairs_md5,
    )
    from cognitive_score_bigdata_spark.queries.round11_staging import (
        dedup_winnowing_pairs,
    )
    from cognitive_score_bigdata_spark.queries.round13_staging import (
        SEM_THRESHOLD,
    )
    from cognitive_score_bigdata_spark.queries.round14_staging import (
        _SPLIT_CASE,
    )

    cand = read_index(spark, index_path)  # the admitted corpus, assigned
    admitted = cand.select(F.col("neighbor_id").alias("doc_id")).distinct()
    docs = load_table(spark, sf_dir, "documents").join(
        admitted, "doc_id", "semi"
    )

    # pairwise legs: admitted-subgraph edges = full edges with both
    # endpoints admitted (semi-join restriction, exact for pairwise
    # evidence)
    def _both_admitted(pairs: DataFrame) -> DataFrame:
        a = admitted.select(F.col("doc_id").alias("doc_a"))
        b = admitted.select(F.col("doc_id").alias("doc_b"))
        return pairs.join(a, "doc_a", "semi").join(b, "doc_b", "semi")

    mh = _both_admitted(
        dedup_minhash_pairs_md5(spark, sf_dir)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    win = _both_admitted(
        dedup_winnowing_pairs(spark, sf_dir).select("doc_a", "doc_b")
    )
    # semantic leg: the admission index IS the quantization artifact —
    # pairs form only among committed (= admitted) vectors
    sem = semantic_dedup_pairs(
        docs, threshold=SEM_THRESHOLD, index=IvfIndex(cand, None)
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))

    # §2.6 leg overlap tried and REVERTED in r17 (same finding as the
    # batch ensemble row): the fused plan already overlaps the legs'
    # stages — see OPTIMIZATION_r17.md.
    edges = (
        mh.unionByName(win)
        .unionByName(sem)
        .distinct()
        .select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    )
    clusters = connected_components(edges, docs, "doc_id")
    return clusters.select(
        "doc_id", "cluster_id", F.expr(_SPLIT_CASE).alias("split")
    )
