"""Round-14 staged queries (the rounds-8-13 staging pattern: full hash
oracle, mirrored at two SFs, slope-measured before they ever enter a
driver window): zone-map-pruned range scan over a manifest-committed,
range-clustered artifact, and leakage-safe dataset splits over the
ensemble dedup clusters.

``scan_zonemap_range_agg`` — the consumer of the r12 zone-map
extension to the manifest protocol (SURVEY §4.1 item 7). The corpus is
published ONCE per session as a clustered artifact
(``clustered_write_commit``: hive-partitioned on ``band``,
``repartitionByRange`` on ``doc_id``, per-file doc_id min/max
harvested from the parquet footers and committed in the same manifest
flip). The query probes the middle decile of the doc_id space through
``read_index(prune=(doc_id, lo, hi))`` — files whose committed stats
prove the range empty are never opened — then applies the REAL range
filter (pruning is advisory IO elision, never semantics) and
aggregates per language. At 100 TB this is the index-assisted range
scan of a transactional table format: partition pruning on one key
dimension, zone-map file skipping on a second, from one write. The
skip is pinned structurally in ``tests/test_zonemaps.py`` /
``tests/test_round14_staging.py`` (``inputFiles()`` == the surviving
file set, strictly fewer than the artifact's total); correctness is
the full DuckDB hash oracle below (the artifact's content is exactly
``documents``, so the oracle recomputes the range-agg from the base
table — layout cannot change answers).

``corpus_leakage_safe_splits`` — the curation step every training
pipeline needs AFTER dedup: train/val/test assignment where near-dup
documents can never straddle a split boundary (splitting by per-doc
hash leaks — a benchmark answer's near-dup lands in train while the
original sits in test). The unit of assignment is the ENSEMBLE dedup
cluster (``dedup_ensemble_clusters``: MinHash ∪ winnowing ∪ seeded
semantic evidence, min-label CC), so every document in a cluster
inherits the cluster's split by construction. The cluster→split map is
a deterministic multiplicative hash (Knuth 2654435761 mod 2^32 mod
10 → 8/1/1 train/val/test), exact BIGINT arithmetic in both engines
at test id ranges (production swaps in xxhash64; the *shape* — hash
the cluster LABEL, never the doc id — is the contract). Oracle =
the ensemble oracle spliced verbatim as a derived table (the
round-13 pattern: legs can't drift) + the same CASE arithmetic.
Scale: the split adds one narrow projection over the cluster
assignment — no new shuffle beyond what dedup already did.

Reference parity: engine-side scan optimization + curation split over
the reference's corpus analytics surface (SURVEY §2-extras; the
reference delegates scans to Postgres — `src/backend/main.py` query
paths — where the equivalent of the range scan is a BRIN index).
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.index_manifest import (
    clustered_write_commit,
    read_index,
)
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.session_cache import session_scoped

_ARTIFACTS: dict = {}

N_BANDS = 4
N_RANGES = 8
# the probed decile of the doc_id space, as integer tenths of max(doc_id)
LO_TENTHS, HI_TENTHS = 2, 3


def zonemap_artifact(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """(path, max_doc_id) of the session's clustered documents artifact
    — built once per (session, corpus): band = doc_id % N_BANDS hive
    partitions, doc_id range-clustered files, doc_id zone maps
    committed with the file list."""

    def build() -> tuple[str, int]:
        docs = load_table(spark, sf_dir, "documents")
        path = tempfile.mkdtemp(prefix="csb_zonemap_art_") + "/docs"
        clustered_write_commit(
            docs.withColumn("band", F.col("doc_id") % N_BANDS),
            path,
            part_col="band",
            cluster_col="doc_id",
            n_ranges=N_RANGES,
            note=f"clustered documents {sf_dir}",
        )
        mx = docs.agg(F.max("doc_id")).collect()[0][0]  # 1-row driver step
        return path, int(mx)

    return session_scoped(_ARTIFACTS, spark, (sf_dir,), build)


def probe_bounds(max_doc_id: int) -> tuple[int, int]:
    lo = max_doc_id * LO_TENTHS // 10
    hi = max_doc_id * HI_TENTHS // 10
    return lo, hi


@register(
    "scan_zonemap_range_agg",
    oracle=f"""
    WITH b AS (
      SELECT (MAX(doc_id)*{LO_TENTHS})//10 AS lo,
             (MAX(doc_id)*{HI_TENTHS})//10 AS hi
      FROM documents
    )
    SELECT d.lang AS lang,
           COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
           MIN(d.doc_id) AS min_doc,
           MAX(d.doc_id) AS max_doc
    FROM documents d, b
    WHERE d.doc_id BETWEEN b.lo AND b.hi
    GROUP BY d.lang
    """,
    doc="zone-map-pruned range scan: the middle decile of doc_id space "
    "read through the manifest's committed per-file min/max stats — "
    "files the stats prove empty are never opened (inputFiles pinned "
    "< total), the real filter re-applies the range (pruning is IO "
    "elision, not semantics), per-language count/sum/min/max on top. "
    "The clustered artifact is exactly `documents`, so the oracle "
    "recomputes from the base table — layout cannot change answers",
)
def scan_zonemap_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, mx = zonemap_artifact(spark, sf_dir)
    lo, hi = probe_bounds(mx)
    return (
        read_index(spark, path, prune=("doc_id", lo, hi))
        .filter(F.col("doc_id").between(lo, hi))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# Knuth's multiplicative constant; exact in BIGINT for any cluster
# label below ~3.4e9 (labels are min doc_ids — far below at every test
# SF; production swaps in xxhash64, same shape).
_MIX = 2654435761
_MOD = 2**32

_SPLIT_CASE = (
    f"CASE WHEN (cluster_id * {_MIX}) % {_MOD} % 10 < 8 THEN 'train' "
    f"WHEN (cluster_id * {_MIX}) % {_MOD} % 10 = 8 THEN 'val' "
    f"ELSE 'test' END"
)


@register(
    "corpus_leakage_safe_splits",
    oracle="""
    SELECT c.doc_id, c.cluster_id, {SPLIT_CASE} AS split
    FROM ( {ENSEMBLE_ORACLE} ) c
    """,
    doc="leakage-safe train/val/test assignment: the unit of splitting "
    "is the ensemble dedup CLUSTER (MinHash ∪ winnowing ∪ seeded "
    "semantic evidence, min-label CC), so near-dup documents can never "
    "straddle a split — the property per-doc hashing cannot give. "
    "Cluster→split via exact multiplicative-hash arithmetic (8/1/1); "
    "oracle splices the ensemble oracle verbatim (legs can't drift) "
    "plus the same CASE",
)
def corpus_leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.queries.round13_staging import (
        dedup_ensemble_clusters,
    )

    clusters = dedup_ensemble_clusters(spark, sf_dir)
    return clusters.select(
        "doc_id", "cluster_id", F.expr(_SPLIT_CASE).alias("split")
    )


def _splice_split_oracle() -> None:
    """Embed the (already-spliced) ensemble oracle verbatim as the
    cluster source — the round-13 move that makes composition oracles
    structurally incapable of drifting from their leg rows."""
    from dataclasses import replace

    from cognitive_score_bigdata_spark.queries import REGISTRY
    from cognitive_score_bigdata_spark.queries import (  # noqa: F401
        round13_staging,  # registers + splices the ensemble oracle
    )

    ensemble = REGISTRY["dedup_ensemble_clusters"].oracle
    spec = REGISTRY["corpus_leakage_safe_splits"]
    REGISTRY["corpus_leakage_safe_splits"] = replace(
        spec,
        oracle=spec.oracle.replace("{ENSEMBLE_ORACLE}", ensemble).replace(
            "{SPLIT_CASE}", _SPLIT_CASE.replace("cluster_id", "c.cluster_id")
        ),
    )


_splice_split_oracle()
