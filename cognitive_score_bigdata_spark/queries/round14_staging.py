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
    replace_parts_commit,
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


# ---------------------------------------------------------------------------
# scan_delete_rewrite_fetch — the UPDATE-shaped lake lifecycle composed
# (VERDICT r12 item 4): fetch-by-id-set (prune_in), rewrite the affected
# partitions (replace_parts_commit), stats re-harvested in the SAME
# manifest flip, then the post-rewrite fetch — the GDPR-delete /
# re-annotate shape a training lake actually runs.
# ---------------------------------------------------------------------------

DEL_MOD, DEL_REM = 100, 17  # the delete list: doc_id ≡ 17 (mod 100)
# the re-fetch list: doc_id ≡ 17 (mod 50) within deciles 2-6 of the id
# space — overlapping the delete list (so the oracle proves the delete)
# and range-local (so the point-set prune actually skips files; a
# whole-range probe set touches every file's committed range)
PROBE_MOD, PROBE_REM = 50, 17
PROBE_LO_TENTHS, PROBE_HI_TENTHS = 2, 6


def probe_id_list(mx: int) -> list[int]:
    lo = mx * PROBE_LO_TENTHS // 10
    hi = mx * PROBE_HI_TENTHS // 10
    return [i for i in range(PROBE_REM, mx + 1, PROBE_MOD) if lo <= i <= hi]

_REWRITE_ARTIFACTS: dict = {}


def rewrite_artifact(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """(path, max_doc_id) of the session's delete-rewritten clustered
    artifact — built once per (session, corpus):

    1. initial clustered publish (band partitions, doc_id zone maps);
    2. FETCH: locate the delete list's files through the committed
       stats alone (``read_index(prune_in=)`` — the "which files hold
       these users" lookup of a deletion request, opening only files
       whose committed range contains a victim);
    3. REWRITE: ``replace_parts_commit`` over exactly the affected
       partitions (every victim id is ≡ {DEL_REM} mod {DEL_MOD}, and
       {DEL_MOD} ≡ 0 mod N_BANDS, so all victims live in ONE band —
       the other partitions' files must survive byte-identical), the
       replacement re-clustered on doc_id with fresh zone maps
       harvested in the SAME flip as the file swap.

    The registered query then re-fetches a probe id set that OVERLAPS
    the delete list, so the oracle (base table minus the delete
    predicate) proves the rewrite dropped exactly the right rows."""

    def build() -> tuple[str, int]:
        docs = load_table(spark, sf_dir, "documents")
        path = tempfile.mkdtemp(prefix="csb_rewrite_art_") + "/docs"
        clustered_write_commit(
            docs.withColumn("band", F.col("doc_id") % N_BANDS),
            path,
            part_col="band",
            cluster_col="doc_id",
            n_ranges=N_RANGES,
            note=f"clustered documents {sf_dir}",
        )
        mx = int(docs.agg(F.max("doc_id")).collect()[0][0])
        del_ids = list(range(DEL_REM, mx + 1, DEL_MOD))
        # fetch: committed-stats file location + the real filter (the
        # deletion request's audit read — which rows are we removing)
        read_index(spark, path, prune_in=("doc_id", del_ids)).filter(
            F.col("doc_id") % DEL_MOD == DEL_REM
        ).count()
        bands = sorted({i % N_BANDS for i in del_ids})
        keep = read_index(spark, path, part_values=bands).filter(
            ~(F.col("doc_id") % DEL_MOD == DEL_REM)
        )
        replace_parts_commit(
            path,
            lambda: keep.repartitionByRange(
                max(N_RANGES // N_BANDS, 1), "doc_id"
            )
            .write.mode("append")
            .partitionBy("band")
            .parquet(path),
            part_values=bands,
            note=f"delete doc_id%{DEL_MOD}=={DEL_REM}",
            stats_cols=["doc_id"],
        )
        return path, mx

    return session_scoped(_REWRITE_ARTIFACTS, spark, (sf_dir,), build)


@register(
    "scan_delete_rewrite_fetch",
    oracle=f"""
    WITH b AS (
      SELECT (MAX(doc_id)*{PROBE_LO_TENTHS})//10 AS lo,
             (MAX(doc_id)*{PROBE_HI_TENTHS})//10 AS hi
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM documents, b
    WHERE doc_id % {PROBE_MOD} = {PROBE_REM}
      AND doc_id % {DEL_MOD} <> {DEL_REM}
      AND doc_id BETWEEN b.lo AND b.hi
    GROUP BY lang
    """,
    doc="the UPDATE-shaped lake lifecycle end to end: GDPR-style "
    "delete list located via committed zone maps (prune_in opens only "
    "files whose range holds a victim), the ONE affected hive "
    "partition rewritten via replace_parts_commit with fresh stats in "
    "the same manifest flip, then a point-set re-fetch overlapping "
    "the delete list — the oracle recomputes from the base table "
    "minus the delete predicate, so a row that survived deletion, a "
    "row deleted twice, or a stray rewrite outside the affected "
    "partition would all hash-mismatch",
)
def scan_delete_rewrite_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, mx = rewrite_artifact(spark, sf_dir)
    probe_ids = probe_id_list(mx)
    return (
        read_index(spark, path, prune_in=("doc_id", probe_ids))
        .filter(F.col("doc_id").isin(probe_ids))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
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
