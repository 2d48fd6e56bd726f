"""Round-10 registry additions: cross-snapshot dedup index MERGE
(VERDICT r9 item 4).

``dedup_incremental_newbatch`` probes a STATIC persisted index; the
CCNet per-snapshot dedup shape also needs the index to absorb each new
snapshot so the next snapshot probes corpus+snap1, then
corpus+snap1+snap2, and so on. This module adds that merge on the
md5-auditable minhash scheme (``round4_staging2.md5_minhash_signatures``
— the two-hash Kirsch-Mitzenmacher construction that is bit-identical
in Spark and DuckDB), so the MERGED artifact itself is value-checked by
the driver, not just row-counted.

Merge strategy — APPEND, deliberately not read-union-rewrite: the LSH
index is a pure row table keyed by (band, bkey); bucket membership is
additive, so absorbing a snapshot is `write.mode("append").
partitionBy("band")` — zero old partitions read, zero rewritten, which
is strictly stronger than rewriting only touched partitions (an index
holding per-bucket AGGREGATES would need read-modify-write; this one
does not, and at 100 TB rewriting a billions-of-rows index per crawl
snapshot is the difference between a nightly job and a non-starter).
The no-index-scan property and band partition pruning are plan-pinned
in ``tests/test_round10_merge.py``. All new docs are absorbed —
duplicates too: near-dup verdicts are downstream decisions (the §9q
bridge pattern); the index stays the authoritative signature store, so
merged-index pair generation is CONSERVATIVE — identical to a full
rebuild over the snapshot union. The oracle exploits exactly that:
it is the full-corpus DuckDB formulation (`_MH_ORACLE`), so the
driver's hash-match IS the conservation proof (merged-index dedup ≡
full-corpus dedup).
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.operators.index_manifest import (
    _list_data_files,
    append_commit,
    compact_index_parts,
    live_part_file_counts,
    part_file_counts,
    publish_manifest,
    read_index,
    read_manifest,
    vacuum_index,
)
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.dedup_md5 import (
    MH_BANDS,
    MH_K,
    MH_ROWS,
    _MH_ORACLE,
    md5_minhash_signatures,
)
from cognitive_score_bigdata_spark.session_cache import session_scoped

# Snapshot split: snapshot 1 = two thirds of the corpus (the standing
# index), snapshot 2 = the remaining third (the new crawl increment).
SNAP_MOD = 3
SNAP_NEW = 2


def md5_banded_rows(d: DataFrame) -> DataFrame:
    """(doc_id, m0..m{K-1}, band, bkey): the persisted-index row form of
    the md5 minhash scheme — full signature carried on every band row
    (like ``operators.dedup.save_minhash_index``) so probe/verify reads
    one table, and ``bkey`` precomputed so the bucket join needs no
    signature arithmetic at probe time."""
    sig = md5_minhash_signatures(d)
    return sig.select(
        "doc_id",
        *[f"m{i}" for i in range(MH_K)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col(f"m{MH_ROWS * k + j}").cast("string")
                                for j in range(MH_ROWS)
                            ],
                        ).alias("bkey"),
                    )
                    for k in range(MH_BANDS)
                ]
            )
        ).alias("b"),
    ).select(
        "doc_id",
        *[f"m{i}" for i in range(MH_K)],
        F.col("b.band").alias("band"),
        F.col("b.bkey").alias("bkey"),
    )


def snapshot_docs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    snap1 = docs.filter(F.col("doc_id") % SNAP_MOD != SNAP_NEW)
    snap2 = docs.filter(F.col("doc_id") % SNAP_MOD == SNAP_NEW)
    return snap1, snap2


def merge_into_index(new_docs: DataFrame, path: str) -> DataFrame:
    """Absorb ``new_docs`` into the band-partitioned index at ``path``
    (the per-snapshot MERGE). Returns the banded rows that were
    appended — whose plan, by construction, contains no scan of
    ``path``: only the new batch is read, no old partition is touched.
    """
    new_rows = md5_banded_rows(fan_out(new_docs))
    # append_commit publishes the added files into the manifest
    # (bootstrapping one for a legacy plain-directory index) without
    # resurrecting files an earlier compaction superseded
    append_commit(
        path,
        lambda: new_rows.write.mode("append").partitionBy("band").parquet(path),
        note="merge append",
    )
    return new_rows


# One build+merge per (session, corpus): the index is a batch artifact
# with snapshot merges layered on it, not a per-query cost — the same
# lifecycle contract as _minhash_index_path / the IVF inverted file.
_MERGED_INDEX_CACHE: dict[tuple, str] = {}


def merged_index_path(spark: SparkSession, sf_dir: str) -> str:
    def build() -> str:
        snap1, snap2 = snapshot_docs(spark, sf_dir)
        path = tempfile.mkdtemp(prefix="csb_mh_merged_") + "/idx"
        # snapshot-1 standing index (the batch build)
        md5_banded_rows(fan_out(snap1)).write.partitionBy("band").parquet(path)
        publish_manifest(path, _list_data_files(path), note="initial build")
        # the MERGE under test: snapshot 2 appended, no index read
        merge_into_index(snap2, path)
        return path

    return session_scoped(_MERGED_INDEX_CACHE, spark, (sf_dir,), build)


@register(
    "dedup_index_merge_pairs_md5",
    oracle=_MH_ORACLE,
    doc="cross-snapshot dedup index MERGE (CCNet per-snapshot shape): "
    "snapshot 1 (2/3 of documents) is the persisted band-partitioned "
    "md5-minhash index; snapshot 2 (the crawl increment) is absorbed "
    "by APPENDING its banded signature rows — the merge reads zero old "
    "partitions and rewrites nothing, because LSH bucket membership is "
    "additive (plan-pinned in test_round10_merge). Candidate pairs + "
    "signature-agreement est_jaccard are then generated FROM THE "
    "MERGED ON-DISK INDEX (bucket self-join on (band,bkey), ids-only "
    "candidates, signatures re-joined after the pair distinct). The "
    "oracle is the FULL-CORPUS DuckDB formulation, so the driver "
    "hash-match is the conservation proof: merged-index dedup is "
    "bit-identical to a from-scratch rebuild over the snapshot union",
)
def dedup_index_merge_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = read_index(spark, merged_index_path(spark, sf_dir))
    a = idx.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
    b = idx.select(F.col("doc_id").alias("doc_b"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sig = idx.filter(F.col("band") == 0)  # one signature row per doc
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(MH_K)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(MH_K)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MH_K)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / F.lit(float(MH_K))).alias("est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# quality_entity_share_audit — the §9u operational gate as a query
# ---------------------------------------------------------------------------

# The per-entity window family's documented caveat becomes a bottleneck
# when one entity's share of rows exceeds a core's share (§9u measured
# the knee at P ~= 1/cores: 10% share costs ~11% wall, 30% costs ~60%
# at 32 cores, and the SAME 1% bot that is invisible at 32 cores
# dominates a 1000-executor stage). This is the audit a 100 TB operator
# runs BEFORE any user_id-partitioned window; the threshold parameter
# is the cluster's core count.
AUDIT_PARALLELISM = 32  # local[32] rig; set to executor cores in prod
AUDIT_TOP_K = 20


@register(
    "quality_entity_share_audit",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM per_user)
    SELECT u.user_id,
           CAST(u.n_events AS BIGINT) AS n_events,
           CAST(u.n_events AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
           (u.n_events * {AUDIT_PARALLELISM} > t.total) AS exceeds_core_share
    FROM per_user u, tot t
    ORDER BY u.n_events DESC, u.user_id ASC
    LIMIT {AUDIT_TOP_K}
    """,
    doc="entity-share audit (the §9u bot-user gate as a first-class "
    "operator): top-K users by event share with an exceeds_core_share "
    "flag at n_events * cores > total — the integer-exact form of "
    "share > 1/cores, the §9u knee where a user_id-partitioned window "
    "partition out-runs one core and AQE cannot split it. Window-free "
    "by construction: map-side-combined count per user, the corpus "
    "total broadcast back as a 1-row aggregate (the same bounded-"
    "driver-state shape as the two-pass prefix sum), TakeOrderedAnd"
    "Project top-K — every stage partial-aggregates, no global sort, "
    "no skew exposure in the audit that exists to FIND skew",
)
def quality_entity_share_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # referenced by the top-K leg AND the total — materialize once
    # (the §9d lesson: plan branches are not free references; without
    # this the total's subtree re-scans the whole events table)
    per_user = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .localCheckpoint(eager=False)
    )
    total = per_user.agg(F.sum("n_events").cast("bigint").alias("total"))
    return (
        per_user.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            (
                F.col("n_events").cast("double")
                / F.col("total").cast("double")
            ).alias("share"),
            (
                F.col("n_events") * F.lit(AUDIT_PARALLELISM) > F.col("total")
            ).alias("exceeds_core_share"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(AUDIT_TOP_K)
    )


# ---------------------------------------------------------------------------
# Index compaction — the maintenance half of the merge lifecycle
# ---------------------------------------------------------------------------
#
# The commit protocol (manifest + _current flip; staged files, vacuum
# as the only deleter) lives in operators/index_manifest.py — shared
# with the IVF inverted file (queries/ivf_lifecycle.py), which mirrors
# this index's merge/compact/vacuum lifecycle on cell= partitions.
# These bindings keep the minhash index's band-named API.


def band_file_counts(path: str) -> dict[int, int]:
    """PHYSICAL parquet files per band partition (manifest-blind —
    includes staged/retained files; use :func:`live_band_file_counts`
    for the committed view compaction decisions read)."""
    return part_file_counts(path)


def live_band_file_counts(path: str) -> dict[int, int]:
    """Committed (manifest) data files per band partition."""
    return live_part_file_counts(path)


def compact_index_bands(
    spark: SparkSession,
    path: str,
    max_files_per_band: int = 1,
    bands: list[int] | None = None,
    _before_publish=None,
) -> dict[int, tuple[int, int]]:
    """Per-band compaction of the minhash index under the manifest
    commit (see :func:`operators.index_manifest.compact_index_parts`
    for the full protocol contract)."""
    return compact_index_parts(
        spark,
        path,
        part_col="band",
        max_files_per_part=max_files_per_band,
        parts=bands,
        _before_publish=_before_publish,
    )


