"""Round-16 session births, part 3: filtered vector search and
tombstone-aware compaction.

Two operators that close the remaining gaps a production retrieval
deployment hits once the §20k/round-20 lifecycle verbs exist:

- **Filtered ANN search** (`vector_ann_ivf_filtered_topk`) — "top-k
  nearest neighbors WHERE label IN (...)", the workload shape every
  vector store grew a feature for (FAISS IDSelector, Milvus/Vespa
  filtered search). The scale design decision is WHERE the predicate
  runs. Post-filtering the unfiltered top-k loses recall (a k-list can
  be entirely filtered away); joining the candidate scan against a
  filtered id list ships an id set through a shuffle or a broadcast
  that at 100 TB is itself a large table. The right move — and what
  the storage layer here makes free — is to DENORMALIZE the
  filterable attribute into the inverted file at build/absorb time, so
  a filtered probe is the same one narrow scan as an unfiltered one
  with the predicate PUSHED INTO the parquet reader (`PushedFilters:
  [In(label, ...)]`, plan-pinned in tests). Pre-filter semantics: the
  predicate restricts candidates BEFORE ranking, so all k results
  satisfy it. With ``n_probe = n_cells`` the probe is
  binning-independent and the brute-force filtered DuckDB oracle is
  exact — the same conservation move as ``vector_ivf_merge_topk``.
- **Tombstone-aware compaction** (`vector_ann_ivf_compact_dead_topk`)
  — the composed maintenance verb: after a tombstone delete (round-20
  deletion vectors) and a streaming/batch absorb (small appended
  files), one maintenance pass merges each cell's file set to a
  single file, DROPS the dead rows, and CLEARS the tombstone pointer
  — all in ONE replace-parts manifest flip, so file state and
  deletion state cannot disagree (a crash before the flip leaves the
  old view byte-intact; the appended replacement files are
  vacuum-sweepable garbage). This is Delta's OPTIMIZE-with-DV-drop /
  Iceberg's rewrite_data_files in the shape this repo's manifest
  protocol gives it. The registry row probes the PLAIN committed view
  at the compacted version with NO tombstone filter and hash-matches
  the same corpus-minus-still-dead oracle the round-20 re-insert row
  proves the LIVE view against — plain-view == live-view is exactly
  the compaction-correctness statement.

Reference parity note: the reference (an AWS serverless scoring stack,
`/root/reference/src/backend/main.py`) has no vector surface at all;
both rows belong to the brief's LLM-pipeline extension surface.
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.index_manifest import (
    _list_data_files,
    publish_manifest,
    read_index,
    read_manifest_meta,
    replace_parts_commit,
)
from cognitive_score_bigdata_spark.operators.similarity import (
    IvfIndex,
    ivf_build,
    ivf_probe,
)
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.round20_staging import (
    DEL_MOD,
    DEL_RES,
    READD_MOD,
    READD_RES,
    _del_oracle,
    _tombstones_at,
    absorb_vectors_seq,
    build_ivf_file_seq,
    delete_from_ivf,
    read_index_live,
)
from cognitive_score_bigdata_spark.session_cache import session_scoped

FILT_CELLS = 8
FILT_K = 10
# The filter predicate: labels {0, 2} of the testdata's 0-3 label
# space (~half the corpus survives — selective enough that the
# filtered and unfiltered top-k differ, populous enough that every
# query finds k candidates).
FILT_LABELS = (0, 2)


def build_filtered_ivf(vectors: DataFrame, path: str, n_cells: int) -> None:
    """Build the inverted file WITH the filterable attribute
    denormalized into every row. The label join happens once, at build
    time, against the (id, label) projection of the source — after
    this commit a filtered probe never joins anything: the predicate
    is an ordinary column filter the parquet reader evaluates during
    the probed-cell scan. Centers first, manifest flip LAST (the
    commit), like every index build here."""
    idx = ivf_build(vectors.select("vec_id", "embedding"), n_cells=n_cells)
    labels = vectors.select(
        F.col("vec_id").alias("neighbor_id"), "label"
    )
    idx.cand.join(F.broadcast(labels), "neighbor_id").write.partitionBy(
        "cell"
    ).parquet(path)
    idx.centers_df.write.parquet(f"{path}_centers")
    publish_manifest(
        path,
        _list_data_files(path),
        note="filtered-attribute inverted file (label denormalized)",
        meta={"centers": f"{path}_centers"},
    )
    idx.unpersist()


_FILT_CACHE: dict = {}


def filtered_ivf_path(spark: SparkSession, sf_dir: str) -> str:
    """Session-scoped persisted filtered-attribute inverted file."""

    def build() -> str:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding", "label"
        )
        path = tempfile.mkdtemp(prefix="csb_ivf_filt_") + "/idx"
        build_filtered_ivf(emb, path, n_cells=FILT_CELLS)
        return path

    return session_scoped(_FILT_CACHE, spark, (sf_dir,), build)


def filtered_probe(
    spark: SparkSession,
    sf_dir: str,
    labels: tuple,
    k: int,
    n_probe: int,
) -> DataFrame:
    """The filtered probe: manifest-aware scan of the inverted file,
    predicate applied BEFORE ranking (pre-filter semantics), then the
    standard cell-pruned probe. The filter sits directly on the scan
    so Catalyst pushes it into the parquet reader — the probed-cell
    scan reads and decodes only surviving rows (`PushedFilters`,
    pinned in test_round21_staging)."""
    path = filtered_ivf_path(spark, sf_dir)
    cand = (
        read_index(spark, path)
        .filter(F.col("label").isin(*labels))
        .select("neighbor_id", "__c", "cell")
    )
    centers = spark.read.parquet(f"{path}_centers")
    queries = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 5
    )
    return ivf_probe(
        IvfIndex(cand, centers), queries, k=k, n_probe=n_probe
    ).select("query_id", "neighbor_id", "rnk")


@register(
    "vector_ann_ivf_filtered_topk",
    oracle=f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                      c.vec_id ASC) AS BIGINT) AS rnk
    FROM embeddings q JOIN embeddings c ON q.vec_id < 5
                                       AND c.vec_id <> q.vec_id
                                       AND c.label IN {FILT_LABELS}
    QUALIFY rnk <= {FILT_K}
    """,
    doc="filtered vector search (FAISS IDSelector / Milvus filtered "
    "search shape): top-k cosine neighbors among rows with label IN "
    "(0, 2), the predicate applied BEFORE ranking so all k results "
    "satisfy it (post-filtering the unfiltered top-k would lose "
    "recall). The label is denormalized into the persisted inverted "
    "file at build time, so the filtered probe is ONE narrow scan "
    "with the predicate pushed into the parquet reader — no join "
    "against a filter list, no second pass; at 100 TB the filter "
    "costs row-group skipping, not a shuffle. n_probe = n_cells "
    "makes the probe binning-independent, so the brute-force "
    "filtered oracle is exact",
)
def vector_ann_ivf_filtered_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return filtered_probe(
        spark, sf_dir, FILT_LABELS, k=FILT_K, n_probe=FILT_CELLS
    )


def compact_ivf_dead(
    spark: SparkSession, path: str, _before_publish=None
) -> int:
    """Tombstone-aware compaction: rewrite EVERY cell's live row set
    to a single file per cell (merging absorb-era small files), drop
    the dead rows, and clear the tombstone pointer — one replace-parts
    flip. ``repartition("cell")`` hash-partitions rows so each cell
    lands wholly in one task → exactly one replacement file per cell.
    Returns the number of cells compacted. Contrast
    :func:`round20_staging.apply_deletes_rewrite`, which touches ONLY
    dirty cells and leaves small files alone: rewrite is the minimal
    deletion apply, compact is the full maintenance pass; both clear
    deletion state in the same flip that commits the files."""
    live = read_index_live(spark, path)
    # Replace-set = every cell of the COMMITTED index, not the live
    # view: a cell whose rows are ALL dead must still have its files
    # superseded (by an empty set — legal under replace_parts_commit),
    # or clearing the pointer would resurrect its dead rows.
    cells = sorted(
        int(r.cell)
        for r in read_index(spark, path).select("cell").distinct().collect()
    )
    meta = {
        k: v for k, v in read_manifest_meta(path).items() if k != "tombstones"
    }
    survivors = live.repartition("cell")
    replace_parts_commit(
        path,
        lambda: survivors.write.mode("append").partitionBy("cell").parquet(path),
        part_values=cells,
        note=f"tombstone-aware compact of {len(cells)} cells",
        meta=meta,
        _before_publish=_before_publish,
    )
    return len(cells)


_CDEAD_CACHE: dict = {}


def compacted_ivf_path(spark: SparkSession, sf_dir: str) -> str:
    """Session-scoped lifecycle fixture, one stage per manifest
    version: v1 full-corpus build (seq 1) → v2 tombstone delete of
    vec_id % 7 == 3 → v3 re-insert absorb of the odd half (seq 2,
    small appended files) → v4 tombstone-aware compact (one file per
    cell, dead rows dropped, pointer cleared). Same id families as the
    round-20 rewrite fixture so the two maintenance verbs prove
    against the same oracle family."""

    def build() -> str:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        path = tempfile.mkdtemp(prefix="csb_ivf_cdead_") + "/idx"
        build_ivf_file_seq(emb, path, n_cells=FILT_CELLS)
        doomed = emb.select("vec_id").filter(
            F.col("vec_id") % DEL_MOD == DEL_RES
        )
        delete_from_ivf(spark, path, doomed)
        readd = emb.filter(F.col("vec_id") % READD_MOD == READD_RES)
        absorb_vectors_seq(spark, readd, path)
        compact_ivf_dead(spark, path)
        return path

    return session_scoped(_CDEAD_CACHE, spark, (sf_dir,), build)


@register(
    "vector_ann_ivf_compact_dead_topk",
    oracle=_del_oracle(f"c.vec_id % {READD_MOD} = {READD_RES + DEL_MOD}"),
    doc="tombstone-aware compaction (OPTIMIZE with deletion-vector "
    "drop): one maintenance flip merges each cell's absorb-era small "
    "files to a single file, drops the tombstoned rows, and clears "
    "the sidecar pointer — files and deletion state commit together, "
    "so they cannot disagree; a crash before the flip leaves the old "
    "view intact. The probe reads the PLAIN committed view at the "
    "compacted version with NO tombstone filter and matches the same "
    "corpus-minus-still-dead oracle the round-20 re-insert row proves "
    "the LIVE view against — plain-view == live-view IS the "
    "compaction-correctness statement. Time travel to the pre-compact "
    "version still resolves the sidecar (pinned)",
)
def vector_ann_ivf_compact_dead_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    path = compacted_ivf_path(spark, sf_dir)
    cand = read_index(spark, path)
    centers = spark.read.parquet(f"{path}_centers")
    queries = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 5
    )
    return ivf_probe(
        IvfIndex(cand.select("neighbor_id", "__c", "cell"), centers),
        queries,
        k=FILT_K,
        n_probe=FILT_CELLS,
    ).select("query_id", "neighbor_id", "rnk")
