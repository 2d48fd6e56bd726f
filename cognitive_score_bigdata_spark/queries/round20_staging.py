"""Round-16 session births, part 2: DELETE in the vector-index
lifecycle (deletion vectors + sequence numbers).

The persisted IVF inverted file has had build / batch merge / fenced
streaming absorb / compaction / vacuum since rounds 11-15 — every
lifecycle verb EXCEPT delete. A training-data deployment needs it:
takedown requests, licence revocations, and corpus re-curation all
remove vectors from a served index, and at 100 TB "rewrite the index
without them" is not an answer. This module adds the FAISS
``remove_ids`` verb in the shape a transactional table format gives
it — deletion vectors, applied lazily:

- **Sequence numbers**: every committed index row carries ``__seq``,
  the manifest commit sequence that appended it (build = 1, each
  absorb bumps ``meta["max_seq"]``). A tombstone is ``(neighbor_id,
  dead_upto)``: rows of that id with ``__seq <= dead_upto`` are dead.
  Re-inserting a deleted id later appends a FRESH row with a higher
  ``__seq`` — visible by construction, no tombstone surgery, and the
  old physical row stays dead, so the live view never holds two rows
  for one id. (Contrast the §20j column-name re-add hazard, where
  name-keyed resurrection was the FAILURE mode and re-add is
  forbidden; here row identity is (id, seq), so resurrection by
  re-insert is exact and intentional — Delta's deletion-vector +
  re-insert semantics.)
- **delete_from_ivf** — the logical delete: union the new ids into the
  tombstone sidecar (a tiny parquet beside the index, like
  ``_centers``), write it under a NEW versioned name, and commit the
  pointer in the manifest ``meta`` flip. The cell partitions are
  untouched — the delete's plan reads only the id list and the old
  sidecar (plan-pinned), exactly like a Delta deletion-vector write.
  Crash before the flip leaves an unreferenced sidecar file — inert,
  never resolved by any committed manifest.
- **read_index_live** — reader-side apply: manifest-aware scan minus a
  broadcast anti-join against the (small by contract) tombstone set.
  Time travel composes: reading at version V applies the tombstones
  committed AT V, so a pre-delete snapshot still sees the rows and a
  post-delete one does not.
- **apply_deletes_rewrite** — the physical apply (maintenance, not the
  hot path): ONLY the cells that actually contain dead rows are
  rewritten (live rows re-staged, dead rows dropped), committed via
  the replace-parts flip with the tombstone pointer cleared in the
  SAME manifest version — files and deletion state cannot disagree.
  Untouched cells' files are not rewritten (byte-identical, pinned).
  After it, the plain committed view equals the live view — which is
  what the ``_rewrite_topk`` registry row proves through the shared
  full-corpus oracle.

Registry rows (one lifecycle stage each, all against the SAME exact
brute-force DuckDB oracle family, probed at n_probe = n_cells so the
hash match is binning-independent — the ``vector_ivf_merge_topk``
conservation move):

- ``vector_ann_ivf_delete_topk`` — probe the LIVE view at the
  delete commit (v2): deleted ids (vec_id % 7 == 3) gone.
- ``vector_ann_ivf_delete_readd_topk`` — probe at v3, after a batch
  RE-INSERTS the odd half of the deleted ids (vec_id % 14 == 3):
  they are visible again at ``__seq`` 2, the even half
  (vec_id % 14 == 10) stays dead.
- ``vector_ann_ivf_delete_rewrite_topk`` — probe the PLAIN committed
  view at v4, after the physical rewrite, with NO tombstone
  filter: same oracle as v3, so the hash match proves physical
  apply == logical view.

At 100 TB: a delete touches O(|ids|) bytes at commit time; probes pay
one broadcast anti-join against a set that maintenance keeps small;
the nightly rewrite pays only the dirty cells. That cost shape — not
"rewrite the inverted file" — is what makes deletes operable at
corpus scale.

Reference parity: the reference's only delete surface is row upserts
in Postgres (``/root/reference/src/backend/main.py:113-124``, INSERT
ON CONFLICT) — index-lifecycle deletes belong to the brief's
LLM-pipeline extension surface (SURVEY §2-extras).
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.operators.index_manifest import (
    _read_manifest_doc,
    append_commit,
    publish_manifest,
    read_index,
    read_manifest,
    read_manifest_meta,
    replace_parts_commit,
    _list_data_files,
)
from cognitive_score_bigdata_spark.operators.similarity import (
    IVF_CAND_SCHEMA,
    IvfIndex,
    ivf_build,
    ivf_probe,
    norm_assign_fn,
)
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.session_cache import session_scoped

DEL_CELLS = 8
DEL_K = 10
# Tombstoned ids: vec_id % 7 == 3 (71 of 500 vectors at test scale).
# Re-inserted at __seq 2: the odd half, vec_id % 14 == 3 (36); the
# even half, vec_id % 14 == 10 (35), stays dead through the rewrite.
DEL_MOD, DEL_RES = 7, 3
READD_MOD, READD_RES = 14, 3


def build_ivf_file_seq(vectors: DataFrame, path: str, n_cells: int) -> None:
    """Initial build with row sequence numbers: identical to
    ``ivf_lifecycle.build_ivf_file`` (centers written first, manifest
    flip LAST — the commit) except every inverted-file row carries
    ``__seq = 1`` and the manifest meta records ``max_seq`` so later
    absorbs can stamp monotonically."""
    idx = ivf_build(vectors, n_cells=n_cells)
    idx.centers_df.write.parquet(f"{path}_centers")
    idx.cand.withColumn("__seq", F.lit(1).cast("long")).write.partitionBy(
        "cell"
    ).parquet(path)
    publish_manifest(
        path,
        _list_data_files(path),
        note="initial build (seq 1)",
        meta={"centers": f"{path}_centers", "max_seq": 1},
    )
    idx.unpersist()


def absorb_vectors_seq(
    spark: SparkSession, new_vectors: DataFrame, path: str
) -> DataFrame:
    """Frozen-centroid absorb stamping the NEXT sequence number: the
    ``merge_vectors_into_ivf`` move plus ``__seq = max_seq + 1`` on the
    appended rows and the bump committed in the same manifest flip.
    A re-inserted previously-deleted id becomes visible through this
    path alone — its new row outlives the tombstone's ``dead_upto``."""
    meta = read_manifest_meta(path)
    seq = int(meta.get("max_seq", 1)) + 1
    centers = spark.read.parquet(f"{path}_centers").collect()
    import numpy as np

    C = np.array(
        [r.center for r in sorted(centers, key=lambda r: r.cell)],
        dtype=np.float64,
    )
    new_rows = (
        fan_out(new_vectors.select("vec_id", "embedding"))
        .mapInPandas(norm_assign_fn(C, "vec_id", "embedding"), IVF_CAND_SCHEMA)
        .withColumn("__seq", F.lit(seq).cast("long"))
    )
    append_commit(
        path,
        lambda: new_rows.write.mode("append").partitionBy("cell").parquet(path),
        note=f"absorb at seq {seq}",
        meta={**meta, "max_seq": seq},
    )
    return new_rows


def _tombstones_at(spark: SparkSession, path: str, version=None):
    """The tombstone set committed at ``version`` (None = current):
    a (neighbor_id, dead_upto) DataFrame, or None if that snapshot has
    no deletions. Versioned reads make time travel compose with
    deletes — a pre-delete snapshot resolves no sidecar pointer."""
    doc = _read_manifest_doc(path, version=version)
    meta = dict(doc.get("meta", {})) if doc else {}
    side = meta.get("tombstones")
    if not side:
        return None
    return spark.read.parquet(side)


def _merged_tombstones(
    spark: SparkSession, path: str, ids: DataFrame, dead_upto: int
) -> DataFrame:
    """The replacement tombstone set: old sidecar ∪ ``ids`` at
    ``dead_upto``, one row per id keeping the highest ``dead_upto``.
    Its plan references only ``ids`` and the previous (tiny) sidecar —
    never a cell partition of ``path`` (plan-pinned in tests)."""
    new_t = ids.select(
        F.col("vec_id").cast("long").alias("neighbor_id"),
        F.lit(dead_upto).cast("long").alias("dead_upto"),
    )
    old_t = _tombstones_at(spark, path)
    allt = new_t if old_t is None else old_t.unionByName(new_t)
    return allt.groupBy("neighbor_id").agg(
        F.max("dead_upto").alias("dead_upto")
    )


def delete_from_ivf(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    _before_publish=None,
) -> int:
    """Logical delete (the deletion-vector write): tombstone every
    current row of ``ids`` by recording ``dead_upto = max_seq``. The
    new sidecar is written under a version-stamped name FIRST; the
    manifest flip that moves the pointer is the commit — no cell
    partition is read or written (see :func:`_merged_tombstones`).
    Crash before the flip leaves an unreferenced sidecar, inert.
    Returns the committed tombstone count."""
    cur = read_manifest(path)
    version = cur[0] if cur else 0
    meta = read_manifest_meta(path)
    dead_upto = int(meta.get("max_seq", 1))
    merged = _merged_tombstones(spark, path, ids, dead_upto)
    side = f"{path}_tombs/v{version + 1}"
    # mode=overwrite makes the retry-after-crash path work: a file at
    # v{version+1} can only be the orphan of an attempt that died
    # before its publish (a COMMITTED sidecar's version is always
    # <= the current manifest version, because the publish that
    # references it also bumps the version past it). Single-writer
    # maintenance discipline — same contract as the replace-parts flip.
    merged.coalesce(1).write.mode("overwrite").parquet(side)
    n = spark.read.parquet(side).count()
    if _before_publish is not None:
        _before_publish()
    publish_manifest(
        path,
        cur[1] if cur else _list_data_files(path),
        note=f"delete {n} ids (tombstone sidecar)",
        meta={**meta, "tombstones": side},
    )
    return n


def read_index_live(
    spark: SparkSession, path: str, version=None
) -> DataFrame:
    """Reader-side deletion-vector apply: the manifest-aware scan at
    ``version`` minus a broadcast anti-join against that snapshot's
    tombstones — a row is dead iff its id is tombstoned AND its
    ``__seq`` does not outlive ``dead_upto`` (re-inserts survive)."""
    rows = read_index(spark, path, version=version)
    tomb = _tombstones_at(spark, path, version=version)
    if tomb is None:
        return rows
    t = F.broadcast(tomb.withColumnRenamed("neighbor_id", "__dead_id"))
    return rows.join(
        t,
        (rows["neighbor_id"] == t["__dead_id"])
        & (rows["__seq"] <= t["dead_upto"]),
        "left_anti",
    )


def apply_deletes_rewrite(
    spark: SparkSession, path: str, _before_publish=None
) -> list:
    """Physical apply (maintenance): rewrite ONLY the cells that hold
    dead rows — live rows re-staged per dirty cell, dead rows dropped —
    and clear the tombstone pointer in the SAME replace-parts flip, so
    deletion state and file state cannot disagree. Untouched cells'
    files are not rewritten. Returns the rewritten cell list (empty =
    nothing to do). The sidecar files themselves stay on disk: older
    retained manifests still reference them for time travel; they die
    with their manifests at vacuum."""
    tomb = _tombstones_at(spark, path)
    if tomb is None:
        return []
    rows = read_index(spark, path)
    t = F.broadcast(tomb.withColumnRenamed("neighbor_id", "__dead_id"))
    dead_cond = (rows["neighbor_id"] == t["__dead_id"]) & (
        rows["__seq"] <= t["dead_upto"]
    )
    # Dirty-cell discovery reads two columns of the index, nothing
    # else; the result is bounded by n_cells (≤8 here) — a driver list,
    # not a dataset.
    dirty = sorted(
        r.cell
        for r in rows.join(t, dead_cond, "left_semi")
        .select("cell")
        .distinct()
        .collect()
    )
    if not dirty:
        return []
    meta = {
        k: v for k, v in read_manifest_meta(path).items() if k != "tombstones"
    }
    survivors = read_index_live(spark, path).filter(
        F.col("cell").isin([int(c) for c in dirty])
    )
    replace_parts_commit(
        path,
        lambda: survivors.write.mode("append").partitionBy("cell").parquet(path),
        part_values=[int(c) for c in dirty],
        note=f"physical delete apply on cells {dirty}",
        meta=meta,
        _before_publish=_before_publish,
    )
    return [int(c) for c in dirty]


_DEL_CACHE: dict = {}


def deleted_ivf_path(spark: SparkSession, sf_dir: str) -> str:
    """Session-scoped lifecycle fixture, one stage per manifest
    version: v1 full-corpus build (seq 1) → v2 tombstone delete of
    vec_id % 7 == 3 → v3 re-insert of the odd half (vec_id % 14 == 3,
    seq 2) → v4 physical rewrite of the dirty cells with the pointer
    cleared. Each registry row time-travels to its stage, so the three
    probes are order-independent and share one build."""

    def build() -> str:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        path = tempfile.mkdtemp(prefix="csb_ivf_del_") + "/idx"
        build_ivf_file_seq(emb, path, n_cells=DEL_CELLS)
        doomed = emb.select("vec_id").filter(
            F.col("vec_id") % DEL_MOD == DEL_RES
        )
        delete_from_ivf(spark, path, doomed)
        readd = emb.filter(F.col("vec_id") % READD_MOD == READD_RES)
        absorb_vectors_seq(spark, readd, path)
        apply_deletes_rewrite(spark, path)
        return path

    return session_scoped(_DEL_CACHE, spark, (sf_dir,), build)


def _probe_stage(
    spark: SparkSession, sf_dir: str, version: int, live: bool
) -> DataFrame:
    path = deleted_ivf_path(spark, sf_dir)
    cand = (
        read_index_live(spark, path, version=version)
        if live
        else read_index(spark, path, version=version)
    )
    centers = spark.read.parquet(f"{path}_centers")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_probe(
        IvfIndex(cand, centers), queries, k=DEL_K, n_probe=DEL_CELLS
    ).select("query_id", "neighbor_id", "rnk")


def _del_oracle(exclude: str) -> str:
    return f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                      c.vec_id ASC) AS BIGINT) AS rnk
    FROM embeddings q JOIN embeddings c ON q.vec_id < 5
                                       AND c.vec_id <> q.vec_id
                                       AND NOT ({exclude})
    QUALIFY rnk <= {DEL_K}
    """


@register(
    "vector_ann_ivf_delete_topk",
    oracle=_del_oracle(f"c.vec_id % {DEL_MOD} = {DEL_RES}"),
    doc="DELETE in the vector-index lifecycle (FAISS remove_ids as "
    "deletion vectors): vec_id % 7 == 3 is tombstoned into a tiny "
    "versioned sidecar whose pointer commits in the manifest meta "
    "flip — no cell partition read or written (plan-pinned). The "
    "probe reads the LIVE view at the delete commit (time travel to "
    "v2): committed scan minus a broadcast anti-join on (id, "
    "dead_upto) vs each row's __seq. n_probe = n_cells makes the "
    "result binning-independent, so the brute-force oracle over the "
    "corpus MINUS the deleted ids is exact — the hash match proves "
    "the deletion-vector read path",
)
def vector_ann_ivf_delete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _probe_stage(spark, sf_dir, version=2, live=True)


@register(
    "vector_ann_ivf_delete_readd_topk",
    oracle=_del_oracle("c.vec_id % 14 = 10"),
    doc="resurrection-by-re-insert under deletion vectors: after the "
    "delete, the odd half of the deleted ids (vec_id % 14 == 3) is "
    "absorbed again at __seq 2 — visible by construction, because a "
    "tombstone kills rows with __seq <= dead_upto only, while the "
    "even half (vec_id % 14 == 10) stays dead. Row identity is (id, "
    "seq), so the old physical row stays dead and the live view holds "
    "exactly one row per re-inserted id (contrast §20j, where "
    "NAME-keyed re-add resurrects stale values and is forbidden). "
    "Probe = live view at v3 against the corpus-minus-still-dead "
    "oracle",
)
def vector_ann_ivf_delete_readd_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _probe_stage(spark, sf_dir, version=3, live=True)


@register(
    "vector_ann_ivf_delete_rewrite_topk",
    oracle=_del_oracle("c.vec_id % 14 = 10"),
    doc="physical apply of the deletion vectors (maintenance): ONLY "
    "the cells holding dead rows are rewritten (live rows re-staged, "
    "dead dropped; untouched cells byte-identical — pinned), and the "
    "tombstone pointer clears in the SAME replace-parts manifest "
    "flip. The probe reads the PLAIN committed view at v4 with NO "
    "tombstone filter and matches the same oracle as the v3 live "
    "view: the hash match IS the physical == logical proof",
)
def vector_ann_ivf_delete_rewrite_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _probe_stage(spark, sf_dir, version=4, live=False)
