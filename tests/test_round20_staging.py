"""DELETE in the vector-index lifecycle (queries/round20_staging.py):
deletion-vector commit/crash/rewrite/time-travel pins, matching the
standard tests/test_ivf_lifecycle.py and test_round19_staging.py set
for the other lifecycle verbs.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.index_manifest import (
    read_index,
    read_manifest,
    read_manifest_meta,
)
from cognitive_score_bigdata_spark.plans.audit import plan_text
from cognitive_score_bigdata_spark.queries.round20_staging import (
    DEL_MOD,
    DEL_RES,
    READD_MOD,
    READD_RES,
    _merged_tombstones,
    absorb_vectors_seq,
    apply_deletes_rewrite,
    build_ivf_file_seq,
    delete_from_ivf,
    read_index_live,
)
from tests.conftest import SF_DIR


def _emb(spark):
    # A 200-vector slice keeps per-test builds fast; every id family
    # (deleted / re-added / still-dead) is well-populated within it.
    return (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 200)
    )


def _fresh(spark, tag):
    emb = _emb(spark)
    path = tempfile.mkdtemp(prefix=f"csb_del_{tag}_") + "/idx"
    build_ivf_file_seq(emb, path, n_cells=4)
    return path, emb


def _doomed(emb):
    return emb.select("vec_id").filter(F.col("vec_id") % DEL_MOD == DEL_RES)


def _data_file_state(path):
    """(relpath -> (mtime_ns, size)) for every physical cell file."""
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and "cell=" in root:
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, path)] = (st.st_mtime_ns, st.st_size)
    return out


def _live_ids(spark, path, version=None):
    return {
        r.neighbor_id
        for r in read_index_live(spark, path, version=version)
        .select("neighbor_id")
        .distinct()
        .collect()
    }


def test_delete_writes_no_cell_partition(spark):
    """The deletion-vector claim, both directions: the tombstone
    merge's PLAN never references the index path (reads only the id
    list and the old sidecar), and the commit leaves every physical
    cell file byte-identical — a delete is O(|ids|), not a rewrite."""
    path, emb = _fresh(spark, "plan")
    merged = _merged_tombstones(spark, path, _doomed(emb), dead_upto=1)
    assert path + "/" not in plan_text(merged)
    before = _data_file_state(path)
    n = delete_from_ivf(spark, path, _doomed(emb))
    assert n == _doomed(emb).count()
    assert _data_file_state(path) == before
    # second delete's plan DOES read the first sidecar, still not the cells
    merged2 = _merged_tombstones(
        spark, path, emb.select("vec_id").filter(F.col("vec_id") == 0), 1
    )
    assert "_tombs" in plan_text(merged2)
    assert path + "/" not in plan_text(merged2).replace(path + "_tombs", "")


def test_live_view_hides_deleted_ids_and_time_travel_composes(spark):
    path, emb = _fresh(spark, "tt")
    all_ids = {r.vec_id for r in emb.collect()}
    dead = {i for i in all_ids if i % DEL_MOD == DEL_RES}
    delete_from_ivf(spark, path, _doomed(emb))
    assert _live_ids(spark, path) == all_ids - dead
    # pre-delete snapshot (v1) still sees every row
    assert _live_ids(spark, path, version=1) == all_ids
    assert _live_ids(spark, path, version=2) == all_ids - dead


def test_reinsert_outlives_tombstone_exactly_once(spark):
    """Resurrection-by-re-insert: a re-absorbed deleted id is visible
    again (its new row's __seq outlives dead_upto) and the live view
    holds EXACTLY ONE row for it — the old physical row stays dead."""
    path, emb = _fresh(spark, "readd")
    delete_from_ivf(spark, path, _doomed(emb))
    readd = emb.filter(F.col("vec_id") % READD_MOD == READD_RES)
    absorb_vectors_seq(spark, readd, path)
    live = read_index_live(spark, path)
    counts = {
        r.neighbor_id: r.n
        for r in live.groupBy("neighbor_id").agg(F.count("*").alias("n")).collect()
    }
    readd_ids = {r.vec_id for r in readd.collect()}
    still_dead = {
        r.vec_id
        for r in emb.filter(F.col("vec_id") % READD_MOD == READD_RES + DEL_MOD)
        .collect()
    }
    assert readd_ids and still_dead
    assert all(counts.get(i) == 1 for i in readd_ids)
    assert all(i not in counts for i in still_dead)


def test_rewrite_touches_only_dirty_cells_and_clears_pointer(spark):
    path, emb = _fresh(spark, "rw")
    delete_from_ivf(spark, path, _doomed(emb))
    live_before = sorted(
        read_index_live(spark, path).select("neighbor_id", "cell", "__seq").collect()
    )
    before = _data_file_state(path)
    dirty = apply_deletes_rewrite(spark, path)
    assert dirty  # the doomed set spans at least one cell
    after = _data_file_state(path)
    # untouched cells: every physical file unchanged
    for rel, st in before.items():
        cell = int(rel.split("cell=")[1].split("/")[0])
        if cell not in dirty:
            assert after[rel] == st
    # pointer cleared in the same flip; plain view == old live view
    assert "tombstones" not in read_manifest_meta(path)
    live_after = sorted(
        read_index(spark, path).select("neighbor_id", "cell", "__seq").collect()
    )
    assert live_after == live_before
    # idempotent: nothing left to apply
    assert apply_deletes_rewrite(spark, path) == []


def test_delete_crash_before_flip_is_invisible_then_retryable(spark):
    path, emb = _fresh(spark, "crash")
    v1 = read_manifest(path)[0]

    class Boom(Exception):
        pass

    def boom():
        raise Boom()

    try:
        delete_from_ivf(spark, path, _doomed(emb), _before_publish=boom)
        raise AssertionError("seam did not fire")
    except Boom:
        pass
    # the orphan sidecar is inert: no pointer, live view unchanged
    assert read_manifest(path)[0] == v1
    assert "tombstones" not in read_manifest_meta(path)
    all_ids = {r.vec_id for r in emb.collect()}
    assert _live_ids(spark, path) == all_ids
    # retry commits normally
    delete_from_ivf(spark, path, _doomed(emb))
    assert _live_ids(spark, path) == {
        i for i in all_ids if i % DEL_MOD != DEL_RES
    }


def test_rewrite_crash_before_flip_keeps_old_view(spark):
    path, emb = _fresh(spark, "rwcrash")
    delete_from_ivf(spark, path, _doomed(emb))
    v2 = read_manifest(path)[0]
    live = _live_ids(spark, path)

    class Boom(Exception):
        pass

    def boom():
        raise Boom()

    try:
        apply_deletes_rewrite(spark, path, _before_publish=boom)
        raise AssertionError("seam did not fire")
    except Boom:
        pass
    # staged replacement files are uncommitted garbage; pointer intact
    assert read_manifest(path)[0] == v2
    assert read_manifest_meta(path).get("tombstones")
    assert _live_ids(spark, path) == live
    # retry applies physically; result unchanged
    apply_deletes_rewrite(spark, path)
    assert "tombstones" not in read_manifest_meta(path)
    assert _live_ids(spark, path) == live


def test_full_stage_sequence_v3_live_equals_v4_plain(spark):
    """The registry rows' conservation claim at test scale: after
    delete → re-insert → rewrite, the plain committed view equals the
    v3 live view row-for-row (ids and seqs), and still excludes the
    never-re-inserted half."""
    path, emb = _fresh(spark, "seq")
    delete_from_ivf(spark, path, _doomed(emb))
    absorb_vectors_seq(
        spark, emb.filter(F.col("vec_id") % READD_MOD == READD_RES), path
    )
    v3_live = sorted(
        read_index_live(spark, path, version=3)
        .select("neighbor_id", "__seq")
        .collect()
    )
    apply_deletes_rewrite(spark, path)
    v4_plain = sorted(
        read_index(spark, path).select("neighbor_id", "__seq").collect()
    )
    assert v4_plain == v3_live
    assert not {
        r.neighbor_id for r in v4_plain
    } & {
        r.vec_id
        for r in emb.filter(
            F.col("vec_id") % READD_MOD == READD_RES + DEL_MOD
        ).collect()
    }
