"""Round-21 staging pins: filtered vector search (predicate pushed
into the probed-cell scan) and tombstone-aware compaction (dead rows
dropped + small files merged + pointer cleared in one flip), matching
the test_round20_staging.py set for the other lifecycle verbs.
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
    absorb_vectors_seq,
    build_ivf_file_seq,
    delete_from_ivf,
    read_index_live,
)
from cognitive_score_bigdata_spark.queries.round21_staging import (
    build_filtered_ivf,
    compact_ivf_dead,
    filtered_probe,
)
from tests.conftest import SF_DIR


def _emb(spark):
    return (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding", "label")
        .filter(F.col("vec_id") < 200)
    )


def _cell_files(path):
    """cell -> list of parquet files currently on disk under it."""
    out: dict = {}
    for root, _, files in os.walk(path):
        if "cell=" in root:
            cell = int(root.rsplit("cell=", 1)[-1])
            out.setdefault(cell, [])
            out[cell] += [f for f in files if f.endswith(".parquet")]
    return out


def _live_ids(spark, path, version=None):
    return {
        r.neighbor_id
        for r in read_index_live(spark, path, version=version)
        .select("neighbor_id")
        .distinct()
        .collect()
    }


# ---------------------------------------------------------------- filtered ANN


def test_filtered_probe_pushes_predicate_into_scan(spark):
    """The 100 TB claim, pinned on the plan: the label predicate
    reaches the parquet reader of the inverted-file scan as a pushed
    filter (row-group skipping, no join, no second pass), and no
    other scan of a filter-id list exists in the plan."""
    df = filtered_probe(spark, SF_DIR, (0, 2), k=5, n_probe=2)
    text = plan_text(df)
    assert "PushedFilters" in text
    # the In(label, …) predicate sits on a scan, not a post-join filter
    assert any(
        "label" in seg.split("]", 1)[0]
        for seg in text.split("PushedFilters: [")[1:]
    ), text


def test_filtered_probe_prefilter_semantics(spark):
    """All k results satisfy the predicate (pre-filter, not
    post-filter-the-topk), and the filtered top-k genuinely differs
    from the unfiltered one (the predicate is doing work)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    labels = {
        r.vec_id: r.label for r in emb.select("vec_id", "label").collect()
    }
    rows = filtered_probe(
        spark, SF_DIR, (0, 2), k=10, n_probe=8
    ).collect()
    assert rows
    assert all(labels[r.neighbor_id] in (0, 2) for r in rows)
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    # k neighbors for every query — the filtered corpus is populous
    assert all(len(v) == 10 for v in per_q.values())


def test_filtered_index_build_commits_label_column(spark):
    """The denormalization contract: the committed inverted file
    carries (neighbor_id, __c, cell, label) so ANY later probe can
    filter without a join; the manifest flip is the commit."""
    emb = _emb(spark)
    path = tempfile.mkdtemp(prefix="csb_filt_t_") + "/idx"
    build_filtered_ivf(emb, path, n_cells=4)
    rows = read_index(spark, path)
    assert {"neighbor_id", "__c", "cell", "label"} <= set(rows.columns)
    got = {
        (r.neighbor_id, r.label)
        for r in rows.select("neighbor_id", "label").collect()
    }
    want = {(r.vec_id, r.label) for r in emb.collect()}
    assert got == want
    assert read_manifest(path)[0] == 1


# ------------------------------------------------- tombstone-aware compaction


def _staged(spark, tag):
    """build(v1) → delete(v2) → re-insert absorb(v3): the pre-compact
    state, with dead rows in most cells and 2 files per touched cell."""
    emb = _emb(spark).select("vec_id", "embedding")
    path = tempfile.mkdtemp(prefix=f"csb_cdead_{tag}_") + "/idx"
    build_ivf_file_seq(emb, path, n_cells=4)
    delete_from_ivf(
        spark,
        path,
        emb.select("vec_id").filter(F.col("vec_id") % DEL_MOD == DEL_RES),
    )
    absorb_vectors_seq(
        spark, emb.filter(F.col("vec_id") % READD_MOD == READD_RES), path
    )
    return path, emb


def test_compact_merges_files_drops_dead_clears_pointer(spark):
    path, emb = _staged(spark, "main")
    live_before = _live_ids(spark, path)
    n = compact_ivf_dead(spark, path)
    assert n == 4
    # one COMMITTED file per cell (superseded files await vacuum, so
    # count the committed manifest's view, not the directory)
    committed = read_manifest(path)[1]
    per_cell: dict = {}
    for f in committed:
        cell = int(f.split("cell=", 1)[-1].split("/", 1)[0])
        per_cell[cell] = per_cell.get(cell, 0) + 1
    assert per_cell == {0: 1, 1: 1, 2: 1, 3: 1}
    # pointer cleared in the SAME flip; plain view == pre-compact live
    assert "tombstones" not in read_manifest_meta(path)
    plain = {
        r.neighbor_id
        for r in read_index(spark, path).select("neighbor_id").collect()
    }
    assert plain == live_before
    # still-dead ids stay gone; re-inserted ids survive with __seq 2
    dead = {
        r.vec_id
        for r in emb.filter(
            F.col("vec_id") % READD_MOD == READD_RES + DEL_MOD
        ).collect()
    }
    assert not plain & dead
    seqs = {
        r["neighbor_id"]: r["__seq"]
        for r in read_index(spark, path)
        .select("neighbor_id", "__seq")
        .collect()
    }
    readded = {
        r.vec_id
        for r in emb.filter(
            F.col("vec_id") % READD_MOD == READD_RES
        ).collect()
    }
    assert all(seqs[i] == 2 for i in readded)


def test_compact_time_travel_still_resolves_sidecar(spark):
    """Reading at the pre-compact version still applies that
    snapshot's tombstones (the sidecar file outlives the pointer until
    vacuum), and the pre-delete snapshot sees everything."""
    path, emb = _staged(spark, "tt")
    v3_live = _live_ids(spark, path, version=3)
    compact_ivf_dead(spark, path)
    assert _live_ids(spark, path, version=3) == v3_live
    all_ids = {r.vec_id for r in emb.collect()}
    assert _live_ids(spark, path, version=1) == all_ids
    # and the compacted plain view equals the v3 live view
    assert _live_ids(spark, path) == v3_live


def test_compact_crash_before_flip_keeps_old_view(spark):
    path, emb = _staged(spark, "crash")
    v3 = read_manifest(path)[0]
    live = _live_ids(spark, path)

    class Boom(Exception):
        pass

    def boom():
        raise Boom()

    try:
        compact_ivf_dead(spark, path, _before_publish=boom)
        raise AssertionError("seam did not fire")
    except Boom:
        pass
    # staged replacement files are uncommitted garbage; pointer intact
    assert read_manifest(path)[0] == v3
    assert read_manifest_meta(path).get("tombstones")
    assert _live_ids(spark, path) == live
    # retry compacts normally
    compact_ivf_dead(spark, path)
    assert "tombstones" not in read_manifest_meta(path)
    assert _live_ids(spark, path) == live


def test_compact_supersedes_fully_dead_cell(spark):
    """The resurrection edge the replace-set choice closes: delete
    EVERY row of one cell, then compact — that cell's files must be
    superseded (empty replacement set) or clearing the pointer would
    resurrect its dead rows into the plain view."""
    emb = _emb(spark).select("vec_id", "embedding")
    path = tempfile.mkdtemp(prefix="csb_cdead_all_") + "/idx"
    build_ivf_file_seq(emb, path, n_cells=4)
    cell0 = read_index(spark, path).filter(F.col("cell") == 0)
    doomed = cell0.select(F.col("neighbor_id").alias("vec_id"))
    n_doomed = doomed.count()
    assert n_doomed > 0
    delete_from_ivf(spark, path, doomed)
    live_before = _live_ids(spark, path)
    compact_ivf_dead(spark, path)
    assert "tombstones" not in read_manifest_meta(path)
    plain = {
        r.neighbor_id
        for r in read_index(spark, path).select("neighbor_id").collect()
    }
    assert plain == live_before
    assert len(plain) == emb.count() - n_doomed
