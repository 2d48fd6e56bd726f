"""Round-18 staged queries (queries/round18_staging.py): oracle parity
plus the pins each row exists to demonstrate — the IVF×BQ tier's
cell-restricted Hamming candidates rescore with non-degenerate cosine
margins (cross-engine rank stability) and clear a recall floor, and
the streaming query probe commits each micro-batch's results behind a
manifest batch-id fence with replay/crash/checkpoint behavior matching
the absorb side's."""

from __future__ import annotations

import duckdb
import numpy as np
import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import TESTDATA_TABLES, load_table
from cognitive_score_bigdata_spark.queries import load_registry
from tests.conftest import SF_DIR, assert_frames_match

NAMES = [
    "vector_ann_ivfbq_topk",
    "vector_ann_stream_probe",
]


def test_oracle_parity(spark):
    reg = load_registry()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    for name in NAMES:
        spec = reg[name]
        assert spec.oracle is not None
        sp = spec.fn(spark, SF_DIR).toPandas()
        oc = con.execute(spec.oracle).df()
        assert_frames_match(sp, oc, name)


def _bq_bits_and_units(spark):
    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb.vec_id.to_numpy()
    M = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    bits = (M > 0).astype(np.uint8)
    units = M / np.linalg.norm(M, axis=1, keepdims=True)
    return ids, bits, units


def _probed_rows(spark, qi, ids, units):
    """Row indices inside the query's n_probe seeded cells — the
    numpy mirror of the seeded assignment + probe-cell choice the
    seeded-IVF family pins."""
    from cognitive_score_bigdata_spark.queries.round12 import (
        SEED_MAX,
        SEED_MOD,
        SEED_REM,
    )
    from cognitive_score_bigdata_spark.queries.round13 import ANN_N_PROBE

    seed_mask = (ids % SEED_MOD == SEED_REM) & (ids < SEED_MAX)
    C = units[seed_mask]  # unit seeds, ordered by vec_id
    cos_all = units @ C.T
    assign = np.argmax(cos_all, axis=1)  # ties: lowest cell, argmax-first
    q_row = int(np.flatnonzero(ids == qi)[0])
    probed = set(
        np.argsort(-cos_all[q_row], kind="stable")[:ANN_N_PROBE]
    )
    return [
        j
        for j in range(len(ids))
        if assign[j] in probed and ids[j] != qi
    ], q_row


def test_ivfbq_candidate_margins(spark):
    """Same contract as the flat BQ margin pin, restricted to the
    probed cells: for every query, the minimum adjacent cosine gap
    among its top-50 Hamming survivors INSIDE the n_probe cells clears
    float noise — no candidate pair can flip ranks cross-engine."""
    from cognitive_score_bigdata_spark.queries.round13 import ANN_N_QUERIES
    from cognitive_score_bigdata_spark.queries.round18_staging import (
        IVFBQ_CANDIDATES,
    )

    ids, bits, units = _bq_bits_and_units(spark)
    worst = 1.0
    for qi in range(ANN_N_QUERIES):
        cand_rows, q_row = _probed_rows(spark, qi, ids, units)
        hdist = (bits[cand_rows] ^ bits[q_row]).sum(axis=1)
        order = sorted(
            zip(hdist.tolist(), ids[cand_rows].tolist(), cand_rows)
        )
        keep = [j for _, _, j in order[:IVFBQ_CANDIDATES]]
        scores = np.sort(units[keep] @ units[q_row])[::-1]
        worst = min(worst, float(np.min(np.abs(np.diff(scores)))))
    assert worst > 1e-9, worst


def test_ivfbq_recall_floor(spark):
    """The composed tier is USEFUL: recall@10 against brute-force
    cosine clears a measured floor (bounded below the flat BQ tier by
    the cell cut, above random by the Hamming correlation)."""
    reg = load_registry()
    got = reg["vector_ann_ivfbq_topk"].fn(spark, SF_DIR).toPandas()
    exact = reg["vector_cosine_topk"].fn(spark, SF_DIR).toPandas()
    assert len(got) == 50
    hits = 0
    for q in range(5):
        g = set(got[got.query_id == q]["neighbor_id"])
        e = set(exact[exact.query_id == q]["neighbor_id"])
        hits += len(g & e)
    assert hits / 50 >= 0.2, hits / 50


def test_ivfbq_candidates_come_from_probed_cells_only(spark):
    """Cell pruning is semantic, not cosmetic: every returned neighbor
    is assigned to one of its query's probed cells."""
    from cognitive_score_bigdata_spark.queries.round13 import ANN_N_QUERIES

    reg = load_registry()
    got = reg["vector_ann_ivfbq_topk"].fn(spark, SF_DIR).toPandas()
    ids, _bits, units = _bq_bits_and_units(spark)
    for qi in range(ANN_N_QUERIES):
        cand_rows, _ = _probed_rows(spark, qi, ids, units)
        allowed = set(ids[cand_rows].tolist())
        returned = set(got[got.query_id == qi]["neighbor_id"])
        assert returned <= allowed, (qi, returned - allowed)


def test_stream_probe_fence_and_results(spark):
    """The drain recorded exactly batches [0, 1, 2] in the results
    manifest; every streamed query has exactly k committed rows; the
    batch partition matches the query's batch assignment."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_index,
        read_manifest_meta,
    )
    from cognitive_score_bigdata_spark.queries.ivf_lifecycle import IVFM_K
    from cognitive_score_bigdata_spark.queries.round18_staging import (
        SPROBE_BATCHES,
        SPROBE_N_QUERIES,
        stream_probe_results_path,
    )

    path = stream_probe_results_path(spark, SF_DIR)
    assert read_manifest_meta(path).get("batch_ids") == list(
        range(SPROBE_BATCHES)
    )
    res = read_index(spark, path).toPandas()
    counts = res.groupby("query_id").size()
    assert set(counts.index) == set(range(SPROBE_N_QUERIES))
    assert (counts == IVFM_K).all()
    assert (
        res["batch"] == res["query_id"] % SPROBE_BATCHES
    ).all()


def test_stream_probe_replay_is_fenced(spark):
    """A replayed batch id is a no-op: the hook returns False and the
    manifest version does not advance."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_manifest,
    )
    from cognitive_score_bigdata_spark.queries.ivf_lifecycle import (
        merged_ivf_path,
    )
    from cognitive_score_bigdata_spark.queries.round18_staging import (
        probe_stream_batch,
        stream_probe_results_path,
    )

    path = stream_probe_results_path(spark, SF_DIR)
    ivf_path = merged_ivf_path(spark, SF_DIR)
    v_before = read_manifest(path)[0]
    batch = load_table(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") % 3 == 1
    ).filter(F.col("vec_id") < 15).select("vec_id", "embedding")
    assert (
        probe_stream_batch(spark, batch, path, ivf_path, 1, n_probe=8)
        is False
    )
    assert read_manifest(path)[0] == v_before


def test_stream_probe_checkpoint_cross_run(spark):
    """Re-running the availableNow stream against the SAME checkpoint
    and input produces no new micro-batches and no new commits."""
    import os

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_manifest,
    )
    from cognitive_score_bigdata_spark.queries.ivf_lifecycle import (
        IVFM_CELLS,
        merged_ivf_path,
    )
    from cognitive_score_bigdata_spark.queries.round18_staging import (
        run_query_stream,
        stream_probe_results_path,
    )

    path = stream_probe_results_path(spark, SF_DIR)
    work = os.path.dirname(path)
    v_before = read_manifest(path)[0]
    q = run_query_stream(
        spark,
        os.path.join(work, "in"),
        path,
        merged_ivf_path(spark, SF_DIR),
        os.path.join(work, "ckpt"),
        n_probe=IVFM_CELLS,
    )
    q.awaitTermination()
    assert read_manifest(path)[0] == v_before


def test_stream_probe_crash_before_flip_is_replayable(spark):
    """A probe commit that dies between the physical append and the
    pointer flip leaves the fence unrecorded and the staged files as
    orphan garbage: after the documented vacuum recovery the SAME
    batch re-probes exactly once and the committed view gains exactly
    k×|batch| rows."""
    import os
    import tempfile

    import pytest

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_index,
        read_manifest,
        read_manifest_meta,
        vacuum_index,
    )
    from cognitive_score_bigdata_spark.queries.ivf_lifecycle import (
        IVFM_K,
        merged_ivf_path,
    )
    from cognitive_score_bigdata_spark.queries.round18_staging import (
        init_results_artifact,
        probe_stream_batch,
    )

    ivf_path = merged_ivf_path(spark, SF_DIR)
    results = os.path.join(
        tempfile.mkdtemp(prefix="csb_sprobe_crash_"), "results"
    )
    init_results_artifact(results)
    batch = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
    )

    class Boom(RuntimeError):
        pass

    def die():
        raise Boom()

    with pytest.raises(Boom):
        probe_stream_batch(
            spark, batch, results, ivf_path, 0, n_probe=8,
            _before_publish=die,
        )
    # nothing committed: still the empty v1, fence unrecorded, and the
    # appended files are uncommitted garbage behind the committed view
    assert read_manifest(results)[0] == 1
    assert read_manifest(results)[1] == []
    assert read_manifest_meta(results).get("batch_ids") is None
    # recovery: vacuum sweeps the uncommitted garbage, replay absorbs
    vacuum_index(results, keep_versions=2)
    assert (
        probe_stream_batch(spark, batch, results, ivf_path, 0, n_probe=8)
        is True
    )
    assert read_manifest_meta(results).get("batch_ids") == [0]
    assert read_index(spark, results).count() == 5 * IVFM_K


def test_bqm_oracle_parity(spark):
    """The merged persisted-file probe hash-matches the FULL-corpus
    IVF×BQ oracle — the conservation proof (frozen-seed assignment is
    deterministic, so merged == one-shot build)."""
    reg = load_registry()
    spec = reg["vector_ann_ivfbq_merged_topk"]
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    assert_frames_match(
        spec.fn(spark, SF_DIR).toPandas(),
        con.execute(spec.oracle).df(),
        "vector_ann_ivfbq_merged_topk",
    )
    # and equals the in-plan composition row for the same corpus
    a = spec.fn(spark, SF_DIR).toPandas().sort_values(
        ["query_id", "rnk"]
    ).reset_index(drop=True)
    b = reg["vector_ann_ivfbq_topk"].fn(spark, SF_DIR).toPandas().sort_values(
        ["query_id", "rnk"]
    ).reset_index(drop=True)
    assert a.equals(b)


def test_bqm_merge_reads_no_index_partition(spark):
    """Frozen-quantizer absorption must scan only the new batch and
    the 8-row centers table — no node of the appended rows' plan may
    reference the inverted-file path."""
    import tempfile

    from cognitive_score_bigdata_spark.plans.audit import plan_text
    from cognitive_score_bigdata_spark.queries.round18_staging import (
        BQM_SNAP_MOD,
        BQM_SNAP_NEW,
        build_bq_file,
        merge_vectors_into_bq,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    path = tempfile.mkdtemp(prefix="csb_bqm_pin_") + "/idx"
    build_bq_file(
        emb.filter(F.col("vec_id") % BQM_SNAP_MOD != BQM_SNAP_NEW), path
    )
    appended = merge_vectors_into_bq(
        emb.filter(F.col("vec_id") % BQM_SNAP_MOD == BQM_SNAP_NEW), path
    )
    assert path not in plan_text(appended)


def test_bqm_frozen_quantizer_and_old_partitions_untouched(spark):
    """The centers table and every pre-merge cell data file are
    byte-for-byte untouched by an absorption (name+mtime identical) —
    the append-only contract at the artifact level."""
    import glob
    import os
    import tempfile

    from cognitive_score_bigdata_spark.queries.round18_staging import (
        BQM_SNAP_MOD,
        BQM_SNAP_NEW,
        build_bq_file,
        merge_vectors_into_bq,
    )

    def sig(pattern):
        return sorted(
            (os.path.relpath(p, os.path.dirname(pattern)), os.path.getmtime(p))
            for p in glob.glob(pattern)
        )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    path = tempfile.mkdtemp(prefix="csb_bqm_frozen_") + "/idx"
    build_bq_file(
        emb.filter(F.col("vec_id") % BQM_SNAP_MOD != BQM_SNAP_NEW), path
    )
    centers_before = sig(f"{path}_centers/*.parquet")
    cells_before = sig(f"{path}/cell=*/*.parquet")
    merge_vectors_into_bq(
        emb.filter(F.col("vec_id") % BQM_SNAP_MOD == BQM_SNAP_NEW), path
    )
    assert sig(f"{path}_centers/*.parquet") == centers_before
    after = sig(f"{path}/cell=*/*.parquet")
    for entry in cells_before:
        assert entry in after, entry


def test_bqm_merged_file_complete_and_cell_pruned(spark):
    """The merged code table holds each corpus vector exactly once
    (one cell, one code row), and a cell-filtered read of the
    committed file shows parquet PartitionFilters — the probe's
    n_probe/n_cells IO story is real partition pruning."""
    import re

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_index,
    )
    from cognitive_score_bigdata_spark.plans.audit import plan_text
    from cognitive_score_bigdata_spark.queries.round18_staging import (
        merged_bq_path,
    )

    path = merged_bq_path(spark, SF_DIR)
    idx = read_index(spark, path)
    n_corpus = load_table(spark, SF_DIR, "embeddings").count()
    per_id = idx.groupBy("neighbor_id").count()
    assert per_id.count() == n_corpus
    assert per_id.filter(F.col("count") != 1).count() == 0
    t = plan_text(idx.filter(F.col("cell") == 0))
    assert re.search(r"PartitionFilters: \[[^\]]*cell", t), t[:2000]


def test_bq_word_packing_matches_numpy(spark):
    """The sign-bit word expression (aggregate/shiftleft over the
    embedding HOF) packs EXACTLY numpy's bit order on adversarial
    inputs — zeros (strictly > 0 is the sign rule, so 0 -> bit off),
    negative zero, ±tiny denormal-adjacent values, and exact IEEE
    boundaries — pinning the cross-engine exactness every BQ-family
    oracle rests on."""
    import numpy as np

    from cognitive_score_bigdata_spark.queries.round17_staging import (
        BQ_DIM,
        _bq_words,
    )

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((32, BQ_DIM))
    vecs[0] = 0.0  # all-zero vector: both words must be 0
    vecs[1, :32] = -0.0  # negative zero is NOT > 0
    vecs[2] = np.where(np.arange(BQ_DIM) % 2 == 0, 1e-300, -1e-300)
    vecs[3] = 1.0  # all bits on
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.neighbor_id: (r.w0, r.w1)
        for r in _bq_words(df, "neighbor_id").collect()
    }
    for i, v in enumerate(vecs):
        bits = (v > 0).astype(np.uint64)
        w0 = int((bits[:32] << np.arange(32, dtype=np.uint64)).sum())
        w1 = int((bits[32:] << np.arange(32, dtype=np.uint64)).sum())
        assert got[i] == (w0, w1), (i, got[i], (w0, w1))
    assert got[0] == (0, 0)
    assert got[3] == ((1 << 32) - 1, (1 << 32) - 1)
