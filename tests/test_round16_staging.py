"""Round-16 staged queries (queries/round16_staging.py): oracle parity
plus the pins each query exists to demonstrate — the change feed reads
ONLY the manifest-diff files and suppresses rewrite-copied rows (a
pure compaction yields an EMPTY feed), schema evolution projects old
files' missing column as NULL with the committed schema carried
forward and time travel resolving each snapshot's own schema, and the
SQ8 pipeline's codes are bit-identical cross-engine with every ranking
margin non-degenerate."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyspark.sql.functions as F

import cognitive_score_bigdata_spark.operators.index_manifest as im
from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import load_registry
from cognitive_score_bigdata_spark.queries.round16_staging import (
    CDF_DEL_MOD,
    CDF_DEL_REM,
    CDF_INS_MOD,
    CDF_INS_REM,
    CDF_UPD_MOD,
    CDF_UPD_REM,
    changes_artifact,
    evolution_artifact,
    sq8_artifact,
)
from tests.conftest import SF_DIR, assert_frames_match

NEW_QUERIES = [
    "scan_changes_feed",
    "agg_mv_apply_changes",
    "scan_schema_evolution_agg",
    "vector_ann_sq8_topk",
    "vector_ann_ivfsq_topk",
    "scan_merge_upsert_agg",
]


def test_oracle_parity(spark, oracle_con):
    for name in NEW_QUERIES:
        spec = load_registry()[name]
        sp = spec.fn(spark, SF_DIR).toPandas()
        oc = oracle_con.execute(spec.oracle).df()
        assert_frames_match(sp, oc, name)


# --- scan_changes_feed -------------------------------------------------------


def _rel_input_files(df, path):
    return {
        os.path.relpath(f.replace("file:", ""), path) for f in df.inputFiles()
    }


def test_changes_feed_io_and_suppression(spark):
    """The CDF contract: (a) the feed scans ONLY the snapshot-diff
    files — untouched partitions' files never enter either side; (b)
    rows the partition rewrite merely copied are suppressed, so the
    feed is exactly |deletes| + 2·|updates| + |inserts| rows; (c)
    conservation between the snapshots holds."""
    path, v1, v2 = changes_artifact(spark, SF_DIR)
    removed, added = im.snapshot_diff(path, v1, v2)
    assert removed and added
    assert {f.split("/")[0] for f in removed + added} == {"band=1"}

    feed = im.read_changes(spark, path, v1, v2, key_cols=["doc_id"])
    assert _rel_input_files(feed, path) <= set(removed) | set(added)

    docs = load_table(spark, SF_DIR, "documents")
    n_del = docs.filter(F.col("doc_id") % CDF_DEL_MOD == CDF_DEL_REM).count()
    n_upd = docs.filter(F.col("doc_id") % CDF_UPD_MOD == CDF_UPD_REM).count()
    n_ins = docs.filter(F.col("doc_id") % CDF_INS_MOD == CDF_INS_REM).count()
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("n"))
        .collect()
    }
    assert by_type == {
        "delete": n_del,
        "update_preimage": n_upd,
        "update_postimage": n_upd,
        "insert": n_ins,
    }
    # conservation across the snapshots
    n_v1 = im.read_index(spark, path, version=v1).count()
    n_v2 = im.read_index(spark, path, version=v2).count()
    assert n_v2 == n_v1 - n_del + n_ins


def test_changes_feed_compaction_and_metadata_commits_are_empty(spark):
    """A pure compaction rewrites files but changes no row — its feed
    must be EMPTY (the row-level-CDF property a file diff lacks). A
    metadata-only commit (same file list, new note/meta) likewise."""
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "band", F.col("doc_id") % 2
    )
    path = tempfile.mkdtemp(prefix="csb_cdf_compact_") + "/docs"
    im.append_commit(
        path,
        lambda: docs.filter(F.col("doc_id") % 4 < 2)
        .write.mode("append")
        .partitionBy("band")
        .parquet(path),
    )
    im.append_commit(
        path,
        lambda: docs.filter(F.col("doc_id") % 4 >= 2)
        .write.mode("append")
        .partitionBy("band")
        .parquet(path),
    )
    touched = im.compact_index_parts(spark, path, "band", max_files_per_part=1)
    assert touched  # the compaction actually rewrote something
    v = im.read_manifest(path)[0]
    feed = im.read_changes(spark, path, v - 1, v, key_cols=["doc_id"])
    assert feed.count() == 0

    cur = im._read_manifest_doc(path)
    im.publish_manifest(
        path, list(cur["files"]), note="metadata only", meta={"fence": 7}
    )
    meta_feed = im.read_changes(spark, path, v, v + 1, key_cols=["doc_id"])
    assert meta_feed.count() == 0
    assert "_change_type" in meta_feed.columns  # schema-stable empty


def test_changes_feed_schema_evolution_backfill_reads_as_update(spark):
    """A backfill that rewrites a partition adding a NEW column (with
    the evolved schema committed in the same flip): the pre side —
    read under ITS snapshot's schema — compares the missing column as
    NULL, so backfilled rows surface as update_preimage (tokens NULL)
    / update_postimage (tokens set), rows with no other change
    included. The same answer a write-side CDF gives."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "n_chars")
        .withColumn("band", F.col("doc_id") % 2)
    )
    path = tempfile.mkdtemp(prefix="csb_cdf_evo_") + "/docs"
    im.append_commit(
        path,
        lambda: docs.write.mode("append").partitionBy("band").parquet(path),
    )
    backfilled = docs.filter(F.col("band") == 0).withColumn(
        "tokens", F.expr("n_chars DIV 5")
    )
    im.replace_parts_commit(
        path,
        lambda: backfilled.write.mode("append")
        .partitionBy("band")
        .parquet(path),
        part_values=[0],
        schema_json=backfilled.schema.json(),
    )
    feed = im.read_changes(spark, path, 1, 2, key_cols=["doc_id"])
    n_band0 = docs.filter(F.col("band") == 0).count()
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("n"))
        .collect()
    }
    assert by_type == {
        "update_preimage": n_band0,
        "update_postimage": n_band0,
    }
    pre = feed.filter(F.col("_change_type") == "update_preimage")
    post = feed.filter(F.col("_change_type") == "update_postimage")
    assert pre.filter(F.col("tokens").isNotNull()).count() == 0
    assert post.filter(F.col("tokens").isNull()).count() == 0


def test_changes_feed_multi_commit_and_net_semantics(spark):
    """The feed composes across commits: applying v1→v2 then v2→v3
    feeds to a keyed store equals the direct v3 read, and the
    NON-ADJACENT v1→v3 feed has NET semantics — a row deleted in v2
    and reinserted identically in v3 appears in neither side of the
    span diff (pre-image == post-image → suppressed)."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "n_chars")
        .withColumn("band", F.col("doc_id") % 2)
    )
    path = tempfile.mkdtemp(prefix="csb_cdf_multi_") + "/docs"
    im.append_commit(
        path,
        lambda: docs.write.mode("append").partitionBy("band").parquet(path),
    )
    # v2: delete doc_id % 10 == 1 from band 1 (all such ids are odd)
    keep = im.read_index(spark, path, part_values=[1]).filter(
        (F.col("band") == 1) & ~(F.col("doc_id") % 10 == 1)
    )
    im.replace_parts_commit(
        path,
        lambda: keep.write.mode("append").partitionBy("band").parquet(path),
        part_values=[1],
    )
    # v3: reinsert the deleted rows byte-identically
    full = docs.filter(F.col("band") == 1)
    im.replace_parts_commit(
        path,
        lambda: full.write.mode("append").partitionBy("band").parquet(path),
        part_values=[1],
    )

    def keyset(df):
        return {r.doc_id for r in df.select("doc_id").collect()}

    f12 = im.read_changes(spark, path, 1, 2, key_cols=["doc_id"])
    f23 = im.read_changes(spark, path, 2, 3, key_cols=["doc_id"])
    victims = keyset(docs.filter((F.col("band") == 1)
                                 & (F.col("doc_id") % 10 == 1)))
    assert {r["_change_type"] for r in f12.select("_change_type")
            .distinct().collect()} == {"delete"}
    assert keyset(f12) == victims
    assert {r["_change_type"] for r in f23.select("_change_type")
            .distinct().collect()} == {"insert"}
    assert keyset(f23) == victims

    # sequential application reaches the direct v3 state
    v1 = keyset(im.read_index(spark, path, version=1))
    applied = (v1 - keyset(f12)) | keyset(f23)
    assert applied == keyset(im.read_index(spark, path, version=3))

    # net semantics across the span: delete + identical reinsert = no row
    f13 = im.read_changes(spark, path, 1, 3, key_cols=["doc_id"])
    assert f13.count() == 0


def test_mv_apply_changes_equals_direct_recompute(spark):
    """The incremental identity, Spark-side: the feed-maintained
    rollup equals the direct aggregate over the v2 snapshot — the
    property that lets a 100 TB view update at the cost of its delta."""
    path, _v1, v2 = changes_artifact(spark, SF_DIR)
    spec = load_registry()["agg_mv_apply_changes"]
    inc = {
        r.lang: (r.n_docs, r.sum_chars)
        for r in spec.fn(spark, SF_DIR).collect()
    }
    direct = {
        r.lang: (r.n_docs, r.sum_chars)
        for r in im.read_index(spark, path, version=v2)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .collect()
    }
    assert inc == direct


# --- scan_schema_evolution_agg ----------------------------------------------


def test_merge_commit_structural_pins(spark):
    """MERGE's locality contract: the operator locates the affected
    partitions from the data (updates span bands 1 and 3, inserts land
    in band 1 — {MRG_INS_OFFSET} ≡ 0 mod N_BANDS), rewrites exactly
    those, and every untouched band's committed file list survives
    byte-identical. The CDF between the pre/post-merge snapshots
    classifies the merge exactly: update pre+post per matched key,
    insert per unmatched source row, nothing else (copied rows
    suppressed)."""
    from cognitive_score_bigdata_spark.queries.round16_staging import (
        MRG_INS_MOD,
        MRG_INS_REM,
        MRG_UPD_MOD,
        MRG_UPD_REM,
        N_BANDS,
        merge_artifact,
    )

    path, v1, v2 = merge_artifact(spark, SF_DIR)
    pre = set(im._read_manifest_doc(path, version=v1)["files"])
    post = set(im._read_manifest_doc(path, version=v2)["files"])
    touched_bands = {f.split("/")[0] for f in (pre - post) | (post - pre)}
    docs = load_table(spark, SF_DIR, "documents")
    upd_bands = {
        f"band={r.b}"
        for r in docs.filter(F.col("doc_id") % MRG_UPD_MOD == MRG_UPD_REM)
        .select((F.col("doc_id") % N_BANDS).alias("b"))
        .distinct()
        .collect()
    }
    assert touched_bands == upd_bands  # inserts' band ⊆ update bands here
    untouched = {
        f for f in pre if f.split("/")[0] not in touched_bands
    }
    assert untouched and untouched <= post  # byte-identical survivors

    feed = im.read_changes(spark, path, v1, v2, key_cols=["doc_id"])
    n_upd = docs.filter(F.col("doc_id") % MRG_UPD_MOD == MRG_UPD_REM).count()
    n_ins = docs.filter(F.col("doc_id") % MRG_INS_MOD == MRG_INS_REM).count()
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("n"))
        .collect()
    }
    assert by_type == {
        "update_preimage": n_upd,
        "update_postimage": n_upd,
        "insert": n_ins,
    }


def test_merge_locate_uses_zone_maps(spark):
    """A small-source MERGE locates its matches through the committed
    zone maps: on a doc_id-clustered artifact, a range-local key batch
    opens only the files whose committed range holds a source key —
    the location cost of a 10k-key merge against a 10⁶-file lake is a
    manifest read plus the overlapping files, never a table scan."""
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "band", F.col("doc_id") % 2
    )
    path = tempfile.mkdtemp(prefix="csb_merge_loc_") + "/docs"
    im.clustered_write_commit(
        docs, path, part_col="band", cluster_col="doc_id", n_ranges=8
    )
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    lo, hi = mx // 10 * 4, mx // 10 * 5  # one narrow decile
    keys = list(range(lo, hi + 1, 3))
    total = len(im.read_manifest(path)[1])
    surviving = im.pruned_files_in(path, "doc_id", keys)
    assert 0 < len(surviving) < total  # the prune is real on this layout
    src = docs.filter(F.col("doc_id").isin(keys)).withColumn(
        "n_chars", F.col("n_chars") + 1
    )
    parts = im.merge_commit(
        spark, path, src, key_cols=["doc_id"], part_col="band"
    )
    assert set(parts) == {0, 1}
    live = im.read_index(spark, path)
    bumped = live.filter(F.col("doc_id").isin(keys))
    base = docs.filter(F.col("doc_id").isin(keys))
    assert bumped.count() == base.count()
    assert (
        bumped.agg(F.sum("n_chars")).collect()[0][0]
        == base.agg(F.sum("n_chars")).collect()[0][0] + base.count()
    )


def test_merge_commit_delete_tombstones(spark):
    """merge_commit's delete_col path: source rows flagged as
    tombstones DELETE their match and insert nothing; the live view
    equals base minus the tombstoned keys, and the feed reads pure
    deletes."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "n_chars")
        .withColumn("band", F.col("doc_id") % 2)
    )
    path = tempfile.mkdtemp(prefix="csb_merge_del_") + "/docs"
    im.append_commit(
        path,
        lambda: docs.write.mode("append").partitionBy("band").parquet(path),
    )
    victims = docs.filter(F.col("doc_id") % 7 == 3)
    src = victims.withColumn("__del", F.lit(True))
    parts = im.merge_commit(
        spark, path, src, key_cols=["doc_id"], part_col="band",
        delete_col="__del",
    )
    assert set(parts) == {0, 1}  # victims span both bands
    live = im.read_index(spark, path)
    assert live.count() == docs.count() - victims.count()
    assert live.filter(F.col("doc_id") % 7 == 3).count() == 0
    feed = im.read_changes(spark, path, 1, 2, key_cols=["doc_id"])
    assert {r["_change_type"] for r in feed.select("_change_type")
            .distinct().collect()} == {"delete"}
    assert feed.count() == victims.count()


def test_drain_changes_checkpointed_consumer(spark):
    """The consumer loop: bootstrap at v1, drain delivers (v1, v2) and
    advances the checkpoint, a second drain is a no-op (None), and a
    crash-before-checkpoint (simulated by rolling the state file back)
    REDELIVERS the same span — the at-least-once contract an
    idempotent keyed apply absorbs."""
    import os

    from cognitive_score_bigdata_spark.queries.round16_staging import (
        changes_artifact,
    )

    path, v1, v2 = changes_artifact(spark, SF_DIR)
    state = tempfile.mkdtemp(prefix="csb_drain_") + "/consumer.v"
    try:
        im.drain_changes(spark, path, state, ["doc_id"], lambda f, a, b: None)
        raise AssertionError("unbootstrapped consumer drained")
    except ValueError:
        pass
    with open(state, "w") as fh:
        fh.write(str(v1))
    seen = []

    def apply_fn(feed, a, b):
        seen.append((a, b, feed.count()))

    assert im.drain_changes(spark, path, state, ["doc_id"], apply_fn) == (
        v1, v2,
    )
    assert im.drain_changes(spark, path, state, ["doc_id"], apply_fn) is None
    with open(state) as fh:
        assert int(fh.read()) == v2
    # crash before checkpoint = state file still at v1: redelivery
    with open(state, "w") as fh:
        fh.write(str(v1))
    assert im.drain_changes(spark, path, state, ["doc_id"], apply_fn) == (
        v1, v2,
    )
    assert seen[0] == seen[1] and len(seen) == 2 and seen[0][2] > 0
    os.remove(state)


def test_schema_evolution_projection_and_time_travel(spark):
    """Old files project the evolved column as NULL (no rewrite —
    their committed file list is byte-identical across the append);
    time travel to v1 resolves v1's OWN schema, without `tokens`."""
    path = evolution_artifact(spark, SF_DIR)
    v1_files = set(im._read_manifest_doc(path, version=1)["files"])
    v2_files = set(im._read_manifest_doc(path, version=2)["files"])
    assert v1_files <= v2_files  # pure append: nothing rewritten

    live = im.read_index(spark, path)
    assert "tokens" in live.columns
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert live.filter(F.col("tokens").isNull()).count() == n_docs

    v1 = im.read_index(spark, path, version=1)
    assert "tokens" not in v1.columns
    assert v1.count() == n_docs


def test_schema_carries_forward_and_survives_compaction(spark):
    """A later commit that omits schema_json keeps the evolved schema
    (the carry-forward rule), and compaction — which reads through
    read_index and so materializes the NULL projection — preserves
    both content and the evolved read schema."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "n_chars")
        .withColumn("band", F.col("doc_id") % 2)
    )
    path = tempfile.mkdtemp(prefix="csb_evo_fwd_") + "/docs"
    im.append_commit(
        path,
        lambda: docs.write.mode("append").partitionBy("band").parquet(path),
    )
    evolved = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        "lang",
        "n_chars",
        F.expr("n_chars DIV 5").alias("tokens"),
        F.col("band"),
    )
    im.append_commit(
        path,
        lambda: evolved.write.mode("append").partitionBy("band").parquet(path),
        schema_json=evolved.schema.json(),
    )
    # third commit WITHOUT schema_json: schema must carry forward
    extra = evolved.withColumn("doc_id", F.col("doc_id") + 500_000)
    im.append_commit(
        path,
        lambda: extra.write.mode("append").partitionBy("band").parquet(path),
    )
    live = im.read_index(spark, path)
    assert "tokens" in live.columns
    want = docs.count() + 2 * evolved.count()
    assert live.count() == want
    n_null = live.filter(F.col("tokens").isNull()).count()
    assert n_null == docs.count()

    im.compact_index_parts(spark, path, "band", max_files_per_part=1)
    after = im.read_index(spark, path)
    assert "tokens" in after.columns
    assert after.count() == want
    # compaction materialized the NULL projection physically; content
    # is conserved column-for-column
    assert after.filter(F.col("tokens").isNull()).count() == n_null


def test_schema_evolution_zonemap_interplay(spark):
    """Zone maps on the EVOLVED column are conservative across the
    schema boundary: pre-evolution files carry no stats for `tokens`
    (their rows project NULL — a range predicate never matches them,
    but the pruner cannot know that without stats, so it must KEEP
    them), while evolved files with provably-empty ranges are
    skipped. The composed read stays exact."""
    path = evolution_artifact(spark, SF_DIR)
    doc = im._read_manifest_doc(path)
    v1_files = set(im._read_manifest_doc(path, version=1)["files"])
    stats = doc.get("stats", {})
    # every pre-evolution file lacks tokens stats; every evolved file
    # has them (stats_cols harvested on the append)
    for f in doc["files"]:
        if f in v1_files:
            assert "tokens" not in stats.get(f, {})
        else:
            assert "tokens" in stats[f]
    hi = max(st["tokens"][1] for f, st in stats.items() if "tokens" in st)
    survivors = im.pruned_files(path, ("tokens", hi + 1, None))
    # old files survive (unknown => never skipped); all evolved files
    # are provably empty above the global max and drop out
    assert set(survivors) == v1_files
    probe = im.read_index(
        spark, path, prune=("tokens", hi + 1, None)
    ).filter(F.col("tokens") > hi)
    assert probe.count() == 0  # exactness: pruning elided IO only


# --- vector_ann_sq8_topk -----------------------------------------------------


def test_sq8_codes_bit_identical_cross_engine(spark, oracle_con):
    """The quantizer's codes — integer floor of an identical IEEE
    double expression tree — are BIT-identical between Spark and
    DuckDB, code for code (the property that makes SQ8 the one
    compressed tier with a full hash oracle)."""
    codes, mins, maxes = sq8_artifact(spark, SF_DIR)
    sp = {
        int(r.neighbor_id): list(r.codes)
        for r in codes.collect()
    }
    oc = oracle_con.execute(
        """
        WITH dims AS (
          SELECT i, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
          FROM (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings)
          GROUP BY i
        )
        SELECT e.vec_id,
               list(LEAST(255, GREATEST(0, CAST(FLOOR(
                 (CAST(e.embedding[d.i] AS DOUBLE) - d.mn) * 255.0
                 / (d.mx - d.mn)) AS INT))) ORDER BY d.i) AS codes
        FROM embeddings e CROSS JOIN dims d
        GROUP BY e.vec_id
        """
    ).df()
    duck = {int(r.vec_id): list(r.codes) for _, r in oc.iterrows()}
    assert sp == duck
    assert all(0 <= c <= 255 for cs in sp.values() for c in cs)


def test_ivfsq_margins_and_numpy_truth(spark):
    """The composed IVF_SQ8 tier's three cross-engine float decisions
    are margin-protected (cell assignment, probe boundary at n_probe,
    consecutive reconstructed-cosine gaps inside probed candidates),
    and the emitted top-k equals a full numpy recompute of the
    pipeline."""
    from cognitive_score_bigdata_spark.queries.round12 import (
        SEED_MAX,
        SEED_MOD,
        SEED_REM,
    )
    from cognitive_score_bigdata_spark.queries.round13 import (
        ANN_K,
        ANN_N_PROBE,
        ANN_N_QUERIES,
    )

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb.vec_id.to_numpy()
    M = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    smask = (ids % SEED_MOD == SEED_REM) & (ids < SEED_MAX)
    S = M[smask]
    u = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    su = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    cos_cells = u @ su.T
    # assignment margin: best vs second-best cell per vector
    srt = np.sort(cos_cells, axis=1)
    assert (srt[:, -1] - srt[:, -2]).min() > 1e-6
    assign = cos_cells.argmax(axis=1)
    # probe-boundary margin at n_probe for the query set
    qmask = ids < ANN_N_QUERIES
    qcells = cos_cells[qmask]
    qsrt = np.sort(qcells, axis=1)[:, ::-1]
    assert (qsrt[:, ANN_N_PROBE - 1] - qsrt[:, ANN_N_PROBE]).min() > 1e-6

    mn, mx = M.min(axis=0), M.max(axis=0)
    span = mx - mn
    codes = np.clip(np.floor((M - mn) * 255.0 / span), 0, 255)
    R = mn + (codes + 0.5) * span / 255.0
    rn = R / np.linalg.norm(R, axis=1, keepdims=True)
    qn = M[qmask] / np.linalg.norm(M[qmask], axis=1, keepdims=True)

    got = {
        (r.query_id, r.neighbor_id, r.rnk)
        for r in load_registry()["vector_ann_ivfsq_topk"]
        .fn(spark, SF_DIR)
        .collect()
    }
    want = set()
    for qi, qid in enumerate(ids[qmask]):
        probed = set(np.argsort(-qcells[qi], kind="stable")[:ANN_N_PROBE])
        cand = [
            j
            for j in range(len(ids))
            if assign[j] in probed and ids[j] != qid
        ]
        scores = qn[qi] @ rn[cand].T
        order = sorted(
            zip(scores, [ids[j] for j in cand]),
            key=lambda t: (-t[0], t[1]),
        )
        gaps = np.abs(np.diff([s for s, _ in order[: ANN_K + 10]]))
        assert gaps.min() > 1e-9
        for rk, (_s, nid) in enumerate(order[:ANN_K], start=1):
            want.add((int(qid), int(nid), rk))
    assert got == want


def test_sq8_margins_and_reconstruction_bound(spark):
    """Ranking margins non-degenerate (no two consecutive candidate
    scores within float noise for any query) and the decode error
    bound holds: |x - decode(encode(x))| <= 0.5 * span/255 per
    dimension (the bucket-midpoint guarantee), span > 0 everywhere."""
    from cognitive_score_bigdata_spark.queries.round16_staging import (
        SQ8_N_QUERIES,
    )

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb.vec_id.to_numpy()
    M = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    mn, mx = M.min(axis=0), M.max(axis=0)
    span = mx - mn
    assert (span > 0).all()
    codes = np.clip(np.floor((M - mn) * 255.0 / span), 0, 255)
    R = mn + (codes + 0.5) * span / 255.0
    assert (np.abs(M - R) <= 0.5 * span / 255.0 + 1e-12).all()

    qmask = ids < SQ8_N_QUERIES
    Q = M[qmask]
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    rn = R / np.linalg.norm(R, axis=1, keepdims=True)
    cos = qn @ rn.T
    worst = 1.0
    for qi, qid in enumerate(ids[qmask]):
        scores = np.sort(cos[qi][ids != qid])[::-1][:20]
        worst = min(worst, np.min(np.abs(np.diff(scores))))
    assert worst > 1e-9, worst


def test_merge_commit_null_flag_is_update(spark):
    """A NULL tombstone flag (the unionByName(allowMissingColumns=True)
    shape) must mean UPDATE, never an implicit delete: the matched row
    survives with the source's values."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "n_chars")
        .withColumn("band", F.col("doc_id") % 2)
    )
    path = tempfile.mkdtemp(prefix="csb_merge_null_") + "/docs"
    im.append_commit(
        path,
        lambda: docs.write.mode("append").partitionBy("band").parquet(path),
    )
    upd = docs.filter(F.col("doc_id") % 11 == 4).withColumn(
        "n_chars", F.col("n_chars") + 100
    )
    # NULL flag on every row — as unionByName with a flag-less leg makes
    src = upd.withColumn("__del", F.lit(None).cast("boolean"))
    im.merge_commit(
        spark, path, src, key_cols=["doc_id"], part_col="band",
        delete_col="__del",
    )
    live = im.read_index(spark, path)
    assert live.count() == docs.count()  # nothing deleted
    got = live.filter(F.col("doc_id") % 11 == 4)
    assert got.count() == upd.count()
    assert (
        got.agg(F.sum("n_chars")).collect()[0][0]
        == docs.filter(F.col("doc_id") % 11 == 4)
        .agg(F.sum("n_chars") + 100 * F.count("*")).collect()[0][0]
    )


def test_merge_commit_duplicate_source_keys_raise(spark):
    """The 'at most one row per key' source contract is enforced on
    both location paths (zone-map collected keys; distributed
    aggregate)."""
    import pytest

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "n_chars")
        .withColumn("band", F.col("doc_id") % 2)
    )
    path = tempfile.mkdtemp(prefix="csb_merge_dup_") + "/docs"
    im.append_commit(
        path,
        lambda: docs.write.mode("append").partitionBy("band").parquet(path),
    )
    one = docs.filter(F.col("doc_id") % 13 == 2)
    dup_src = one.unionByName(one.withColumn("n_chars", F.col("n_chars") + 1))
    with pytest.raises(ValueError, match="duplicate keys"):
        im.merge_commit(
            spark, path, dup_src, key_cols=["doc_id"], part_col="band"
        )
    with pytest.raises(ValueError, match="duplicate keys"):
        im.merge_commit(
            spark, path, dup_src, key_cols=["doc_id"], part_col="band",
            locate_cap=0,  # force the distributed dup check
        )
    assert len(im.read_manifest(path)[1]) > 0  # nothing committed


def test_sq8_degenerate_span_raises(spark):
    """A constant dimension (span 0) must fail fast in fit AND encode —
    the alternative is silent NaN/Inf-derived garbage codes."""
    import pytest

    from cognitive_score_bigdata_spark.operators import sq

    vecs = spark.createDataFrame(
        [(i, [float(i), 7.0]) for i in range(4)], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="degenerate dimension"):
        sq.sq8_fit(vecs)
    with pytest.raises(ValueError, match="degenerate dimension"):
        sq.sq8_encode(vecs, [0.0, 7.0], [3.0, 7.0])


def _evolved_fixture(spark, prefix):
    """v1: doc_id-banded documents WITHOUT tokens; v2: evolved append
    carrying tokens (schema committed in the same flip). Fresh per
    test — never the session-cached registry artifact."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "n_chars")
        .withColumn("band", F.col("doc_id") % 2)
    )
    path = tempfile.mkdtemp(prefix=prefix) + "/docs"
    im.append_commit(
        path,
        lambda: docs.write.mode("append").partitionBy("band").parquet(path),
        stats_cols=["doc_id"],
    )
    batch = (
        docs.filter(F.col("doc_id") % 10 == 3)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn("tokens", F.expr("n_chars DIV 5"))
        .withColumn("band", F.col("doc_id") % 2)
    )
    im.append_commit(
        path,
        lambda: batch.write.mode("append").partitionBy("band").parquet(path),
        note="evolved append",
        stats_cols=["doc_id", "tokens"],
        schema_json=batch.schema.json(),
    )
    return path, docs, batch


def test_merge_into_evolved_table(spark):
    """MERGE against a schema-evolved table where the survivors predate
    the column: survivors project tokens as NULL into the replacement
    files, the source's tokens land on its matched/inserted rows, the
    committed schema carries forward through the merge flip, and time
    travel to the pre-evolution snapshot still resolves its OWN
    schema."""
    path, docs, batch = _evolved_fixture(spark, "csb_evomerge_")
    src = (
        docs.filter(F.col("doc_id") % 10 == 7)  # pre-evolution rows
        .withColumn("n_chars", F.col("n_chars") + 9)
        .withColumn("tokens", F.expr("n_chars DIV 5"))
        .withColumn("band", F.col("doc_id") % 2)
    )
    n_upd = src.count()
    im.merge_commit(
        spark, path, src, key_cols=["doc_id"], part_col="band"
    )
    live = im.read_index(spark, path)
    assert "tokens" in live.columns
    # merged rows carry the source's tokens
    got = live.filter(
        (F.col("doc_id") % 10 == 7) & (F.col("doc_id") < 1_000_000)
    )
    assert got.count() == n_upd
    assert got.filter(F.col("tokens").isNull()).count() == 0
    # untouched pre-evolution rows (rewritten as survivors or not)
    # still project NULL tokens
    untouched = live.filter(
        (F.col("doc_id") % 10 != 7) & (F.col("doc_id") < 1_000_000)
    )
    assert untouched.filter(F.col("tokens").isNotNull()).count() == 0
    # the evolved batch is intact
    assert live.filter(F.col("doc_id") >= 1_000_000).count() == batch.count()
    # time travel: the pre-evolution snapshot resolves its own schema
    v1 = im.read_index(spark, path, version=1)
    assert "tokens" not in v1.columns


def test_compact_mixed_schema_partitions(spark):
    """Sort-aware compaction of partitions whose live files disagree on
    schema (pre-evolution files lack tokens): the rewrite projects the
    committed schema (NULL tokens for old rows), content is conserved,
    and stats re-harvest covers every tracked column — files the old
    schema wrote are simply unknown for tokens (never wrongly
    skipped), while the pruned probe stays exact."""
    path, docs, batch = _evolved_fixture(spark, "csb_evocompact_")
    before = im.read_index(spark, path).toPandas()
    res = im.compact_index_parts(
        spark, path, "band", max_files_per_part=1, cluster_col="doc_id",
        parts=[0, 1],  # explicit: 2 files/band sits at the no-op threshold
    )
    assert res  # both bands rewrote
    after = im.read_index(spark, path).toPandas()
    key = lambda df: sorted(
        map(tuple, df[["doc_id", "band"]].itertuples(index=False))
    )
    assert key(after) == key(before)  # conservation
    assert after["tokens"].notna().sum() == len(batch.toPandas())
    # tracked-column stats re-harvested on the compacted files: a
    # tokens range prune + caller filter equals the plain filter
    doc = im._read_manifest_doc(path)
    stats = doc.get("stats", {})
    compacted = [f for f in doc["files"] if "compact-v" in f]
    assert compacted
    assert any("tokens" in stats.get(f, {}) for f in compacted)
    lo = int(batch.agg(F.min("tokens")).collect()[0][0])
    pruned = im.read_index(
        spark, path, prune=("tokens", lo, None)
    ).filter(F.col("tokens") >= lo)
    want = im.read_index(spark, path).filter(F.col("tokens") >= lo)
    assert pruned.count() == want.count() == batch.count()
