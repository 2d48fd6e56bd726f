"""Round-17 staged queries (queries/round17_staging.py): oracle parity
plus the pins each row exists to demonstrate — the md5 incremental
probe recovers every planted clone at est 1.0 against the PERSISTED
banded index without corpus-side recompute, and the composed
stream→admission→ensemble→splits pipeline records the fence, rejects
every echo, and yields a leakage-safe admitted training set."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import TESTDATA_TABLES, load_table
from cognitive_score_bigdata_spark.queries import load_registry
from cognitive_score_bigdata_spark.queries.round17_staging import (
    ADMIT_INIT_MOD,
    ECHO1_SHIFT,
    INCR_MOD,
    INCR_SHIFT,
    _admitted_index_path,
    _md5_index_path,
)
from tests.conftest import SF_DIR, assert_frames_match

NAMES = [
    "dedup_incremental_newbatch",
    "curation_stream_training_set",
    "scan_merge_evolved_agg",
    "vector_ann_bq_topk",
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


def test_incremental_recovers_planted_clones(spark):
    """Every re-ingested clone must pair with its source at exactly
    est_jaccard 1.0 (identical text → identical signature → identical
    band keys), and every reported pair clears the 0.8 threshold."""
    reg = load_registry()
    got = reg["dedup_incremental_newbatch"].fn(spark, SF_DIR).toPandas()
    docs = load_table(spark, SF_DIR, "documents")
    planted = {
        r.doc_id + INCR_SHIFT
        for r in docs.filter(F.col("doc_id") % INCR_MOD == 0)
        .select("doc_id")
        .collect()
    }
    exact = got[got["est_jaccard"] == 1.0]
    self_pairs = set(
        exact[exact["new_id"] == exact["corpus_id"] + INCR_SHIFT]["new_id"]
    )
    assert planted <= self_pairs
    assert (got["est_jaccard"] >= 0.8).all()


def test_incremental_index_is_persisted_and_band_partitioned(spark):
    """The standing-index contract: the probe joins a PERSISTED banded
    table (hive-partitioned by band, manifest-committed, resolved via
    read_index), not a recomputed one — a band filter must open only
    that band's files."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_index,
        read_manifest,
    )

    path = _md5_index_path(spark, SF_DIR)
    assert read_manifest(path) is not None  # committed, not a bare dir
    banded = read_index(spark, path)
    one = banded.filter(F.col("band") == 2)
    # inputFiles() reports the pre-pruning relation; the executed scan
    # (input_file_name over the filtered plan) shows what was read
    opened = {
        r[0]
        for r in one.select(F.input_file_name()).distinct().collect()
    }
    assert opened and all("band=2" in f for f in opened)
    assert len(set(banded.select("band").distinct().toPandas()["band"])) == 4


def test_incremental_index_absorb_and_compact_conserve_probe(spark):
    """The §4.1 lifecycle on the md5 incremental index (VERDICT r14
    item 4): build the standing index from 2/3 of the corpus, absorb
    the remaining third with round10's append_commit merge (no old
    partition read), compact the over-threshold band partitions — and
    after every step the SAME incremental probe over read_index returns
    the full-build answer (content conserved through absorb + compact;
    the probe row's hash-green oracle is against the full build)."""
    import tempfile

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        compact_index_parts,
        read_index,
        read_manifest,
    )
    from cognitive_score_bigdata_spark.queries.round10 import (
        md5_banded_rows,
        merge_into_index,
    )
    from cognitive_score_bigdata_spark.queries.round17_staging import (
        INCR_MOD,
        INCR_SHIFT,
        INCR_THRESHOLD,
    )
    from cognitive_score_bigdata_spark.io import fan_out
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        _list_data_files,
        publish_manifest,
    )
    from cognitive_score_bigdata_spark.queries.dedup_md5 import (
        MH_K,
        md5_minhash_banded,
        md5_minhash_signatures,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    path = tempfile.mkdtemp(prefix="csb_md5_lc_") + "/idx"
    snap1 = docs.filter(F.col("doc_id") % 3 != 2)
    snap2 = docs.filter(F.col("doc_id") % 3 == 2)
    md5_banded_rows(fan_out(snap1)).write.partitionBy("band").parquet(path)
    publish_manifest(path, _list_data_files(path), note="initial build")

    def probe():
        new_docs = docs.filter(F.col("doc_id") % INCR_MOD == 0).select(
            (F.col("doc_id") + INCR_SHIFT).alias("doc_id"), "text"
        )
        new_sig = md5_minhash_signatures(fan_out(new_docs)).localCheckpoint(
            eager=False
        )
        new_banded = md5_minhash_banded(new_sig).select(
            F.col("doc_id").alias("new_id"), "band", "bkey"
        )
        idx = read_index(spark, path)
        cand = (
            idx.select("doc_id", "band", "bkey")
            .join(F.broadcast(new_banded), ["band", "bkey"])
            .select("new_id", F.col("doc_id").alias("corpus_id"))
            .distinct()
        )
        sa = new_sig.select(
            F.col("doc_id").alias("new_id"),
            *[F.col(f"m{i}").alias(f"a{i}") for i in range(MH_K)],
        )
        sb = idx.filter(F.col("band") == 0).select(
            F.col("doc_id").alias("corpus_id"),
            *[F.col(f"m{i}").alias(f"b{i}") for i in range(MH_K)],
        )
        agree = sum(
            F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            for i in range(MH_K)
        )
        rows = (
            cand.join(F.broadcast(sa), "new_id")
            .join(sb, "corpus_id")
            .select(
                "new_id",
                "corpus_id",
                (agree.cast("double") / F.lit(float(MH_K))).alias("est"),
            )
            .filter(F.col("est") >= INCR_THRESHOLD)
            .collect()
        )
        return {(r.new_id, r.corpus_id, round(r.est, 9)) for r in rows}

    # the full-build answer, from the session artifact's committed view
    full = {
        (r.new_id, r.corpus_id, round(r.est_jaccard, 9))
        for r in load_registry()["dedup_incremental_newbatch"]
        .fn(spark, SF_DIR)
        .collect()
    }
    partial = probe()
    assert partial < full  # snap2's sources are missing, nothing extra
    merge_into_index(snap2, path)
    assert probe() == full  # absorb conserves the probe
    v_before = read_manifest(path)[0]
    touched = compact_index_parts(spark, path, "band", max_files_per_part=1)
    assert touched and read_manifest(path)[0] == v_before + 1
    assert probe() == full  # compaction conserves the probe


def test_curation_fixture_postconditions(spark):
    """The drain recorded exactly batches [0, 1, 2]; no echo was
    admitted; the committed corpus is the initial evens plus (a subset
    of) the novel batch."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_index,
        read_manifest_meta,
    )

    path = _admitted_index_path(spark, SF_DIR)
    assert read_manifest_meta(path).get("batch_ids") == [0, 1, 2]
    ids = {
        r.neighbor_id
        for r in read_index(spark, path).select("neighbor_id").collect()
    }
    assert max(ids) < ECHO1_SHIFT
    assert all(i % ADMIT_INIT_MOD in (0, 1) for i in ids)
    emb = load_table(spark, SF_DIR, "embeddings")
    evens = {
        r.vec_id
        for r in emb.filter(
            F.col("vec_id") % ADMIT_INIT_MOD == 0
        ).collect()
    }
    assert evens <= ids  # the initial corpus is never evicted


def test_curation_splits_are_leakage_safe(spark):
    """Every admitted document lands in exactly one split, rejected
    content reaches no split, and no dedup cluster straddles splits."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_index,
    )

    reg = load_registry()
    splits = reg["curation_stream_training_set"].fn(spark, SF_DIR).toPandas()
    assert splits["doc_id"].is_unique
    assert set(splits["split"]) <= {"train", "val", "test"}
    path = _admitted_index_path(spark, SF_DIR)
    admitted = {
        r.neighbor_id
        for r in read_index(spark, path).select("neighbor_id").collect()
    }
    assert set(splits["doc_id"]) == admitted
    spans = splits.groupby("cluster_id")["split"].nunique()
    assert (spans == 1).all()


def test_merge_evolved_artifact_structural_pins(spark):
    """The MERGE × evolution seam at the artifact level: the committed
    schema (with tokens) carries forward through the merge flip, time
    travel to the pre-evolution snapshot resolves its own schema, the
    merge touched only the bands the semantics name, and every
    untouched band's committed files survive byte-identical."""
    import json

    import cognitive_score_bigdata_spark.operators.index_manifest as im
    from cognitive_score_bigdata_spark.queries.round16_staging import N_BANDS
    from cognitive_score_bigdata_spark.queries.round17_staging import (
        EM_INS_MOD,
        EM_INS_REM,
        EM_UPD_MOD,
        EM_UPD_REM,
        evolved_merge_artifact,
    )

    path = evolved_merge_artifact(spark, SF_DIR)
    # v1 pre-evolution, v2 evolved append, v3 merge
    assert im.read_manifest(path)[0] == 3
    v3 = im._read_manifest_doc(path)
    assert "tokens" in [f["name"] for f in json.loads(v3["schema"])["fields"]]
    assert "tokens" not in (im._read_manifest_doc(path, version=1).get("schema") or "")
    assert "tokens" not in im.read_index(spark, path, version=1).columns

    docs = load_table(spark, SF_DIR, "documents")
    touched = {
        r.b
        for r in docs.filter(
            (F.col("doc_id") % EM_UPD_MOD == EM_UPD_REM)
            | (F.col("doc_id") % EM_INS_MOD == EM_INS_REM)
        )
        .select((F.col("doc_id") % N_BANDS).alias("b"))
        .distinct()
        .collect()
    }
    pre = set(im._read_manifest_doc(path, version=2)["files"])
    post = set(v3["files"])
    moved = {f.split("/")[0] for f in (pre - post) | (post - pre)}
    assert moved == {f"band={b}" for b in touched}
    untouched = {f for f in pre if f.split("/")[0] not in moved}
    assert untouched and untouched <= post


def test_bq_oracle_parity_and_recall(spark):
    """The BQ row hash-matches its oracle (covered in NAMES parity too)
    and the sign-bit tier is USEFUL: recall@10 of the Hamming-cut +
    rescore pipeline against brute-force cosine clears a measured
    floor on the random test corpus."""
    reg = load_registry()
    got = reg["vector_ann_bq_topk"].fn(spark, SF_DIR).toPandas()
    exact = reg["vector_cosine_topk"].fn(spark, SF_DIR).toPandas()
    assert len(got) == len(exact) == 50
    hits = 0
    for q in range(5):
        g = set(got[got.query_id == q]["neighbor_id"])
        e = set(exact[exact.query_id == q]["neighbor_id"])
        hits += len(g & e)
    recall = hits / 50
    assert recall >= 0.3, recall  # sign bits of random 64-d vectors


def test_bq_candidate_margins(spark):
    """Cross-engine parity of the BQ rescore depends on float-identical
    cosine ORDERING among each query's Hamming survivors — not just the
    global brute-force top-20 the SQ8 margin test pins (ADVICE r14).
    Pin: for every query, the minimum adjacent cosine gap among its
    full top-50 Hamming candidate set (deterministic hdist/id
    tiebreak, same cut as the query) clears float noise, so no
    candidate pair can flip ranks between Spark and DuckDB."""
    import numpy as np

    from cognitive_score_bigdata_spark.queries.round17_staging import (
        BQ_CANDIDATES,
        BQ_QUERIES,
    )

    emb = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = emb.vec_id.to_numpy()
    M = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    bits = (M > 0).astype(np.uint8)  # sign-bit code, dim order
    n = M / np.linalg.norm(M, axis=1, keepdims=True)
    worst = 1.0
    for qi in range(BQ_QUERIES):
        q_row = int(np.flatnonzero(ids == qi)[0])
        hdist = (bits ^ bits[q_row]).sum(axis=1)
        order = sorted(
            (int(hdist[j]), int(ids[j]), j)
            for j in range(len(ids))
            if ids[j] != qi
        )
        cand_rows = [j for _, _, j in order[:BQ_CANDIDATES]]
        scores = np.sort(n[cand_rows] @ n[q_row])[::-1]
        worst = min(worst, float(np.min(np.abs(np.diff(scores)))))
    assert worst > 1e-9, worst
