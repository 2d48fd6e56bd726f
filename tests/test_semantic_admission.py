"""Streaming semantic-dedup admission (streaming/semantic_admission.py):
end-to-end availableNow drive, admitted-becomes-corpus across batches,
replay fence, crash-window exactly-once — the §4.1 protocol battery
applied to the admission gate."""

from __future__ import annotations

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.index_manifest import (
    read_index,
    read_manifest_meta,
    vacuum_index,
)
from cognitive_score_bigdata_spark.queries.round12 import (
    SEED_MAX,
    SEED_MOD,
    SEED_REM,
)
from cognitive_score_bigdata_spark.streaming.semantic_admission import (
    admit_stream_batch,
    build_semantic_index,
)
from tests.conftest import SF_DIR


def _base_and_seeds(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    seeds = emb.filter(
        (F.col("vec_id") % SEED_MOD == SEED_REM) & (F.col("vec_id") < SEED_MAX)
    )
    return emb, seeds


def _fresh(spark, tmp_path, corpus_filter):
    emb, seeds = _base_and_seeds(spark)
    path = str(tmp_path / "semidx")
    build_semantic_index(emb.filter(corpus_filter), seeds, path)
    return emb, path


def test_batch_admission_rejects_dups_admits_novel(spark, tmp_path):
    """Batch 0 = exact copies of corpus vectors (re-id'd) + novel
    vectors: copies rejected, novel admitted AND committed."""
    emb, path = _fresh(spark, tmp_path, F.col("vec_id") % 2 == 0)
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding"
    )
    novel = emb.filter(F.col("vec_id") % 2 == 1).filter(
        F.col("vec_id") % 7 == 1
    )
    batch = copies.unionByName(novel)
    n_copies, n_novel = copies.count(), novel.count()

    stats = admit_stream_batch(spark, batch, path, batch_id=0)
    assert stats["rejected"] >= n_copies  # all exact copies caught
    assert stats["admitted"] + stats["rejected"] == n_copies + n_novel
    committed = {
        r.neighbor_id for r in read_index(spark, path).select("neighbor_id").collect()
    }
    assert not any(v >= 5_000_000 for v in committed)
    # every admitted vector is committed exactly once
    novel_ids = {r.vec_id for r in novel.collect()}
    admitted_ids = committed & novel_ids
    assert len(admitted_ids) == stats["admitted"]


def test_admitted_becomes_corpus_for_later_batches(spark, tmp_path):
    """A duplicate of an ADMITTED vector arriving in a later batch is
    rejected — the state the gate maintains is the point."""
    emb, path = _fresh(spark, tmp_path, F.col("vec_id") % 2 == 0)
    novel = emb.filter(F.col("vec_id") == 31)
    assert admit_stream_batch(spark, novel, path, 0)["admitted"] == 1
    echo = novel.select((F.col("vec_id") + 9_000_000).alias("vec_id"), "embedding")
    stats = admit_stream_batch(spark, echo, path, 1)
    assert stats == {"admitted": 0, "rejected": 1, "replayed": False}


def test_within_batch_dups_admit_smallest_only(spark, tmp_path):
    """Two copies of the same novel vector in ONE batch: exactly one
    (the smaller id) is admitted."""
    emb, path = _fresh(spark, tmp_path, F.col("vec_id") % 2 == 0)
    v = emb.filter(F.col("vec_id") == 33)
    batch = v.unionByName(
        v.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    stats = admit_stream_batch(spark, batch, path, 0)
    assert stats["admitted"] == 1 and stats["rejected"] == 1
    committed = {
        r.neighbor_id for r in read_index(spark, path).select("neighbor_id").collect()
    }
    assert 33 in committed and 1_000_033 not in committed


def test_replay_is_fenced_and_crash_window_replays_once(spark, tmp_path):
    """At-least-once semantics: a committed batch id is a no-op on
    replay; a crash BEFORE the manifest flip leaves the fence
    unrecorded and the replay commits exactly once (appended files
    from the crashed attempt are vacuum-sweepable garbage)."""
    emb, path = _fresh(spark, tmp_path, F.col("vec_id") % 2 == 0)
    novel = emb.filter(F.col("vec_id").isin(35, 37))

    # crash between the physical append and the flip
    try:
        admit_stream_batch(
            spark, novel, path, 0,
            _before_publish=lambda: (_ for _ in ()).throw(RuntimeError("crash")),
        )
    except RuntimeError:
        pass
    assert read_manifest_meta(path).get("batch_ids", []) == []
    committed = {
        r.neighbor_id for r in read_index(spark, path).select("neighbor_id").collect()
    }
    assert 35 not in committed  # nothing committed by the crashed attempt

    # replay commits exactly once, second replay is a no-op
    s1 = admit_stream_batch(spark, novel, path, 0)
    assert s1["admitted"] == 2 and not s1["replayed"]
    s2 = admit_stream_batch(spark, novel, path, 0)
    assert s2["replayed"]
    counts = (
        read_index(spark, path)
        .filter(F.col("neighbor_id").isin(35, 37))
        .groupBy("neighbor_id")
        .count()
        .collect()
    )
    assert {r["count"] for r in counts} == {1}
    vacuum_index(path, keep_versions=1)  # sweeps the crashed attempt's files
    counts2 = (
        read_index(spark, path)
        .filter(F.col("neighbor_id").isin(35, 37))
        .groupBy("neighbor_id")
        .count()
        .collect()
    )
    assert {r["count"] for r in counts2} == {1}


def test_drop_dir_stream_end_to_end(spark, tmp_path):
    """availableNow drain through foreachBatch: duplicates (of corpus
    AND of earlier-admitted vectors) rejected, novel admitted exactly
    once, regardless of micro-batch split."""
    emb, path = _fresh(spark, tmp_path, F.col("vec_id") % 2 == 0)
    drop = tmp_path / "drop"
    # b0: novel odds; b1: copies of corpus evens; b2: echoes of b0's novels
    b0 = emb.filter(F.col("vec_id") % 2 == 1).filter(F.col("vec_id") < 40)
    b1 = emb.filter(F.col("vec_id") % 2 == 0).filter(
        F.col("vec_id") < 40
    ).select((F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding")
    b2 = b0.select((F.col("vec_id") + 6_000_000).alias("vec_id"), "embedding")
    for i, b in enumerate((b0, b1, b2)):
        b.coalesce(1).write.parquet(str(drop / f"b{i}"))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: admit_stream_batch(spark, b, path, bid)
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    committed = {
        r.neighbor_id for r in read_index(spark, path).select("neighbor_id").collect()
    }
    novel_ids = {r.vec_id for r in b0.collect()}
    assert novel_ids <= committed  # novels admitted
    assert not any(v >= 5_000_000 for v in committed)  # all dups rejected


def test_stream_to_training_set_pipeline(spark, tmp_path):
    """The composed ingestion-to-training-set path (VERDICT r12 item 5):
    availableNow stream -> fenced admission -> ensemble dedup over the
    ADMITTED corpus -> leakage-safe splits, as one call chain.

    Pins, per stage and across them:
    - the fence recorded every micro-batch exactly once;
    - rejected vectors (copies of corpus AND echoes of earlier-admitted
      novels) reach NO split — the training set never sees them;
    - every admitted document lands in exactly one split;
    - no dedup cluster straddles a split (the leakage property,
      now holding over streamed-in content, not just batch corpora)."""
    from cognitive_score_bigdata_spark.streaming.curation_pipeline import (
        admitted_training_splits,
        drain_admission_stream,
    )

    emb, path = _fresh(spark, tmp_path, F.col("vec_id") % 2 == 0)
    drop = tmp_path / "drop"
    b0 = emb.filter(F.col("vec_id") % 2 == 1).filter(F.col("vec_id") < 40)
    b1 = (
        emb.filter(F.col("vec_id") % 2 == 0)
        .filter(F.col("vec_id") < 40)
        .select((F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding")
    )
    b2 = b0.select((F.col("vec_id") + 6_000_000).alias("vec_id"), "embedding")
    for i, b in enumerate((b0, b1, b2)):
        b.coalesce(1).write.parquet(str(drop / f"b{i}"))

    drain_admission_stream(
        spark, str(drop / "*"), path, str(tmp_path / "chk")
    )
    assert read_manifest_meta(path).get("batch_ids") == [0, 1, 2]

    splits = admitted_training_splits(spark, SF_DIR, path).toPandas()
    # rejected content reaches no split
    assert (splits["doc_id"] < 5_000_000).all()
    # admitted novel docs are in the training set; each doc exactly once
    novel_ids = {r.vec_id for r in b0.collect()}
    assert novel_ids <= set(splits["doc_id"])
    assert splits["doc_id"].is_unique
    # corpus evens (the initial index) are in too
    assert len(splits) >= len(novel_ids)
    # the leakage property over the streamed-in corpus
    spans = splits.groupby("cluster_id")["split"].nunique()
    assert (spans == 1).all()
    assert set(splits["split"]) <= {"train", "val", "test"}


def test_probe_reads_only_batch_cells(spark, tmp_path):
    """Cell pruning (r13): a batch occupying ONE cell must scan only
    that cell's committed files — metadata-level part_values pruning
    plus the semi-join mean other cells neither read nor shuffle."""
    import os as _os

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_manifest,
    )
    from cognitive_score_bigdata_spark.queries.round13_staging import (
        semantic_probe_pairs,
    )
    from cognitive_score_bigdata_spark.streaming.semantic_admission import (
        _assign_batch,
    )

    emb, path = _fresh(spark, tmp_path, F.col("vec_id") % 2 == 0)
    one = emb.filter(F.col("vec_id") == 2).select(
        (F.col("vec_id") + 7_000_000).alias("vec_id"), "embedding"
    )
    cand = _assign_batch(spark, one, path).localCheckpoint()
    cells = [r.cell for r in cand.select("cell").distinct().collect()]
    assert len(cells) == 1
    corpus = read_index(spark, path, part_values=cells)
    opened = {
        _os.path.relpath(f.replace("file:", ""), path)
        for f in corpus.inputFiles()
    }
    committed = set(read_manifest(path)[1])
    in_cell = {f for f in committed if f.startswith(f"cell={cells[0]}/")}
    assert opened <= in_cell and opened and in_cell < committed
    # and the pruned probe still finds the duplicate
    pairs = semantic_probe_pairs(corpus, cand, 0.95).toPandas()
    assert (pairs["new_id"] == 7_000_002).all() and len(pairs) >= 1
