"""Streaming corpus ingest: quality filter + watermarked content dedup
must drop in-horizon duplicates across micro-batches, keep the first
occurrence, and filter rule-failing documents — all through a real
availableNow run with checkpointing."""

from __future__ import annotations

import json
import os

from cognitive_score_bigdata_spark.streaming.corpus import run_corpus_ingest

GOOD = "the quick brown fox jumps over the lazy dog near the river bank today"
OTHER = "completely different document text with plenty of distinct tokens here now"
BAD = "tiny"  # fails the Gopher word-count lower bound


def _write_batch(input_dir: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(input_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_dedup_and_quality_filter(spark, tmp_path):
    input_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    _write_batch(
        input_dir,
        "b1.json",
        [
            {"doc_id": 1, "text": GOOD, "source": "a", "crawl_ts": "2024-01-01T10:00:00"},
            {"doc_id": 2, "text": GOOD, "source": "b", "crawl_ts": "2024-01-01T10:00:30"},
            {"doc_id": 3, "text": BAD, "source": "a", "crawl_ts": "2024-01-01T10:00:40"},
        ],
    )
    run_corpus_ingest(spark, input_dir, out_dir, ckpt).awaitTermination(120)

    # second run (fresh files, same checkpoint): an in-horizon re-crawl
    # of GOOD must still be dropped via checkpointed digest state
    _write_batch(
        input_dir,
        "b2.json",
        [
            {"doc_id": 4, "text": GOOD, "source": "c", "crawl_ts": "2024-01-01T10:02:00"},
            {"doc_id": 5, "text": OTHER, "source": "c", "crawl_ts": "2024-01-01T10:02:10"},
        ],
    )
    run_corpus_ingest(spark, input_dir, out_dir, ckpt).awaitTermination(120)

    rows = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert set(rows) == {1, 5}, rows  # 2,4 = dup; 3 = quality-failed
    assert rows[1]["text_md5"] is not None
    assert rows[5]["text"] == OTHER


def test_streaming_dedup_probe_quarantines_neardups(spark, tmp_path):
    """Arriving docs probe the persisted corpus index: a copy of an
    indexed document is quarantined (with its matched corpus id in the
    dup log), a fresh document reaches the clean lake."""
    import os

    import pyspark.sql.functions as F

    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.operators.dedup import (
        save_minhash_index,
    )
    from cognitive_score_bigdata_spark.streaming.corpus import (
        run_streaming_dedup_probe,
    )
    from tests.conftest import SF_DIR

    corpus = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    index_path = str(tmp_path / "idx")
    save_minhash_index(corpus, index_path)

    copy_text = corpus.filter(F.col("doc_id") == 3).collect()[0]["text"]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    spark.createDataFrame(
        [
            (9_000_003, copy_text, "web", "2024-01-01T10:00:00"),
            (
                9_000_004,
                "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii",
                "web",
                "2024-01-01T10:00:01",
            ),
        ],
        "doc_id long, text string, source string, crawl_ts string",
    ).coalesce(1).write.mode("overwrite").json(in_dir)

    clean_dir = str(tmp_path / "clean")
    duplog_dir = str(tmp_path / "duplog")
    q = run_streaming_dedup_probe(
        spark,
        in_dir,
        index_path,
        clean_dir,
        duplog_dir,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    clean_ids = {r["doc_id"] for r in spark.read.parquet(clean_dir).collect()}
    assert clean_ids == {9_000_004}
    dup = spark.read.parquet(duplog_dir).collect()
    assert any(
        r["new_id"] == 9_000_003 and r["corpus_id"] == 3 for r in dup
    )


def test_streaming_dedup_probe_replay_idempotent(spark, tmp_path):
    """Re-running the probe over the same backlog with a FRESH
    checkpoint (the worst-case replay: every epoch reprocessed) must
    leave the clean lake and dup log with the same contents — the
    dynamic epoch-partition overwrite guarantees exactly-once output
    on plain parquet."""
    import os

    import pyspark.sql.functions as F

    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.operators.dedup import (
        save_minhash_index,
    )
    from cognitive_score_bigdata_spark.streaming.corpus import (
        run_streaming_dedup_probe,
    )
    from tests.conftest import SF_DIR

    corpus = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    index_path = str(tmp_path / "idx")
    save_minhash_index(corpus, index_path)

    copy_text = corpus.filter(F.col("doc_id") == 5).collect()[0]["text"]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    spark.createDataFrame(
        [(8_000_005, copy_text, "web", "2024-01-01T10:00:00")],
        "doc_id long, text string, source string, crawl_ts string",
    ).coalesce(1).write.mode("overwrite").json(in_dir)

    clean_dir = str(tmp_path / "clean")
    duplog_dir = str(tmp_path / "duplog")
    for run in (1, 2):  # second run = full replay with a new checkpoint
        q = run_streaming_dedup_probe(
            spark,
            in_dir,
            index_path,
            clean_dir,
            duplog_dir,
            str(tmp_path / f"ckpt{run}"),
        )
        q.awaitTermination(300)

    dup = spark.read.parquet(duplog_dir).collect()
    assert len(dup) == len(
        {(r["new_id"], r["corpus_id"]) for r in dup}
    ), "replay duplicated dup-log rows"
    assert any(r["new_id"] == 8_000_005 and r["corpus_id"] == 5 for r in dup)
