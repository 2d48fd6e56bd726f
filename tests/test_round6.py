"""Round-6 training-data curation operators: deterministic behavior
pins beyond the oracle hash-match (which tests/test_oracle_parity.py
already applies to every registered query)."""

from __future__ import annotations

import json
import os
import time as _time

import pyspark.sql.functions as F
from pyspark.sql import Window

from tests.conftest import SF_DIR


def test_admission_stream_counter_carries_across_batches(spark, tmp_path):
    """The per-source admitted counter must persist across micro-batches:
    with cap=3 and a 2-then-2 file split for one source, batch 2 admits
    exactly ONE more doc (3-2), not cap-fresh."""
    from cognitive_score_bigdata_spark.streaming.admission import (
        admission_stream,
    )

    files = [
        [(1, "a"), (2, "a"), (10, "b")],
        [(3, "a"), (4, "a"), (11, "b")],
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, batch in enumerate(files):
        p = in_dir / f"part-{i}.json"
        p.write_text(
            "\n".join(
                json.dumps({"doc_id": d, "source": s}) for d, s in batch
            )
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        _time.sleep(0.05)
    got = admission_stream(
        spark,
        str(in_dir),
        str(tmp_path / "ckpt"),
        query_name="csb_admit_test_carry",
        cap=3,
        max_files_per_trigger=1,
    )
    admitted = {
        (r["source"], r["doc_id"]) for r in got.collect()
    }
    assert admitted == {
        ("a", 1), ("a", 2), ("a", 3),  # 2 from batch 1 + 1 from batch 2
        ("b", 10), ("b", 11),  # under cap throughout
    }


def test_admission_stream_overfull_single_batch(spark, tmp_path):
    """A single batch larger than the remaining room admits exactly the
    doc_id-smallest `room` rows and clamps the counter at cap."""
    from cognitive_score_bigdata_spark.streaming.admission import (
        admission_stream,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "part-0.json").write_text(
        "\n".join(
            json.dumps({"doc_id": d, "source": "x"})
            for d in (5, 3, 9, 1, 7)
        )
    )
    got = admission_stream(
        spark,
        str(in_dir),
        str(tmp_path / "ckpt"),
        query_name="csb_admit_test_overfull",
        cap=2,
    )
    assert {r["doc_id"] for r in got.collect()} == {1, 3}


def test_domain_quota_two_level_equals_naive_window(spark):
    """The skew-safe two-level selection must be row-identical to the
    naive single window over the group key — on a SKEWED synthetic
    (one giant group, several tiny ones), not just the test corpus."""
    from cognitive_score_bigdata_spark.queries.round6 import (
        QUOTA_K,
        sample_domain_quota,
    )

    rows = [(i, "big") for i in range(500)] + [
        (1000 + i, f"tiny{i % 3}") for i in range(9)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    df.createOrReplaceTempView("csb_quota_skewtest")
    # naive reference: one window over source
    naive = (
        df.select(
            "doc_id",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("mk"),
        )
        .withColumn(
            "rn",
            F.row_number()
            .over(Window.partitionBy("source").orderBy("mk", "doc_id"))
            .cast("bigint"),
        )
        .filter(F.col("rn") <= QUOTA_K)
        .select("doc_id", "source", "rn")
    )
    # two-level path: run the registered query body against a temp
    # parquet dir so load_table resolves the same rows
    import tempfile

    d = tempfile.mkdtemp(prefix="csb_quota_eq_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = sample_domain_quota(spark, d)
    assert sorted(got.collect()) == sorted(naive.collect())


def test_contamination_flags_planted_copy(spark, tmp_path):
    """A doc that shares a long span with a benchmark (src0) doc must be
    flagged; unrelated docs must not."""
    from cognitive_score_bigdata_spark.queries.round6 import (
        corpus_contamination_4gram,
    )

    span = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"benchmark question {span} answer choice", "en", "src0", 1),
        (1, f"innocent words about nothing shared at all here", "en",
         "src1", 1),
        (2, f"leaked copy contains {span} verbatim inside", "en", "src2", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    d = tmp_path / "corpus"
    d.mkdir()
    df.write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {
        r["doc_id"]: r["n_shared"]
        for r in corpus_contamination_4gram(spark, str(d)).collect()
    }
    assert 2 in got and got[2] >= 2  # the planted leak is flagged
    assert 1 not in got  # the innocent doc is not


def test_contamination_benchmark_side_broadcasts(spark):
    """Scale pin: the benchmark gram set must join as a broadcast —
    a shuffle on the full corpus gram stream is the 100 TB failure
    mode."""
    from cognitive_score_bigdata_spark.queries.round6 import (
        corpus_contamination_4gram,
    )

    plan = corpus_contamination_4gram(
        spark, SF_DIR
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_signals_detect_repetitive_doc(spark, tmp_path):
    """A doc of one repeated token must score ~1.0 top-token fraction
    and ~1.0 dup-2gram fraction; a all-distinct doc scores the
    opposite ends."""
    from cognitive_score_bigdata_spark.queries.round6 import (
        quality_repetition_signals,
    )

    rows = [
        (0, " ".join(["spam"] * 50), "en", "spammy", 1),
        (1, " ".join(f"w{i}" for i in range(50)), "en", "clean", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    d = tmp_path / "corpus"
    d.mkdir()
    df.write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {
        r["source"]: r
        for r in quality_repetition_signals(spark, str(d)).collect()
    }
    assert got["spammy"]["avg_toptok_micro"] == 1_000_000
    assert got["spammy"]["avg_dup2g_micro"] > 900_000
    assert got["clean"]["avg_toptok_micro"] == 20_000  # 1/50
    assert got["clean"]["avg_dup2g_micro"] == 0
    assert got["clean"]["avg_ttr_micro"] == 1_000_000


def test_mix_rebalance_weights_flatten_to_uniform(spark):
    """weight * share must equal the uniform target (up to integer
    truncation): sum over langs of n_docs * weight ~= total."""
    from cognitive_score_bigdata_spark.queries.round6 import (
        corpus_mix_rebalance,
    )

    rows = corpus_mix_rebalance(spark, SF_DIR).collect()
    total = sum(r["n_docs"] for r in rows)
    n_langs = len(rows)
    for r in rows:
        # n_docs * weight_micro / 1e6 ~= total / n_langs
        resampled = r["n_docs"] * r["weight_micro"] // 1_000_000
        target = total // n_langs
        assert abs(resampled - target) <= max(2, target // 100)


def test_runtime_bloom_join_plan_and_conf_hygiene(spark):
    """scan_runtime_bloom_join must (a) inject a bloom_filter_agg on
    the dimension side and a might_contain probe into the fact scan,
    and (b) restore the session confs it force-sets — a registry query
    must not leak state into subsequent queries."""
    from cognitive_score_bigdata_spark.queries.round6 import (
        scan_runtime_bloom_join,
    )

    before = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold",
        )
    }
    out = scan_runtime_bloom_join(spark, SF_DIR)
    after = {k: spark.conf.get(k) for k in before}
    assert after == before, "session confs leaked"
    assert out.count() > 0
    # the checkpointed plan was chosen under the forced confs; re-plan
    # the same query shape under them to pin the bloom injection
    import pyspark.sql.functions as F

    from cognitive_score_bigdata_spark.io import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold",
        "0",
    )
    try:
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        plan = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_linestatus")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        for k, v in before.items():
            spark.conf.set(k, v)
    assert "bloom_filter_agg" in plan, plan[:1500]
    assert "might_contain" in plan


def test_cms_one_sided_error_and_merge_semantics(spark):
    """Count-Min guarantees est >= exact for every queried item (cells
    only over-count on collisions, never under) — the property that
    makes the sketch safe for threshold filters at scale."""
    from cognitive_score_bigdata_spark.queries.round6 import (
        sketch_cms_md5_tokens,
    )

    rows = sketch_cms_md5_tokens(spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r["cms_est"] >= r["exact_count"] for r in rows)


def test_curation_batch_queries_stay_jvm_side(spark):
    """Scale pin: the batch curation gates are pure Catalyst plans —
    no BatchEvalPython / ArrowEvalPython stage anywhere. Text analysis
    in the hot path must not silently grow a per-row Python stage."""
    from cognitive_score_bigdata_spark.queries import load_registry

    reg = load_registry()
    for name in (
        "corpus_contamination_4gram",
        "sample_domain_quota",
        "quality_repetition_signals",
        "corpus_mix_rebalance",
        "events_streak_islands",
        "market_rule_lift",
        "sketch_cms_md5_tokens",
    ):
        plan = (
            reg[name]
            .fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan, f"{name} grew a Python stage"


def test_counter_v2_transform_with_state(spark, tmp_path):
    """Spark 4 state API v2 (transformWithStateInPandas + ValueState):
    running per-user counters accumulate across micro-batches and
    MAX(running) per key equals the batch COUNT(*). Gated on
    google.protobuf — the v2 state-server protocol requires it and
    this container does not ship it (same env-gate class as the live
    Kafka/JDBC round trips); the operator activates unchanged on any
    standard Spark 4 distribution."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")

    from cognitive_score_bigdata_spark.streaming.counter_v2 import (
        counter_stream,
    )

    files = [[(1, 1), (1, 2), (2, 10)], [(1, 3), (2, 11)]]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, batch in enumerate(files):
        p = in_dir / f"p{i}.json"
        p.write_text(
            "\n".join(
                json.dumps({"user_id": u, "event_id": e}) for u, e in batch
            )
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        _time.sleep(0.05)
    got = counter_stream(
        spark,
        str(in_dir),
        str(tmp_path / "ckpt"),
        query_name="csb_tws_test",
        max_files_per_trigger=1,
    )
    final: dict = {}
    for r in got.collect():
        final[r["user_id"]] = max(final.get(r["user_id"], 0), r["running"])
    assert final == {1: 3, 2: 2}


def test_orc_scan_is_vectorized_with_pushdown(spark):
    """scan_orc_pushdown's plan must be a vectorized ORC scan with the
    predicate pushed to the file scan — a row-at-a-time or
    filter-above-scan plan loses the format's stripe-skip economics."""
    from cognitive_score_bigdata_spark.queries.round6 import (
        scan_orc_pushdown,
    )

    plan = (
        scan_orc_pushdown(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FileScan orc" in plan
    assert "Batched: true" in plan
    assert "DataFilters: [" in plan and "isnotnull(value" in plan
