"""Round-8 staged queries: plan pins + semantic pins on planted data.

Oracle parity at SF_DIR is covered by the parametrized suite; these pin
the scale-shape and the selection semantics.
"""

from __future__ import annotations

import os
import tempfile

from cognitive_score_bigdata_spark.plans.audit import audit
from cognitive_score_bigdata_spark.queries import load_registry
from tests.conftest import SF_DIR

REGISTRY = load_registry()


def test_dsir_plan_broadcasts_weights_no_smj(spark):
    """The bucket-weight table (<= DSIR_B rows) must broadcast back
    into the token stream; the only full-corpus shuffles are the
    bounded bucket aggregates and the per-doc score aggregate."""
    a = audit(REGISTRY["curation_dsir_importance_topk"].fn(spark, SF_DIR))
    assert a["n_sortmerge_joins"] == 0, a["text"]
    assert a["n_broadcast_joins"] >= 1, a["text"]
    assert a["has_take_ordered"], a["text"]  # top-K never global-sorts
    assert a["n_partial_aggs"] >= 2, a["text"]


def test_budget_plan_is_two_aggregates_and_broadcast(spark):
    a = audit(REGISTRY["corpus_token_budget_epochs"].fn(spark, SF_DIR))
    assert a["n_sortmerge_joins"] == 0
    assert a["n_partial_aggs"] >= 1


def _docs_dir(spark, rows):
    d = tempfile.mkdtemp(prefix="csb_r8_")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_dsir_target_lookalike_outranks(spark):
    """A candidate doc written in the target's vocabulary must outscore
    one written in vocabulary the target never uses."""
    target = [(i, "src0", "alpha beta gamma delta") for i in range(8)]
    lookalike = (100, "srcX", "alpha beta gamma delta")
    outlier = (101, "srcX", "omega psi chi phi")
    d = _docs_dir(spark, target + [lookalike, outlier])
    rows = {
        r["doc_id"]: r["score"]
        for r in REGISTRY["curation_dsir_importance_topk"]
        .fn(spark, d)
        .collect()
    }
    assert set(rows) == {100, 101}  # src0 docs are never candidates
    assert rows[100] > rows[101]


def test_token_budget_exact_epochs(spark):
    """Two sources, 10 and 40 tokens: uniform target gives each a
    5M-token slice of the 10M budget -> 500000x and 125000x repeats in
    micro-units, both above the 4-epoch cap."""
    rows = [(1, "a", " ".join(["t"] * 10)), (2, "b", " ".join(["u"] * 40))]
    d = _docs_dir(spark, rows)
    got = {
        r["source"]: r
        for r in REGISTRY["corpus_token_budget_epochs"]
        .fn(spark, d)
        .collect()
    }
    assert got["a"]["n_tokens"] == 10 and got["b"]["n_tokens"] == 40
    assert got["a"]["share_micro"] == 200_000  # 10/50
    assert got["b"]["share_micro"] == 800_000
    # weight = total / (n_src * n_tokens): a -> 50/(2*10) = 2.5
    assert got["a"]["weight_micro"] == 2_500_000
    assert got["b"]["weight_micro"] == 625_000
    # epochs = 10M*1e6 / (2 * tokens)
    assert got["a"]["epochs_micro"] == 10_000_000 * 1_000_000 // 20
    assert got["a"]["epochs_capped_micro"] == 4_000_000
    assert got["b"]["epochs_capped_micro"] == 4_000_000


def test_streaming_dedup_batch_split_invariant(spark, tmp_path):
    """The admitted KEY SET must not depend on the micro-batch split:
    a 2-file drain with maxFilesPerTrigger=1 (duplicates crossing the
    batch boundary) admits exactly the same keys as batch DISTINCT."""
    import json as _json
    import os

    from cognitive_score_bigdata_spark.streaming.dedupe import dedup_stream

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    base = 1_700_000_000
    f1 = [{"key": "a", "ts_s": base}, {"key": "b", "ts_s": base + 5}]
    f2 = [
        {"key": "a", "ts_s": base + 10},  # dup across the batch split
        {"key": "c", "ts_s": base + 15},
        {"key": "b", "ts_s": base + 20},  # dup across the batch split
    ]
    for i, rows in enumerate([f1, f2]):
        with open(os.path.join(in_dir, f"f{i}.json"), "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
    got = dedup_stream(
        spark,
        in_dir,
        str(tmp_path / "ckpt"),
        query_name="csb_sdw_split_test",
        max_files_per_trigger=1,
    )
    keys = sorted(r["key"] for r in got.collect())
    assert keys == ["a", "b", "c"]
    spark.catalog.dropTempView("csb_sdw_split_test")
