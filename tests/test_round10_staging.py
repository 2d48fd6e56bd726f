"""Round-10 staged queries: plan pins + derived invariants.

Oracle parity at SF_DIR is covered by the auto-parameterized
test_oracle_parity suite; these pin the physical plans' 100 TB
properties and the cross-query conservation laws against the round-9
scorer machinery they compose.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.plans.audit import audit
from cognitive_score_bigdata_spark.queries import load_registry
from cognitive_score_bigdata_spark.queries.round10_staging import N_BANDS
from tests.conftest import SF_DIR

REGISTRY = load_registry()

PY_STAGES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
)


def test_oov_audit_plan_broadcast_no_window(spark):
    """Same shape as the scorer it audits: broadcast weight join,
    TakeOrderedAndProject vocab cut, one map-side-combinable agg,
    nothing Python, zero windows."""
    a = audit(REGISTRY["curation_scorer_oov_audit"].fn(spark, SF_DIR))
    t = a["text"]
    for py_stage in PY_STAGES:
        assert py_stage not in t, f"Python stage {py_stage} in plan"
    assert a["n_broadcast_joins"] >= 1, t
    assert a["has_take_ordered"], t
    assert len(re.findall(r"\n\(\d+\) Window", t)) == 0, t
    assert a["n_partial_aggs"] >= 2, t


def test_length_bias_plan_histogram_window_broadcast_thresholds(spark):
    """The decile thresholds must come from windows over the
    DISTINCT-score HISTOGRAM (bounded by the score domain), and the
    one-row threshold table must broadcast back — never a per-row
    NTILE over the doc table."""
    a = audit(
        REGISTRY["curation_scorer_length_bias"].fn(spark, SF_DIR)
    )
    t = a["text"]
    for py_stage in PY_STAGES:
        assert py_stage not in t, f"Python stage {py_stage} in plan"
    assert "ntile" not in t.lower(), t
    # the windows' input is the (score_micro, c) histogram aggregate
    assert re.search(r"Keys \[1\]: \[score_micro#\d+", t), t
    assert a["n_broadcast_joins"] >= 2, t  # weights + threshold row


def test_oov_audit_conserves_scorer_token_mass(spark):
    """n_tokens summed over sources == total token instances in the
    corpus, and every source has 0 < oov < n (the TOP_V cut binds but
    never swallows a whole source at test SF)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total = docs.select(
        F.explode(F.split("text", " +")).alias("t")
    ).count()
    out = REGISTRY["curation_scorer_oov_audit"].fn(spark, SF_DIR)
    rows = out.collect()
    assert sum(r["n_tokens"] for r in rows) == total
    for r in rows:
        assert 0 < r["n_oov"] < r["n_tokens"], r


def test_length_bias_bands_partition_docs(spark):
    """Bands cover every scored doc exactly once, band sizes are
    equal-count within one histogram-value granularity, and the score
    spans are disjoint and ordered."""
    out = REGISTRY["curation_scorer_length_bias"].fn(spark, SF_DIR)
    rows = sorted(out.collect(), key=lambda r: r["band"])
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert [r["band"] for r in rows] == list(range(1, N_BANDS + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["max_score_micro"] < b["min_score_micro"], (a, b)
