"""Round-9 queries: plan pins + cross-machinery invariants + planted
fixtures.

The oracle-parity suite already hash-checks both queries against DuckDB
at SF_DIR; these tests pin (a) the physical-plan properties that make
them 100 TB-safe, (b) the span bridge's conservation law against
text_chunk_dedup (two independent implementations must agree on the
total stripped-span count), and (c) hand-computable planted fixtures.
"""

from __future__ import annotations

import os
import re
import tempfile

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.plans.audit import audit
from cognitive_score_bigdata_spark.queries import load_registry
from cognitive_score_bigdata_spark.queries.round9 import (
    QUALITY_MIN_MICRO,
    TOP_V,
)
from tests.conftest import SF_DIR

REGISTRY = load_registry()

PY_STAGES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
)


# ---------------------------------------------------------------------------
# plan pins
# ---------------------------------------------------------------------------


def test_linear_scorer_plan_broadcast_topv_no_window(spark):
    """The scorer's 100 TB shape: the weight table must reach the
    scoring pass as a BROADCAST hash join, the top-V vocabulary cut
    must plan as TakeOrderedAndProject (distributed per-partition
    top-V — never a global sort or a single-partition rank window),
    and everything stays JVM-side."""
    a = audit(
        REGISTRY["curation_quality_linear_scorer"].fn(spark, SF_DIR)
    )
    t = a["text"]
    for py_stage in PY_STAGES:
        assert py_stage not in t, f"Python stage {py_stage} in plan"
    assert a["n_broadcast_joins"] >= 1, t
    assert a["n_sortmerge_joins"] == 0, t
    assert a["has_take_ordered"], t
    assert len(re.findall(r"\n\(\d+\) Window", t)) == 0, t
    # map-side partials on both the vocab agg and the scoring aggs
    assert a["n_partial_aggs"] >= 2, t
    # the weight-build branch prunes doc_id off its scan
    assert any("doc_id" not in s for s in a["read_schemas"]), (
        a["read_schemas"]
    )


def test_span_bridge_plan_skew_immune_aggs_no_window(spark):
    """The bridge stamps verdicts with map-only expressions BEFORE the
    chunk explode (no join to a verdict table), and the winner /
    occurrence-count stages must be MAP-SIDE-COMBINABLE aggregates —
    never a row_number window, which cannot take the WindowGroupLimit
    rewrite here (it needs the non-winner rows) and would ship every
    occurrence of a hot boilerplate chunk to one reducer (the §9f
    failure mode). The only join is winners-to-counts on chunk, both
    sides already distinct-keyed."""
    a = audit(
        REGISTRY["curation_compliance_span_bridge"].fn(spark, SF_DIR)
    )
    t = a["text"]
    for py_stage in PY_STAGES:
        assert py_stage not in t, f"Python stage {py_stage} in plan"
    windows = re.findall(r"\n\(\d+\) Window", t)
    assert len(windows) == 0, t
    # both chunk-keyed aggregates combine map-side: the min-struct
    # winner and the (chunk, source) occurrence count
    assert re.search(r"partial_min\(struct\(", t), t
    assert a["n_partial_aggs"] >= 3, t


# ---------------------------------------------------------------------------
# cross-machinery conservation: bridge vs text_chunk_dedup
# ---------------------------------------------------------------------------


def test_span_bridge_conserves_chunk_dedup_strip_count(spark):
    """The bridge classifies exactly the spans text_chunk_dedup strips:
    sum(n_stripped) over the bridge's output must equal
    sum(n_chunks - n_kept) over text_chunk_dedup's — two independent
    implementations (first+rank single window vs WindowGroupLimit
    winners + reassembly join) of the same corpus-wide
    first-occurrence rule."""
    bridge = REGISTRY["curation_compliance_span_bridge"].fn(spark, SF_DIR)
    dedup = REGISTRY["text_chunk_dedup"].fn(spark, SF_DIR)
    n_bridge = bridge.agg(F.sum("n_stripped")).collect()[0][0]
    n_dedup = dedup.agg(
        F.sum(F.col("n_chunks") - F.col("n_kept"))
    ).collect()[0][0]
    assert n_bridge == n_dedup > 0


# ---------------------------------------------------------------------------
# planted fixtures
# ---------------------------------------------------------------------------


def _write_docs(spark, rows):
    """documents.parquet fixture dir with the production schema subset
    the queries read (doc_id, source, text)."""
    tmp = tempfile.mkdtemp(prefix="r9fix_")
    spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )
    return tmp


def test_span_bridge_planted_denied_winner(spark):
    """doc 0 (source src4 -> denied_host) holds the first occurrence of
    span 'x y z'; doc 2 (source src5, doc_id%4==2 -> cc0, path
    /docs/2 -> kept) repeats it. The bridge must report exactly one
    stripped span, attributed (src5, denied_host) — the
    orphaned-by-compliance case the query exists to count."""
    tmp = _write_docs(
        spark,
        [(0, "src4", "x y z"), (2, "src5", "x y z q")],
    )
    out = REGISTRY["curation_compliance_span_bridge"].fn(spark, tmp)
    rows = {tuple(r) for r in out.collect()}
    assert rows == {("src5", "denied_host", 1, 1)}, rows


def test_linear_scorer_planted_weights(spark):
    """Hand-computable weights: token 'aa' appears 2x in ref-class
    src0 and 2x in src9 -> w = 500000; 'bb' only in src9 -> w = 0;
    'cc' only in src0 -> w = 1000000. Scores: doc 0 ('aa aa cc') =
    (500000*2 + 1000000) // 3 = 666666 -> keep; doc 1 ('aa aa bb') =
    1000000 // 3 = 333333 -> keep; doc 3 ('bb bb bb') = 0 -> drop."""
    tmp = _write_docs(
        spark,
        [
            (0, "src0", "aa aa cc"),
            (1, "src9", "aa aa bb"),
            (3, "src9", "bb bb bb"),
        ],
    )
    out = REGISTRY["curation_quality_linear_scorer"].fn(spark, tmp)
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_keep"],
            r["avg_score_micro"],
            r["min_score_micro"],
            r["max_score_micro"],
        )
        for r in out.collect()
    }
    assert got == {
        "src0": (1, 1, 666666, 666666, 666666),
        "src9": (2, 1, 166666, 0, 333333),
    }, got


def test_linear_scorer_vocab_cut_exercised(spark):
    """The fixture corpus must carry MORE distinct tokens than TOP_V so
    the top-V cut (and the OOV-scores-zero path) is actually exercised
    by the hash check, and the audit must conserve doc counts."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_vocab = (
        docs.select(F.explode(F.split("text", " +")).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert n_vocab > TOP_V, (n_vocab, TOP_V)
    out = REGISTRY["curation_quality_linear_scorer"].fn(spark, SF_DIR)
    agg = out.agg(
        F.sum("n_docs").alias("nd"), F.sum("n_keep").alias("nk")
    ).collect()[0]
    assert agg["nd"] == docs.count()
    assert 0 < agg["nk"] < agg["nd"], (
        f"threshold {QUALITY_MIN_MICRO} is vacuous: "
        f"{agg['nk']}/{agg['nd']} kept"
    )
