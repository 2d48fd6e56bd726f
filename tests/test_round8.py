"""Round-8 queries: plan pins + semantic edge cases.

The oracle-parity suite already hash-checks both queries against DuckDB
at SF_DIR; these tests pin (a) the physical-plan properties that make
them 100 TB-safe and (b) first-match-precedence / keep-policy corner
semantics, on planted fixtures where the expected answer is computable
by hand and on derived invariants the implementation must satisfy.
"""

from __future__ import annotations

import os
import re
import tempfile

import pyspark.sql.functions as F  # noqa: F401

from cognitive_score_bigdata_spark.plans.audit import audit
from cognitive_score_bigdata_spark.queries import load_registry
from cognitive_score_bigdata_spark.queries.round8 import (
    ALLOW_LICENSES,
    DENY_HOSTS,
    DENY_PATH_PREFIXES,
    REP_MAX_MICRO,
)
from tests.conftest import SF_DIR

REGISTRY = load_registry()


# ---------------------------------------------------------------------------
# plan pins
# ---------------------------------------------------------------------------


def test_compliance_filter_plan_is_map_only_single_agg(spark):
    """The compliance gate must stay a pure map-only expression pass
    feeding ONE (source, verdict) aggregate: no join of any kind, no
    Python stage, scan pruned to the two columns it uses."""
    a = audit(
        REGISTRY["curation_compliance_source_filter"].fn(spark, SF_DIR)
    )
    t = a["text"]
    for py_stage in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                     "FlatMapGroupsInPandas", "PythonMapInArrow"):
        assert py_stage not in t, f"Python stage {py_stage} in plan"
    assert a["n_broadcast_joins"] == 0 and a["n_sortmerge_joins"] == 0
    # column pruning reached the scan: only doc_id + source are read
    assert any(
        "doc_id" in s and "source" in s and "text" not in s
        for s in a["read_schemas"]
    ), a["read_schemas"]
    # map-side partial on the single aggregate
    assert a["n_partial_aggs"] >= 1, t


def test_keep_matrix_plan_histogram_window_broadcast(spark):
    """Skew-safety shape (the quality_length_quantile_audit argument):
    the tertile window must run over the (source, fam_micro) HISTOGRAM
    (distinct values), never the raw per-doc rows, and the
    |sources|-row threshold table must broadcast back. The per-doc
    signal computation itself must stay JVM-side."""
    a = audit(REGISTRY["curation_quality_keep_matrix"].fn(spark, SF_DIR))
    t = a["text"]
    for py_stage in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                     "FlatMapGroupsInPandas", "PythonMapInArrow"):
        assert py_stage not in t, f"Python stage {py_stage} in plan"
    # two Window nodes (running cumulative + whole-partition total)
    assert len(re.findall(r"\n\(\d+\) Window", t)) == 2, t
    # threshold table broadcasts back into the per-doc stream
    assert a["n_broadcast_joins"] >= 1, t
    # the window's input is the histogram aggregate keyed on
    # (source, fam_micro)
    assert re.search(r"Keys \[2\]: \[source#\d+, fam_micro", t), t
    assert a["n_partial_aggs"] >= 2, t


# ---------------------------------------------------------------------------
# planted-fixture semantics
# ---------------------------------------------------------------------------

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(rows):
    from cognitive_score_bigdata_spark.session import get_spark

    spark = get_spark("csb-tests")
    d = tempfile.mkdtemp(prefix="csb_r8_")
    spark.createDataFrame(rows, _DOCS_SCHEMA).coalesce(1).write.parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def _doc(doc_id, source, text="alpha beta gamma delta"):
    return (doc_id, text, "en", source, len(text))


def test_compliance_first_match_precedence(spark):
    """Hand-picked doc_ids hitting each rule tier, including a doc that
    violates ALL three rules at once (must land in denied_host — the
    first tier):

    - doc 13 @ src4:  host src4.example.com denied + path /docs/13
      denied (prefix /docs/1) + licence 13%4=1 cc-by-nc denied
      -> denied_host (all three violated, first match wins)
    - doc 33 @ src0:  path /docs/33 denied (prefix /docs/3) + licence
      33%4=1 denied -> denied_path
    - doc 7  @ src0:  path /docs/7 fine, licence 7%4=3
      all-rights-reserved -> denied_licence
    - doc 8  @ src0:  path /docs/8 fine, licence 8%4=0 cc-by -> kept
    """
    d = _write_docs(
        [_doc(13, "src4"), _doc(33, "src0"), _doc(7, "src0"),
         _doc(8, "src0")]
    )
    out = {
        (r["source"], r["verdict"]): (r["n_docs"], r["sample_doc"])
        for r in REGISTRY["curation_compliance_source_filter"]
        .fn(spark, d)
        .collect()
    }
    assert out == {
        ("src4", "denied_host"): (1, 13),
        ("src0", "denied_path"): (1, 33),
        ("src0", "denied_licence"): (1, 7),
        ("src0", "kept"): (1, 8),
    }, out


def test_compliance_rule_constants_are_canonical_form():
    """The blocklist entries must be in canonical host form (lowercase,
    no www.) and the path prefixes rooted — otherwise the gate silently
    never matches (the canonicalizer lowercases and strips www.
    upstream of the IN test)."""
    for h in DENY_HOSTS:
        assert h == h.lower() and not h.startswith("www."), h
    for p in DENY_PATH_PREFIXES:
        assert p.startswith("/"), p
    assert all(lic == lic.lower() for lic in ALLOW_LICENSES)


def test_compliance_partitions_every_doc_exactly_once(spark):
    """Verdicts partition the corpus: per-source n_docs sums to the
    table count and the verdict domain is closed."""
    res = (
        REGISTRY["curation_compliance_source_filter"]
        .fn(spark, SF_DIR)
        .collect()
    )
    from cognitive_score_bigdata_spark.io import load_table

    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in res) == total
    assert {r["verdict"] for r in res} <= {
        "kept", "denied_host", "denied_path", "denied_licence"
    }
    # the planted rule sets actually fire at SF_DIR: every tier present
    assert {r["verdict"] for r in res} == {
        "kept", "denied_host", "denied_path", "denied_licence"
    }


def test_keep_matrix_policy_invariants(spark):
    """Derived invariants of the keep policy, checked on real data:

    - bands are exactly {1,2,3} values;
    - tail band (3) never keeps a doc (keep requires fam > t1);
    - in head/middle bands keep = n_docs - n_rep_fail (every non-tail
      doc is kept iff its repetition signal passes);
    - the matrix covers exactly the docs with >=3 chars and >=2 tokens
      (the inner-join domain documented in the spec doc).
    """
    res = (
        REGISTRY["curation_quality_keep_matrix"].fn(spark, SF_DIR).collect()
    )
    assert res, "empty keep matrix"
    from cognitive_score_bigdata_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents")
    eligible = docs.filter(
        (F.length("text") >= 3) & (F.size(F.split("text", " +")) >= 2)
    ).count()
    assert sum(r["n_docs"] for r in res) == eligible
    for r in res:
        assert r["fam_band"] in (1, 2, 3), r
        assert 0 <= r["n_rep_fail"] <= r["n_docs"], r
        if r["fam_band"] == 3:
            assert r["n_keep"] == 0, r
        else:
            assert r["n_keep"] == r["n_docs"] - r["n_rep_fail"], r


def test_keep_matrix_repetition_gate_fires(spark):
    """A planted boilerplate doc (one 2-gram repeated) must fail the
    repetition gate while plain docs pass: single source, four docs
    with identical familiarity structure except the spam one."""
    spam = "spam spam spam spam spam spam spam spam spam spam"
    clean = [
        "alpha beta gamma delta epsilon zeta",
        "beta gamma delta epsilon zeta alpha",
        "gamma delta epsilon zeta alpha beta",
    ]
    d = _write_docs(
        [_doc(i, "s0", t) for i, t in enumerate(clean)]
        + [_doc(99, "s0", spam)]
    )
    res = REGISTRY["curation_quality_keep_matrix"].fn(spark, d).collect()
    # spam doc: 9 2-grams, 1 distinct -> dup2g_micro = 888888 > gate
    assert sum(r["n_rep_fail"] for r in res) == 1
    assert sum(r["n_docs"] for r in res) == 4
    # kept docs are the clean ones that land above the tail tertile
    assert sum(r["n_keep"] for r in res) <= 3
    assert REP_MAX_MICRO < 888888
