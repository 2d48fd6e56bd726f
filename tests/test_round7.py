"""Round-7 queries: plan pins + semantic edge cases.

The oracle-parity suite already hash-checks both queries against DuckDB
at SF_DIR; these tests pin (a) the physical-plan properties that make
them 100 TB-safe and (b) the canonicalization / quantile-threshold
corner semantics on planted fixtures where the expected answer is
computable by hand.
"""

from __future__ import annotations

import os
import re
import tempfile

import pyspark.sql.functions as F  # noqa: F401

from cognitive_score_bigdata_spark.plans.audit import audit
from cognitive_score_bigdata_spark.queries import load_registry
from tests.conftest import SF_DIR

REGISTRY = load_registry()


def test_url_canonical_plan_is_pure_jvm_two_level_agg(spark):
    """The curation gate must stay a map-only expression pass feeding a
    two-level (host, canon_url) -> host aggregate: no Python stage, no
    join, scan pruned to the two columns it uses."""
    a = audit(
        REGISTRY["curation_url_canonical_hostdedup"].fn(spark, SF_DIR)
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
    # map-side partials on both aggregate levels
    assert a["n_partial_aggs"] >= 2, t


def test_quantile_audit_plan_histogram_window_broadcast(spark):
    """Skew-safety shape: the window must run over the (source,
    n_chars) HISTOGRAM (distinct values), never the raw rows, and the
    |sources|-row threshold table must broadcast back into the scan."""
    a = audit(REGISTRY["quality_length_quantile_audit"].fn(spark, SF_DIR))
    t = a["text"]
    # two Window nodes (running cumulative + whole-partition total),
    # both over the histogram; formatted plans list each node twice
    assert len(re.findall(r"\n\(\d+\) Window", t)) == 2, t
    assert a["n_broadcast_joins"] >= 1 and a["n_sortmerge_joins"] == 0
    # the window's input is the histogram aggregate: a HashAggregate
    # keyed on (source, n_chars) exists in the plan
    assert re.search(r"Keys \[2\]: \[source#\d+, n_chars", t), t
    assert a["n_partial_aggs"] >= 2, t


def _write_docs(rows, schema):
    from cognitive_score_bigdata_spark.session import get_spark

    spark = get_spark("csb-tests")
    d = tempfile.mkdtemp(prefix="csb_r7_")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_url_canonicalization_collapses_equivalent_urls(spark):
    """Planted equivalences, residues chosen by hand:

    - doc 0   -> HTTP://WWW.SRCA.Example.COM:80/docs/0/?utm_source=..&id=0#sec
    - doc 300 -> same scheme/www/host-case/port residues but NO
      trailing slash (300 % 7 != 0) -> canonically EQUAL to doc 0
      (trailing slash stripped, :80 stripped, www. stripped, utm_
      dropped, fragment dropped)
    - doc 105 -> no WWW (odd), port :443 on scheme HTTP -> :443 is NOT
      http's default so it is KEPT -> canonically DISTINCT
    """
    d = _write_docs(
        [(0, "srcA"), (300, "srcA"), (105, "srcA")],
        "doc_id long, source string",
    )
    rows = (
        REGISTRY["curation_url_canonical_hostdedup"]
        .fn(spark, d)
        .collect()
    )
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["host"] == "srca.example.com"
    assert r["n_docs"] == 3
    assert r["n_canon"] == 2  # 0 == 300; 105 differs (kept :443)
    assert r["dup_per_mille"] == 333
    # doc 0 and 105 carry utm_ params (doc_id % 3 == 0), 300 too
    assert r["n_tracked"] == 3


def test_url_full_period_duplicate_detected(spark):
    """doc_id and doc_id + 2100 (= lcm of every derivation modulus)
    produce byte-identical raw URLs -> must count as duplicates."""
    d = _write_docs(
        [(7, "srcB"), (2107, "srcB")], "doc_id long, source string"
    )
    r = (
        REGISTRY["curation_url_canonical_hostdedup"]
        .fn(spark, d)
        .collect()[0]
        .asDict()
    )
    assert r["n_docs"] == 2 and r["n_canon"] == 1
    assert r["dup_per_mille"] == 500


def test_quantile_bands_exact_and_tie_degenerate(spark):
    """n_chars 1..8 over one source: thresholds q1=2 q2=4 q3=6, two
    docs per band. An all-ties source collapses into band 1 (the
    percentile_disc convention: smallest value whose cumulative count
    reaches the target)."""
    rows = [(i, "even", i) for i in range(1, 9)]
    rows += [(100 + i, "ties", 5) for i in range(4)]
    d = _write_docs(rows, "doc_id long, source string, n_chars long")
    got = {
        (r["source"], r["band"]): (r["n_docs"], r["min_chars"],
                                   r["max_chars"])
        for r in REGISTRY["quality_length_quantile_audit"]
        .fn(spark, d)
        .collect()
    }
    assert got[("even", 1)] == (2, 1, 2)
    assert got[("even", 2)] == (2, 3, 4)
    assert got[("even", 3)] == (2, 5, 6)
    assert got[("even", 4)] == (2, 7, 8)
    assert got[("ties", 1)] == (4, 5, 5)
    assert ("ties", 2) not in got
