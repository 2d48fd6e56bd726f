"""Round-12 staged queries: distributed BPE merge training
(queries/round12_staging.py)."""

from __future__ import annotations

import duckdb

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.operators.bpe import bpe_train
from cognitive_score_bigdata_spark.queries import load_registry
from cognitive_score_bigdata_spark.queries.round12_staging import (
    K_BPE_MERGES,
    _train_oracle,
    bpe_train_distributed,
    word_freq_table,
)
from tests.conftest import SF_DIR


def test_bpe_train_matches_driver_trainer(spark):
    """Two independent implementations of the same algorithm must
    agree: the distributed trainer (word-table loop, JVM string
    replaces) and operators/bpe.bpe_train (driver Counter loop) produce
    the same merge sequence when the driver trainer's sample is the
    full corpus (sf0.001 < MAX_TRAIN_ROWS). Counts all >=2 so the
    driver trainer's min-count stop never engages (the one rule the
    fixed-K distributed run drops)."""
    R = load_registry()
    sp = (
        R["corpus_bpe_train_merges"]
        .fn(spark, SF_DIR)
        .orderBy("step")
        .collect()
    )
    assert len(sp) == K_BPE_MERGES
    assert all(r.pair_count >= 2 for r in sp)
    drv = bpe_train(load_table(spark, SF_DIR, "documents"), K_BPE_MERGES)
    assert [(r.lhs, r.rhs) for r in sp] == drv


def test_bpe_train_oracle_parity_in_suite(spark):
    """Value-for-value Spark vs DuckDB at sf0.001 (the driver runs the
    same comparison at sf0.01): symbols and integer counts only, so the
    match is exact, not tolerance-based."""
    R = load_registry()
    sp = {
        (r.step, r.lhs, r.rhs, r.pair_count)
        for r in R["corpus_bpe_train_merges"].fn(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = set(map(tuple, con.execute(_train_oracle()).fetchall()))
    con.close()
    assert sp == want


def _train_both(spark, tmp_path, texts, k):
    """Run the distributed trainer AND the oracle on an ad-hoc corpus."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train_distributed(word_freq_table(docs), k)
    p = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = [tuple(r) for r in con.execute(_train_oracle(k)).fetchall()]
    con.close()
    return got, want


def test_bpe_train_exhaustion_and_ties_match_oracle(spark, tmp_path):
    """The ADVICE-r10 class of bug, designed out up front: when pairs
    run dry before step K, the Spark loop breaks and the oracle's
    empty best-CTE cascades — BOTH emit exactly the merges that exist.
    Corpus 'ab ab cb': step 1 has the tie (a,b)=2 vs (c,b)=1 -> (a,b);
    step 2 merges (c,b); after that every word is one symbol — with
    K=4 requested, both engines must emit exactly 2 rows. Tie-break
    pinned too: 'ba dc ba dc' counts (b,a)=2 (d,c)=2 -> lexicographic
    (b,a) first."""
    got, want = _train_both(spark, tmp_path / "x", ["ab ab cb"], 4)
    assert got == want
    assert len(got) == 2
    assert [(a, b) for _, a, b, _ in got] == [("a", "b"), ("c", "b")]

    got2, want2 = _train_both(spark, tmp_path / "t", ["ba dc", "ba dc"], 2)
    assert got2 == want2
    assert [(a, b) for _, a, b, _ in got2][0] == ("b", "a")


def test_bpe_train_merge_application_handles_runs(spark, tmp_path):
    """Left-to-right non-overlapping merge on repeated-symbol runs —
    the semantics the delimiter scheme must preserve: 'aaaa' under
    (a,a) becomes [aa][aa] (count 3 at step 1: two inside 'aaaa' via
    positions 1,3 is WRONG under overlap-free counting... the COUNT
    stage counts ALL adjacencies (3 in 'aaaa'), the APPLY stage merges
    non-overlapping left-to-right (2 merges) — exactly Sennrich's
    reference implementation split, and both engines agree on both
    stages."""
    got, want = _train_both(spark, tmp_path, ["aaaa"], 2)
    assert got == want
    # step 1: (a,a) with 3 adjacencies counted in 'aaaa'
    assert got[0][1:] == ("a", "a", 3)
    # after applying: 'aaaa' -> [aa][aa]; step 2 merges (aa,aa) count 1
    assert got[1][1:] == ("aa", "aa", 1)
