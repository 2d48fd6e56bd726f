"""Pins the pinned-BPE-merge-table artifact (operators/bpe_artifact.py):

1. the artifact is exactly what bpe_train produces on its training
   corpus (sf0.01) — the "reproducible build artifact" claim;
2. the chained-replace apply (what the DuckDB oracle runs) equals the
   greedy applier (what the Spark side runs) on every distinct corpus
   word at both test SFs plus a random-word stress set — the
   equivalence the corpus_bpe_encode oracle upgrade rests on.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from cognitive_score_bigdata_spark.operators.bpe import (
    _encode_word,
    bpe_train,
)
from cognitive_score_bigdata_spark.operators.bpe_artifact import MERGES_64

SEP = "\x1f"
RANKS = {p: i for i, p in enumerate(MERGES_64)}


def _chained(word: str) -> list[str]:
    """Rank-ordered chained replace with the boundary-safe double-
    separator encoding — the Python mirror of the SQL oracle."""
    s = SEP * 2 + (SEP * 2).join(word) + SEP * 2
    for a, b in MERGES_64:
        s = s.replace(SEP + a + SEP + SEP + b + SEP, SEP + a + b + SEP)
    return [t for t in s.split(SEP) if t]


def test_artifact_reproducible(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert bpe_train(docs, n_merges=64) == MERGES_64


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_chained_replace_equals_greedy_on_corpus(sf):
    words = [
        r[0]
        for r in duckdb.sql(
            "SELECT DISTINCT unnest(string_split_regex(text, ' +')) "
            f"FROM '/root/testdata/sf{sf}/documents.parquet'"
        ).fetchall()
        if r[0]
    ]
    assert words
    for w in words:
        assert _encode_word(w, RANKS) == _chained(w), w


def test_chained_replace_equals_greedy_random():
    rng = random.Random(0)
    alphabet = "abcdefghijklmnopqrstuvwy"
    for _ in range(2000):
        w = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 14))
        )
        assert _encode_word(w, RANKS) == _chained(w), w
