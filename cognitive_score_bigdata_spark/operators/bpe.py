"""Byte-pair-encoding tokenizer: bounded driver train, distributed apply.

The tokenizer-application step of a pretraining pipeline (reference has
none — this is north-star scope like the other corpus operators). Shape
follows the repo's build-artifact rule (IVF quantizer, PQ codebooks,
minhash index): the *training* corpus statistic is computed on a bounded
sample driver-side (merge tables don't need every document, exactly like
coarse centroids), and the *application* runs distributed as one Arrow
pass with a per-batch memo over distinct words — so the hot path cost is
O(distinct words), not O(tokens), on natural corpora.

Determinism: sample selection is seed-fixed and sorted, merge ties break
on (count desc, pair lexicographic), so the merge table — and therefore
every encoding — is reproducible across partitionings and sessions.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from cognitive_score_bigdata_spark.io import fan_out

MAX_TRAIN_ROWS = 100_000


def bpe_train(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a bounded, deterministic sample.

    Classic Sennrich et al. (2016) word-internal BPE: words start as
    character sequences; each round merges the most frequent adjacent
    symbol pair (ties: lexicographic) across the word-frequency table.
    The sample is capped at ``MAX_TRAIN_ROWS`` docs and sorted by id so
    collect order cannot perturb the result — same driver-size contract
    as the IVF/PQ trainers.
    """
    n = docs.count()
    fit = docs if n <= MAX_TRAIN_ROWS else docs.sample(
        fraction=MAX_TRAIN_ROWS / n, seed=seed
    )
    rows = fit.select(id_col, text_col).collect()
    rows.sort(key=lambda r: r[0])

    word_freq = Counter()
    for r in rows:
        word_freq.update((r[1] or "").split())
    # word → tuple of current symbols
    words: dict[str, list[str]] = {w: list(w) for w in word_freq}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, syms in words.items():
            f = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge table: (id_col, n_bpe_tokens, tokens_fp).

    One ``mapInPandas`` pass; the merge table rides in the closure
    (broadcast by task serialization — a few KB). Words memoize within
    the worker, so cost scales with DISTINCT words per worker, not total
    tokens. ``tokens_fp`` is an md5 over the joined token stream
    (unit-separator delimited) — a scalar, order-sensitive encoding
    fingerprint the harness can compare.
    """
    import hashlib

    ranks = {p: i for i, p in enumerate(merges)}
    out_schema = f"{id_col} long, n_bpe_tokens long, tokens_fp string"

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            ids, counts, fps = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in (text or "").split():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, ranks)
                    toks.extend(got)
                ids.append(i)
                counts.append(len(toks))
                fps.append(hashlib.md5("\x1f".join(toks).encode()).hexdigest())
            yield pd.DataFrame(
                {id_col: ids, "n_bpe_tokens": counts, "tokens_fp": fps}
            )

    return fan_out(docs.select(id_col, text_col)).mapInPandas(enc, out_schema)


def bpe_decode_tokens(tokens: list[str]) -> str:
    """Inverse of word-internal BPE for one word's tokens: concatenation.
    (Merges never cross whitespace, so a document round-trips by joining
    each word's tokens then words by a space — used by tests.)"""
    return "".join(tokens)
