"""Pinned BPE merge table — the tokenizer-as-versioned-artifact pattern.

Production pipelines train a tokenizer ONCE and ship it as an immutable
artifact applied to every corpus thereafter (the merge table below was
produced by :func:`operators.bpe.bpe_train` at n_merges=64 on the
sf0.01 documents table — seed-fixed, sorted sample, deterministic tie
breaks, so re-running the trainer reproduces it bit-for-bit; pinned in
tests).  Freezing it does two things:

- the corpus_bpe_encode query means what production means: "apply THE
  tokenizer", identical token ids at every scale factor, rather than
  "train a new tokenizer on whatever corpus you point me at";
- the encoding becomes SQL-expressible, because applying a FIXED merge
  list in rank order is a chain of string replaces — which upgrades the
  query from a rows-only driver row to a full DuckDB hash-match
  (VERDICT r3 item 9).

Greedy-vs-rank-order equivalence: the greedy applier
(:func:`operators.bpe._encode_word`) merges the lowest-ranked pair
present, one at a time; applying each merge fully in rank order gives
the same result because a merge can only create adjacencies involving
its OWN new symbol, and any merge consuming that symbol was necessarily
learned later (higher rank) — so no lower-ranked opportunity ever
appears after its pass.  Verified exhaustively over every distinct
corpus word at sf0.01/sf0.1 plus 5000 random words (test_bpe_artifact).

SQL encoding of one replace pass with symbol-boundary safety: a word is
rendered with DOUBLE unit-separators between symbols and at both ends
(``\\x1f\\x1f a \\x1f\\x1f b \\x1f\\x1f``); the pattern for merge (a, b) is
``\\x1f a \\x1f\\x1f b \\x1f`` -> ``\\x1f ab \\x1f``.  The single outer
separators force the match to align on whole symbols (a naive single-
separator scheme matches ``a\\x1fs`` against a PREFIX of symbol ``st``),
and the shared-boundary double keeps left-to-right non-overlapping
replacement identical to the merge semantics for runs like ``aaa``.
"""

from __future__ import annotations

MERGES_64: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
    ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector"), ("in", "e"),
    ("l", "ine"), ("a", "b"), ("ab", "l"), ("abl", "e"), ("at", "a"),
    ("d", "ata"), ("t", "able"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("e", "y"), ("k", "ey"),
]


def _q(s: str) -> str:
    """SQL string literal (corpus alphabet is [a-z ], but be correct)."""
    return "'" + s.replace("'", "''") + "'"


def merges_values_sql(merges: list[tuple[str, str]] = MERGES_64) -> str:
    """``(rnk, pat, rep)`` VALUES rows for the chained-replace oracle."""
    rows = ", ".join(
        f"({i}, chr(31)||{_q(a)}||chr(31)||chr(31)||{_q(b)}||chr(31), "
        f"chr(31)||{_q(a + b)}||chr(31))"
        for i, (a, b) in enumerate(merges)
    )
    return rows


def bpe_oracle_sql(merges: list[tuple[str, str]] = MERGES_64) -> str:
    """DuckDB SQL computing (doc_id, n_bpe_tokens, tokens_fp) for the
    pinned merge table — per-word recursive chained replace, reassembled
    in word order, fingerprinted exactly like the Spark side."""
    n = len(merges)
    return f"""
    WITH RECURSIVE m(rnk, pat, rep) AS (
      VALUES {merges_values_sql(merges)}
    ),
    words AS (
      SELECT doc_id,
             generate_subscripts(string_split_regex(text, ' +'), 1) AS widx,
             unnest(string_split_regex(text, ' +')) AS w
      FROM documents
    ),
    nz AS (SELECT * FROM words WHERE w <> ''),
    enc AS (
      SELECT doc_id, widx,
             chr(31)||chr(31)||
             array_to_string(string_split(w, ''), chr(31)||chr(31))||
             chr(31)||chr(31) AS s,
             0 AS step
      FROM nz
      UNION ALL
      SELECT e.doc_id, e.widx, replace(e.s, m.pat, m.rep), e.step + 1
      FROM enc e JOIN m ON m.rnk = e.step
    ),
    done AS (
      SELECT doc_id, widx,
             trim(regexp_replace(s, chr(31) || '+', chr(31), 'g'),
                  chr(31)) AS toks
      FROM enc WHERE step = {n}
    ),
    per_doc AS (
      SELECT doc_id,
             string_agg(toks, chr(31) ORDER BY widx) AS stream,
             CAST(SUM(len(string_split(toks, chr(31)))) AS BIGINT)
               AS n_bpe_tokens
      FROM done GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_bpe_tokens, 0) AS n_bpe_tokens,
           md5(COALESCE(p.stream, '')) AS tokens_fp
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN per_doc p USING (doc_id)
    """
