"""Text-analysis column expressions for training-data pipelines.

All pure built-in expressions (split/regexp/length/md5) so they stay
inside whole-stage codegen and scale linearly with the scan — no Python
in the hot path. Heuristics are deliberately simple and deterministic;
they are the Spark-side counterparts of what a corpus-prep pipeline runs
over billions of documents (language ID, quality filters, token budgets,
fingerprints).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Whitespace tokenizer: testdata documents are space-joined word streams.
_TOKEN_SEP = " +"

_STOPWORDS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, _TOKEN_SEP)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("bigint")


def char_len(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c).cast("bigint")


def uniq_ratio(text: Column | str) -> Column:
    """Type-token ratio — low values flag boilerplate / repetition."""
    return distinct_token_count(text).cast("double") / token_count(text)


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: type-token ratio blended
    with a length prior (docs under ~100 tokens are penalized linearly).
    """
    length_prior = F.least(token_count(text).cast("double") / F.lit(100.0), F.lit(1.0))
    return F.lit(0.5) * uniq_ratio(text) + F.lit(0.5) * length_prior


def lang_guess(text: Column | str) -> Column:
    """Stopword-hit language ID. Returns 'und' when nothing matches."""
    c = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    expr = F.lit("und")
    # build the CASE from the last branch backwards
    for lang in reversed(list(_STOPWORDS)):
        words = _STOPWORDS[lang]
        cond = F.lit(False)
        for wrd in words:
            cond = cond | padded.contains(f" {wrd} ")
        expr = F.when(cond, lang).otherwise(expr)
    return expr


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint (md5 hex) — exact-dup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c.cast("binary"))


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the shape a byte-pair tokenizer's pre-split produces.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_ish_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)).cast(
        "bigint"
    )


_MOD = 2_147_483_647  # 2^31 - 1: keeps the rolling state overflow-free


def token_hash(tok: Column) -> Column:
    """Cross-engine token hash: first 15 hex chars of md5 parsed as a
    60-bit long, reduced mod M. md5 is bit-identical in every engine
    (unlike xxhash64, which only Spark exposes), so the rolling
    fingerprint built on it is oracle-checkable."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long"),
        F.lit(_MOD),
    )


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash over the token stream (order-sensitive,
    unlike the md5-of-body fingerprint): h = (h*31 + md5hash(tok)) mod M,
    folded left-to-right with built-in ``aggregate`` — deterministic,
    no UDF, never overflows a long (M < 2^31 so h*31 + x < 2^36)."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + token_hash(t)) % F.lit(_MOD),
    )
