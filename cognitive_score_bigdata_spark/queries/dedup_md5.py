"""md5-auditable MinHash / SimHash near-dup pairs (split out of
``round4_staging2.py`` in round 16 — registry keys unchanged).

These are the CROSS-ENGINE-EXACT twins of the xxhash64 fast paths in
``operators/dedup.py``: ONE md5 per token split into two 56-bit
halves (``_MH_H1``/``_MH_H2``), k=16 signatures in 4 bands — the
banding algebra is identical, only the hash family differs, so the
DuckDB oracle can reproduce every signature bit. The helper trio
(:func:`md5_minhash_signatures` / :func:`md5_minhash_banded` /
:func:`md5_minhash_band_candidates`) is shared by the incremental
index merge (``round5.py``), its compaction (``round10.py``), the
persisted-index dedup (``round17_staging.py``) and the streaming
curation pipeline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register

# ---------------------------------------------------------------------------
# dedup_simhash_pairs_md5
# ---------------------------------------------------------------------------

SH_BITS = 60  # 15 md5 hex chars -> fits signed BIGINT in both engines
SH_HAMMING = 3  # 4 chunks of 15 bits: hamming<=3 shares >=1 exact chunk


@register(
    "dedup_simhash_pairs_md5",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(text, ' +')) AS t
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 15)) AS UBIGINT) AS hv
      FROM tok
    ),
    votes AS (
      SELECT doc_id, b.i AS bit,
             SUM(CASE WHEN (hv >> CAST(b.i AS INTEGER)) & 1 = 1
                      THEN 1 ELSE -1 END) AS v
      FROM h, UNNEST(range({SH_BITS})) AS b(i)
      GROUP BY doc_id, b.i
    ),
    sk AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0
                           THEN (CAST(1 AS UBIGINT) << CAST(bit AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS sh
      FROM votes GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, sh, c.i AS ck,
             (sh >> CAST(c.i * 15 AS INTEGER)) & 32767 AS cv
      FROM sk, UNNEST(range(4)) AS c(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sh AS sha, b.sh AS shb
      FROM chunks a JOIN chunks b
        ON a.ck = b.ck AND a.cv = b.cv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sha, shb)) <= {SH_HAMMING}
    """,
    doc="SimHash near-dup pairs with an EXACT oracle: the bit votes use "
    "an md5-derived 60-bit token hash instead of xxhash64, so the "
    "sketch — an approximate similarity structure — is bit-identical "
    "across engines and the full pipeline (votes -> sign bits -> "
    "pigeonhole 15-bit-chunk blocking -> exact Hamming verify) gets a "
    "driver hash-match row. Same one-shuffle explode/agg plan as "
    "dedup_simhash_pairs (which keeps xxhash64 for speed and stays "
    "rows-only); hamming <= 3 over 4 chunks guarantees a shared exact "
    "chunk, so candidates come from an equi-join, never n^2",
)
def dedup_simhash_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.dedup import simhash_sketch

    docs = load_table(spark, sf_dir, "documents")

    def md5_hash60(c):
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    # both sides of the chunk-bucket self-join consume the sketch —
    # materialize once (plan branches are not free references)
    sk = simhash_sketch(
        docs, "doc_id", "text", token_hash=md5_hash60, n_bits=SH_BITS
    ).localCheckpoint(eager=False)
    chunks = sk.select(
        F.col("doc_id"),
        F.col("simhash").alias("sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("ck"),
                        F.shiftright(F.col("simhash"), 15 * k)
                        .bitwiseAND(F.lit(32767).cast("long"))
                        .alias("cv"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "sh", F.col("c.ck").alias("ck"), F.col("c.cv").alias("cv"))
    a = chunks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sha"),
        "ck",
        "cv",
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("shb"),
        "ck",
        "cv",
    )
    cand = (
        a.join(b, ["ck", "cv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sha", "shb")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("sha").bitwiseXOR(F.col("shb"))
    ).cast("bigint")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= SH_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# dedup_minhash_pairs_md5
# ---------------------------------------------------------------------------

MH_K = 16  # minhashes
MH_BANDS = 4  # 4 bands x 4 rows: P(candidate) = 1-(1-j^4)^4
MH_ROWS = MH_K // MH_BANDS  # rows per band, shared by BOTH the Spark
# band keys below and the DuckDB _MH_BANDKEY fragment — one constant,
# so changing MH_K/MH_BANDS can't desynchronize engine from oracle

# Two-hash scheme (Kirsch & Mitzenmacher 2006): ONE md5 per shingle,
# split into two 56-bit halves h1/h2; minhash i uses h1 + i*h2. 56-bit
# halves keep i*h2 (i <= 15) under 2^60 — safe in Spark's SIGNED long
# and DuckDB's UBIGINT alike, so both engines compute bit-identical
# signatures. 16x fewer digests than the per-i md5 formulation.
_MH_H1 = "CAST(('0x' || substr(md5(s), 1, 14)) AS UBIGINT)"
_MH_H2 = "CAST(('0x' || substr(md5(s), 17, 14)) AS UBIGINT)"
_MH_MINS = ",\n             ".join(
    f"MIN({_MH_H1} + {i} * {_MH_H2}) AS m{i}" for i in range(MH_K)
)
_MH_BANDKEY = " ".join(
    f"WHEN b.i = {k} THEN concat_ws('-', "
    + ", ".join(
        f"CAST(m{MH_ROWS * k + j} AS VARCHAR)" for j in range(MH_ROWS)
    )
    + ")"
    for k in range(MH_BANDS)
)
_MH_AGREE = " + ".join(
    f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(MH_K)
)

_MH_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[CAST(u.i AS INTEGER):CAST(u.i + 2 AS INTEGER)],
                             ' ') AS s
      FROM toks,
           UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
    ),
    sig AS (
      SELECT doc_id,
             {_MH_MINS}
      FROM sh GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, b.i AS band,
             CASE {_MH_BANDKEY} END AS bkey
      FROM sig, UNNEST(range({MH_BANDS})) AS b(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST({_MH_AGREE} AS DOUBLE) / {MH_K} AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
"""


def md5_minhash_signatures(d) -> "DataFrame":
    """(doc_id, m0..m{k-1}): the md5 two-hash minhash signature table
    over ``d(doc_id, text)`` (Kirsch & Mitzenmacher 2006; constants
    MH_K/MH_BANDS shared with the DuckDB oracle fragments _MH_MINS /
    _MH_BANDKEY above). THE single implementation — both
    ``dedup_minhash_pairs_md5`` and round5's blocked-verify pipeline
    compose these helpers, so the Spark side cannot drift from the
    oracle in one query but not the other."""
    from cognitive_score_bigdata_spark.operators.dedup import shingles

    sh = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(shingles("text", 3))).alias("s"),
        )
        .distinct()
    )
    digest = F.md5(F.col("s"))
    h1 = F.conv(F.substring(digest, 1, 14), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 17, 14), 16, 10).cast("long")
    hashed = sh.select("doc_id", h1.alias("h1"), h2.alias("h2"))
    mins = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"m{i}")
        for i in range(MH_K)
    ]
    return hashed.groupBy("doc_id").agg(*mins)


def md5_minhash_banded(sig) -> "DataFrame":
    """(doc_id, band, bkey): the banded LSH key table of a signature
    table from :func:`md5_minhash_signatures` — one row per (doc,
    band), bkey = the band's MH_ROWS mins dash-joined (byte-identical
    to the oracle's _MH_BANDKEY CASE). Factored out (r14) so the
    incremental probe can persist/index it, not just self-join it."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col(f"m{MH_ROWS * k + j}").cast("string")
                                for j in range(MH_ROWS)
                            ],
                        ).alias("bkey"),
                    )
                    for k in range(MH_BANDS)
                ]
            )
        ).alias("b"),
    ).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
    )


def md5_minhash_band_candidates(sig, a_col: str = "doc_a", b_col: str = "doc_b"):
    """(a_col, b_col) distinct id pairs sharing at least one full band
    of the signature table from :func:`md5_minhash_signatures`."""
    banded = md5_minhash_banded(sig)
    a = banded.select(F.col("doc_id").alias(a_col), "band", "bkey")
    b = banded.select(F.col("doc_id").alias(b_col), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col(a_col) < F.col(b_col))
        .select(a_col, b_col)
        .distinct()
    )


@register(
    "dedup_minhash_pairs_md5",
    oracle=_MH_ORACLE,
    doc="MinHash-LSH near-dup candidates with an EXACT oracle: k=16 "
    "md5-derived 60-bit minhashes over distinct 3-gram shingles, "
    "banded 4x4 — every stage of the flagship LLM-dedup technique "
    "(shingle, k-way min, band bucket join, signature-agreement "
    "estimate) is bit-identical across engines, so the driver gets a "
    "hash-match row for the approximate algorithm itself, not just a "
    "rows-only run. The xxhash64 pipeline (dedup_minhash_pairs) stays "
    "as the fast path; this variant pays ONE string md5 per shingle "
    "(two-hash scheme, Kirsch & Mitzenmacher 2006: minhash i = "
    "h1 + i*h2 from the digest's two 56-bit halves — bit-identical in "
    "Spark signed long and DuckDB UBIGINT) for cross-engine "
    "verifiability. est_jaccard = agreeing positions / 16 — identical "
    "IEEE division both sides",
)
def dedup_minhash_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # reused by the band explode AND both agreement sides — materialize
    # once (the §9d lesson: plan branches are not free references)
    sig = md5_minhash_signatures(
        fan_out(docs).select("doc_id", "text")
    ).localCheckpoint(eager=False)
    cand = md5_minhash_band_candidates(sig)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(MH_K)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(MH_K)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MH_K)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / F.lit(float(MH_K))).alias("est_jaccard"),
        )
    )
