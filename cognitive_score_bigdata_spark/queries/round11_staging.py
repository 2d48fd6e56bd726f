"""Round-11 staged queries (benched from day one; driver rows front
the round-11 birth window, per the staging pattern of rounds 8-10).

``dedup_winnowing_pairs`` — local-fingerprint substring dedup
(winnowing, Schleimer/Wilkerson/Aiken SIGMOD'03 — the MOSS algorithm):
hash every k-token gram, slide a w-hash window over each document, and
keep each window's MINIMUM hash as a fingerprint. The selection is
content-local, so any two documents sharing a token run of at least
w + k - 1 tokens are GUARANTEED to share a fingerprint value — the
detection floor the paper proves — while storing only ~2/(w+1) of the
gram hashes. This is the exact-substring-overlap detector the chunk
(fixed-window) and MinHash (whole-doc Jaccard) families cannot give:
chunk dedup misses runs that straddle chunk boundaries unless they
align, MinHash scores global similarity and is blind to one long
shared passage inside otherwise-different documents.

Cross-engine exactness: gram hashes are the md5 two-half 56-bit trick
(`round4_staging2._MH_H1` pattern) so Spark and DuckDB select
bit-identical minima; fingerprints join on VALUE (the distinct
(doc, h) set), which sidesteps tie-position conventions entirely —
identical content produces identical window minima in both engines.

Scale posture: per-document windows only (`doc_id` partition key — the
§9r per-entity class, bounded by document length, classified
automatically by the window-skew sweep); the pair join is
fingerprint-bucketed with a document-frequency cap (ubiquitous
boilerplate fingerprints are dropped exactly like hot LSH buckets and
stopword grams — both engines compute the same cap), so no stage ever
sees corpus x corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register

WIN_K = 4  # tokens per gram
WIN_W = 4  # gram hashes per winnowing window
WIN_DF_CAP = 20  # drop fingerprints appearing in more docs (boilerplate)
# guarantee floor: shared runs of >= WIN_W + WIN_K - 1 = 7 tokens match

_WIN_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, ' +') AS t FROM documents
    ),
    kg AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS i,
             CAST(('0x' || substr(md5(
               array_to_string(t[CAST(u.i AS INTEGER):CAST(u.i + {WIN_K - 1} AS INTEGER)], ' ')
             ), 1, 14)) AS UBIGINT) AS h
      FROM toks,
           UNNEST(range(1, greatest(len(t) - {WIN_K - 1}, 0) + 1)) AS u(i)
    ),
    win AS (
      SELECT doc_id, i,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW
                          AND {WIN_W - 1} FOLLOWING) AS wmin,
             COUNT(*) OVER (PARTITION BY doc_id) AS nkg
      FROM kg
    ),
    fp AS (
      SELECT DISTINCT doc_id, wmin AS h
      FROM win WHERE i <= greatest(nkg - {WIN_W} + 1, 1)
    ),
    kept AS (
      SELECT h FROM fp GROUP BY h HAVING COUNT(*) <= {WIN_DF_CAP}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fp
    FROM fp a
    JOIN kept k ON k.h = a.h
    JOIN fp b ON b.h = a.h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
"""


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, h): the distinct winnowed fingerprint set per document.

    Positions explode map-side; the only shuffle before the pair join
    is the per-``doc_id`` window sort — the §9r per-entity class,
    bounded by document length.
    """
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " +").alias("t")
    )
    # Docs with fewer than WIN_K tokens yield NO grams. The guard is
    # load-bearing: F.sequence(1, 0) is the DESCENDING [1, 0] (Spark
    # defaults the step to -1 when start > stop), and the i=0 it emits
    # aborts slice(t, 0, k) with INVALID_PARAMETER_VALUE.START — a
    # data-dependent hard failure on any 1-3-token document. The DuckDB
    # oracle's range(1, 1) is empty, so the empty-array branch is also
    # what keeps short docs semantically identical cross-engine.
    kg = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= WIN_K,
                F.sequence(F.lit(1), F.size("t") - F.lit(WIN_K - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
        "t",
    ).select(
        "doc_id",
        "i",
        F.conv(
            F.substring(
                F.md5(F.array_join(F.slice("t", F.col("i"), WIN_K), " ")),
                1,
                14,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, WIN_W - 1)
    )
    nkg = Window.partitionBy("doc_id")
    win = kg.select(
        "doc_id",
        "i",
        F.min("h").over(w).alias("wmin"),
        F.count(F.lit(1)).over(nkg).alias("nkg"),
    )
    return (
        win.filter(
            F.col("i") <= F.greatest(F.col("nkg") - F.lit(WIN_W - 1), F.lit(1))
        )
        .select("doc_id", F.col("wmin").alias("h"))
        .distinct()
    )


@register(
    "dedup_winnowing_pairs",
    oracle=_WIN_ORACLE,
    doc=f"winnowing substring-overlap pairs (MOSS, Schleimer et al. "
    f"SIGMOD'03): md5 {WIN_K}-gram hashes, per-doc {WIN_W}-hash window "
    f"minima as fingerprints — any shared run of >= {WIN_W + WIN_K - 1} "
    f"tokens is GUARANTEED to share a fingerprint (the paper's "
    f"detection floor, pinned by a planted-passage test) while keeping "
    f"~2/(w+1) of gram hashes. Fingerprints join on VALUE (distinct "
    f"per doc), so tie-position conventions cannot diverge engines; "
    f"document-frequency cap {WIN_DF_CAP} drops boilerplate "
    f"fingerprints like hot LSH buckets, computed identically in the "
    f"oracle. Windows are per-doc (§9r per-entity class); the pair "
    f"join is fingerprint-bucketed — no corpus x corpus stage",
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    # referenced by the a-leg, b-leg AND the df-cap — materialize once
    # (the §9d lesson: without this the whole winnowing pipeline runs
    # three times; the sweep showed 6 Window nodes instead of 2)
    fp = winnow_fingerprints(docs).localCheckpoint(eager=False)
    kept = fp.groupBy("h").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= WIN_DF_CAP
    )
    a = fp.join(kept.select("h"), "h").select(
        F.col("doc_id").alias("doc_a"), "h"
    )
    b = fp.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fp"))
    )
