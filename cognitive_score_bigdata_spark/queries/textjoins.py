"""Text similarity joins: blocked edit-distance linkage, asymmetric
containment, the exact global Jaccard>=0.8 AllPairs prefix-filter
join, and corpus novelty scoring (split out of ``round4_staging2.py``
in round 16 — registry keys unchanged).

``text_prefix_filter_join`` is the Bayardo'07 AllPairs implementation
(asymmetric index/probe prefixes, rarest-token-first canonical order,
xxhash64 8-byte prefix keys, exact bitmap verify) whose hash-match
against the naive all-pairs oracle is the recall proof; cost is the
price of exactness — the scale-safe plan is sum of small
prefix-df^2, not sum-df^2.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register

# ---------------------------------------------------------------------------
# join_fuzzy_levenshtein
# ---------------------------------------------------------------------------

MAX_EDIT = 4


@register(
    "join_fuzzy_levenshtein",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= {MAX_EDIT}
    """,
    doc="edit-distance fuzzy join with blocking: candidate pairs only "
    "within a block (shared noun token), then exact Levenshtein <= 4 "
    "verify — the classic record-linkage shape (block -> verify) that "
    "keeps an O(n^2) string comparison at O(sum block^2). Distances are "
    "integers, so both engines agree exactly. Names are DISTINCT'd "
    "before pairing: entity linkage dedups representations first, and "
    "it collapses the quadratic blow-up duplicate names would cause. "
    "Complements text_fuzzy_token_pairs (FastSS deletion-neighborhood "
    "blocking) with the simpler sort-key blocking strategy",
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.split("p_name", " ").getItem(1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("block").alias("ba")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("block").alias("bb")
    )
    return (
        a.join(
            b,
            (F.col("ba") == F.col("bb"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn(
            "edit_dist",
            F.levenshtein("name_a", "name_b").cast("bigint"),
        )
        .filter(F.col("edit_dist") <= MAX_EDIT)
        .select("name_a", "name_b", "edit_dist")
    )


# ---------------------------------------------------------------------------
# text_containment_neardup
# ---------------------------------------------------------------------------

CONTAIN_PCT = 9  # flag when 10 * |A∩B| >= 9 * |A| (A the smaller set)


@register(
    "text_containment_neardup",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, source,
             unnest(string_split_regex(text, ' +')) AS tok
      FROM documents
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS nc
      FROM tok a JOIN tok b
        ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND i.da < i.db)
                THEN i.da ELSE i.db END AS doc_small,
           CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND i.da < i.db)
                THEN i.db ELSE i.da END AS doc_big,
           i.nc AS n_common,
           LEAST(sa.n, sb.n) AS n_small
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.da
    JOIN sizes sb ON sb.doc_id = i.db
    WHERE i.nc * 10 >= {CONTAIN_PCT} * LEAST(sa.n, sb.n)
    """,
    doc="token-set CONTAINMENT near-dup (|A∩B|/|A| for the smaller set "
    "A): catches a short doc swallowed inside a much longer one — the "
    "quote/excerpt/boilerplate-wrapper case that symmetric Jaccard "
    "structurally misses (J <= |A|/|B| no matter how perfectly A is "
    "contained); threshold as the integer predicate 10*common >= 9*|A| "
    "so no division crosses the engines. Round-4 rewrite "
    "(operators/containment.py): token sets dictionary-encode to "
    "packed int64 bitmaps, so the quadratic stage shuffles (id, n, "
    "signature) — bytes, never token arrays (§9c; plan-pinned) — and "
    "the verify is a zip_with/bit_count fold in codegen, not string "
    "array_intersect. NOT blocked by the MinHash index, deliberately: "
    "qualifying pairs have Jaccard down to 0.20 at sf0.01 (measured), "
    "below any band threshold — a symmetric sketch cannot carry an "
    "asymmetric measure's recall; external blocking injects via "
    "candidate_pairs where the domain provides one",
)
def text_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.functions import text as TX
    from cognitive_score_bigdata_spark.io import fan_out
    from cognitive_score_bigdata_spark.operators.containment import (
        containment_pairs,
        token_bitmap_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        fan_out(docs)
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(TX.tokens("text"))).alias("tok"),
        )
    )
    # reused by both sides of the pair join — materialize once (the §9d
    # lesson: plan branches are not free references)
    sigs = token_bitmap_table(tok, ["doc_id", "source"]).localCheckpoint(
        eager=False
    )
    return containment_pairs(sigs, contain_pct=CONTAIN_PCT)


# ---------------------------------------------------------------------------
# text_prefix_filter_join
# ---------------------------------------------------------------------------

PFJ_T_NUM, PFJ_T_DEN = 4, 5  # Jaccard threshold t = 4/5


@register(
    "text_prefix_filter_join",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(text, ' +')) AS tok
      FROM documents
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM tok a JOIN tok b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b, i.n_common,
           CAST(sa.n + sb.n - i.n_common AS BIGINT) AS n_union
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE i.n_common * {PFJ_T_DEN}
          >= {PFJ_T_NUM} * (sa.n + sb.n - i.n_common)
    """,
    doc="exact set-similarity join (Jaccard >= 0.8, GLOBAL — no source "
    "blocking) by prefix filtering (Chaudhuri'06/Bayardo'07 AllPairs): "
    "tokens canonically ordered by (global df, token), each doc emits "
    "only its first n - ceil(t*n) + 1 tokens as candidate keys — any "
    "qualifying pair provably shares a prefix token, so the posting "
    "join runs on prefixes (sum of small prefix-df^2) instead of the "
    "full sum-df^2 blow-up the oracle's naive formulation spells. The "
    "hash-match against that naive oracle IS the recall-guarantee "
    "proof on this corpus: a single missed pair would fail parity. "
    "Integer threshold predicate; rarest-first ordering makes prefix "
    "buckets the smallest available",
)
def text_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        fan_out(docs)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.col("text"), " +"))
            ).alias("tok"),
        )
        .distinct()
    )
    df_t = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # prefix arrays carry xxhash64(token) LONGS, not strings: the
    # prefix join then hashes/compares 8-byte keys. A hash collision
    # can only MERGE two tokens (extra candidates, removed by the
    # exact bitmap verify) — never split one, so recall is unchanged
    # and the oracle hash-match still proves exactness.
    ordered = (
        tok.join(df_t, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("df"), F.col("tok")))
                ),
                lambda s: F.xxhash64(s.tok),
            ).alias("toks")
        )
        .withColumn("n", F.size("toks").cast("bigint"))
        # prefix length n - ceil(t*n) + 1, all-integer ceil
        .withColumn(
            "p",
            F.col("n")
            - F.expr(
                f"(n * {PFJ_T_NUM} + {PFJ_T_DEN - 1}) div {PFJ_T_DEN}"
            )
            + 1,
        )
        .localCheckpoint(eager=False)  # reused: prefix emit + verify
    )
    # ASYMMETRIC prefixes (the full Bayardo'07 AllPairs, round 4): the
    # larger record of a qualifying pair must share a token within its
    # PROBE prefix (n - ceil(t*n) + 1: alpha >= t*n_big once the length
    # filter holds), while the smaller record only needs its INDEX
    # prefix of n - ceil(2t/(1+t)*n) + 1 tokens (alpha >= t/(1+t) *
    # (n_big+n_small) >= 2t/(1+t)*n_small) — and the FIRST common token
    # in the global (df, token) canonical order provably sits inside
    # BOTH. At t=4/5 the index prefix is ~n/9+1 vs the probe's ~n/5+1,
    # cutting candidate instances ~45% (28.7M -> 16.3M at sf0.1) before
    # the dedup shuffle, which is where the wall time lived. Recall
    # stays exact — the hash-match against the naive all-pairs oracle
    # is the proof, as before.
    probe = ordered.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("pna"),
        F.posexplode(
            F.slice(F.col("toks"), 1, F.col("p").cast("int"))
        ).alias("ia", "tk"),
    )
    # index prefix length: n - ceil(2t/(1+t) * n) + 1, all-integer
    # (2t/(1+t) at t=4/5 is 8/9)
    idx = ordered.withColumn(
        "pi", F.col("n") - F.expr("(n * 8 + 8) div 9") + 1
    ).select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("pnb"),
        F.posexplode(
            F.slice(F.col("toks"), 1, F.col("pi").cast("int"))
        ).alias("ib", "tk"),
    )
    # AllPairs length filter at candidate GENERATION: J >= t forces
    # n_small >= t*n_big, an integer predicate evaluated inside the
    # prefix join before the dedup shuffle — without it a flat-df
    # vocabulary (this corpus) degenerates the prefix buckets
    # (25.5 s -> 17.1 s at sf0.1; the remaining cost is OUTPUT volume:
    # this synthetic corpus really contains ~3M J>=0.8 pairs at sf0.1,
    # so the query is emit-bound, not filter-bound).
    size_ok = F.col("pnb") * PFJ_T_DEN >= PFJ_T_NUM * F.col("pna")
    # orientation: probe side is the larger record (ties by id), so
    # each unordered pair is generated exactly one way
    bigger = (F.col("pna") > F.col("pnb")) | (
        (F.col("pna") == F.col("pnb")) & (F.col("doc_a") < F.col("doc_b"))
    )
    # PPJoin positional filter (Xiao'08, round 6): a match at 0-based
    # prefix positions (ia, ib) bounds the whole-pair overlap at
    # min(na-ia, nb-ib) — every common token sits at or after the
    # FIRST common one in the shared canonical order — so instances
    # that can't reach alpha = ceil(t/(1+t)*(na+nb)) drop before the
    # candidate-dedup exchange (the measured wall-time floor: 18.4M ->
    # 12.6M instances at sf0.1, verified output bit-identical). The
    # first-common-token instance of every qualifying pair always
    # passes, so recall is exact — the oracle hash-match is the proof.
    alpha = F.expr(
        f"({PFJ_T_NUM} * (pna + pnb) + {PFJ_T_NUM + PFJ_T_DEN - 1}) "
        f"div {PFJ_T_NUM + PFJ_T_DEN}"
    )
    pos_ok = (
        F.least(F.col("pna") - F.col("ia"), F.col("pnb") - F.col("ib"))
        >= alpha
    )
    cand = (
        probe.join(idx, "tk")
        .filter(bigger & size_ok & pos_ok)
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    # Verify on packed bitmap signatures, not token arrays (round 4 —
    # same trick as operators/containment.py): the candidate set is
    # millions of rows and array_intersect on string arrays was the
    # per-candidate bottleneck; bit_count(sig&sig) is a codegen integer
    # op and the signature table joins in at ~8 bytes/doc instead of
    # ~300. Exactness unchanged — the same oracle hash-match proves it.
    from cognitive_score_bigdata_spark.operators.containment import (
        sig_intersect_count,
        token_bitmap_table,
    )

    # The signature subtree IS planned twice (once per join side), but
    # checkpointing it to share one build LOSES here: the r16 lazy
    # localCheckpoint regressed the driver's 32-core run 8.9 -> 13.0 s
    # (above the committed band) and an interleaved same-session A/B at
    # 32 cores (r17, 5 pairs) read 14.4 s with vs 10.9 s without — the
    # two sides otherwise execute as independent overlapping stages and
    # the candidate stage backfills the idle cores (guide §2.6), while
    # the checkpoint serializes build-then-consume. Same failure mode as
    # the reverted md5_minhash_band_candidates cut (OPTIMIZATION_r16).
    # The subtree is cheap (~8 bytes/doc of signature state) relative to
    # the emit-bound candidate stage, so the duplicated work is the
    # smaller cost at every measured core count.
    sigs = token_bitmap_table(tok, ["doc_id"])
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("sig").alias("sig_a"),
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("sig").alias("sig_b"),
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_common", sig_intersect_count(sigs, "sig_a", "sig_b"))
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_common"))
        .filter(
            F.col("n_common") * PFJ_T_DEN >= PFJ_T_NUM * F.col("n_union")
        )
        .select("doc_a", "doc_b", "n_common", "n_union")
    )


# ---------------------------------------------------------------------------
# text_novelty_score
# ---------------------------------------------------------------------------


@register(
    "text_novelty_score",
    oracle="""
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
    df AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (df.df = 1) AS BIGINT) AS n_unique,
           CAST((COUNT(*) FILTER (df.df = 1)) * 1000000 // COUNT(*)
                AS BIGINT) AS novelty_micro
    FROM sh JOIN df ON df.s = sh.s
    GROUP BY sh.doc_id
    """,
    doc="per-document n-gram novelty: the fraction of a doc's distinct "
    "3-gram shingles that appear NOWHERE else in the corpus — high "
    "novelty = original content, low = boilerplate/template recombination "
    "(the inverse signal of text_charngram_familiarity, computed "
    "corpus-relative instead of model-relative). Shingle document "
    "frequencies via one hash agg, joined back to the doc's shingles — "
    "two shuffles on the shingle key; integer micro-unit ratio. The "
    "upweight-novel/downweight-duplicated curriculum signal in LLM "
    "data pipelines",
)
def text_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.io import fan_out
    from cognitive_score_bigdata_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        fan_out(docs)
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles("text", 3))).alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # reused: df build + rejoin
    )
    df_s = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(df_s, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            F.expr("(n_unique * 1000000) div n_shingles")
            .cast("bigint")
            .alias("novelty_micro"),
        )
    )
