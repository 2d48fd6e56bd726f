"""Round-14 session births (benched + mirrored from day one, the
standing staging pattern).

``dedup_incremental_newbatch`` — UPGRADED IN PLACE (VERDICT r13
item 6, the last convertible rows-only family): the incremental
near-dup probe now runs on the md5 two-hash signature family
(round4_staging2's cross-engine-exact scheme) against a PERSISTED
banded index — the standing-artifact shape the xxhash64 original
demonstrated (signatures computed once per corpus lifetime,
partitioned by band, new batch broadcast into the bucket join) — and
therefore carries a FULL DuckDB hash oracle: corpus signatures, clone
signatures, band keys, bucket join, agreement estimate and the >= 0.8
threshold are all bit-identical cross-engine. The xxhash64 fast path
stays in ``operators/dedup.py`` (``save_minhash_index`` /
``dedup_incremental``), pinned by test_dedup_similarity; what changed
is which variant earns the driver row. Ledger drops to 20.

``curation_stream_training_set`` — the composed stream-to-training-set
pipeline (VERDICT r13 item 7) as a driver-checkable batch-shaped row:
an availableNow parquet stream drains through the manifest-fenced
semantic admission gate (batch 0 = novel vectors, admitted; batches
1-2 = exact echoes of committed / batch-0 content, rejected — the
fence records all three), then the ADMITTED corpus flows through
ensemble dedup (md5-MinHash ∪ winnowing ∪ committed-cell semantic
evidence, min-label CC) into leakage-safe cluster splits. Every stage
reuses its hash-green machinery (``streaming/semantic_admission.py``,
``streaming/curation_pipeline.py``, the r13 ensemble, the r14 split
case), and the COMPOSITION gets a full oracle: admission is unrolled
in SQL (novel batch filtered by NOT EXISTS same-cell cosine >=
threshold against the initial corpus and against smaller-id batch
mates — exactly the operator's probe-then-greedy semantics), echo
batches are proven rejected by a loud precondition on the committed
index (every committed id stays below the echo shift), and the
ensemble/split tail splices the same oracle fragments as its
standalone rows. Scale: the admission probe is cell-pruned O(batch),
the legs are banded/blocked, CC is the bounded hybrid finish — the
composition adds only admitted-endpoint semi-joins.

Reference parity: curation/stream-family extensions over the
reference's ingestion surface (SURVEY §2-extras; the reference's
``src/ingestion.py:14-60`` lands raw events with no dedup gate).
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.dedup_md5 import (
    _MH_AGREE,
    _MH_BANDKEY,
    _MH_MINS,
    MH_BANDS,
    MH_K,
    md5_minhash_banded,
    md5_minhash_signatures,
)
from cognitive_score_bigdata_spark.session_cache import session_scoped

# ---------------------------------------------------------------------------
# dedup_incremental_newbatch (md5 persisted-index upgrade)
# ---------------------------------------------------------------------------

INCR_MOD = 5  # the increment: every 5th document re-ingested
INCR_SHIFT = 2_000_000
INCR_THRESHOLD = 0.8  # 12/16 = 0.75 < 0.8 < 13/16 = 0.8125 — margin-safe

_M_COLS = ", ".join(f"m{i}" for i in range(MH_K))

_INCR_ORACLE = f"""
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
    new_sig AS (
      SELECT doc_id + {INCR_SHIFT} AS doc_id, {_M_COLS}
      FROM sig WHERE doc_id % {INCR_MOD} = 0
    ),
    banded_c AS (
      SELECT doc_id, b.i AS band,
             CASE {_MH_BANDKEY} END AS bkey
      FROM sig, UNNEST(range({MH_BANDS})) AS b(i)
    ),
    banded_n AS (
      SELECT doc_id, b.i AS band,
             CASE {_MH_BANDKEY} END AS bkey
      FROM new_sig, UNNEST(range({MH_BANDS})) AS b(i)
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
      FROM banded_n n JOIN banded_c c
        ON n.band = c.band AND n.bkey = c.bkey
    )
    SELECT new_id, corpus_id, est_jaccard FROM (
      SELECT c.new_id, c.corpus_id,
             CAST({_MH_AGREE} AS DOUBLE) / {MH_K} AS est_jaccard
      FROM cand c
      JOIN new_sig sa ON sa.doc_id = c.new_id
      JOIN sig sb ON sb.doc_id = c.corpus_id
    ) WHERE est_jaccard >= {INCR_THRESHOLD}
"""

# The persisted index is a batch-build artifact, written once per
# corpus lifetime (the xxhash64 original's contract, kept), in the
# round10 single-table row form — (doc_id, m0..m15, band, bkey), full
# signature carried on every band row so probe/verify reads ONE
# band-partitioned table — and committed through the §4.1 manifest
# lifecycle like every other long-lived artifact (VERDICT r14 item 4:
# the r14 tempdir write bypassed the protocol): publish_manifest is
# the initial build, round10's append_commit-based merge_into_index is
# the new-snapshot absorb, compact_index_parts the maintenance, and
# every read resolves through read_index.
_MD5_INDEX_CACHE: dict = {}


def _md5_index_path(spark: SparkSession, sf_dir: str) -> str:
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        _list_data_files,
        publish_manifest,
    )
    from cognitive_score_bigdata_spark.queries.round10 import (
        md5_banded_rows,
    )
    from cognitive_score_bigdata_spark.queries.round16_staging import (
        _assert_offset_headroom,
    )

    def build() -> str:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        _assert_offset_headroom(docs, INCR_SHIFT)
        path = tempfile.mkdtemp(prefix="csb_md5_idx_") + "/idx"
        md5_banded_rows(fan_out(docs)).write.partitionBy("band").parquet(
            path
        )
        publish_manifest(
            path, _list_data_files(path), note=f"initial build {sf_dir}"
        )
        return path

    return session_scoped(_MD5_INDEX_CACHE, spark, (sf_dir,), build)


@register(
    "dedup_incremental_newbatch",
    oracle=_INCR_ORACLE,
    doc="incremental near-dup with a FULL hash oracle (r14 in-place "
    "upgrade of the rows-only xxhash64 row; r15: the index now commits "
    "through the manifest protocol): every 5th document re-ingested "
    "under a new id and probed against the PERSISTED corpus "
    "md5-minhash index — the round10 single-table row form (full "
    "signature on every band row), band-partitioned, manifest-"
    "committed, read via read_index, absorbing new snapshots with "
    "round10's append_commit merge — new batch signatures broadcast "
    "into the bucket join, agreement-verified at est_jaccard >= 0.8, "
    "no corpus-side recompute. Every stage (md5 two-hash minhash, 4x4 "
    "banding, bucket join, agreement estimate) is bit-identical "
    "cross-engine",
)
def dedup_incremental_newbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_index,
    )

    path = _md5_index_path(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new_docs = docs.filter(F.col("doc_id") % INCR_MOD == 0).select(
        (F.col("doc_id") + INCR_SHIFT).alias("doc_id"), "text"
    )
    # the probe's only compute: signatures of the increment (two
    # consumers — band keys and agreement — so materialize once)
    new_sig = md5_minhash_signatures(fan_out(new_docs)).localCheckpoint(
        eager=False
    )
    new_banded = md5_minhash_banded(new_sig).select(
        F.col("doc_id").alias("new_id"), "band", "bkey"
    )
    idx = read_index(spark, path)  # manifest-resolved committed view
    cand = (
        idx.select("doc_id", "band", "bkey")
        .join(F.broadcast(new_banded), ["band", "bkey"])
        .select("new_id", F.col("doc_id").alias("corpus_id"))
        .distinct()
    )
    sa = new_sig.select(
        F.col("doc_id").alias("new_id"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(MH_K)],
    )
    # every band row carries the full signature: band 0 alone is the
    # signature table, a single partition-pruned read
    sb = idx.filter(F.col("band") == 0).select(
        F.col("doc_id").alias("corpus_id"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(MH_K)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(MH_K)
    )
    return (
        cand.join(F.broadcast(sa), "new_id")
        .join(sb, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            (agree.cast("double") / F.lit(float(MH_K))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= INCR_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# curation_stream_training_set — the composed pipeline as a driver row
# ---------------------------------------------------------------------------

ADMIT_INIT_MOD = 4  # initial corpus: vec_id ≡ 0; novel batch: ≡ 1
ECHO1_SHIFT = 5_000_000  # batch 1: exact echoes of the initial corpus
ECHO2_SHIFT = 6_000_000  # batch 2: exact echoes of the novel batch

_ADMIT_CACHE: dict = {}


def _admitted_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build + drain the session's admission fixture ONCE per
    (session, corpus): seed-cell index over the initial corpus
    (vec_id ≡ 0 mod {ADMIT_INIT_MOD}), then an availableNow drain of
    three drop files — novel odd-residue vectors, echoes of the
    committed corpus, echoes of the novel batch — through the
    manifest-fenced admission gate. Postconditions are LOUD: the fence
    must record batches [0, 1, 2], and no echo may be admitted (every
    committed id < {ECHO1_SHIFT}) — an exact clone always probes >=
    threshold against its committed source, so an admitted echo means
    a broken probe, not a different answer."""
    import os

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_index,
        read_manifest_meta,
    )
    from cognitive_score_bigdata_spark.queries.round12 import (
        SEED_MAX,
        SEED_MOD,
        SEED_REM,
    )
    from cognitive_score_bigdata_spark.streaming.curation_pipeline import (
        drain_admission_stream,
    )
    from cognitive_score_bigdata_spark.streaming.semantic_admission import (
        build_semantic_index,
    )

    def build() -> str:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        seeds = emb.filter(
            (F.col("vec_id") % SEED_MOD == SEED_REM)
            & (F.col("vec_id") < SEED_MAX)
        )
        init = emb.filter(F.col("vec_id") % ADMIT_INIT_MOD == 0)
        b0 = emb.filter(F.col("vec_id") % ADMIT_INIT_MOD == 1)
        base = tempfile.mkdtemp(prefix="csb_curation_")
        path = base + "/idx"
        build_semantic_index(init, seeds, path)
        b1 = init.select(
            (F.col("vec_id") + ECHO1_SHIFT).alias("vec_id"), "embedding"
        )
        b2 = b0.select(
            (F.col("vec_id") + ECHO2_SHIFT).alias("vec_id"), "embedding"
        )
        for i, b in enumerate((b0, b1, b2)):
            d = f"{base}/drop/b{i}"
            b.coalesce(1).write.parquet(d)
            # FileStreamSource drains oldest-first (mtime, then path);
            # pin BOTH orders so batch i is micro-batch i
            os.utime(d, (1_700_000_000 + i, 1_700_000_000 + i))
            for f in os.listdir(d):
                os.utime(
                    os.path.join(d, f),
                    (1_700_000_000 + i, 1_700_000_000 + i),
                )
        drain_admission_stream(
            spark, f"{base}/drop/*", path, f"{base}/chk"
        )
        fence = read_manifest_meta(path).get("batch_ids")
        if fence != [0, 1, 2]:
            raise ValueError(
                f"admission fence recorded {fence}, expected [0, 1, 2]"
            )
        mx = (
            read_index(spark, path)
            .agg(F.max("neighbor_id").alias("m"))
            .collect()[0]
            .m
        )
        if mx is not None and mx >= ECHO1_SHIFT:
            raise ValueError(
                f"an echo vector was admitted (max committed id {mx}) — "
                "the oracle's all-echoes-rejected precondition is broken"
            )
        return path

    return session_scoped(_ADMIT_CACHE, spark, (sf_dir,), build)


# Admission unrolled in SQL: batch 0 is the only batch that can admit
# (echo batches are rejected by construction, enforced by the loud
# precondition above), and its survivors are exactly the operator's
# probe-then-greedy semantics — NOT similar (same cell, cos >=
# threshold) to any committed vector, and NOT similar to any
# smaller-id batch mate (kept or not: the gate is conservative by
# design). The ensemble/split tail splices the standalone rows'
# oracle fragments verbatim at import, like every composition oracle.
_CURATION_ORACLE_TEMPLATE = """
    WITH RECURSIVE
    {SEEDS_CTE},
    init AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % {INIT_MOD} = 0
    ),
    b0 AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % {INIT_MOD} = 1
    ),
    ia AS ({ASSIGN_INIT}),
    a0 AS ({ASSIGN_B0}),
    adm0 AS (
      SELECT v.vec_id FROM a0 v
      WHERE NOT EXISTS (
        SELECT 1 FROM ia c WHERE c.cell = v.cell
          AND list_cosine_similarity(c.embedding, v.embedding)
              >= {THRESHOLD}
      )
      AND NOT EXISTS (
        SELECT 1 FROM a0 u WHERE u.cell = v.cell
          AND u.vec_id < v.vec_id
          AND list_cosine_similarity(u.embedding, v.embedding)
              >= {THRESHOLD}
      )
    ),
    admitted AS (
      SELECT vec_id FROM init UNION SELECT vec_id FROM adm0
    ),
    ca_adm AS (
      SELECT * FROM ia
      UNION ALL
      SELECT a0.* FROM a0 JOIN adm0 USING (vec_id)
    ),
    sem_edges AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM ca_adm a JOIN ca_adm b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding)
            >= {THRESHOLD}
    ),
    mh_edges AS (
      SELECT doc_a, doc_b FROM (
        {MH_ORACLE}
      ) WHERE est_jaccard >= 0.5
        AND doc_a IN (SELECT vec_id FROM admitted)
        AND doc_b IN (SELECT vec_id FROM admitted)
    ),
    win_edges AS (
      SELECT doc_a, doc_b FROM (
        {WIN_ORACLE}
      ) WHERE doc_a IN (SELECT vec_id FROM admitted)
          AND doc_b IN (SELECT vec_id FROM admitted)
    ),
    edges AS (
      SELECT * FROM mh_edges
      UNION SELECT * FROM win_edges
      UNION SELECT * FROM sem_edges
    ),
    bidir AS (
      SELECT doc_a AS src, doc_b AS dst FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ),
    adocs AS (
      SELECT d.doc_id FROM documents d
      JOIN admitted a ON d.doc_id = a.vec_id
    ),
    reach(node, lab) AS (
      SELECT doc_id, doc_id FROM adocs
      UNION
      SELECT b.dst, r.lab FROM reach r JOIN bidir b ON b.src = r.node
    ),
    clusters AS (
      SELECT node AS doc_id, MIN(lab) AS cluster_id
      FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id, {SPLIT_CASE} AS split FROM clusters
"""


@register(
    "curation_stream_training_set",
    oracle="{CURATION_ORACLE}",  # spliced below after the leg modules load
    doc="the flagship stream-to-training-set composition as ONE "
    "hash-checked row: availableNow parquet stream -> manifest-fenced "
    "semantic admission (novel batch admitted; echo batches of "
    "committed and of batch-0 content rejected, fence records all "
    "three) -> ensemble dedup over the ADMITTED corpus (md5-MinHash "
    "∪ winnowing ∪ committed-cell semantic evidence, min-label CC) "
    "-> leakage-safe cluster splits. The oracle unrolls the admission "
    "probe in SQL (NOT EXISTS same-cell cosine vs the initial corpus "
    "and vs smaller-id batch mates) and splices the ensemble/split "
    "fragments verbatim; all-echoes-rejected is a loud fixture "
    "precondition, not an assumption",
)
def curation_stream_training_set(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cognitive_score_bigdata_spark.streaming.curation_pipeline import (
        admitted_training_splits,
    )

    path = _admitted_index_path(spark, sf_dir)
    return admitted_training_splits(spark, sf_dir, path)


def _splice_curation_oracle() -> None:
    """Embed the md5-minhash / winnowing / seed-assignment / split-case
    fragments verbatim — the standing move that makes composition
    oracles structurally incapable of drifting from their leg rows."""
    from dataclasses import replace

    from cognitive_score_bigdata_spark.queries import REGISTRY
    from cognitive_score_bigdata_spark.queries.dedup_md5 import (
        _MH_ORACLE,
    )
    from cognitive_score_bigdata_spark.queries.round11_staging import (
        _WIN_ORACLE,
    )
    from cognitive_score_bigdata_spark.queries.round13_staging import (
        _SEEDS_CTE,
        _assign_sql,
    )
    from cognitive_score_bigdata_spark.queries.round14_staging import (
        _SPLIT_CASE,
    )
    from cognitive_score_bigdata_spark.streaming.semantic_admission import (
        SEM_ADMIT_THRESHOLD,
    )

    oracle = (
        _CURATION_ORACLE_TEMPLATE.replace("{SEEDS_CTE}", _SEEDS_CTE.strip())
        .replace("{ASSIGN_INIT}", _assign_sql("init"))
        .replace("{ASSIGN_B0}", _assign_sql("b0"))
        .replace("{THRESHOLD}", str(SEM_ADMIT_THRESHOLD))
        .replace("{INIT_MOD}", str(ADMIT_INIT_MOD))
        .replace("{MH_ORACLE}", _MH_ORACLE)
        .replace("{WIN_ORACLE}", _WIN_ORACLE)
        .replace("{SPLIT_CASE}", _SPLIT_CASE)
    )
    spec = REGISTRY["curation_stream_training_set"]
    REGISTRY["curation_stream_training_set"] = replace(spec, oracle=oracle)


_splice_curation_oracle()


# ---------------------------------------------------------------------------
# scan_merge_evolved_agg — MERGE × schema evolution (VERDICT r13 item 8)
# ---------------------------------------------------------------------------

EM_EVO_MOD, EM_EVO_REM = 10, 3  # the evolved batch: clones of these rows
EM_EVO_OFFSET = 2_000_000  # ≡ 0 (mod N_BANDS): clones keep their band
EM_UPD_MOD, EM_UPD_REM = 10, 7  # matched PRE-EVOLUTION rows: updated
EM_UPD_DELTA = 9
EM_INS_MOD, EM_INS_REM = 20, 11  # unmatched source rows: doc_id + 4M
EM_INS_OFFSET = 4_000_000  # ≡ 0 (mod N_BANDS)
EM_TOKENS_DIV = 5

_EVOMERGE_ARTIFACTS: dict = {}


def evolved_merge_artifact(spark: SparkSession, sf_dir: str) -> str:
    """Path of the session's evolved-then-merged artifact: v1 =
    clustered publish of ``documents`` (no ``tokens``), v2 = evolved
    append carrying ``tokens`` (schema committed in the flip), v3 =
    ONE ``merge_commit`` whose source CARRIES the evolved column —
    updates of pre-evolution rows (they gain tokens) and fresh inserts.
    The Delta-parity seam the r13 verdict named: survivors that predate
    the column ride through the merge rewrite as NULL-projected rows,
    the committed schema carries forward unchanged, and untouched
    bands' files survive byte-identical."""
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        append_commit,
        clustered_write_commit,
        merge_commit,
    )
    from cognitive_score_bigdata_spark.queries.round16_staging import (
        N_BANDS,
        N_RANGES,
        _assert_offset_headroom,
    )

    def build() -> str:
        docs = load_table(spark, sf_dir, "documents")
        _assert_offset_headroom(docs, EM_EVO_OFFSET)
        path = tempfile.mkdtemp(prefix="csb_evomerge_art_") + "/docs"
        clustered_write_commit(
            docs.withColumn("band", F.col("doc_id") % N_BANDS),
            path,
            part_col="band",
            cluster_col="doc_id",
            n_ranges=N_RANGES,
            note=f"clustered documents {sf_dir}",
        )
        evolved = (
            docs.filter(F.col("doc_id") % EM_EVO_MOD == EM_EVO_REM)
            .withColumn("doc_id", F.col("doc_id") + EM_EVO_OFFSET)
            .withColumn("tokens", F.expr(f"n_chars DIV {EM_TOKENS_DIV}"))
            .withColumn("band", F.col("doc_id") % N_BANDS)
        )
        append_commit(
            path,
            lambda: evolved.write.mode("append")
            .partitionBy("band")
            .parquet(path),
            note="evolved append: + tokens column",
            stats_cols=["doc_id", "tokens"],
            schema_json=evolved.schema.json(),
        )
        updates = (
            docs.filter(F.col("doc_id") % EM_UPD_MOD == EM_UPD_REM)
            .withColumn("n_chars", F.col("n_chars") + EM_UPD_DELTA)
            .withColumn("tokens", F.expr(f"n_chars DIV {EM_TOKENS_DIV}"))
            .withColumn("band", F.col("doc_id") % N_BANDS)
        )
        inserts = (
            docs.filter(F.col("doc_id") % EM_INS_MOD == EM_INS_REM)
            .withColumn("doc_id", F.col("doc_id") + EM_INS_OFFSET)
            .withColumn("tokens", F.expr(f"n_chars DIV {EM_TOKENS_DIV}"))
            .withColumn("band", F.col("doc_id") % N_BANDS)
        )
        merge_commit(
            spark,
            path,
            updates.unionByName(inserts),
            key_cols=["doc_id"],
            part_col="band",
            note="merge carrying the evolved column",
        )
        return path

    return session_scoped(_EVOMERGE_ARTIFACTS, spark, (sf_dir,), build)


@register(
    "scan_merge_evolved_agg",
    oracle=f"""
    WITH live AS (
      SELECT lang,
             CASE WHEN doc_id % {EM_UPD_MOD} = {EM_UPD_REM}
                  THEN n_chars + {EM_UPD_DELTA} ELSE n_chars END AS n_chars,
             CASE WHEN doc_id % {EM_UPD_MOD} = {EM_UPD_REM}
                  THEN (n_chars + {EM_UPD_DELTA}) // {EM_TOKENS_DIV}
                  ELSE CAST(NULL AS BIGINT) END AS tokens
      FROM documents
      UNION ALL
      SELECT lang, n_chars, n_chars // {EM_TOKENS_DIV}
      FROM documents WHERE doc_id % {EM_EVO_MOD} = {EM_EVO_REM}
      UNION ALL
      SELECT lang, n_chars, n_chars // {EM_TOKENS_DIV}
      FROM documents WHERE doc_id % {EM_INS_MOD} = {EM_INS_REM}
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(tokens) AS BIGINT) AS n_with_tokens,
           CAST(SUM(COALESCE(tokens, 0)) AS BIGINT) AS sum_tokens
    FROM live GROUP BY lang
    """,
    doc="MERGE INTO a schema-evolved table (the r13-verdict Delta-"
    "parity seam): v2 commits `tokens` + the evolved schema, v3 merges "
    "a source CARRYING the new column — matched pre-evolution rows "
    "gain tokens, survivors that predate the column ride the rewrite "
    "NULL-projected, unmatched rows insert, the committed schema "
    "carries forward through the merge flip, and untouched bands "
    "survive byte-identical. Oracle recomputes the post-merge evolved "
    "state from the base table; a dropped NULL projection, lost "
    "update, or schema regression hash-mismatches",
)
def scan_merge_evolved_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.index_manifest import (
        read_index,
    )

    path = evolved_merge_artifact(spark, sf_dir)
    return (
        read_index(spark, path)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.count("tokens").cast("bigint").alias("n_with_tokens"),
            F.sum(F.coalesce(F.col("tokens"), F.lit(0)))
            .cast("bigint")
            .alias("sum_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# vector_ann_bq_topk — binary quantization (sign-bit codes), the 32×
# memory tier below SQ8's 4× (FAISS LSH / RaBitQ-family shape): one bit
# per dimension, Hamming-distance candidate scan over the code table,
# exact-cosine rescore of the survivors. Every stage is EXACT
# cross-engine — the code is integer bit-math on the sign of each
# coordinate, Hamming is bit_count(xor), and the rescore reuses the
# margin-pinned cosine ranking the brute-force rows prove — so the
# two-stage retrieval pipeline itself earns a full hash oracle.
# ---------------------------------------------------------------------------

BQ_DIM = 64  # testdata embedding width; two 32-bit words per vector
BQ_QUERIES = 5
BQ_CANDIDATES = 50  # stage-1 Hamming cut
BQ_TOP_K = 10

# bits 0-31 of word w cover dims 32w+1 .. 32w+32 (1-indexed); shifts
# stay <= 31 so the words never touch the BIGINT sign bit
_BQ_WORD_SPARK = (
    "aggregate(sequence(1, 32), 0L, (acc, i) -> acc + IF("
    "element_at(embedding, i + {off}) > 0, shiftleft(1L, i - 1), 0L))"
)


def _bq_words(df: DataFrame, id_alias: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(id_alias),
        F.expr(_BQ_WORD_SPARK.format(off=0)).alias("w0"),
        F.expr(_BQ_WORD_SPARK.format(off=32)).alias("w1"),
    )


_BQ_WORDS_SQL = f"""
      SELECT vec_id,
             CAST(SUM(CASE WHEN u.i <= 32 AND embedding[u.i] > 0
                      THEN 1::BIGINT << (u.i - 1) ELSE 0 END) AS BIGINT)
               AS w0,
             CAST(SUM(CASE WHEN u.i > 32 AND embedding[u.i] > 0
                      THEN 1::BIGINT << (u.i - 33) ELSE 0 END) AS BIGINT)
               AS w1
      FROM embeddings, UNNEST(range(1, {BQ_DIM + 1})) AS u(i)
      GROUP BY vec_id
"""

_BQ_ORACLE = f"""
    WITH words AS ({_BQ_WORDS_SQL}),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY bit_count(xor(q.w0, c.w0))
                        + bit_count(xor(q.w1, c.w1)) ASC,
                        c.vec_id ASC) AS BIGINT) AS hrnk
      FROM words q JOIN words c
        ON q.vec_id < {BQ_QUERIES} AND c.vec_id <> q.vec_id
      QUALIFY hrnk <= {BQ_CANDIDATES}
    )
    SELECT query_id, neighbor_id, rnk FROM (
      SELECT cand.query_id, cand.neighbor_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY cand.query_id
               ORDER BY list_cosine_similarity(qe.embedding, ce.embedding)
                        DESC, cand.neighbor_id ASC) AS BIGINT) AS rnk
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
    ) WHERE rnk <= {BQ_TOP_K}
"""


@register(
    "vector_ann_bq_topk",
    oracle=_BQ_ORACLE,
    doc="binary-quantized ANN with a FULL hash oracle: sign-bit codes "
    "(one bit per dimension, two BIGINT words per vector — a 16-32× "
    "scan-IO cut below SQ8's 4×), Hamming-distance candidate scan "
    "(bit_count(xor), whole-stage codegen integer math, deterministic "
    "id tiebreak), exact-cosine rescore of the top-50 survivors. The "
    "production two-stage retrieval shape: at 100 TB stage 1 reads "
    "only the 16-byte code column, stage 2 fetches full vectors for "
    "Q×50 rows",
)
def vector_ann_bq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from cognitive_score_bigdata_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    # the code table is the persisted index at scale; computed in the
    # same narrow pass here (build cost ≈ one scan, like sq8_encode)
    codes = _bq_words(fan_out(emb), "neighbor_id").localCheckpoint(
        eager=False
    )
    qcodes = _bq_words(
        emb.filter(F.col("vec_id") < BQ_QUERIES), "query_id"
    ).select(
        "query_id",
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    hamming = F.expr("bit_count(w0 ^ q0) + bit_count(w1 ^ q1)")
    wh = Window.partitionBy("query_id").orderBy(
        F.asc("hdist"), F.asc("neighbor_id")
    )
    cand = (
        codes.join(
            F.broadcast(qcodes),
            F.col("neighbor_id") != F.col("query_id"),
        )
        .withColumn("hdist", hamming)
        .withColumn("hrnk", F.row_number().over(wh))
        .filter(F.col("hrnk") <= BQ_CANDIDATES)
        .select("query_id", "neighbor_id")
    )
    qe = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ce = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .withColumn("cos", cosine(F.col("q_emb"), F.col("c_emb")))
        .withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= BQ_TOP_K)
        .select("query_id", "neighbor_id", "rnk")
    )
