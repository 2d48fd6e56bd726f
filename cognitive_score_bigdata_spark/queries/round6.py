"""Round-6 additions: training-data curation operators.

The four batch queries + one streaming operator here are the curation
gates a large-scale pretraining pipeline runs between "crawl landed"
and "tokens shipped": benchmark-contamination screening, per-domain
quota sampling (skew-safe exact-k), repetition/quality signals, and
corpus mix rebalancing. The reference has no corpus surface (its
documents are wearable events; `/root/reference/src/backend/main.py`
serves scores) — these extend the brief's large-scale-pipeline family
next to the dedup/similarity/text modules, with the same posture:
every fraction is integer micro-units so the DuckDB oracle hash-matches
bit-exactly, and every operator documents how it behaves at 100 TB.

Scale design notes:

- `corpus_contamination_4gram`: the benchmark side is SMALL by
  construction (a benchmark suite is megabytes; here the src0 slice).
  Its distinct-gram set broadcasts; the corpus side is a map-side
  explode → broadcast-hash semi-join → per-doc count. No shuffle
  touches the full gram stream except the final per-doc aggregate,
  which is map-side-combinable on doc_id. At 100 TB the corpus scan
  dominates and parallelizes linearly.
- `sample_domain_quota`: exact-K per group via ONE window over the
  group key degenerates at 100 TB — 20 sources means 20 reducers see
  everything. Two-level selection fixes it: rank within (source,
  salt-bucket) first (64-way parallel per source, partial top-K), then
  rank the ≤ 64·K survivors per source. Identical output to the naive
  single window (both keep the global K smallest (md5, doc_id) keys),
  pinned by the oracle hash-match against the naive SQL.
- `quality_repetition_signals` (Gopher-style repetition filters,
  Rae et al. 2021): per-doc stats are a token explode + two
  map-side-combinable aggregates; nothing global.
- `corpus_mix_rebalance`: output is |langs| rows; trivially scalable.
- `streaming_quota_admission` (streaming/admission.py): admission
  control as ORDER-SENSITIVE streaming state — the per-source admitted
  counter persists across micro-batches, so a drained backlog plus a
  live tail admits exactly the same set as one batch run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries._helpers import shared_stage

# ---------------------------------------------------------------------------
# corpus_contamination_4gram
# ---------------------------------------------------------------------------

CONTAM_N = 4  # gram width
CONTAM_THR = 2  # distinct shared grams to flag

_CONTAM_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, source, string_split_regex(text, ' +') AS ts
      FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             array_to_string(ts[i:i+{CONTAM_N - 1}], ' ') AS gram
      FROM tok, UNNEST(range(1, len(ts) - {CONTAM_N - 2})) AS r(i)
      WHERE len(ts) >= {CONTAM_N}
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
    cand AS (
      SELECT DISTINCT doc_id, gram FROM g WHERE source <> 'src0'
    )
    SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM cand c JOIN bench b USING (gram)
    GROUP BY c.doc_id
    HAVING COUNT(*) >= {CONTAM_THR}
"""


def _grams(col: str, n: int):
    """n-gram strings over a token array column (0-based Spark SQL)."""
    parts = ", ".join(f"{col}[i + {j}]" for j in range(n))
    return F.expr(
        f"transform(sequence(0, size({col}) - {n}), "
        f"i -> concat_ws(' ', {parts}))"
    )


@register(
    "corpus_contamination_4gram",
    oracle=_CONTAM_ORACLE,
    doc="benchmark-contamination screen (the gate every pretraining "
    "corpus runs against eval suites): docs sharing >= 2 distinct "
    "4-grams with the benchmark slice (source src0 stands in for the "
    "benchmark set) are flagged with their shared-gram count. The "
    "benchmark gram set is small by construction and BROADCASTS; the "
    "corpus side is map-side explode -> broadcast semi-join -> "
    "map-side-combinable per-doc count, so the 100 TB scan "
    "parallelizes linearly with zero full-corpus shuffle. On this "
    "corpus the flagged docs are exactly the planted cross-source "
    "near-duplicates — the screen finds real leakage, not noise. "
    "Complements text_contamination_check (substring hit on short "
    "snippets): n-gram overlap counting survives paraphrase-level "
    "edits a verbatim substring probe misses, which is why WMDP/GPT-4 "
    "era decontamination standardized on n-gram overlap",
)
def corpus_contamination_4gram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", F.split("text", " +").alias("ts")
    )
    g = docs.filter(F.size("ts") >= CONTAM_N).select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(_grams("ts", CONTAM_N))).alias("gram"),
    )
    bench = g.filter(F.col("source") == "src0").select("gram").distinct()
    cand = g.filter(F.col("source") != "src0").select("doc_id", "gram")
    return (
        cand.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= CONTAM_THR)
    )


# ---------------------------------------------------------------------------
# sample_domain_quota
# ---------------------------------------------------------------------------

QUOTA_K = 5
_QUOTA_SALT = 64

_QUOTA_ORACLE = f"""
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    WHERE rn <= {QUOTA_K}
"""


@register(
    "sample_domain_quota",
    oracle=_QUOTA_ORACLE,
    doc="per-domain quota sampling (cap each source at K docs, "
    "selection order = md5(doc_id) — a deterministic uniform draw "
    "shared bit-for-bit with the oracle). SKEW-SAFE exact-k: a naive "
    "window over source sends the whole corpus through |sources| "
    "reducers; here stage 1 ranks within (source, 64-way salt bucket) "
    "and keeps K per bucket — map-parallel partial top-K — so stage "
    "2's real window ranks <= 64K survivors per source. Output is "
    "provably identical to the naive window (both keep the K globally "
    "smallest (md5, doc_id) keys per source: the global top-K survive "
    "every per-bucket top-K); the hash-match against the naive oracle "
    "SQL is the proof",
)
def sample_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("mk"),
    )
    stage1 = Window.partitionBy(
        "source", F.pmod(F.hash("doc_id"), F.lit(_QUOTA_SALT))
    ).orderBy("mk", "doc_id")
    survivors = (
        docs.withColumn("rn1", F.row_number().over(stage1))
        .filter(F.col("rn1") <= QUOTA_K)
        .drop("rn1")
    )
    stage2 = Window.partitionBy("source").orderBy("mk", "doc_id")
    return (
        survivors.withColumn(
            "rn", F.row_number().over(stage2).cast("bigint")
        )
        .filter(F.col("rn") <= QUOTA_K)
        .select("doc_id", "source", "rn")
    )


# ---------------------------------------------------------------------------
# quality_repetition_signals
# ---------------------------------------------------------------------------

_REP_ORACLE = """
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split_regex(text, ' +')) AS t
      FROM documents
    ),
    cnt AS (
      SELECT doc_id, source, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY doc_id, source, t
    ),
    per AS (
      SELECT doc_id, source,
             CAST(SUM(c) AS BIGINT) AS n_tok,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(MAX(c) AS BIGINT) AS top_c
      FROM cnt GROUP BY doc_id, source
    ),
    tg AS (
      SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS g
      FROM (SELECT doc_id, string_split_regex(text, ' +') AS ts
            FROM documents),
           UNNEST(range(1, len(ts))) AS r(i)
      WHERE len(ts) >= 2
    ),
    big AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_2g,
             CAST(COUNT(DISTINCT g) AS BIGINT) AS n_2g_d
      FROM tg GROUP BY doc_id
    )
    SELECT p.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.top_c * 1000000 // p.n_tok) // COUNT(*) AS BIGINT)
             AS avg_toptok_micro,
           CAST(SUM(p.n_types * 1000000 // p.n_tok) // COUNT(*) AS BIGINT)
             AS avg_ttr_micro,
           CAST(SUM((b.n_2g - b.n_2g_d) * 1000000 // b.n_2g) // COUNT(*)
                AS BIGINT) AS avg_dup2g_micro
    FROM per p JOIN big b USING (doc_id)
    GROUP BY p.source
"""


@register(
    "quality_repetition_signals",
    oracle=_REP_ORACLE,
    doc="Gopher-style repetition quality signals (Rae et al. 2021 "
    "table A1 analogues) per source: top-token fraction, type-token "
    "ratio, duplicate-2-gram fraction — the filters that catch "
    "boilerplate/spam before training. All-integer micro-unit "
    "arithmetic (x*1000000 div n, then div n_docs) so the oracle "
    "hash-matches exactly. Per-doc stats are a token explode with "
    "map-side-combinable aggregates keyed by doc_id — no global "
    "state, linear at 100 TB; the per-source rollup is |sources| "
    "rows. Complements text_gopher_rules (per-DOC keep/drop "
    "composite over n_words/mwl/ttr/top-share): this row adds the "
    "duplicate-2-gram repetition signal and the per-source health "
    "rollup a curation dashboard monitors",
)
def quality_repetition_signals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = (
        fan_out(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "source", F.split("text", " +").alias("ts"))
        # reused: the token-count branch AND the 2-gram branch — the cut
        # runs the scan + tokenize + fan_out shuffle once, not twice.
        # Footprint: |docs| rows, each carrying its token array (≈ text
        # size) — one corpus pass of storage for one saved corpus pass.
    )
    docs = shared_stage(docs)
    cnt = docs.select(
        "doc_id", "source", F.explode("ts").alias("t")
    ).groupBy("doc_id", "source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per = cnt.groupBy("doc_id", "source").agg(
        F.sum("c").cast("bigint").alias("n_tok"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.max("c").cast("bigint").alias("top_c"),
    )
    tg = docs.filter(F.size("ts") >= 2).select(
        "doc_id", F.explode(_grams("ts", 2)).alias("g")
    )
    big = tg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_2g"),
        F.count_distinct("g").cast("bigint").alias("n_2g_d"),
    )
    j = per.join(big, "doc_id")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("sum(top_c * 1000000 div n_tok) div count(1)")
        .cast("bigint")
        .alias("avg_toptok_micro"),
        F.expr("sum(n_types * 1000000 div n_tok) div count(1)")
        .cast("bigint")
        .alias("avg_ttr_micro"),
        F.expr("sum((n_2g - n_2g_d) * 1000000 div n_2g) div count(1)")
        .cast("bigint")
        .alias("avg_dup2g_micro"),
    )


# ---------------------------------------------------------------------------
# corpus_mix_rebalance
# ---------------------------------------------------------------------------

_MIX_ORACLE = """
    WITH per AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY lang
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM per
    )
    SELECT p.lang, p.n_docs,
           CAST(p.n_docs * 1000000 // t.total AS BIGINT) AS share_micro,
           CAST(t.total * 1000000 // (t.n_langs * p.n_docs) AS BIGINT)
             AS weight_micro
    FROM per p CROSS JOIN tot t
"""


@register(
    "corpus_mix_rebalance",
    oracle=_MIX_ORACLE,
    doc="corpus mix rebalancing: per-language share and the sampling "
    "weight that flattens the mix to uniform (weight = target_share / "
    "current_share, micro-units) — the knob pretraining runs tune when "
    "a crawl over-represents one language. Aggregate is "
    "map-side-combinable; the totals join is a 5-row broadcast. The "
    "weights feed sample_domain_quota-style downsampling directly",
)
def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr("n_docs * 1000000 div total")
        .cast("bigint")
        .alias("share_micro"),
        F.expr("total * 1000000 div (n_langs * n_docs)")
        .cast("bigint")
        .alias("weight_micro"),
    )


# ---------------------------------------------------------------------------
# streaming_quota_admission
# ---------------------------------------------------------------------------

_ADMIT_ORACLE = f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn <= {QUOTA_K * 2}
"""

_ADMIT_STREAM_IN: dict = {}


def _admit_stream_indir(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    from cognitive_score_bigdata_spark.session_cache import session_scoped

    def build() -> str:
        in_dir = os.path.join(
            tempfile.mkdtemp(prefix="csb_stream_admit_"), "in"
        )
        # ONE data file (ADVICE r6): the registry row's hash-match vs
        # the doc_id-ordered ROW_NUMBER oracle requires the whole input
        # in a single micro-batch (across batches admission is
        # arrival-order FIFO); one part file makes that hold under ANY
        # source admission limit, instead of assuming none is set
        (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "source")
            .coalesce(1)
            .write.mode("overwrite")
            .json(in_dir)
        )
        return in_dir

    return session_scoped(_ADMIT_STREAM_IN, spark, (sf_dir,), build)


@register(
    "streaming_quota_admission",
    oracle=_ADMIT_ORACLE,
    doc="per-source quota ADMISSION CONTROL as stateful streaming "
    "(streaming/admission.py): each source's admitted-count persists "
    "in the state store, each micro-batch sorts its rows by doc_id "
    "and admits until the source's cap is reached — the gate a "
    "continuously-ingesting corpus pipeline runs so one crawl domain "
    "cannot flood the training set. Single-batch availableNow drain "
    "makes admission order = doc_id order, hash-matching the batch "
    "ROW_NUMBER oracle; cross-batch counter carryover is pinned "
    "separately in tests (a second file's admissions respect the "
    "count from the first). State is one integer per source",
)
def streaming_quota_admission(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from cognitive_score_bigdata_spark.streaming.admission import (
        admission_stream,
    )

    in_dir = _admit_stream_indir(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="csb_stream_admit_run_")
    name = f"csb_admit_{abs(hash(work)) % 10**8}"
    admitted = admission_stream(
        spark,
        in_dir,
        os.path.join(work, "ckpt"),
        query_name=name,
        cap=QUOTA_K * 2,
    )
    # bounded output (sources x cap rows): eager-checkpoint, then
    # reclaim the memory-sink view and per-run checkpoint dir
    out = admitted.select("doc_id", "source").localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    shutil.rmtree(work, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# events_streak_islands
# ---------------------------------------------------------------------------

_STREAK_ORACLE = """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor
      FROM days
    ),
    runs AS (
      SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len,
             MIN(d) AS streak_start
      FROM isl GROUP BY user_id, anchor
    )
    SELECT user_id, len AS streak_days, streak_start
    FROM (
      SELECT user_id, len, streak_start,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY len DESC, streak_start) AS rn
      FROM runs
    ) WHERE rn = 1
"""


@register(
    "events_streak_islands",
    oracle=_STREAK_ORACLE,
    doc="longest consecutive-day activity streak per user "
    "(gaps-and-islands: island anchor = day - row_number, so "
    "consecutive days share an anchor; longest run per user with "
    "deterministic earliest-start tiebreak). Both windows partition "
    "by user_id — one shuffle on the natural key, O(days-per-user) "
    "per partition, no global state; the classic engagement-streak "
    "query every activity dashboard ships",
)
def events_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.min("d").alias("streak_start"),
    )
    top = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), "streak_start"
    )
    return (
        runs.withColumn("rn", F.row_number().over(top))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("streak_days"),
            "streak_start",
        )
    )


# ---------------------------------------------------------------------------
# market_rule_lift
# ---------------------------------------------------------------------------

LIFT_MIN_SUP = 3

_LIFT_ORACLE = f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
    sup1 AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS s FROM li GROUP BY pk
    ),
    sup2 AS (
      SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS s12
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
      HAVING COUNT(*) >= {LIFT_MIN_SUP}
    )
    SELECT s2.p1, s2.p2, s2.s12,
           CAST(s2.s12 * 1000000 // sa.s AS BIGINT) AS conf_micro,
           CAST(s2.s12 * n.n_orders * 1000000 // (sa.s * sb.s) AS BIGINT)
             AS lift_micro
    FROM sup2 s2
    JOIN sup1 sa ON sa.pk = s2.p1
    JOIN sup1 sb ON sb.pk = s2.p2
    CROSS JOIN n
"""


@register(
    "market_rule_lift",
    oracle=_LIFT_ORACLE,
    doc="association rules over co-purchase pairs: confidence(p1->p2) "
    "and lift in integer micro-units for pairs with support >= 3 — "
    "the step after market_basket_pairs that turns raw pair counts "
    "into ranked rules. The item-support table joins in twice "
    "(broadcast: |parts| rows); the basket count is a once-per-corpus "
    "driver-side scalar folded into the lift expression as a literal. "
    "Pair generation reuses the same self-join shape as the "
    "co-purchase graph family; map-side combine bounds the shuffle "
    "at distinct-pair cardinality. Scale bound: the all-integer lift "
    "numerator s12*n_orders*1e6 stays inside BIGINT while s12 * "
    "n_orders < 9.2e12 (e.g. 1e9 baskets x pair-support 9e3) — "
    "beyond that, divide by sa before multiplying (one extra "
    "truncation step, documented rather than silently applied)",
)
def market_rule_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
        # reused FOUR ways (basket count, item support, both pair-join
        # sides): the cut makes the scan+distinct run once — the
        # n_orders action right below materializes it (r16 plan audit:
        # 8 scans / 20 Exchanges before, one distinct after).
        # Footprint: two BIGINTs per distinct (order, part) line — far
        # smaller than lineitem itself.
    )
    li = shared_stage(li)
    n_orders = li.select("ok").distinct().count()
    sup1 = li.groupBy("pk").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    a = li.select(F.col("ok"), F.col("pk").alias("p1"))
    b = li.select(F.col("ok"), F.col("pk").alias("p2"))
    sup2 = (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("s12"))
        .filter(F.col("s12") >= LIFT_MIN_SUP)
    )
    sa = F.broadcast(sup1.select(F.col("pk").alias("p1"), F.col("s").alias("sa")))
    sb = F.broadcast(sup1.select(F.col("pk").alias("p2"), F.col("s").alias("sb")))
    return (
        sup2.join(sa, "p1")
        .join(sb, "p2")
        .select(
            "p1",
            "p2",
            "s12",
            # conf stays BIGINT-safe (s12 <= n_orders, ~9.2e12 bound);
            # lift multiplies two counts (s12 * n_orders ~ 1e22 at
            # 100 TB) -> DECIMAL(38,0), the fam_micro overflow class
            # (ADVICE r8); all terms non-negative so div == floor
            F.expr("s12 * 1000000 div sa").cast("bigint").alias("conf_micro"),
            F.expr(
                f"(CAST(s12 AS DECIMAL(38,0)) * {n_orders}L * 1000000)"
                " div (CAST(sa AS DECIMAL(38,0)) * sb)"
            )
            .cast("bigint")
            .alias("lift_micro"),
        )
    )


# ---------------------------------------------------------------------------
# scan_runtime_bloom_join
# ---------------------------------------------------------------------------

_BLOOM_ORACLE = """
    SELECT l.l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_linestatus
"""


@register(
    "scan_runtime_bloom_join",
    oracle=_BLOOM_ORACLE,
    doc="runtime bloom-filter pruned fact scan: a selective dimension "
    "predicate (urgent orders) injects a bloom_filter_agg on the "
    "build side and a might_contain probe INTO the fact scan's "
    "filter, so lineitem rows for non-urgent orders drop at the scan "
    "before the join shuffle — Spark's runtime-filter answer to the "
    "100 TB fact/dim join where the dim predicate is selective but "
    "not partition-aligned (DPP's case). Plan-pinned: "
    "bloom_filter_agg + might_contain present with the SMJ path "
    "forced; identical rows to the plain join oracle by construction",
)
def scan_runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    # Force the shuffle-join path (a broadcast join subsumes the bloom
    # filter) and let the filter apply at local-file scan sizes; both
    # confs restored — registry queries must not leak session state.
    conf = spark.conf
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": conf.get(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold"
        ),
    }
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold",
        "0",
    )
    try:
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_linestatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_items"),
                F.sum(F.col("l_quantity").cast("bigint"))
                .cast("bigint")
                .alias("sum_qty"),
            )
        )
        # materialize the plan under the forced confs: localCheckpoint
        # executes NOW, so restoring confs afterwards cannot change the
        # already-chosen physical plan
        return out.localCheckpoint(eager=True)
    finally:
        for k, v in saved.items():
            conf.set(k, v)


# ---------------------------------------------------------------------------
# join_asof_cogrouped
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS click_ts, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
"""


@register(
    "join_asof_cogrouped",
    oracle=_ASOF_ORACLE,
    doc="the as-of join AGAIN, through Spark's cogrouped-pandas API "
    "(groupBy.cogroup().applyInPandas, numpy searchsorted merge) — "
    "the surface for per-key logic that outgrows SQL (§2.10): "
    "both sides shuffle ONCE on the key, each key's two Arrow batches "
    "meet in one Python worker, and the merge is a per-key sorted "
    "scan. Same oracle as join_asof (the union-tag single-shuffle "
    "formulation): two implementations, one hash — the strongest "
    "cross-check either can get. Tiebreak parity: clicks sort by "
    "(ts, value) so the searchsorted hit == the window form's "
    "greatest-payload-struct winner. MEASURED crossover warning "
    "(sf0.1, 1500 groups x ~13 rows): ~3.5 ms/group of cogroup "
    "machinery makes this 15-25x slower than the SQL union-tag form "
    "— reach for cogrouped-pandas only when per-group logic is too "
    "rich for SQL or groups are large enough to amortize the Arrow "
    "slice + frame construction; shuffle volume is identical",
)
def join_asof_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )

    out_schema = (
        "event_id long, user_id long, ts timestamp_ntz, value double, "
        "click_ts timestamp_ntz, click_value double"
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        # numpy lexsort + searchsorted, not pandas merge_asof: per-GROUP
        # pandas overhead dominates at this corpus's ~13 rows/group
        # (measured 7.6 s -> 5.3 s warm at sf0.1); the remaining cost is
        # the cogroup machinery itself (per-group Arrow slice -> pandas
        # frames both sides + result serialization), which is the API's
        # floor. Ties on click_ts: ascending (ts, value) sort means the
        # searchsorted 'right'-1 hit is the max value — the same winner
        # as asof_join's payload-struct tiebreak.
        import numpy as np

        if lpdf.empty:
            return pd.DataFrame(
                columns=[
                    "event_id", "user_id", "ts", "value",
                    "click_ts", "click_value",
                ]
            )
        lo = np.lexsort((lpdf["event_id"].values, lpdf["ts"].values))
        left = lpdf.iloc[lo]
        rts = rpdf["click_ts"].values
        rv = rpdf["click_value"].values
        ro = np.lexsort((rv, rts))
        rts, rv = rts[ro], rv[ro]
        idx = np.searchsorted(rts, left["ts"].values, side="right") - 1
        ok = idx >= 0
        cts = np.full(len(left), np.datetime64("NaT", "us"))
        cv = np.full(len(left), np.nan)
        cts[ok] = rts[idx[ok]]
        cv[ok] = rv[idx[ok]]
        return pd.DataFrame(
            {
                "event_id": left["event_id"].values,
                "user_id": left["user_id"].values,
                "ts": left["ts"].values,
                "value": left["value"].values,
                "click_ts": cts,
                "click_value": cv,
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(lambda l, r: merge(l, r), out_schema)
    )


# ---------------------------------------------------------------------------
# multimodal_arrow_bytes
# ---------------------------------------------------------------------------

_ARROW_BYTES_ORACLE = """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'BM' ELSE 'RI' END AS magic,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN 54 + (3 + doc_id % 7)
                     * (((4 + doc_id % 13) * 3 + 3) // 4 * 4)
                ELSE 44 + 2 * (64 + doc_id % 100)
           END AS BIGINT) AS n_bytes
    FROM documents
"""


@register(
    "multimodal_arrow_bytes",
    oracle=_ARROW_BYTES_ORACLE,
    doc="zero-copy byte-level media stats through mapInArrow (the "
    "lowest-level Arrow batch API, §2.10 — no pandas conversion in "
    "the loop): container magic (first 2 bytes) and exact payload "
    "size per media object via pyarrow.compute binary kernels over "
    "the same doc_id-derived synthetic BMP/WAV payloads as "
    "multimodal_decode_real. The oracle recomputes both from the "
    "integer spec (BMP: 54 + h*rowstride with 4-byte row padding; "
    "WAV: 44 + 2n), so the codec writers, the Arrow path, and the "
    "byte arithmetic cross-check exactly. At 100 TB this is the "
    "triage scan a media pipeline runs before decode: columnar "
    "binary stays off-heap end-to-end",
)
def multimodal_arrow_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pyarrow as pa
    import pyarrow.compute as pc

    from cognitive_score_bigdata_spark.queries.multimodal_real import (
        _synth_media,
    )

    media = _synth_media(fan_out(load_table(spark, sf_dir, "documents")))

    def stats(
        batches: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows == 0:
                continue
            mid = b.column(b.schema.get_field_index("media_id"))
            pay = b.column(b.schema.get_field_index("payload"))
            yield pa.RecordBatch.from_arrays(
                [
                    mid,
                    pc.cast(pc.binary_slice(pay, 0, 2), pa.string()),
                    pc.cast(pc.binary_length(pay), pa.int64()),
                ],
                ["media_id", "magic", "n_bytes"],
            )

    return media.mapInArrow(
        stats, "media_id long, magic string, n_bytes long"
    )


# ---------------------------------------------------------------------------
# sketch_cms_md5_tokens
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 128  # buckets per row
CMS_TOPK = 20  # point-query the K most frequent tokens

# Same Kirsch-Mitzenmacher two-hash trick as the md5-MinHash family
# (round4_staging2): ONE md5 per token, split into two 56-bit halves,
# row j's hash = h1 + j*h2 (j*h2 < 2^58, sum < 2^59 — positive in
# Spark's signed long and DuckDB's UBIGINT alike, so bucket ids match
# bit-for-bit).
_CMS_H1 = "CAST(('0x' || substr(md5(t), 1, 14)) AS UBIGINT)"
_CMS_H2 = "CAST(('0x' || substr(md5(t), 17, 14)) AS UBIGINT)"

_CMS_ORACLE = f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(text, ' +')) AS t FROM documents
    ),
    cells AS (
      SELECT j, ({_CMS_H1} + j * {_CMS_H2}) % {CMS_W} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM tok, UNNEST(range({CMS_D})) AS r(j)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM tok GROUP BY t
      ORDER BY exact_count DESC, t LIMIT {CMS_TOPK}
    ),
    probes AS (
      SELECT e.t, e.exact_count, r.j,
             ({_CMS_H1.replace('md5(t)', 'md5(e.t)')}
              + r.j * {_CMS_H2.replace('md5(t)', 'md5(e.t)')})
               % {CMS_W} AS bucket
      FROM exact e, UNNEST(range({CMS_D})) AS r(j)
    )
    SELECT p.t AS token, p.exact_count,
           CAST(MIN(c.c) AS BIGINT) AS cms_est
    FROM probes p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
    GROUP BY p.t, p.exact_count
"""


@register(
    "sketch_cms_md5_tokens",
    oracle=_CMS_ORACLE,
    doc="auditable Count-Min sketch (Cormode-Muthukrishnan 2005) over "
    "document tokens: d=4 md5-two-hash rows x w=128 buckets, built as "
    "ONE map-side-combinable aggregate (512 cells total regardless of "
    "corpus size — the distributed-sketch story: cell tables merge by "
    "addition across 1000 executors); point estimates for the 20 most "
    "frequent tokens are min-over-rows lookups against the cell "
    "table. Every integer is engine-reproducible, so the oracle "
    "hash-checks the full sketch maintenance + probe path — the same "
    "auditability posture as the md5 KMV/HLL/MinHash family; the "
    "est >= exact one-sided error guarantee is pinned in tests. "
    "Completes the classic sketch set (HLL, KMV, theta, SimHash, "
    "MinHash, heavy-hitter, CMS)",
)
def sketch_cms_md5_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        F.explode(F.split(F.col("text"), " +")).alias("t")
    )
    digest = F.md5(F.col("t"))
    h1 = F.conv(F.substring(digest, 1, 14), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 17, 14), 16, 10).cast("long")
    hashed = tok.select(h1.alias("h1"), h2.alias("h2")).localCheckpoint(
        eager=False
    )
    rows = spark.range(CMS_D).select(F.col("id").cast("long").alias("j"))
    cells = (
        hashed.crossJoin(F.broadcast(rows))
        .groupBy(
            "j",
            ((F.col("h1") + F.col("j") * F.col("h2")) % CMS_W).alias(
                "bucket"
            ),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    exact = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), "t")
        .limit(CMS_TOPK)
    )
    pdig = F.md5(F.col("t"))
    ph1 = F.conv(F.substring(pdig, 1, 14), 16, 10).cast("long")
    ph2 = F.conv(F.substring(pdig, 17, 14), 16, 10).cast("long")
    probes = exact.crossJoin(F.broadcast(rows)).select(
        F.col("t").alias("token"),
        "exact_count",
        "j",
        ((ph1 + F.col("j") * ph2) % CMS_W).alias("bucket"),
    )
    return (
        probes.join(cells, ["j", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# scalar_variant_props
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) * 1000000
                // COUNT(*) AS BIGINT) AS avg_k_micro
    FROM events
    GROUP BY event_type
"""


@register(
    "scalar_variant_props",
    oracle=_VARIANT_ORACLE,
    doc="semi-structured props through Spark 4's VARIANT type "
    "(parse_json once -> variant_get typed extraction), aggregated "
    "per event type with integer-micro averages. VARIANT is the "
    "engine's answer to the reference's dynamic-schema JSON events "
    "(SURVEY §1.2): parse once into a binary-encoded tree, extract "
    "fields typed WITHOUT per-query string re-parsing — at 100 TB "
    "the parse cost is paid once at ingest and every downstream "
    "extraction is a binary offset walk, unlike get_json_object's "
    "per-call string parse (the scalar_json row). Shredding into "
    "parquet columns is the storage-side continuation",
)
def scalar_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.variant_get(
            F.parse_json(F.col("props")), "$.k", "bigint"
        ).alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        # decomposed exact floor(sum*1e6/count): sum(k) over an
        # event-type group is unbounded at corpus scale (1e12 rows x
        # k<=99 passes 9.2e12 long before overflow matters to DuckDB's
        # HUGEINT oracle), and k >= 0 so div/mod truncation == floor
        # (same guard as curation_quality_keep_matrix's fam_micro)
        F.expr(
            "(sum(k) div count(1)) * 1000000"
            " + ((sum(k) % count(1)) * 1000000) div count(1)"
        )
        .cast("bigint")
        .alias("avg_k_micro"),
    )


# ---------------------------------------------------------------------------
# scan_orc_pushdown
# ---------------------------------------------------------------------------

_ORC_CACHE: dict = {}


def _orc_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Session-cached ORC copy of events — the lake-format conversion
    is a once-per-corpus job, not per-query cost (same posture as the
    bucketed/partitioned/Z-ordered lake fixtures)."""
    import os
    import tempfile

    from cognitive_score_bigdata_spark.session_cache import session_scoped

    def build() -> str:
        out = os.path.join(tempfile.mkdtemp(prefix="csb_orc_"), "events")
        load_table(spark, sf_dir, "events").write.mode("overwrite").orc(out)
        return out

    return session_scoped(_ORC_CACHE, spark, (sf_dir,), build)


_ORC_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(19,6)) * 1000000
                AS BIGINT)) AS BIGINT) AS sum_value_micro
    FROM events
    WHERE event_type IN ('purchase', 'click') AND value > 10.0
    GROUP BY event_type
"""


@register(
    "scan_orc_pushdown",
    oracle=_ORC_ORACLE,
    doc="ORC as a first-class lake format (§2.1 source coverage next "
    "to parquet/CSV/JSON/JDBC/Kafka): events converted once per "
    "corpus lifetime (session-cached, like the bucketed and "
    "Z-ordered lake fixtures), then a selective scan whose predicate "
    "and projection push into the vectorized OrcScan (plan-pinned: "
    "DataFilters on the FileScan orc node, Batched: true) and an "
    "integer-micro aggregate the DuckDB oracle reproduces over the "
    "original parquet — format conversion provably lossless for the "
    "queried columns. At 100 TB the same statement holds: ORC "
    "stripe/row-group stats serve the skip logic Catalyst pushes",
)
def scan_orc_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    orc = spark.read.orc(_orc_events_dir(spark, sf_dir))
    return (
        orc.filter(
            F.col("event_type").isin("purchase", "click")
            & (F.col("value") > 10.0)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                (F.col("value").cast("decimal(19,6)") * 1000000).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("sum_value_micro"),
        )
    )
