"""Round-3 query additions, imported FIRST so each gets a driver row.

The driver's correctness harness checks the first 50 registry entries per
round; this module sits at the head of ``load_registry``'s import list so
every query added this round is inside the window (each addition pushes
one already-r1-verified filler out of the tail — the right trade).

Contents:

- ``ml_feature_assembly`` — the deterministic portion of the §3.2 serving
  path (reference ``src/backend/main.py:55-93``: latest-state lookup join
  + form-feature merge + P7 defaults + U3 threshold) as an oracle-checked
  query, leaving only the GBT ``transform`` itself rows-only in
  ``ml_score_batch``.
- ``text_rolling_fingerprint`` — moved from ``queries/textops.py`` and
  upgraded from rows-only to a full DuckDB oracle (the token hash is now
  md5-derived, portable to any engine; see ``functions/text.token_hash``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.functions import text as TX
from cognitive_score_bigdata_spark.io import fan_out, load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.session_cache import session_scoped


@register(
    "ml_feature_assembly",
    oracle="""
    WITH latest AS (
      SELECT user_id,
             arg_max(value, ts) FILTER (WHERE event_type = 'view')
               AS hr_proxy,
             arg_max(value, ts) FILTER (WHERE event_type = 'click')
               AS steps_proxy,
             arg_max(value, ts) FILTER (WHERE event_type = 'error')
               AS cal_proxy
      FROM events
      WHERE event_type IN ('view', 'click', 'error')
      GROUP BY user_id
    ),
    form AS (
      SELECT user_id, arg_max(value, ts) AS form_value, MAX(ts) AS form_ts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT f.user_id, f.form_value, f.form_ts,
           COALESCE(l.hr_proxy, CAST(0 AS DOUBLE)) AS hr_proxy,
           COALESCE(l.steps_proxy, CAST(0 AS DOUBLE)) AS steps_proxy,
           COALESCE(l.cal_proxy, CAST(0 AS DOUBLE)) AS cal_proxy,
           CASE WHEN f.form_value < 50 THEN 'Critical' ELSE 'Normal' END
             AS status
    FROM form f LEFT JOIN latest l ON f.user_id = l.user_id
    """,
    doc="§3.2 feature assembly, the deterministic serving-path prefix "
    "(main.py:55-93): per-user latest live readings across three event "
    "channels (J5/W1 as a two-level aggregate — latest per (user, "
    "channel), then a conditional pivot), broadcast-merged with the "
    "latest form event (J3), null state defaulted to 0 (P7), threshold "
    "status (U3/P5). Only the model transform itself stays rows-only "
    "(ml_score_batch)",
)
def ml_feature_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # latest reading per (user, channel): one shuffle on the composite
    # key, map-side combine; the per-user pivot then reuses the same
    # hash partitioning (user_id is a prefix of the grouping key).
    per_channel = (
        events.filter(F.col("event_type").isin("view", "click", "error"))
        .groupBy("user_id", "event_type")
        .agg(F.max_by("value", "ts").alias("v"))
    )
    chan = lambda t: F.max(  # noqa: E731 — one row per channel, max = value
        F.when(F.col("event_type") == t, F.col("v"))
    )
    latest = per_channel.groupBy("user_id").agg(
        chan("view").alias("hr_proxy"),
        chan("click").alias("steps_proxy"),
        chan("error").alias("cal_proxy"),
    )
    form = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max_by("value", "ts").alias("form_value"),
            F.max("ts").alias("form_ts"),
        )
    )
    return form.join(latest, "user_id", "left").select(
        "user_id",
        "form_value",
        "form_ts",
        F.coalesce("hr_proxy", F.lit(0.0)).alias("hr_proxy"),
        F.coalesce("steps_proxy", F.lit(0.0)).alias("steps_proxy"),
        F.coalesce("cal_proxy", F.lit(0.0)).alias("cal_proxy"),
        F.when(F.col("form_value") < 50, "Critical")
        .otherwise("Normal")
        .alias("status"),
    )


@register(
    "text_rolling_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split_regex(text, ' +'),
                 t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)
                      % 2147483647)),
             (acc, t) -> (acc * 31 + t) % 2147483647
           ) AS rolling_fp
    FROM documents
    """,
    doc="order-sensitive polynomial rolling hash over the token stream "
    "(content fingerprint that distinguishes permuted documents, unlike "
    "md5-of-body on normalized text). Token hash is md5-derived (first "
    "15 hex chars as a 60-bit long mod 2^31-1) so the fold is exact on "
    "both engines; list_prepend(0, ...) gives DuckDB's seedless "
    "list_reduce the same initial accumulator as Spark's aggregate",
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.rolling_fingerprint("text").alias("rolling_fp")
    )


# The BM25 statistics tables (tf postings, doc lengths, document
# frequencies, corpus stats) ARE the inverted search index — a batch
# build artifact computed once per corpus, like the minhash/IVF indexes.
# Cached per (session, corpus dir); each entry persists the tokenization
# exactly once instead of rescanning documents four times per query.
_BM25_INDEX_CACHE: dict = {}


def _bm25_index(spark: SparkSession, sf_dir: str):
    def build():
        docs = load_table(spark, sf_dir, "documents")
        tok = fan_out(docs).select(
            "doc_id", F.explode(F.split(F.col("text"), " +")).alias("term")
        )
        tf = (
            tok.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .persist()
        )
        dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")).persist()
        stats = dl.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        ).persist()
        dfreq = (
            tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).persist()
        )
        return (tf, dl, stats, dfreq)

    return session_scoped(_BM25_INDEX_CACHE, spark, (sf_dir,), build)


@register(
    "text_bm25_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(text, ' +')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    q AS (
      SELECT doc_id AS query_id,
             unnest(list_distinct(string_split_regex(text, ' +')[1:5]))
               AS term
      FROM documents WHERE doc_id % 97 = 1
    ),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             CAST(SUM(CAST(
               ((s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * ((tf.tf * 2.2)
                  / (tf.tf + 1.2 * (0.25 + (0.75 * dl.dl) / s.avgdl)))
             AS DECIMAL(28,6))) AS DOUBLE) AS score
      FROM q
      JOIN tf ON tf.term = q.term
      JOIN dfreq ON dfreq.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 10
    """,
    doc="BM25 top-10 retrieval via posting-list join — the IR-shaped "
    "similarity search a data pipeline runs for contamination and "
    "near-query mining. Queries are the first 5 distinct tokens of "
    "every 97th document; candidate generation is an equi-join on term "
    "(posting lists, broadcast query side) — never doc × doc. Exactness "
    "across engines: rational idf surrogate (no ln), power-of-two BM25 "
    "constants where possible, identical double expression trees, and a "
    "DECIMAL(28,6) accumulator for the per-term score sum so addition "
    "order can't perturb low bits; rank ties break on doc_id",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf, dl, stats, dfreq = _bm25_index(spark, sf_dir)
    q = (
        docs.filter(F.col("doc_id") % 97 == 1)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.array_distinct(F.slice(F.split(F.col("text"), " +"), 1, 5))
            ).alias("term"),
        )
    )
    idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tfn = (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (0.25 + (0.75 * F.col("dl")) / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum((idf * tfn).cast("decimal(28,6)"))
            .cast("double")
            .alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "doc_id", "score", "rnk")
    )


@register(
    "dedup_cluster_exact",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT DISTINCT doc_id, source,
             unnest(string_split_regex(text, ' +')) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM tok a JOIN tok b
        ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.8
    ),
    bidir AS (
      SELECT doc_a AS src, doc_b AS dst FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ),
    reach(node, lab) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.dst, r.lab FROM reach r JOIN bidir b ON b.src = r.node
    )
    SELECT node AS doc_id, MIN(lab) AS cluster_id
    FROM reach GROUP BY node
    """,
    doc="near-dup cluster assignment on the EXACT jaccard graph "
    "(unigram-set >= 0.8 within a source block): min-label connected "
    "components, cluster_id = smallest reachable doc_id, singletons "
    "label themselves. First oracle-checked clustering row — DuckDB "
    "computes the same fixpoint as a recursive-CTE transitive closure, "
    "so the iterative Spark operator (operators/dedup.py "
    "connected_components) is value-pinned end to end, not just "
    "union-find-tested. The LSH variants (dedup_cluster_docs[_star]) "
    "keep rows-only checks; this query is their exact counterpart",
)
def dedup_cluster_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.dedup import (
        connected_components,
    )
    from cognitive_score_bigdata_spark.queries.textops import (
        text_ngram_jaccard,
    )

    # The cluster assignment is a build artifact like the minhash/BM25
    # indexes: one batch job per corpus whose output every downstream
    # consumer joins against. Cache per (session, corpus) so the
    # keep-best composition below doesn't re-run the exact-jaccard pair
    # join + CC fixpoint it shares with this query (measured at sf0.1:
    # corpus_dedup_keep_best 7.5s -> 1.1s against the warm cache).
    def build():
        docs = load_table(spark, sf_dir, "documents")
        pairs = text_ngram_jaccard(spark, sf_dir).select(
            F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
        )
        # plain propagation: exact-jaccard clusters are dense and shallow
        # (diameter 2-4), where min-label converges in fewer scheduled
        # rounds than star contraction (measured: 4.8s vs 5.3s at sf0.1)
        return connected_components(pairs, docs, "doc_id").persist()

    return session_scoped(_CLUSTER_CACHE, spark, (sf_dir,), build)


_CLUSTER_CACHE: dict = {}


@register(
    "dedup_semantic_pairs",
    oracle=None,  # cluster assignment is k-means (iterative, seeded) —
    # not SQL; precision/recall and partition independence pinned in
    # test_dedup_similarity
    doc="SemDeDup (Abbas et al. 2023): semantic near-dup pairs computed "
    "only within k-means clusters of embedding space — the quadratic "
    "stage is (N/k)² per cluster, never N², via a blocked per-cluster "
    "Gram matmul with id-only output. Every 25th vector is re-ingested "
    "under a new id as a planted duplicate (same determinism trick as "
    "dedup_incremental_newbatch), so the pair set is stable and "
    "non-empty for the rows-only check",
)
def dedup_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.similarity import (
        ivf_build,
        semantic_dedup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    # quantization is a build artifact — cache per (session, corpus dir)
    # like the IVF inverted file, instead of re-persisting per call
    index = session_scoped(
        _SEM_IDX_CACHE, spark, (sf_dir,), lambda: ivf_build(corpus, n_cells=8)
    )
    return semantic_dedup_pairs(corpus, threshold=0.95, index=index)


_SEM_IDX_CACHE: dict = {}


@register(
    "sketch_hll_group_users",
    oracle=None,  # estimator-specific values (Datasketches HLL) — no
    # cross-engine SQL equivalent; error bound + mergeability pinned in
    # test_sketches
    doc="mergeable distinct-user counts per event_type via Datasketches "
    "HLL sketches, with the ALL row produced by MERGING the per-group "
    "sketches (register-wise max) rather than rescanning — the persisted "
    "per-partition-sketch pattern that answers any rollup over 100 TB "
    "without touching raw data. Deterministic: HLL register updates are "
    "commutative, so the estimate is independent of partitioning",
)
def sketch_hll_group_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.sketches import (
        hll_group_cardinality,
    )

    return hll_group_cardinality(
        load_table(spark, sf_dir, "events"), "event_type", "user_id"
    )


@register(
    "sketch_theta_user_overlap",
    oracle=None,  # estimator-specific values (theta sketches) — accuracy
    # vs the exact self-join pinned in test_sketches
    doc="theta-sketch set algebra: |A|, |B|, |A intersect B|, |A union B| "
    "of the view-users and purchase-users sets in one pass — the "
    "snapshot-overlap question answered on bounded sketches instead of a "
    "raw-data self-join (intersection is what HLL cannot do)",
)
def sketch_theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.sketches import (
        theta_overlap,
    )

    return theta_overlap(
        load_table(spark, sf_dir, "events"),
        "event_type",
        "user_id",
        "view",
        "purchase",
    )


# BPE merge tables are training artifacts — once per corpus, like the
# BM25/minhash/IVF indexes above.
def _bpe_oracle() -> str:
    from cognitive_score_bigdata_spark.operators.bpe_artifact import (
        bpe_oracle_sql,
    )

    return bpe_oracle_sql()


@register(
    "corpus_bpe_encode",
    oracle=_bpe_oracle(),  # chained-replace apply of the PINNED merge
    # table (operators/bpe_artifact.py) — full hash-match row since r4;
    # train round-trip/determinism/compression stay pinned in test_corpus
    doc="BPE tokenizer application at corpus scale (Sennrich et al. "
    "2016): the merge table is a PINNED versioned artifact "
    "(operators/bpe_artifact.py — trained once by bpe_train on sf0.01, "
    "reproducible bit-for-bit; production applies THE tokenizer, it "
    "does not retrain per corpus), applied as ONE Arrow pass with "
    "per-worker word memoization — cost scales with distinct words, "
    "not tokens. Output: per-doc token count + an order-sensitive md5 "
    "fingerprint of the token stream. Oracle = the same merges applied "
    "as a rank-ordered chain of boundary-safe string replaces in a "
    "recursive CTE (equivalence with the greedy applier proven in "
    "test_bpe_artifact)",
)
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.bpe import bpe_encode
    from cognitive_score_bigdata_spark.operators.bpe_artifact import (
        MERGES_64,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode(docs, MERGES_64)


@register(
    "text_segment_udtf",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' the '), 1) AS seg_idx,
             unnest(string_split(text, ' the ')) AS segment
      FROM documents
    )
    SELECT doc_id,
           CAST(seg_idx AS INT) AS seg_idx,
           trim(segment) AS segment,
           CAST(len(string_split_regex(trim(segment), ' +')) AS INT)
             AS n_words
    FROM s WHERE trim(segment) <> ''
    """,
    doc="Python UDTF surface (U4 beyond built-in explode): a lateral "
    "table function splitting each document into delimiter-separated "
    "segments with positional index and word count — one row in, many "
    "rows out, arbitrary Python per row. Value-pinned against DuckDB's "
    "unnest WITH ORDINALITY equivalent, which is what keeps this UDTF "
    "honest: same split, trim, and empty-segment semantics on both "
    "engines. UDTFs remain the slow path (SURVEY §2.10 design rule) — "
    "this exists for API-surface parity; explode/posexplode cover the "
    "built-in cases",
)
def text_segment_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, seg_idx: int, segment: string, n_words: int")
    class SegmentSplit:
        def eval(self, doc_id, text):  # noqa: ANN001
            for i, seg in enumerate((text or "").split(" the ")):
                seg = seg.strip()
                if seg:
                    yield doc_id, i + 1, seg, len(seg.split())

    spark.udtf.register("csb_segment_split", SegmentSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        """
        SELECT s.doc_id, s.seg_idx, s.segment, s.n_words
        FROM __udtf_docs d,
             LATERAL csb_segment_split(d.doc_id, d.text) s
        """
    )


@register(
    "agg_pandas_udaf_gmean",
    oracle=None,  # exp/ln differ in final-bit rounding across engines —
    # value parity vs numpy pinned in test_operators instead
    doc="grouped-aggregate pandas UDF surface (the UDAF shape the "
    "reference never needed — A3 mapped to built-in max_by): geometric "
    "mean of positive event values per event_type, one Arrow batch per "
    "group state, partial-agg'd by Spark like any aggregate. Exists for "
    "API-surface parity; every production aggregate in this repo is a "
    "built-in expression",
)
def agg_pandas_udaf_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: `from __future__ import annotations` makes
    # type hints strings, which defeats signature inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def gmean(v):
        return float(np.exp(np.log(v.to_numpy()).mean()))

    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(gmean("value").alias("gmean_value"))
    )


@register(
    "corpus_dedup_keep_best",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT DISTINCT doc_id, source,
             unnest(string_split_regex(text, ' +')) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM tok a JOIN tok b
        ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.8
    ),
    bidir AS (
      SELECT doc_a AS src, doc_b AS dst FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ),
    reach(node, lab) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.dst, r.lab FROM reach r JOIN bidir b ON b.src = r.node
    ),
    clusters AS (
      SELECT node AS doc_id, MIN(lab) AS cluster_id
      FROM reach GROUP BY node
    ),
    quality AS (
      SELECT doc_id,
             0.5 * (CAST(len(list_distinct(string_split_regex(text, ' +')))
                         AS DOUBLE)
                    / len(string_split_regex(text, ' +')))
             + 0.5 * least(CAST(len(string_split_regex(text, ' +'))
                                AS DOUBLE) / 100.0, 1.0) AS quality
      FROM documents
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(CASE WHEN rnk = 1 THEN doc_id END) AS keep_doc_id,
           MIN(CASE WHEN rnk = 1 THEN quality END) AS keep_quality
    FROM (
      SELECT c.cluster_id, c.doc_id, q.quality,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.quality DESC, c.doc_id ASC)
               AS rnk
      FROM clusters c JOIN quality q ON q.doc_id = c.doc_id
    )
    GROUP BY cluster_id
    """,
    doc="the full dedup endgame as one oracle-checked plan: exact-"
    "jaccard connected components (dedup_cluster_exact's fixpoint) -> "
    "join per-doc quality (text_quality_score's rational formula — "
    "exact cross-engine) -> keep the highest-quality doc per cluster "
    "(quality desc, doc_id tiebreak). This is the canonical-survivor "
    "selection step every near-dup pipeline ends with, value-pinned "
    "end to end. Winner selection is a max_by STRUCT AGGREGATE, not a "
    "row_number window (round-10 window-skew sweep finding, same shape "
    "as the §9q span bridge): the consumer needs n_docs over ALL rows, "
    "so WindowGroupLimit cannot pre-collapse below the exchange, and a "
    "hot cluster_id — which is exactly what dedup produces on "
    "boilerplate at 100 TB — would be a one-reducer straggler; the "
    "aggregate's map-side partials collapse it to one row per map "
    "task. The oracle keeps the window form as the independent-"
    "implementation proof",
)
def corpus_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = dedup_cluster_exact(spark, sf_dir)
    quality = load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.quality_score("text").alias("quality")
    )
    # (quality DESC, doc_id ASC) winner == max_by over the orderable
    # struct (quality, -doc_id); struct comparison is lexicographic
    best = F.max_by(
        F.struct(F.col("doc_id"), F.col("quality")),
        F.struct(F.col("quality"), (-F.col("doc_id")).alias("neg_id")),
    )
    return (
        clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            best.alias("__best"),
        )
        .select(
            "cluster_id",
            "n_docs",
            F.col("__best.doc_id").alias("keep_doc_id"),
            F.col("__best.quality").alias("keep_quality"),
        )
    )


# The z-ordered lake is a layout artifact — written once per (session,
# corpus), then every scan benefits; same cache contract as the indexes.
_ZLAKE_CACHE: dict = {}


@register(
    "scan_zorder_two_dim",
    oracle="""
    SELECT event_id, user_id, ts_us, value
    FROM (
      SELECT event_id, user_id,
             epoch_us(ts) AS ts_us, value
      FROM events
    )
    WHERE user_id BETWEEN 2 AND 9
      AND ts_us BETWEEN 1704067200000000 AND 1704844800000000
    """,
    doc="two-dimensional predicate over the Z-ORDERED event lake: the "
    "query rewrites events through write_zordered_lake (Morton-code "
    "clustering on (user_id, ts)) and scans the result with a predicate "
    "on BOTH dimensions — the access pattern the layout exists for "
    "(footer min/max prune files on either column; verified from "
    "parquet metadata in test_sinks). The oracle reads the ORIGINAL "
    "table: a layout rewrite must never change query results, which is "
    "exactly what this row proves under the hash check",
)
def scan_zorder_two_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from cognitive_score_bigdata_spark.sources.sinks import (
        write_zordered_lake,
    )

    def build() -> str:
        path = os.path.join(tempfile.mkdtemp(prefix="csb_zlake_"), "events")
        events = load_table(spark, sf_dir, "events").withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        )
        write_zordered_lake(events, path, ["user_id", "ts_us"], n_files=16)
        return path

    lake = spark.read.parquet(
        session_scoped(_ZLAKE_CACHE, spark, (sf_dir,), build)
    )
    return lake.filter(
        F.col("user_id").between(2, 9)
        & F.col("ts_us").between(1704067200000000, 1704844800000000)
    ).select("event_id", "user_id", "ts_us", "value")


@register(
    "text_fuzzy_token_pairs",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT unnest(string_split_regex(text, ' +')) AS tok
      FROM documents
    )
    SELECT a.tok AS tok_a, b.tok AS tok_b,
           CAST(levenshtein(a.tok, b.tok) AS INT) AS dist
    FROM vocab a JOIN vocab b ON a.tok < b.tok
    WHERE levenshtein(a.tok, b.tok) <= 2
    """,
    doc="typo-level fuzzy token matching via the FastSS deletion-"
    "neighborhood join (k=2): every token explodes into its 0/1/2-"
    "deletion variants, candidate pairs are an EQUI-join on the variant "
    "(O(vocab x len^2) rows through the shuffle, never the vocab x "
    "vocab cross join the oracle runs), then an exact levenshtein "
    "verify kills false positives — two strings within edit distance k "
    "always share a k-deletion variant, so the candidate set is "
    "complete. The scalable shape for vocabulary normalization / "
    "OCR-noise collapse over corpus-scale vocabularies",
)
def text_fuzzy_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " +")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    L = F.length("tok")
    d1 = F.transform(
        F.sequence(F.lit(1), L),
        lambda i: F.concat(
            F.substr(F.col("tok"), F.lit(1), i - 1),
            F.substr(F.col("tok"), i + 1, L),
        ),
    )
    # delete positions i<j; descending inner sequences for short tokens
    # only add junk variants, which the exact verify filters anyway
    d2 = F.flatten(
        F.transform(
            F.sequence(F.lit(1), L),
            lambda i: F.transform(
                F.sequence(i + 1, L),
                lambda j: F.concat(
                    F.substr(F.col("tok"), F.lit(1), i - 1),
                    F.substr(F.col("tok"), i + 1, j - i - 1),
                    F.substr(F.col("tok"), j + 1, L),
                ),
            ),
        )
    )
    variants = vocab.select(
        "tok",
        F.explode(
            F.array_distinct(
                F.concat(F.array(F.col("tok")), d1, d2)
            )
        ).alias("variant"),
    )
    a = variants.select(F.col("tok").alias("tok_a"), "variant")
    b = variants.select(F.col("tok").alias("tok_b"), "variant")
    return (
        a.join(b, "variant")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .dropDuplicates(["tok_a", "tok_b"])
        .withColumn(
            "dist", F.levenshtein(F.col("tok_a"), F.col("tok_b")).cast("int")
        )
        .filter(F.col("dist") <= 2)
        .select("tok_a", "tok_b", "dist")
    )


@register(
    "multimodal_audio_spectrum",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(3 + doc_id % 13 AS INT) AS dominant_bin,
           CAST(256 AS INT) AS n_samples
    FROM documents WHERE doc_id % 3 = 0
    """,
    doc="REAL audio DSP path, value-pinned by construction: pure tones "
    "at an EXACT FFT-bin frequency (k = 3 + doc_id%13 cycles in a "
    "256-sample window) are PCM16-WAV-encoded, parsed back by the "
    "pure-numpy codec, and rfft'd inside mapInPandas — an integer-exact "
    "tone has zero spectral leakage, so argmax|rfft| must equal k and "
    "the oracle recomputes it as integer arithmetic on doc_id. Encode → "
    "container parse → spectral feature, all under the hash check",
)
def multimodal_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from cognitive_score_bigdata_spark.operators.codecs import (
        encode_wav,
        parse_wav,
    )

    N = 256
    docs = fan_out(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(N)
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = []
            for d in pdf["doc_id"]:
                k = 3 + int(d) % 13
                wave = (
                    np.sin(2 * np.pi * k * t / N) * 12000.0
                ).astype(np.int16)
                payloads.append(encode_wav(wave))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    def spectrum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            bins, counts = [], []
            for p in pdf["payload"]:
                wav = parse_wav(bytes(p))
                x = wav["samples"][:, 0].astype(np.float64)
                mag = np.abs(np.fft.rfft(x))
                bins.append(int(mag.argmax()))
                counts.append(len(x))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dominant_bin": np.array(bins, dtype=np.int32),
                    "n_samples": np.array(counts, dtype=np.int32),
                }
            )

    wavs = docs.mapInPandas(synth, "media_id long, payload binary")
    return wavs.mapInPandas(
        spectrum, "media_id long, dominant_bin int, n_samples int"
    )


@register(
    "corpus_train_holdout_split",
    oracle="""
    WITH tagged AS (
      SELECT source, doc_id,
             len(string_split_regex(text, ' +')) AS n_tok,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 100 AS h
      FROM documents
    )
    SELECT CASE WHEN h < 90 THEN 'train'
                WHEN h < 95 THEN 'val'
                ELSE 'test' END AS split,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM tagged GROUP BY 1, 2
    """,
    doc="deterministic train/val/test holdout assignment — the split "
    "every training-data pipeline needs to be REPRODUCIBLE and "
    "JOIN-FREE: membership is a pure function of the stable document id "
    "(md5 -> 60-bit int -> mod 100 -> 90/5/5), so any node can classify "
    "any record without coordination, reruns and late-arriving shards "
    "land in the same split, and no membership table is shuffled or "
    "broadcast at 100 TB. Per (split, source) occupancy stats make the "
    "90/5/5 allocation and source balance auditable under the hash check",
)
def corpus_train_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    ).alias("split")
    return (
        docs.select(split, "source", "doc_id", TX.token_count("text").alias("n_tok"))
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@register(
    "quality_data_validation",
    oracle="""
    WITH base AS (
      SELECT CAST(COUNT(o_custkey) AS DOUBLE) / COUNT(*) AS completeness,
             CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*)
               AS uniqueness,
             CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS DOUBLE)
               AS range_violations,
             MIN(o_totalprice) AS min_price,
             MAX(o_totalprice) AS max_price
      FROM orders
    ),
    orphans AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS orphan_orders
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL
    )
    SELECT m.metric, m.value FROM base, orphans,
    LATERAL (VALUES
      ('completeness_o_custkey', completeness),
      ('uniqueness_o_orderkey', uniqueness),
      ('range_violations_o_totalprice', range_violations),
      ('min_o_totalprice', min_price),
      ('max_o_totalprice', max_price),
      ('orphan_orders', orphan_orders)
    ) AS m(metric, value)
    """,
    doc="declarative data-quality validation suite (the Deequ pattern): "
    "completeness, key uniqueness, range-violation count, min/max "
    "profile, and referential-integrity orphan count, computed as ONE "
    "aggregate pass over the fact table plus one broadcast anti-join — "
    "never one job per constraint. Tall (metric, value) output so the "
    "constraint set can grow without schema changes; the gate every "
    "ingest pipeline runs before promoting a 100 TB batch",
)
def quality_data_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.agg(
        (F.count("o_custkey").cast("double") / F.count(F.lit(1))).alias(
            "completeness"
        ),
        (
            F.count_distinct(F.col("o_orderkey")).cast("double")
            / F.count(F.lit(1))
        ).alias("uniqueness"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1))
        .cast("double")
        .alias("range_violations"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    orphans = (
        o.join(
            F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left_anti"
        ).agg(F.count(F.lit(1)).cast("double").alias("orphan_orders"))
    )
    return base.crossJoin(orphans).selectExpr(
        """stack(6,
          'completeness_o_custkey', completeness,
          'uniqueness_o_orderkey', uniqueness,
          'range_violations_o_totalprice', range_violations,
          'min_o_totalprice', min_price,
          'max_o_totalprice', max_price,
          'orphan_orders', orphan_orders
        ) AS (metric, value)"""
    )


@register(
    "vector_centroid_by_group",
    oracle="""
    WITH ex AS (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding) AS v
      FROM embeddings
    )
    SELECT label, CAST(dim AS INT) AS dim,
           CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE)
             / COUNT(v) AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM ex GROUP BY label, dim
    """,
    doc="per-group embedding centroids (label -> mean vector), the "
    "reduction behind k-means updates, class prototypes, and SemDeDup "
    "cluster centers — computed DISTRIBUTED: posexplode to (label, dim, "
    "value), one shuffle on the composite key with map-side partial "
    "sums, DECIMAL(28,6) accumulator so the result is independent of "
    "partitioning (the property that makes it oracle-checkable at all). "
    "Output rows = labels x dims, never collected vectors",
)
def vector_centroid_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.queries._helpers import davg

    ex = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "v"
            ),
        )
    )
    return ex.groupBy("label", "dim").agg(
        davg("v", "centroid"),
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
    )


@register(
    "scd2_user_event_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    chg AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type AS status, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current,
           CAST(row_number() OVER w AS BIGINT) AS version
    FROM chg
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="slowly-changing-dimension type-2 history build: collapse the "
    "raw event stream to status-change rows (lag over (ts, event_id) — "
    "the unique tiebreaker makes equal-timestamp runs deterministic), "
    "then derive [valid_from, valid_to) intervals, is_current flag, and "
    "version number with lead/row_number over the SAME partitioning — "
    "Catalyst evaluates all three in one Window exchange. The standard "
    "warehouse dimension-versioning op, one shuffle end to end",
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.scd2 import scd2_build

    return scd2_build(load_table(spark, sf_dir, "events"))
