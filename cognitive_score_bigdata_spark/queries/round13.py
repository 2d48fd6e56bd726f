"""Round-13 queries: the seeded-quantizer transfer (VERDICT r12 item 3)
— two rows-only families given fully hash-checkable siblings.

``vector_ann_ivf_topk_seeded`` — the IVF ANN probe made hash-checkable
the same way ``dedup_semantic_pairs_seeded`` did it for blocked
SemDeDup: swap the Lloyd-trained coarse quantizer (seeded/iterative,
not SQL) for the deterministic 8-seed centroid table and keep EVERY
other stage of the production probe — cell assignment, per-query cell
ranking, n_probe candidate generation, exact cosine verify, top-k rank
— running through the same ``IvfIndex``/``ivf_probe`` code path the
rows-only ``vector_ann_ivf_topk`` uses. The DuckDB mirror recomputes
assignment, probe-cell choice and ranking from scratch, so the driver
hash-checks the ANN *algorithm*, not just its row count. The evidence
transfers to the k-means sibling because the two differ ONLY in where
the centroid matrix comes from.

``sketch_theta_md5_overlap`` — theta/KMV set algebra with an EXACT
oracle, the ``sketch_hll_md5_users`` recipe applied to the remaining
ledgered sketch family: md5-fixed 60-bit hashes (bit-identical in both
engines), K smallest per side, theta = min of the two K-th order
statistics (exact-mode sides use 2^60), membership counts below theta
are plain integers, and the four estimates are single IEEE divisions
of identical integer operands. Every stage of the theta sketch —
hashing, the K-th order statistic, the min-theta combine, the
below-theta intersection/union counts — is bit-reproducible, so the
sketch family's set-ALGEBRA row (what HLL cannot do) becomes
driver-auditable like the KMV/HLL/md5-MinHash rows. The datasketches
pipeline (``sketch_theta_user_overlap``) stays as the fast generic
path.

Cross-engine float contract (IVF row): Spark assigns cells in unit
space via ``norm_assign_fn`` (argmin of |c|^2 - 2 v.c, strictly
decreasing in cosine for unit centroids, tie -> lowest cell), ranks
probe cells by unit-space euclidean distance, and scores candidates
with the HOF dot over unit vectors; DuckDB uses
list_cosine_similarity DESC + id ASC everywhere. All three decisions
are protected by margins pinned non-degenerate in
tests/test_round13.py (assignment gap, probe-cell boundary gap at
n_probe, consecutive candidate-cosine gaps per query).

Reference parity: ANN/sketch-family extensions (SURVEY §2-extras);
the reference has no embedding or sketch pipeline.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.round12 import (
    SEED_MAX,
    SEED_MOD,
    SEED_REM,
    seeded_cells,
)
from cognitive_score_bigdata_spark.session_cache import session_scoped

ANN_K = 10
ANN_N_PROBE = 2  # of the 8 seeded cells
ANN_N_QUERIES = 5  # vec_id < 5, same query set as the k-means sibling

_SEEDED_IVF_CACHE: dict = {}


def _seeded_ivf_index(spark: SparkSession, sf_dir: str):
    """Session-cached seeded-centroid IVF index over the PLAIN
    embeddings table (build artifact, like the k-means sibling's
    ``ivf_index``): cand = one Arrow assignment pass, centers = the 8
    unit-normalized seed embeddings (bounded 8-row collect)."""
    from cognitive_score_bigdata_spark.operators.similarity import IvfIndex

    def build():
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        seeds = emb.filter(
            (F.col("vec_id") % SEED_MOD == SEED_REM)
            & (F.col("vec_id") < SEED_MAX)
        )
        rows = seeds.collect()  # 8 rows — build artifact, not data
        rows.sort(key=lambda r: r.vec_id)
        C = np.array([r.embedding for r in rows], dtype=np.float64)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        cand = seeded_cells(emb, seeds).persist()
        centers_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(C)],
            "cell int, center array<double>",
        )
        return IvfIndex(cand, centers_df)

    return session_scoped(_SEEDED_IVF_CACHE, spark, (sf_dir,), build)


@register(
    "vector_ann_ivf_topk_seeded",
    oracle=f"""
    WITH seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
             embedding AS center
      FROM embeddings
      WHERE vec_id % {SEED_MOD} = {SEED_REM} AND vec_id < {SEED_MAX}
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, s.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.center)
                          DESC, s.cell ASC
               ) AS rn
        FROM embeddings e CROSS JOIN seeds s
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, s.cell,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding, s.center)
                          DESC, s.cell ASC
               ) AS rc
        FROM embeddings q CROSS JOIN seeds s
        WHERE q.vec_id < {ANN_N_QUERIES}
      ) WHERE rc <= {ANN_N_PROBE}
    )
    SELECT query_id, neighbor_id, rnk FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY p.query_id
               ORDER BY list_cosine_similarity(qe.embedding, ce.embedding)
                        DESC, a.vec_id ASC
             ) AS BIGINT) AS rnk
      FROM probe p
      JOIN assign a ON a.cell = p.cell
      JOIN embeddings ce ON ce.vec_id = a.vec_id
      JOIN embeddings qe ON qe.vec_id = p.query_id
      WHERE a.vec_id <> p.query_id
    ) WHERE rnk <= {ANN_K}
    """,
    doc="IVF approximate top-k with a deterministic seeded coarse "
    "quantizer: cells = nearest of 8 fixed seed embeddings, each query "
    "probes its 2 nearest cells, exact cosine verify + top-10 rank "
    "inside the candidates — the SAME IvfIndex/ivf_probe path as the "
    "k-means row, hash-checked stage-for-stage against the DuckDB "
    "mirror (assignment, probe-cell choice, ranking). First full hash "
    "oracle for the ANN probe family; the k-means sibling differs only "
    "in where the centroid matrix comes from",
)
def vector_ann_ivf_topk_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.similarity import ivf_probe

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_N_QUERIES)
    index = _seeded_ivf_index(spark, sf_dir)
    return ivf_probe(index, queries, k=ANN_K, n_probe=ANN_N_PROBE).select(
        "query_id", "neighbor_id", "rnk"
    )


# ---------------------------------------------------------------------------
# sketch_theta_md5_overlap
# ---------------------------------------------------------------------------

THETA_K = 64
_2_60 = 1 << 60  # md5 15-hex-digit hashes are uniform in [0, 2^60)


@register(
    "sketch_theta_md5_overlap",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    ranked AS (
      SELECT event_type, hv,
             row_number() OVER (
               PARTITION BY event_type ORDER BY hv ASC
             ) AS rn
      FROM h
    ),
    th AS (
      SELECT event_type,
             CASE WHEN COUNT(*) >= {THETA_K}
                  THEN MAX(CASE WHEN rn = {THETA_K} THEN hv END)
                  ELSE {_2_60} END AS theta_g
      FROM ranked GROUP BY event_type
    ),
    theta AS (SELECT MIN(theta_g) AS theta FROM th),
    below AS (
      SELECT h.event_type, h.hv FROM h, theta WHERE h.hv < theta.theta
    ),
    counts AS (
      SELECT
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN hv END)
             AS BIGINT) AS n_a_below,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN hv END)
             AS BIGINT) AS n_b_below,
        CAST(COUNT(DISTINCT hv) AS BIGINT) AS n_union_below
      FROM below
    )
    SELECT 'view' AS group_a, 'purchase' AS group_b,
           CAST(theta.theta AS BIGINT) AS theta,
           n_a_below, n_b_below,
           CAST(n_a_below + n_b_below - n_union_below AS BIGINT)
             AS n_intersection_below,
           n_union_below,
           n_a_below * {_2_60}.0 / theta.theta AS est_a,
           n_b_below * {_2_60}.0 / theta.theta AS est_b,
           (n_a_below + n_b_below - n_union_below) * {_2_60}.0
             / theta.theta AS est_intersection,
           n_union_below * {_2_60}.0 / theta.theta AS est_union
    FROM counts, theta
    """,
    doc="theta/KMV set algebra with an EXACT oracle: md5-fixed 60-bit "
    "hashes, theta = min over sides of the K=64-th smallest hash "
    "(2^60 for exact-mode sides), |A|, |B|, |A intersect B|, |A union "
    "B| estimated as below-theta counts scaled by 2^60/theta — "
    "integers end to end, the four estimates are single IEEE "
    "divisions of identical operands, so the sketch family's "
    "set-algebra row (intersection is what HLL cannot do) hash-checks "
    "cross-engine; the datasketches pipeline stays the fast path",
)
def sketch_theta_md5_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("hv"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("hv"))
    ranked = h.withColumn("rn", F.row_number().over(w))
    th = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("rn") == THETA_K, F.col("hv"))).alias("kth"),
    )
    theta = th.agg(
        F.min(
            F.when(F.col("n") >= THETA_K, F.col("kth")).otherwise(
                F.lit(_2_60)
            )
        ).alias("theta")
    )
    below = h.join(F.broadcast(theta), F.col("hv") < F.col("theta"))
    counts = below.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("hv"))
        ).cast("bigint").alias("n_a_below"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("hv"))
        ).cast("bigint").alias("n_b_below"),
        F.countDistinct("hv").cast("bigint").alias("n_union_below"),
    )
    n_i = (
        F.col("n_a_below") + F.col("n_b_below") - F.col("n_union_below")
    ).cast("bigint")
    scale = F.lit(float(_2_60))
    return counts.crossJoin(F.broadcast(theta)).select(
        F.lit("view").alias("group_a"),
        F.lit("purchase").alias("group_b"),
        F.col("theta").cast("bigint").alias("theta"),
        "n_a_below",
        "n_b_below",
        n_i.alias("n_intersection_below"),
        "n_union_below",
        (F.col("n_a_below") * scale / F.col("theta")).alias("est_a"),
        (F.col("n_b_below") * scale / F.col("theta")).alias("est_b"),
        (n_i * scale / F.col("theta")).alias("est_intersection"),
        (F.col("n_union_below") * scale / F.col("theta")).alias("est_union"),
    )
