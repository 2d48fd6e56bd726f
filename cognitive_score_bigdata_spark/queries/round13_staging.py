"""Round-13 staged queries (benched + banded from day one, the
rounds-8-12 staging pattern): the dedup family's two remaining
compositions, both with FULL hash oracles.

``dedup_semantic_incremental`` — the semantic twin of
``dedup_incremental_newbatch``: a new crawl increment probed against
the CORPUS's cell-blocked embedding space with no corpus-side
recompute. Assignment uses the round-12 seeded quantizer
(deterministic, SQL-expressible — see ``queries/round12.py``), so
unlike the minhash incremental row (rows-only: LSH banding isn't SQL)
this one hash-matches end to end: new batch assigns to seed cells,
pairs form ONLY against same-cell corpus vectors via a cogrouped
blocked-Gram kernel (new x corpus, never corpus x corpus), cos >=
0.95. Scale: the corpus side is the session-scoped assignment
artifact read once by cell; the new batch is the only moving part —
O(batch) work against a standing index, the same contract as the
minhash incremental path.

``dedup_ensemble_clusters`` — near-dup clustering over the UNION of
the three oracle-able pair evidence legs the repo ships: md5-banded
MinHash (lexical, ``dedup_minhash_pairs_md5`` at est_jaccard >= 0.5),
winnowing fingerprints (substring overlap, ``dedup_winnowing_pairs``),
and seeded semantic pairs (embedding cosine >= 0.95, base vectors
only — doc_id and vec_id share an id space in the test corpus). This
is how production dedup actually decides: multiple weak candidate
generators, one transitive-closure cluster assignment. Every leg and
the min-label connected components have cross-engine-exact semantics,
so the COMPOSITION gets a hash oracle (nested-CTE legs + recursive-CTE
reach, the ``dedup_cluster_exact`` pattern). Scale: each leg is its
proven bucketed/blocked plan; the union is ids-only; CC is the hybrid
local-finish operator (bounded driver at <= 2M edges, distributed
min-label beyond).

Reference parity: curation-family extensions (SURVEY §2-extras).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register
from cognitive_score_bigdata_spark.queries.round12 import (
    SEED_MAX,
    SEED_MOD,
    SEED_REM,
    SEM_THRESHOLD,
    _seeded_cand,
    seeded_cells,
)

NEW_MOD = 5  # every 5th vector re-ingested, the incremental fixture
NEW_SHIFT = 2_000_000

# Shared SQL fragment: deterministic seed-cell assignment of an
# arbitrary (vec_id, embedding) relation named by `rel`. Seeds always
# come from the BASE embeddings table, matching seeded_cells.
def _assign_sql(rel: str) -> str:
    return f"""
    SELECT vec_id, embedding, cell FROM (
      SELECT c.vec_id, c.embedding, s.cell,
             row_number() OVER (
               PARTITION BY c.vec_id
               ORDER BY list_cosine_similarity(c.embedding, s.center)
                        DESC, s.cell ASC
             ) AS rn
      FROM {rel} c CROSS JOIN seeds s
    ) WHERE rn = 1
    """


_SEEDS_CTE = f"""
    seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
             embedding AS center
      FROM embeddings
      WHERE vec_id % {SEED_MOD} = {SEED_REM} AND vec_id < {SEED_MAX}
    )
"""


def semantic_probe_pairs(
    corpus_cand: DataFrame,
    new_cand: DataFrame,
    threshold: float,
    block: int = 1024,
) -> DataFrame:
    """(cell, new_id, corpus_id): cosine >= threshold pairs between a
    NEW batch and the standing corpus, computed only within shared
    cells — the cogrouped face of ``semantic_dedup_pairs``'s blocked
    Gram kernel (new x corpus strips, executor memory bounded by
    ``block``; ids only in the output)."""

    if new_cand is corpus_cand:
        raise ValueError(
            "cogrouping a DataFrame with itself is not well-defined in "
            "Spark; for within-set pairs use semantic_dedup_pairs"
        )

    # Cell pruning (r13, the deferred r12 watch item): pairs can only
    # form in cells the BATCH occupies, yet the cogroup would shuffle
    # every corpus cell's vectors regardless — at 100 TB that is the
    # whole standing corpus moving for an O(batch) probe. The broadcast
    # semi-join restricts the corpus side to the batch's cell set
    # before the shuffle; semantics are untouched (empty cogroup sides
    # already produced no pairs). The batch assignment now has TWO
    # consumers (the cell set and the cogroup side), so materialize it
    # once — same lazy-checkpoint move as the sign-LSH buckets —
    # instead of running the batch's norm_assign Arrow pass twice.
    new_cand = new_cand.localCheckpoint(eager=False)
    corpus_cand = corpus_cand.join(
        F.broadcast(new_cand.select("cell").distinct()), "cell", "semi"
    )

    def probe(key, corpus_pdf: pd.DataFrame, new_pdf: pd.DataFrame):
        if corpus_pdf.empty or new_pdf.empty:
            return pd.DataFrame({"cell": [], "new_id": [], "corpus_id": []})
        cids = corpus_pdf["neighbor_id"].to_numpy()
        Cm = np.stack(corpus_pdf["__c"].to_numpy())
        nids = new_pdf["neighbor_id"].to_numpy()
        Nm = np.stack(new_pdf["__c"].to_numpy())
        out_n, out_c = [], []
        for s in range(0, len(nids), block):
            G = Nm[s : s + block] @ Cm.T
            ni, ci = np.nonzero(G >= threshold)
            out_n.append(nids[ni + s])
            out_c.append(cids[ci])
        return pd.DataFrame(
            {
                "cell": int(key[0]),
                "new_id": np.concatenate(out_n) if out_n else [],
                "corpus_id": np.concatenate(out_c) if out_c else [],
            }
        )

    return (
        corpus_cand.groupBy("cell")
        .cogroup(new_cand.groupBy("cell"))
        .applyInPandas(probe, "cell long, new_id long, corpus_id long")
    )


@register(
    "dedup_semantic_incremental",
    oracle=f"""
    WITH {_SEEDS_CTE},
    corpus AS (SELECT vec_id, embedding FROM embeddings),
    newbatch AS (
      SELECT vec_id + {NEW_SHIFT} AS vec_id, embedding FROM embeddings
      WHERE vec_id % {NEW_MOD} = 0
    ),
    ca AS ({_assign_sql("corpus")}),
    na AS ({_assign_sql("newbatch")})
    SELECT CAST(na.cell AS BIGINT) AS cell,
           na.vec_id AS new_id, ca.vec_id AS corpus_id
    FROM na JOIN ca ON na.cell = ca.cell
    WHERE list_cosine_similarity(na.embedding, ca.embedding)
          >= {SEM_THRESHOLD}
    """,
    doc="incremental SEMANTIC near-dup: every 5th vector re-ingested "
    "under a new id and probed against the corpus's seeded-cell "
    "embedding blocks — new batch assigns to frozen seed cells, "
    "cogrouped blocked-Gram kernel forms pairs only against same-cell "
    "corpus vectors (O(batch) against a standing artifact, no corpus "
    "recompute, never corpus x corpus). Full hash oracle via the "
    "deterministic seeded quantizer — the check the minhash "
    "incremental row (rows-only: LSH banding isn't SQL) cannot have",
)
def dedup_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seeds = emb.filter(
        (F.col("vec_id") % SEED_MOD == SEED_REM) & (F.col("vec_id") < SEED_MAX)
    )
    # corpus side: the round-12 session-scoped assignment artifact,
    # restricted to base vectors (the planted +1M rows are that
    # sibling's fixture, not corpus)
    corpus_cand = _seeded_cand(spark, sf_dir).filter(
        F.col("neighbor_id") < 1_000_000
    )
    new_batch = emb.filter(F.col("vec_id") % NEW_MOD == 0).select(
        (F.col("vec_id") + NEW_SHIFT).alias("vec_id"), "embedding"
    )
    new_cand = seeded_cells(new_batch, seeds)
    return semantic_probe_pairs(corpus_cand, new_cand, SEM_THRESHOLD)


@register(
    "dedup_ensemble_clusters",
    oracle=f"""
    WITH RECURSIVE
    {_SEEDS_CTE},
    corpus AS (SELECT vec_id, embedding FROM embeddings),
    ca AS ({_assign_sql("corpus")}),
    sem_edges AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM ca a JOIN ca b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding)
            >= {SEM_THRESHOLD}
    ),
    mh_edges AS (
      SELECT doc_a, doc_b FROM (
        {{MH_ORACLE}}
      ) WHERE est_jaccard >= 0.5
    ),
    win_edges AS (
      SELECT doc_a, doc_b FROM (
        {{WIN_ORACLE}}
      )
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
    reach(node, lab) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.dst, r.lab FROM reach r JOIN bidir b ON b.src = r.node
    )
    SELECT node AS doc_id, MIN(lab) AS cluster_id
    FROM reach GROUP BY node
    """,
    doc="ensemble near-dup clustering: the union of the three "
    "oracle-able evidence legs — md5-banded MinHash candidates at "
    "est_jaccard >= 0.5 (lexical), winnowing shared fingerprints "
    "(substring), seeded-cell embedding cosine >= 0.95 (semantic, "
    "base vectors; doc_id == vec_id in the test corpus) — closed "
    "under min-label connected components (hybrid local finish). The "
    "production dedup decision shape: several weak candidate "
    "generators, one transitive closure; every leg is its proven "
    "bucketed/blocked plan and the whole composition hash-matches the "
    "nested-CTE + recursive-reach oracle",
)
def dedup_ensemble_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cognitive_score_bigdata_spark.operators.dedup import (
        connected_components,
    )
    from cognitive_score_bigdata_spark.operators.similarity import (
        IvfIndex,
        semantic_dedup_pairs,
    )
    from cognitive_score_bigdata_spark.queries.dedup_md5 import (
        dedup_minhash_pairs_md5,
    )
    from cognitive_score_bigdata_spark.queries.round11_staging import (
        dedup_winnowing_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    mh = (
        dedup_minhash_pairs_md5(spark, sf_dir)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    win = dedup_winnowing_pairs(spark, sf_dir).select("doc_a", "doc_b")
    base_cand = _seeded_cand(spark, sf_dir).filter(
        F.col("neighbor_id") < 1_000_000
    )
    sem = semantic_dedup_pairs(
        docs, threshold=SEM_THRESHOLD, index=IvfIndex(base_cand, None)
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    # §2.6 thread-pool leg overlap was tried and REVERTED in r17: the
    # fused union plan already runs the three legs' stages concurrently
    # (AQE materializes independent query stages in parallel), so eager
    # per-leg checkpoints bought only ~0-8% with worse variance — see
    # OPTIMIZATION_r17.md for the interleaved A/B numbers.
    edges = (
        mh.unionByName(win)
        .unionByName(sem)
        .distinct()
        .select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    )
    return connected_components(edges, docs, "doc_id")


def _splice_ensemble_oracle() -> None:
    """The ensemble oracle reuses the md5-minhash and winnowing oracle
    SQL verbatim (nested as derived tables) — spliced at import so the
    legs can never drift from their standalone rows."""
    from cognitive_score_bigdata_spark.queries import REGISTRY
    from cognitive_score_bigdata_spark.queries.dedup_md5 import (
        _MH_ORACLE,
    )
    from cognitive_score_bigdata_spark.queries.round11_staging import (
        _WIN_ORACLE,
    )
    from dataclasses import replace

    spec = REGISTRY["dedup_ensemble_clusters"]
    REGISTRY["dedup_ensemble_clusters"] = replace(
        spec,
        oracle=spec.oracle.replace("{MH_ORACLE}", _MH_ORACLE).replace(
            "{WIN_ORACLE}", _WIN_ORACLE
        ),
    )


_splice_ensemble_oracle()
