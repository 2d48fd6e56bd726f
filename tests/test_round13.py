"""Round-13 pins for the three ADVICE-r12 manifest findings
(operators/index_manifest.py):

1. sort-aware compaction convergence must tolerate the ONE extra file
   a range slice staging across a partition boundary produces —
   without the slack the nightly trigger re-touches and rewrites that
   partition with identical content forever;
2. ``replace_parts_commit`` must canonicalize partition values the
   same way ``read_index(part_values=)`` does (bool → ``true``, None →
   ``__HIVE_DEFAULT_PARTITION__``, URL-unescape the disk spelling) —
   plain ``str(v)`` falsely fired the stray-file guard and left
   superseded files live;
3. ``vacuum_index(orphan_grace_s=)`` must leave a YOUNG above-pointer
   manifest alone (it may be a concurrent writer mid-commit, and
   deleting it would strand that writer's pointer flip) while still
   excluding it from the keep set.

Plus the round-13 seeded-quantizer transfer rows (queries/round13.py):
float-margin non-degeneracy for every cross-engine decision of
``vector_ann_ivf_topk_seeded`` (cell argmax, probe-cell boundary at
n_probe, candidate-cosine ordering) and exact/estimator-regime truth
for ``sketch_theta_md5_overlap``.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyspark.sql.functions as F
import pytest

from cognitive_score_bigdata_spark.operators.index_manifest import (
    append_commit,
    compact_index_parts,
    publish_manifest,
    read_index,
    read_manifest,
    replace_parts_commit,
    vacuum_index,
)
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _fresh(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=prefix) + "/idx"


def test_compaction_straddle_slack_converges(spark):
    """A partition holding exactly files_per_part + 1 files — the
    shape a boundary-straddling range slice legitimately stages — must
    NOT be re-touched when cluster_col is set; one more file than that
    still triggers."""
    path = _fresh("csb_straddle_")
    docs = _docs(spark).withColumn("band", F.lit(0))
    append_commit(
        path,
        lambda: docs.repartition(5)
        .write.mode("append")
        .partitionBy("band")
        .parquet(path),
        stats_cols=["doc_id"],
    )
    # 5 files at files_per_part=4: the straddle shape → converged, no-op
    assert (
        compact_index_parts(
            spark, path, "band", max_files_per_part=1,
            cluster_col="doc_id", files_per_part=4,
        )
        == {}
    )
    # 5 files at files_per_part=3: over even the slacked threshold
    out = compact_index_parts(
        spark, path, "band", max_files_per_part=1,
        cluster_col="doc_id", files_per_part=3,
    )
    assert out and out[0][0] == 5


def test_replace_parts_bool_and_escaped_partition_values(spark):
    """Boolean and URL-escaped partition values: the caller passes the
    Python value / raw string, the writer puts Spark's hive-path
    spelling on disk, and replace_parts_commit must match the two —
    no false stray-file error, and the old partition content must be
    superseded (not double-counted)."""
    path = _fresh("csb_replparts_")
    docs = _docs(spark).withColumn("flag", F.col("doc_id") % 2 == 0)
    append_commit(
        path,
        lambda: docs.write.mode("append").partitionBy("flag").parquet(path),
        stats_cols=["doc_id"],
    )
    n_false = docs.filter(~F.col("flag")).count()
    replacement = (
        docs.filter(F.col("flag"))
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    # old code: vals == {'True'}, disk says flag=true → ValueError here
    replace_parts_commit(
        path,
        lambda: replacement.write.mode("append")
        .partitionBy("flag")
        .parquet(path),
        part_values=[True],
        stats_cols=["doc_id"],
    )
    # hive partition columns come back as their path spelling (string
    # 'true'/'false' — Spark's inference does not cover booleans)
    live = read_index(spark, path).withColumn(
        "flag", F.col("flag").cast("string")
    )
    # survivors filtered: no pre-replacement flag=true row remains
    assert (
        live.filter(
            (F.col("flag") == "true") & (F.col("doc_id") < 100000)
        ).count()
        == 0
    )
    assert live.filter(F.col("flag") == "true").count() == replacement.count()
    assert live.filter(F.col("flag") == "false").count() == n_false

    # URL-escaped value (':' → %3A on disk) round-trips via unquote
    path2 = _fresh("csb_replparts_esc_")
    tagged = _docs(spark).withColumn(
        "tag", F.when(F.col("doc_id") % 2 == 0, "a:b").otherwise("plain")
    )
    append_commit(
        path2,
        lambda: tagged.write.mode("append").partitionBy("tag").parquet(path2),
    )
    repl2 = tagged.filter(F.col("tag") == "a:b").limit(5)
    replace_parts_commit(
        path2,
        lambda: repl2.write.mode("append").partitionBy("tag").parquet(path2),
        part_values=["a:b"],
    )
    live2 = read_index(spark, path2)
    assert live2.filter(F.col("tag") == "a:b").count() == 5
    assert (
        live2.filter(F.col("tag") == "plain").count()
        == tagged.filter(F.col("tag") == "plain").count()
    )


def test_vacuum_orphan_grace_spares_young_manifest(spark):
    """orphan_grace_s: a freshly-written above-pointer manifest is NOT
    deleted (it may be a live writer between manifest write and pointer
    flip) but is still excluded from the keep set; the default grace of
    0 deletes it immediately (single-writer recovery unchanged)."""
    path = _fresh("csb_grace_")
    docs = _docs(spark).withColumn("band", F.lit(0)).limit(10)
    append_commit(
        path,
        lambda: docs.coalesce(1)
        .write.mode("append")
        .partitionBy("band")
        .parquet(path),
    )
    v, files = read_manifest(path)
    orphan = os.path.join(path, "_manifest", f"m-{v + 1:010d}.json")
    with open(orphan, "w") as fh:
        json.dump(
            {"version": v + 1, "files": [], "note": "mid-commit?"}, fh
        )
    deleted = vacuum_index(path, keep_versions=1, orphan_grace_s=3600.0)
    assert os.path.exists(orphan)  # spared: could be a live writer
    assert os.path.relpath(orphan, path) not in deleted
    # ...but its empty file list never protected anything: the live
    # snapshot (keep_versions=1) is intact
    assert read_manifest(path) == (v, files)
    for f in files:
        assert os.path.exists(os.path.join(path, f))
    # CAS still blocked while the orphan stands
    with pytest.raises(FileExistsError, match="vacuum_index"):
        publish_manifest(path, files, note="retry")
    # grace elapsed (default 0): the designated janitor clears it
    deleted = vacuum_index(path, keep_versions=1)
    assert not os.path.exists(orphan)
    assert os.path.relpath(orphan, path) in deleted
    assert publish_manifest(path, files, note="retry") == v + 1


# ---------------------------------------------------------------------------
# round-13 queries: seeded IVF probe + md5 theta overlap
# ---------------------------------------------------------------------------


def _emb_and_seeds(spark):
    from cognitive_score_bigdata_spark.queries.round12 import (
        SEED_MAX,
        SEED_MOD,
        SEED_REM,
    )

    emb = (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .toPandas()
    )
    import numpy as np

    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ids = emb["vec_id"].to_numpy()
    mask = (ids % SEED_MOD == SEED_REM) & (ids < SEED_MAX)
    order = np.argsort(ids[mask])
    return ids, M, M[mask][order]


def test_seeded_ivf_probe_margins_nondegenerate(spark):
    """Every cross-engine float decision of vector_ann_ivf_topk_seeded
    is margin-protected: (a) each vector's best-vs-second seed gap, (b)
    each query's probe boundary (n_probe-th vs n_probe+1-th cell), (c)
    each query's consecutive candidate-cosine gaps — so Spark's
    unit-space euclidean ranks and DuckDB's cosine ranks cannot
    disagree anywhere in the pipeline."""
    import numpy as np

    from cognitive_score_bigdata_spark.queries.round13 import (
        ANN_N_PROBE,
        ANN_N_QUERIES,
    )

    ids, M, C = _emb_and_seeds(spark)
    sims = M @ C.T
    top2 = np.sort(sims, axis=1)[:, -2:]
    assert (top2[:, 1] - top2[:, 0]).min() > 1e-6

    cells = sims.argmax(axis=1)
    qmask = ids < ANN_N_QUERIES
    qsims = np.sort(sims[qmask], axis=1)[:, ::-1]
    probe_gap = qsims[:, ANN_N_PROBE - 1] - qsims[:, ANN_N_PROBE]
    assert probe_gap.min() > 1e-6, f"probe boundary margin: {probe_gap}"

    # candidate ordering: per query, all consecutive cosine gaps among
    # its probed cells' members are far above the ulp scale at which
    # the two engines' cosine formulations could diverge
    probed = (-sims[qmask]).argsort(axis=1)[:, :ANN_N_PROBE]
    for qi, qrow in enumerate(np.where(qmask)[0]):
        members = np.isin(cells, probed[qi]) & (ids != ids[qrow])
        cos = np.sort(M[members] @ M[qrow])
        gaps = np.diff(cos)
        assert gaps.min() > 1e-9, f"candidate margin q{ids[qrow]}: {gaps.min()}"


def test_seeded_ivf_probe_matches_numpy_truth(spark):
    """The Spark probe result equals an independent numpy recomputation
    of the same contract (assign -> probe 2 cells -> exact cosine top-10,
    ties to lowest id) — the oracle-free in-repo proof."""
    import numpy as np

    from cognitive_score_bigdata_spark.queries import load_registry
    from cognitive_score_bigdata_spark.queries.round13 import (
        ANN_K,
        ANN_N_PROBE,
        ANN_N_QUERIES,
    )

    reg = load_registry()
    got = (
        reg["vector_ann_ivf_topk_seeded"].fn(spark, SF_DIR)
        .toPandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )
    ids, M, C = _emb_and_seeds(spark)
    sims = M @ C.T
    cells = sims.argmax(axis=1)
    rows = []
    for qrow in np.where(ids < ANN_N_QUERIES)[0]:
        probed = (-sims[qrow]).argsort()[:ANN_N_PROBE]
        members = np.isin(cells, probed) & (ids != ids[qrow])
        cand_ids = ids[members]
        cos = M[members] @ M[qrow]
        order = np.lexsort((cand_ids, -cos))[:ANN_K]
        rows.extend(
            (int(ids[qrow]), int(cand_ids[j]), r + 1)
            for r, j in enumerate(order)
        )
    import pandas as pd

    want = pd.DataFrame(
        rows, columns=["query_id", "neighbor_id", "rnk"]
    ).sort_values(["query_id", "rnk"]).reset_index(drop=True)
    assert got.astype("int64").equals(want.astype("int64"))


def test_theta_md5_overlap_truth_both_regimes(spark):
    """sf0.001 has 15 distinct users per side (< K=64): theta = 2^60 and
    every estimate is EXACT. At the driver SF (150 per side) the
    estimator regime engages: theta is the 64th order statistic and the
    estimates must land within KMV error of the exact answers."""
    from cognitive_score_bigdata_spark.queries import load_registry
    from cognitive_score_bigdata_spark.queries.round13 import THETA_K, _2_60

    reg = load_registry()
    fn = reg["sketch_theta_md5_overlap"].fn

    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    import pandas as pd

    ev = events.select("event_type", "user_id").toPandas()
    a = set(ev[ev.event_type == "view"].user_id)
    b = set(ev[ev.event_type == "purchase"].user_id)

    row = fn(spark, SF_DIR).toPandas().iloc[0]
    if len(a) < THETA_K and len(b) < THETA_K:
        assert row["theta"] == _2_60
        assert row["est_a"] == len(a) and row["est_b"] == len(b)
        assert row["est_intersection"] == len(a & b)
        assert row["est_union"] == len(a | b)
    # internal consistency in every regime
    assert (
        row["n_intersection_below"]
        == row["n_a_below"] + row["n_b_below"] - row["n_union_below"]
    )
    assert row["n_intersection_below"] >= 0

    # estimator regime at the driver SF
    sf01 = "/root/testdata/sf0.01"
    ev1 = (
        spark.read.parquet(os.path.join(sf01, "events.parquet"))
        .select("event_type", "user_id")
        .toPandas()
    )
    a1 = set(ev1[ev1.event_type == "view"].user_id)
    b1 = set(ev1[ev1.event_type == "purchase"].user_id)
    assert len(a1) >= THETA_K  # the regime the driver actually checks
    row1 = fn(spark, sf01).toPandas().iloc[0]
    assert row1["theta"] < _2_60
    for est, exact in (
        (row1["est_a"], len(a1)),
        (row1["est_b"], len(b1)),
        (row1["est_union"], len(a1 | b1)),
        (row1["est_intersection"], len(a1 & b1)),
    ):
        # KMV relative error ~ 1/sqrt(K-1) ≈ 12.6%; allow 4 sigma
        assert abs(est - exact) <= max(4 * exact / (THETA_K - 1) ** 0.5, 8)
