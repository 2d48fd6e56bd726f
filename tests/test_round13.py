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
