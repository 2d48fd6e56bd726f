"""Round-14 staged query (queries/round14_staging.py): oracle parity
for the zone-map-pruned range scan, plus the structural pins the query
exists to demonstrate — the physical scan opens ONLY the files whose
committed doc_id range overlaps the probe, and the probe's answer is
layout-independent (pruned artifact read ≡ base-table recompute)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.operators.index_manifest import (
    pruned_files,
    read_index,
    read_manifest,
)
from cognitive_score_bigdata_spark.queries import load_registry
from cognitive_score_bigdata_spark.queries.round14_staging import (
    corpus_leakage_safe_splits,
    probe_bounds,
    scan_zonemap_range_agg,
    zonemap_artifact,
)
from tests.conftest import SF_DIR, assert_frames_match


def test_oracle_parity(spark, oracle_con):
    for name in ["scan_zonemap_range_agg", "corpus_leakage_safe_splits"]:
        spec = load_registry()[name]
        sp = spec.fn(spark, SF_DIR).toPandas()
        oc = oracle_con.execute(spec.oracle).df()
        assert_frames_match(sp, oc, name)


def test_splits_never_straddle_a_cluster(spark):
    """THE leakage property: every dedup cluster maps to exactly one
    split, so no near-dup pair (lexical, substring, or semantic
    evidence — the ensemble's union) can land on both sides of a
    train/eval boundary. Also sanity-pins the 8/1/1 shape: all three
    splits populated, train the strict majority."""
    out = corpus_leakage_safe_splits(spark, SF_DIR).toPandas()
    spans = out.groupby("cluster_id")["split"].nunique()
    assert (spans == 1).all()
    counts = out["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] + counts["test"]
    # every document is assigned exactly once
    assert out["doc_id"].is_unique and len(out) == out["doc_id"].count()


def test_probe_opens_only_overlapping_files(spark):
    """IO pin: the pruned scan's inputFiles must be exactly the
    surviving file set, strictly smaller than the committed total —
    the artifact layout (range-clustered on doc_id) makes the middle
    decile skippable."""
    path, mx = zonemap_artifact(spark, SF_DIR)
    lo, hi = probe_bounds(mx)
    total = read_manifest(path)[1]
    kept = pruned_files(path, ("doc_id", lo, hi))
    assert 1 <= len(kept) < len(total), (len(kept), len(total))
    scan = read_index(spark, path, prune=("doc_id", lo, hi))
    opened = sorted(
        os.path.relpath(f.replace("file:", ""), path) for f in scan.inputFiles()
    )
    assert opened == sorted(kept)


def test_splits_compose_with_packing_downstream(spark):
    """The split's reason to exist is what runs AFTER it: per-split
    packing into fixed-length training sequences. Pin the composition —
    pack each split independently (the production shape: train/val/test
    never share sequences) and check (a) token conservation: the sum of
    packed token ranges per split equals the split's raw token count,
    and (b) isolation: no document appears in two splits' packings."""
    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.operators.sharding import (
        pack_sequences,
    )

    docs = load_table(spark, SF_DIR, "documents")
    splits = corpus_leakage_safe_splits(spark, SF_DIR).select(
        "doc_id", "split"
    )
    tagged = docs.join(splits, "doc_id")
    seen: dict[str, set] = {}
    for split in ["train", "val", "test"]:
        part = tagged.filter(F.col("split") == split)
        raw_tokens = part.select(
            F.sum(F.size(F.split(F.col("text"), " +"))).alias("t")
        ).collect()[0].t
        packed = pack_sequences(part, seq_len=128)
        packed_tokens = packed.select(
            F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("t")
        ).collect()[0].t
        assert packed_tokens == raw_tokens, split
        seen[split] = {r.doc_id for r in packed.select("doc_id").distinct().collect()}
    assert not (seen["train"] & seen["val"])
    assert not (seen["train"] & seen["test"])
    assert not (seen["val"] & seen["test"])


def test_zonemap_scan_plan_shape(spark):
    """Scale pins on the staged scan's physical plan: the doc_id range
    reaches the parquet scan as PushedFilters (row-group pruning inside
    the surviving files — the layer below our file-level skip), and the
    aggregation is map-side partial (partial_count/partial_sum before
    the exchange), so shuffle bytes scale with |langs|, not rows."""
    from cognitive_score_bigdata_spark.plans.audit import plan_text

    t = plan_text(scan_zonemap_range_agg(spark, SF_DIR))
    import re

    assert re.search(r"PushedFilters: \[[^\]]*doc_id", t), t[:2000]
    assert "partial_sum" in t or "partial_count" in t, t[:2000]


def test_pruned_scan_equals_unpruned_scan(spark):
    """Advisory-only pin: dropping the prune (full manifest read +
    same real filter) must give the identical aggregate — skipping
    elides IO, never rows."""
    path, mx = zonemap_artifact(spark, SF_DIR)
    lo, hi = probe_bounds(mx)
    agg = lambda df: (  # noqa: E731
        df.filter(F.col("doc_id").between(lo, hi))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s"))
    )
    full = {
        r.lang: (r.n, r.s) for r in agg(read_index(spark, path)).collect()
    }
    pruned = {
        r.lang: (r.n, r.s)
        for r in agg(
            read_index(spark, path, prune=("doc_id", lo, hi))
        ).collect()
    }
    assert pruned == full


# ---------------------------------------------------------------------------
# scan_delete_rewrite_fetch (VERDICT r12 item 4)
# ---------------------------------------------------------------------------


def test_delete_rewrite_oracle_parity(spark, oracle_con):
    spec = load_registry()["scan_delete_rewrite_fetch"]
    sp = spec.fn(spark, SF_DIR).toPandas()
    oc = oracle_con.execute(spec.oracle).df()
    assert_frames_match(sp, oc, "scan_delete_rewrite_fetch")


def test_delete_rewrite_touches_only_affected_partition(spark):
    """The UPDATE-shaped lifecycle's two structural pins:

    (a) the rewrite superseded files ONLY in the one partition the
        delete list lives in — every other partition's committed file
        list survives byte-identical (same relpaths) across the flip;
    (b) the post-rewrite point-set fetch opens only files whose
        committed range holds a probe id (inputFiles == the prune_in
        survivor set, strictly fewer than the artifact's total), and
        the rewritten partition's fresh stats prove the victims gone
        (no committed band-1 file range contains a deleted id's rows —
        checked via the real scan: zero rows match the delete
        predicate anywhere in the live view)."""
    import pyspark.sql.functions as F

    from cognitive_score_bigdata_spark.operators.index_manifest import (
        pruned_files_in,
        read_manifest_stats,
    )
    from cognitive_score_bigdata_spark.queries.round14_staging import (
        DEL_MOD,
        DEL_REM,
        N_BANDS,
        PROBE_MOD,
        PROBE_REM,
        rewrite_artifact,
    )

    path, mx = rewrite_artifact(spark, SF_DIR)
    affected = {i % N_BANDS for i in range(DEL_REM, mx + 1, DEL_MOD)}
    assert len(affected) == 1  # the design: one band holds every victim
    band = affected.pop()

    # (a) unaffected partitions' committed files are the ORIGINAL
    # publish's (version 1) files, untouched by the version-2 flip
    import cognitive_score_bigdata_spark.operators.index_manifest as im

    doc1 = im._read_manifest_doc(path, version=1)
    doc2 = im._read_manifest_doc(path)
    assert int(doc2["version"]) == 2
    for b in range(N_BANDS):
        pre = sorted(f for f in doc1["files"] if f.startswith(f"band={b}/"))
        post = sorted(f for f in doc2["files"] if f.startswith(f"band={b}/"))
        if b == band:
            assert pre and post and set(pre).isdisjoint(post)
        else:
            assert pre == post

    # fresh stats rode the same flip for every replacement file
    stats = read_manifest_stats(path)
    for f in doc2["files"]:
        if f.startswith(f"band={band}/"):
            assert "doc_id" in stats.get(f, {}), f

    # (b) the fetch opens exactly the prune_in survivor set, < total
    from cognitive_score_bigdata_spark.queries.round14_staging import (
        probe_id_list,
    )

    probe_ids = probe_id_list(mx)
    kept = pruned_files_in(path, "doc_id", probe_ids)
    assert 1 <= len(kept) < len(doc2["files"])
    scan = read_index(spark, path, prune_in=("doc_id", probe_ids))
    opened = sorted(
        os.path.relpath(f.replace("file:", ""), path)
        for f in scan.inputFiles()
    )
    assert opened == sorted(kept)

    # no deleted row anywhere in the live view
    live = read_index(spark, path)
    assert live.filter(F.col("doc_id") % DEL_MOD == DEL_REM).count() == 0
    # and the delete dropped ONLY the victims: row conservation
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_victims = docs.filter(F.col("doc_id") % DEL_MOD == DEL_REM).count()
    assert live.count() == docs.count() - n_victims
