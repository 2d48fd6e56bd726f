"""Sink tests: bucketed tables must join WITHOUT a shuffle (the
co-located join guarantee), partitioned writes must prune."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.plans.audit import plan_text
from cognitive_score_bigdata_spark.sources.sinks import (
    write_bucketed,
    write_partitioned,
    write_sorted_lake,
)
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    users = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))

    write_bucketed(
        events, "ev_bucketed", str(tmp_path / "ev"), "user_id", 8, "user_id"
    )
    write_bucketed(
        users, "us_bucketed", str(tmp_path / "us"), "user_id", 8, "user_id"
    )
    try:
        a = spark.table("ev_bucketed")
        b = spark.table("us_bucketed")
        joined = a.join(b.hint("merge"), "user_id")
        text = plan_text(joined)
        assert "SortMergeJoin" in text
        assert "Exchange" not in text, "bucketed join must not shuffle"
        # and it still returns the right answer
        assert joined.count() == events.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS us_bucketed")


def test_partitioned_write_prunes(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").withColumn(
        "ingest_date", F.to_date("ts")
    )
    path = str(tmp_path / "lake")
    write_partitioned(events, path, ["ingest_date"])

    lake = spark.read.parquet(path)
    one_day = lake.filter(F.col("ingest_date") == "2024-01-05")
    text = plan_text(one_day)
    assert "PartitionFilters" in text and "2024-01-05" in text
    expected = events.filter(F.col("ingest_date") == "2024-01-05").count()
    assert one_day.count() == expected


def test_sorted_lake_files_cover_disjoint_ranges(spark, tmp_path):
    """write_sorted_lake must produce files whose parquet footer min/max
    on the range column are (near-)disjoint — the property file/row-group
    skipping depends on. Verified from the actual parquet metadata."""
    import pyarrow.parquet as pq
    import glob

    events = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "sorted_lake")
    write_sorted_lake(events.withColumn("uid", F.col("user_id")), path, "uid", n_files=4)

    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "uid" and col.statistics is not None:
                    los.append(col.statistics.min)
                    his.append(col.statistics.max)
        if los:
            spans.append((min(los), max(his)))
    assert len(spans) >= 2, "expected multiple output files with stats"
    spans.sort()
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {spans}"

    # and the filter actually reaches the scan
    lake = spark.read.parquet(path)
    text = plan_text(lake.filter(F.col("uid") == 7))
    assert "PushedFilters" in text and "uid" in text


def test_compact_small_files(spark, tmp_path):
    from cognitive_score_bigdata_spark.sources.sinks import compact_small_files

    src = str(tmp_path / "fragmented")
    events = load_table(spark, SF_DIR, "events")
    n = events.count()
    events.repartition(64).write.parquet(src)  # 64 tiny files
    import glob
    assert len(glob.glob(src + "/*.parquet")) == 64

    out = str(tmp_path / "compacted")
    n_files = compact_small_files(spark, src, target_rows_per_file=n // 2, out_path=out)
    got = glob.glob(out + "/*.parquet")
    assert len(got) == n_files <= 3
    assert spark.read.parquet(out).count() == n

    with pytest.raises(ValueError, match="NEW path"):
        compact_small_files(spark, src, 100, out_path=None)


def test_zordered_lake_prunes_on_both_dimensions(spark, tmp_path):
    """Z-ordered layout must make footer min/max selective on BOTH
    clustering columns at once: for a narrow predicate on either
    user_id or ts, at least half the files are skippable from their
    stats — the property a single-column sort can only provide for its
    own column. Verified from actual parquet metadata."""
    import glob

    import pyarrow.parquet as pq

    from cognitive_score_bigdata_spark.sources.sinks import (
        write_zordered_lake,
    )

    events = load_table(spark, SF_DIR, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    path = str(tmp_path / "zlake")
    write_zordered_lake(events, path, ["user_id", "ts_us"], n_files=16)

    spans: dict[str, list[tuple[float, float]]] = {"user_id": [], "ts_us": []}
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for col_name in spans:
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == col_name and col.statistics:
                        los.append(col.statistics.min)
                        his.append(col.statistics.max)
            if los:
                spans[col_name].append((min(los), max(his)))

    n_files = len(spans["user_id"])
    assert n_files >= 8, "expected many output files with stats"
    for col_name, sp in spans.items():
        glo = min(lo for lo, _ in sp)
        ghi = max(hi for _, hi in sp)
        mid = (glo + ghi) / 2
        width = (ghi - glo) / 20  # a 5%-of-domain predicate window
        skippable = sum(1 for lo, hi in sp if hi < mid or lo > mid + width)
        assert skippable >= n_files // 2, (
            f"{col_name}: only {skippable}/{n_files} files skippable; "
            f"spans {sp}"
        )


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """Format coverage: the same documents table written as ORC reads
    back value-identical to the parquet original (ORC is in-box in
    Spark; a lake migration must not change a single row)."""
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0


def test_jsonl_corpus_roundtrip(spark, tmp_path):
    """JSONL — the standard corpus interchange format for LLM training
    data — round-trips through spark.read.json with schema enforced.
    Without an explicit schema, JSON inference may widen/reorder; the
    pipeline always passes one (the same contract the streaming ingest
    uses for event JSON)."""
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_jsonl")
    docs.write.json(path)  # one JSON object per line
    back = spark.read.schema(docs.schema).json(path)
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0


def test_publish_with_audit_promotes_good_batch(spark, tmp_path):
    from cognitive_score_bigdata_spark.sources.sinks import publish_with_audit

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "live")

    def nonempty(df):
        n = df.count()
        return n > 0, f"{n} rows"

    def no_null_ids(df):
        n = df.filter(F.col("doc_id").isNull()).count()
        return n == 0, f"{n} null ids"

    out = publish_with_audit(docs, path, [nonempty, no_null_ids])
    assert out["published"] == path
    assert all(a["ok"] for a in out["audits"])
    assert spark.read.parquet(path).count() == docs.count()


def test_publish_with_audit_rejects_bad_batch_keeps_live(spark, tmp_path):
    from cognitive_score_bigdata_spark.sources.sinks import (
        AuditFailure,
        publish_with_audit,
    )

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "live")

    def always_ok(df):
        return True, "ok"

    publish_with_audit(docs, path, [always_ok])
    live_count = spark.read.parquet(path).count()

    bad = docs.limit(10).withColumn("doc_id", F.lit(None).cast("long"))

    def no_null_ids(df):
        n = df.filter(F.col("doc_id").isNull()).count()
        return n == 0, f"{n} null ids"

    with pytest.raises(AuditFailure):
        publish_with_audit(bad, path, [no_null_ids])
    # live table untouched; bad batch quarantined in staging
    assert spark.read.parquet(path).count() == live_count
    import os

    assert os.path.exists(path + "__staging")


def test_merge_schema_reads_evolved_batches(spark, tmp_path):
    """Schema evolution on read: an old batch without a column and a
    new batch with it coexist in one lake path; mergeSchema unions the
    schemas, old rows surface NULL for the new column."""
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    path = str(tmp_path / "evolve")
    docs.write.parquet(path + "/batch=1")
    docs.withColumn("quality", F.lit(0.5)).write.parquet(path + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "quality" in merged.columns
    assert merged.count() == 100
    assert merged.filter(F.col("quality").isNull()).count() == 50
