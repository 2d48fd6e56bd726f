"""Winnowing substring dedup (queries/round11_staging.py): the paper's
detection guarantee, the fingerprint-density economy, and the §9r
window classification."""

from __future__ import annotations

import pyspark.sql.functions as F

from cognitive_score_bigdata_spark.queries.round11_staging import (
    WIN_DF_CAP,
    WIN_K,
    WIN_W,
    winnow_fingerprints,
)

GUARANTEE = WIN_W + WIN_K - 1  # shared runs this long MUST pair


def _pairs(spark, rows):
    from cognitive_score_bigdata_spark.queries import load_registry  # noqa: F401
    from cognitive_score_bigdata_spark.queries.round11_staging import (
        dedup_winnowing_pairs,
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="csb_winnow_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return {
        (r.doc_a, r.doc_b)
        for r in dedup_winnowing_pairs(spark, d).collect()
    }


def test_shared_run_at_guarantee_floor_is_detected(spark):
    """Two documents sharing EXACTLY w+k-1 consecutive tokens inside
    otherwise-disjoint text must share a fingerprint — the SIGMOD'03
    guarantee the operator's doc string promises."""
    shared = " ".join(f"common{i}" for i in range(GUARANTEE))
    rows = [
        (1, f"alpha beta gamma {shared} delta epsilon", "en", "a", 0),
        (2, f"one two three four five {shared} six seven", "en", "b", 0),
        # unrelated doc: no pair with either
        (3, "totally different words everywhere here now", "en", "c", 0),
    ]
    got = _pairs(spark, rows)
    assert (1, 2) in got, got
    assert not any(3 in p for p in got), got


def test_short_documents_yield_no_grams_and_no_crash(spark):
    """Documents with fewer than WIN_K tokens must contribute ZERO
    fingerprints — and must not abort the job. Without the size guard,
    F.sequence(1, 0) emits the DESCENDING [1, 0] (Spark's default step
    is -1 when start > stop) and the i=0 kills slice() with
    INVALID_PARAMETER_VALUE.START; the DuckDB oracle's range(1, 1) is
    empty, so the empty set is also the cross-engine-correct answer.
    Covers 1-, 2-, 3-token and empty/whitespace-only docs — all routine
    in web-corpus text."""
    shared = " ".join(f"common{i}" for i in range(GUARANTEE))
    rows = [
        (1, f"alpha beta {shared} gamma", "en", "a", 0),
        (2, f"x y z {shared} w v", "en", "b", 0),
        (3, "tiny", "en", "c", 0),  # 1 token
        (4, "two tokens", "en", "c", 0),
        (5, "just three tokens", "en", "c", 0),
        (6, " ", "en", "c", 0),  # whitespace-only
    ]
    got = _pairs(spark, rows)
    assert (1, 2) in got, got
    assert not any(p[0] >= 3 or p[1] >= 3 for p in got), got
    # and directly: the fingerprint table has no rows for short docs
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fp_docs = {
        r.doc_id
        for r in winnow_fingerprints(docs.select("doc_id", "text"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert fp_docs == {1, 2}, fp_docs


def test_fingerprint_density_matches_winnowing_economy(spark):
    """Winnowing keeps roughly 2/(w+1) of gram hashes (the paper's
    expected density) — far fewer than all grams, which is the point;
    allow a generous band since short docs keep proportionally more."""
    df = spark.range(1).select(
        F.lit(1).alias("doc_id"),
        F.lit(" ".join(f"tok{i * 7919 % 997}x{i}" for i in range(500))).alias(
            "text"
        ),
    )
    n_fp = winnow_fingerprints(df).count()
    n_grams = 500 - WIN_K + 1
    density = n_fp / n_grams
    assert 1.0 / (WIN_W + 1) < density < 4.0 / (WIN_W + 1), density


def test_winnowing_windows_classify_per_entity(spark):
    """The per-doc winnowing windows must land in the §9r per-entity
    class under the mechanical sweep — bounded by document length,
    never a global sort. Classified on the PRE-checkpoint stage: the
    registered query localCheckpoints the fingerprint table (it has
    three consumers), and a lazy checkpoint truncates the SQL plan at
    an ExistingRDD scan, so the registry-wide sweep cannot see these
    windows — this dedicated test is the documented pattern for
    checkpoint-hidden stages (see window_audit docstring)."""
    from cognitive_score_bigdata_spark.io import load_table
    from cognitive_score_bigdata_spark.plans.window_audit import classify_windows
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    fp = winnow_fingerprints(docs)
    ks = {w.klass for w in classify_windows(fp)}
    assert ks == {"per-entity"}, ks


def test_df_cap_drops_boilerplate_fingerprints(spark):
    """Fingerprints present in more than WIN_DF_CAP docs must be
    excluded from pair generation (the hot-bucket guard). Plant one
    shared passage in CAP+2 docs: the passage's CORE fingerprint (the
    window fully inside the shared run, identical in every doc) is
    over-cap and must not appear in the join; without the cap it alone
    would emit all C(n,2) pairs. Windows straddling into the unique
    filler yield partially-shared fingerprints with df <= cap — those
    legitimately survive, so the assertion is on the core fingerprint
    and the pair count, not on emptiness."""
    import tempfile

    shared = " ".join(f"boiler{i}" for i in range(GUARANTEE))
    n = WIN_DF_CAP + 2
    rows = [
        (i, f"{shared} filler{i}a filler{i}b filler{i}c", "en", "s", 0)
        for i in range(n)
    ]
    d = tempfile.mkdtemp(prefix="csb_winnow_cap_")
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    fp = winnow_fingerprints(docs.select("doc_id", "text"))
    df_counts = fp.groupBy("h").count()
    over_cap = {r.h for r in df_counts.filter(f"count > {WIN_DF_CAP}").collect()}
    assert over_cap, "fixture must produce an over-cap core fingerprint"
    got = _pairs(spark, rows)
    all_pairs = n * (n - 1) // 2
    assert len(got) < all_pairs, (
        f"cap had no effect: {len(got)} == C({n},2)"
    )
