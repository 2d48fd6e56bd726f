"""Registry-wide duplicated-Python-stage sweep.

This session's plan audit found the SAME bug three times: a
full-corpus Arrow stage (winnowing fingerprints §9d; the MMR scoring
leg; sign-LSH bucketing + unit normalization in
``cosine_neardup_lsh``) consumed by two aliased branches of a
self-join, which defeats Spark's exchange reuse — the stage silently
planned and EXECUTED twice, with no test to notice. Three hand-finds
of one species is a sweep's job.

Signal: each Python-stage node carries its function-expression
instance id (``...)#N``). The same ``#N`` at two different positions
of the executed tree means ONE logical stage was planned twice —
exactly the recompute shape. Distinct stages get distinct ids, so
sequential pipelines (the IVF-PQ encode→scan→refine chain) pass
untouched. The walk does NOT descend into ``InMemoryTableScan``
(persist()-cached lineage executes once however many scans read it —
the IVF inverted file's duplicated plan TEXT is not a duplicated
execution). Fix on catch: materialize the shared stage once (lazy
``localCheckpoint`` — the winnowing/MMR/LSH pattern) or restructure
so the exchange is reusable.
"""

from __future__ import annotations

import re

import pytest

from cognitive_score_bigdata_spark.queries import load_registry
from tests.conftest import SF_DIR

REGISTRY = load_registry()

_PY_EXECS = {
    "MapInPandasExec",
    "FlatMapCoGroupsInPandasExec",
    "FlatMapGroupsInPandasExec",
    "PythonMapInArrowExec",
    "MapInArrowExec",
    "ArrowEvalPythonExec",
    "BatchEvalPythonExec",
}
_CACHED = {"InMemoryTableScanExec"}
_ID = re.compile(r"(\w+)\([^)]*\)#(\d+)")

# Queries allowed to plan one Python stage twice, each with the reason
# reviewed. Empty today — additions need the duplicated stage to be
# provably cheap or the duplication load-bearing.
EXEMPT: dict[str, str] = {}


def _dup_python_stage_ids(df) -> dict[str, int]:
    """Instance ids of Python-stage nodes appearing >1 time in the
    pre-AQE physical tree, cached subtrees excluded."""
    seen: dict[str, int] = {}

    def walk(node) -> None:
        nm = node.getClass().getSimpleName()
        if nm in _CACHED:
            return
        if nm in _PY_EXECS:
            m = _ID.search(node.simpleString(200))
            if m:
                key = f"{nm}:{m.group(1)}#{m.group(2)}"
                seen[key] = seen.get(key, 0) + 1
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().sparkPlan())
    return {k: n for k, n in seen.items() if n > 1}


def test_fixture_catches_duplicated_stage(spark):
    """The LSH bug shape, reconstructed: one mapInPandas consumed by
    two aliased self-join sides must trip the detector."""
    import pyspark.sql.functions as F

    def tag(batches):
        for b in batches:
            yield b

    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).mapInPandas(tag, "id long, k long")
    a = base.select(F.col("k"), F.col("id").alias("id_a"))
    b = base.select(F.col("k"), F.col("id").alias("id_b"))
    joined = a.join(b, "k").filter(F.col("id_a") < F.col("id_b"))
    assert _dup_python_stage_ids(joined)


def test_fixture_ignores_cached_lineage(spark):
    """A persist()-cached stage read by both join sides executes once —
    the detector must NOT flag it (the IVF inverted-file shape)."""
    import pyspark.sql.functions as F

    def tag(batches):
        for b in batches:
            yield b

    base = (
        spark.range(100)
        .select(F.col("id"), (F.col("id") % 7).alias("k"))
        .mapInPandas(tag, "id long, k long")
        .persist()
    )
    base.count()  # materialize the cache so the scan is InMemory
    a = base.select(F.col("k"), F.col("id").alias("id_a"))
    b = base.select(F.col("k"), F.col("id").alias("id_b"))
    joined = a.join(b, "k")
    try:
        assert not _dup_python_stage_ids(joined)
    finally:
        base.unpersist()


def test_registry_no_duplicated_python_stages(spark):
    """No registry query may plan the same Python stage twice."""
    offenders = {}
    for name, spec in REGISTRY.items():
        if name in EXEMPT:
            continue
        try:
            dups = _dup_python_stage_ids(spec.fn(spark, SF_DIR))
        except Exception as exc:  # pragma: no cover - surfaced below
            pytest.fail(f"{name}: plan build failed: {exc!r}")
        if dups:
            offenders[name] = dups
    assert not offenders, (
        "duplicated Python stages (one logical stage planned twice — "
        f"materialize it once, see module docstring): {offenders}"
    )
