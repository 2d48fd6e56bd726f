"""Property-based check of the zone-map prune ALGEBRA
(operators/index_manifest.py): hypothesis generates arbitrary little
indexes (random partitions, random int payload columns with nulls,
random per-file row counts including empty and all-null files, stats
harvested for a random SUBSET of files) and arbitrary probes (random
range conjuncts over one or both columns, optionally a partition-value
set), and asserts the one-sided contract the handwritten tests pin on
specific layouts:

    files(pruned) ∩ matching-rows  ==  files(all) ∩ matching-rows

i.e. skipping may drop files, never rows that satisfy the probe — for
EVERY generated layout and probe, including files with no stats
(must always survive), all-null columns (skippable for ranges), empty
files, and unbounded range sides.

Pure pyarrow + Python (no Spark in the loop) so hypothesis can afford
real exploration; the Spark reader's agreement with the file-list
resolution is pinned separately in test_zonemaps.py via inputFiles().
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from cognitive_score_bigdata_spark.operators.index_manifest import (
    _list_data_files,
    file_column_stats,
    pruned_files,
    pruned_files_in,
    publish_manifest,
)


def _build_index(files, statted):
    """Materialize the generated layout; returns (path, truth, all)."""
    path = tempfile.mkdtemp(prefix="csb_zm_prop_") + "/idx"
    truth: dict[str, list] = {}
    for i, (part, rows) in enumerate(files):
        d = os.path.join(path, f"p={part}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "a": pa.array([r[0] for r in rows], pa.int64()),
                    "b": pa.array([r[1] for r in rows], pa.int64()),
                }
            ),
            os.path.join(d, f"f{i}.parquet"),
        )
        truth[f"p={part}/f{i}.parquet"] = rows
    all_files = _list_data_files(path)
    subset = [f for i, f in enumerate(all_files) if i in statted]
    publish_manifest(
        path, all_files, stats=file_column_stats(path, subset, ["a", "b"])
    )
    return path, truth, all_files, set(subset)

# one file = (partition 0-2, rows: list of (a, b) with None allowed)
FILE = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=0,
        max_size=8,
    ),
)

BOUND = st.one_of(st.none(), st.integers(min_value=-60, max_value=60))

PROBE = st.tuples(
    st.lists(  # conjuncts over 'a' / 'b'
        st.tuples(st.sampled_from(["a", "b"]), BOUND, BOUND),
        min_size=0,
        max_size=3,
    ),
    st.one_of(  # part_values or no partition restriction
        st.none(), st.sets(st.integers(min_value=0, max_value=3), max_size=3)
    ),
)


def _matches(row, conjuncts) -> bool:
    vals = {"a": row[0], "b": row[1]}
    for col, lo, hi in conjuncts:
        v = vals[col]
        if v is None:
            return False  # range predicates never match NULL
        if lo is not None and v < lo:
            return False
        if hi is not None and v > hi:
            return False
    return True


@settings(max_examples=60, deadline=None)
@given(
    files=st.lists(FILE, min_size=1, max_size=6),
    statted=st.sets(st.integers(min_value=0, max_value=5)),
    probe=PROBE,
)
def test_prune_algebra_never_drops_a_matching_row(files, statted, probe):
    conjuncts, part_values = probe
    path, truth, all_files, subset = _build_index(files, statted)

    candidates = (
        [f for f in all_files if f.split("=", 1)[1].split("/", 1)[0]
         in {str(v) for v in part_values}]
        if part_values is not None
        else all_files
    )
    kept = set(
        pruned_files(path, conjuncts, files=candidates)
    )
    # one-sided correctness: every matching row lives in a kept file
    for f in candidates:
        if any(_matches(r, conjuncts) for r in truth[f]):
            assert f in kept, (f, conjuncts)
    # and unstatted files are always kept
    for f in candidates:
        if f not in subset:
            assert f in kept


@settings(max_examples=40, deadline=None)
@given(
    files=st.lists(FILE, min_size=1, max_size=6),
    statted=st.sets(st.integers(min_value=0, max_value=5)),
    col=st.sampled_from(["a", "b"]),
    values=st.sets(
        st.integers(min_value=-60, max_value=60), min_size=0, max_size=4
    ),
)
def test_point_set_prune_never_drops_a_matching_row(
    files, statted, col, values
):
    """The OR form: a file holding ANY of the probed values must
    survive ``pruned_files_in``, and unstatted files always do."""
    path, truth, all_files, subset = _build_index(files, statted)
    kept = set(pruned_files_in(path, col, values))
    idx = 0 if col == "a" else 1
    for f in all_files:
        holds = any(r[idx] in values for r in truth[f])
        if holds or f not in subset:
            assert f in kept, (f, sorted(values))
