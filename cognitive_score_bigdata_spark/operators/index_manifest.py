"""Manifest-committed persisted artifacts: the object-store-true commit
protocol shared by the minhash band index (``queries/round10.py``), the
IVF inverted file (``queries/ivf_lifecycle.py``), and the daily-rollup
MV (``queries/mv_maintenance.py`` — via :func:`replace_parts_commit`,
the read-modify-write form).

The protocol (VERDICT r10: a ``rmtree``+``rename`` partition swap is
neither crash-atomic nor reader-atomic, and directory renames do not
exist on an object store) — the same snapshot-isolation move
Delta/Iceberg make:

    path/_manifest/m-0000000001.json   full list of live data files
    path/_current                      name of the current manifest

Readers (:func:`read_index`) resolve ``_current`` -> manifest -> file
list and read exactly those files; writers stage new files BESIDE the
live set (append-only object writes, never an in-place delete) and
commit by publishing a new manifest + flipping ``_current`` — a
single-object replace, atomic on POSIX (``os.replace``) and a single
PUT on an object store, so a concurrent reader resolves the OLD file
set or the NEW one, never a hole and never a mix. A crash at any point
before the flip leaves the live manifest (and every file it names)
untouched; orphaned staged files are garbage, not corruption, swept by
:func:`vacuum_index` — the ONLY place data files are ever deleted,
kept separate from commit so readers holding an older manifest keep a
retention window (Iceberg's expire-snapshots split). Single-writer
maintenance is assumed (merges/compactions are the nightly job);
reader/writer concurrency is what the manifest protects, pinned in
``tests/test_round10_merge.py``.

Artifacts are hive-partitioned on ONE column (``band=N`` / ``cell=N``
integers for the indexes, ``event_day=YYYY-MM-DD`` strings for the
MV); the commit/read/vacuum helpers are partition-column-agnostic.
The integer-keyed count/compaction helpers (``part_file_counts``,
``compact_index_parts``) assume integer partition values — the MV's
maintenance merges already rewrite its touched partitions wholesale,
so it needs no separate compaction pass (each day's live set is one
merge's output).

Zone maps (file skipping): manifests optionally carry per-file
min/max/null column statistics (``stats`` key), harvested from the
parquet FOOTERS the writers already produced
(:func:`file_column_stats` — a metadata-only read, no data scan) and
committed in the SAME flip as the file list, so the stats a reader
resolves always describe exactly the snapshot it resolved.
:func:`read_index` takes an advisory ``prune=(col, lo, hi)`` range and
drops files whose committed stats PROVE no row can satisfy it —
Iceberg/Delta's data-skipping move, orthogonal to hive partition
pruning (the stat column is a payload column, not the partition
column). Skipping is strictly conservative: a file with no stats, no
stats for that column, or an incomparable bound is always kept, and
callers must still apply the real filter — pruning only removes
footers/IO, never changes semantics. At 100 TB this is the difference
between opening every file of a band/cell and opening the two whose
doc-id range overlaps the probe; it pays exactly when writers CLUSTER
on the stat column (``repartitionByRange`` before the write gives
near-disjoint per-file ranges — pinned in ``tests/test_zonemaps.py``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifest"
_CURRENT = "_current"


def _list_data_files(path: str) -> list[str]:
    """Relative paths of all physical partitioned data files under
    ``path`` (any single hive partition level, e.g. band=N or cell=N)."""
    import glob
    import os

    return sorted(
        os.path.relpath(p, path)
        for p in glob.glob(os.path.join(path, "*=*", "*.parquet"))
    )


def file_column_stats(
    path: str, files: list[str], cols: list[str]
) -> dict[str, dict[str, list]]:
    """Per-file ``{col: [min, max, null_count, num_rows]}`` for
    ``cols``, harvested from the parquet footers (pyarrow metadata —
    no row is read; at scale this is one ranged GET per file, the same
    footer the scan would fetch anyway, done once at commit time
    instead of per query).

    Bounds are the writer's footer statistics. A column with no usable
    footer stats in SOME row group is dropped for that file entirely
    (unknown ⇒ never skipped); an all-null column keeps
    ``[None, None, nulls, rows]`` so range pruning can skip the file
    (a range predicate never matches NULL). Two writer pathologies are
    guarded, both verified against this container's pyarrow:

    - FLOAT/DOUBLE columns are excluded entirely: footers compute
      min/max IGNORING NaN (``[1.0, NaN]`` reports ``max=1.0`` with
      ``null_count=0``) while Spark and DuckDB order NaN GREATER than
      every number, so a bound-based skip could drop a file whose NaN
      rows match. No footer field records NaN presence (Iceberg needs
      write-time NaN counts for this).
    - STRING columns record the LOWER bound only (``max`` stored as
      None = unbounded above): pyarrow truncates long string maxima to
      ``''`` — ``['a', 'z'*4097]`` reports ``max=''`` and
      ``['', 'z'*4097]`` reports ``min='' max=''``, which is
      indistinguishable from a genuine all-empty-string file, so NO
      footer-side validation can make a string max trustworthy. An
      under-reported MIN is safe (it can only keep extra files); an
      under-reported MAX is not (it can skip a matching file).

    Anything else (timestamps, binary) is treated as unknown too."""
    import os

    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    for rel in files:
        md = pq.ParquetFile(os.path.join(path, rel)).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        fstats: dict[str, list] = {}
        for col in cols:
            if col not in names:
                continue
            ci = names.index(col)
            phys = md.schema.column(ci).physical_type
            if phys in ("FLOAT", "DOUBLE"):
                continue  # NaN-unsafe bounds (see docstring)
            is_str = phys == "BYTE_ARRAY"
            mn = mx = None
            has_vals = False
            nulls = rows = 0
            ok = True
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                rows += rg.num_rows
                st = rg.column(ci).statistics
                if st is None or st.null_count is None:
                    ok = False
                    break
                nulls += st.null_count
                if st.null_count == rg.num_rows:
                    continue  # all-null group contributes no bounds
                if not st.has_min_max or not isinstance(
                    st.min, (int, float, str, bool)
                ):
                    ok = False
                    break
                has_vals = True
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            if ok:
                if is_str and has_vals:
                    mx = None  # string max untrustworthy (see docstring)
                fstats[col] = [mn, mx, nulls, rows]
        if fstats:
            out[rel] = fstats
    return out


def _read_manifest_doc(path: str, version: int | None = None) -> dict | None:
    """The full committed manifest DOCUMENT (one read/parse — version,
    files, meta, stats all come from the same snapshot), or None for a
    never-published index. All reader helpers go through this, so a
    commit or pruned scan costs ONE manifest GET, not one per field."""
    import glob
    import json
    import os

    cur = os.path.join(path, _CURRENT)
    if not os.path.exists(cur):
        if version is not None:
            raise ValueError(
                f"index at {path!r} has no committed manifest to "
                f"time-travel in"
            )
        return None
    if version is None:
        with open(cur) as f:
            name = f.read().strip()
    else:
        # Committed = at or below the pointer (the same rule vacuum
        # applies): a manifest NEWER than _current is a crash orphan —
        # a commit that died before its flip. Resolving it would serve
        # a snapshot that never existed and whose files vacuum is
        # allowed to delete mid-scan.
        with open(cur) as f:
            committed = int(f.read().strip()[2:-5])
        if version > committed:
            raise ValueError(
                f"manifest version {version} of {path!r} was never "
                f"committed (pointer is at {committed}; a newer "
                "manifest file is a crash orphan awaiting vacuum)"
            )
        name = f"m-{version:010d}.json"
        if not os.path.exists(os.path.join(path, _MANIFEST_DIR, name)):
            have = sorted(
                int(os.path.basename(p)[2:-5])
                for p in glob.glob(
                    os.path.join(path, _MANIFEST_DIR, "m-*.json")
                )
            )
            raise ValueError(
                f"manifest version {version} of {path!r} is not "
                f"retained (have {have[0]}..{have[-1]})"
                if have
                else f"index at {path!r} has no manifests"
            )
    with open(os.path.join(path, _MANIFEST_DIR, name)) as f:
        return json.load(f)


def read_manifest(
    path: str, version: int | None = None
) -> tuple[int, list[str]] | None:
    """(version, live data files) of the committed manifest, or None if
    the index has never published one (legacy plain-directory index).

    ``version`` selects a RETAINED older manifest (snapshot read /
    time travel — Iceberg's ``VERSION AS OF``): any version still
    present under ``_manifest/`` resolves; one already expired by
    :func:`vacuum_index` raises with the retained range named, because
    silently falling back to ``_current`` would time-travel to the
    wrong snapshot."""
    m = _read_manifest_doc(path, version=version)
    if m is None:
        return None
    return int(m["version"]), list(m["files"])


def publish_manifest(
    path: str,
    files: list[str],
    note: str = "",
    meta: dict | None = None,
    stats: dict[str, dict[str, list]] | None = None,
    schema_json: str | None = None,
) -> int:
    """Commit ``files`` as the new live set. The manifest file is
    written complete before the ``_current`` flip, and the flip is
    ``os.replace`` of a same-directory temp file — readers see the old
    pointer or the new one, never a partial write. (Object-store
    translation: manifest PUT, then ``_current`` PUT.)

    ``meta`` rides in the SAME manifest document, so any caller state
    (e.g. a streaming batch-id fence) commits atomically WITH the file
    list — there is no residual window between "files live" and "state
    recorded". Each manifest carries its own complete meta; callers
    that accumulate (fences) read the current meta first. Omitted meta
    carries the current manifest's forward unchanged.

    ``stats`` (per-file zone maps, see :func:`file_column_stats`)
    commits in the same flip. Carry-forward rule: a live file keeps
    its current committed stats unless this commit provides new ones;
    stats of files leaving the live set are dropped with them — the
    stored map never names a dead file, so time travel resolves each
    snapshot's own stats.

    ``schema_json`` (a Spark ``StructType.json()`` string) records the
    TABLE schema in the manifest — the schema-evolution move of a
    transactional table format (Delta's metaData action): files written
    before a column existed stay on disk untouched, and readers project
    the missing column as NULL because :func:`read_index` applies the
    committed schema to the scan. Carried forward unchanged when a
    commit omits it, so one evolving append upgrades every later
    snapshot's read schema while time travel to an older manifest still
    resolves that snapshot's OWN schema."""
    import json
    import os

    cur = _read_manifest_doc(path)  # ONE read: version+meta+stats together
    version = (int(cur["version"]) if cur else 0) + 1
    if meta is None:
        meta = dict(cur.get("meta", {})) if cur else {}
    if schema_json is None and cur is not None:
        schema_json = cur.get("schema")
    carried = dict(cur.get("stats", {})) if cur else {}
    carried.update(stats or {})
    live_stats = {f: carried[f] for f in files if f in carried}
    mdir = os.path.join(path, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    name = f"m-{version:010d}.json"
    # Exclusive create = the optimistic-concurrency check (Iceberg's
    # manifest CAS): two writers that both resolved version N race to
    # create m-{N+1}; the loser gets FileExistsError — a loud commit
    # conflict — instead of silently truncating the winner's manifest
    # and last-writer-winning the _current flip. Single-writer
    # maintenance is still the deployment assumption; this turns a
    # violation from corruption into an error. (Object-store
    # translation: conditional PUT / If-None-Match.) A same-named file
    # can also be a CRASH ORPHAN — a prior commit that died between
    # manifest write and pointer flip; the two are indistinguishable at
    # commit time, so the error names the recovery (vacuum_index, the
    # designated janitor, deletes manifests newer than the committed
    # pointer) rather than silently overwriting what might be a live
    # writer's document.
    try:
        fh = open(os.path.join(mdir, name), "x")
    except FileExistsError:
        raise FileExistsError(
            f"commit conflict on {name} at {path!r}: another writer "
            "committed from the same base version, or a prior commit "
            "crashed before its pointer flip — the two are "
            "indistinguishable here, so AFTER confirming no writer is "
            "mid-commit (or with vacuum_index(orphan_grace_s=...) set "
            "beyond the longest commit), run vacuum_index() to clear "
            "crash orphans, then retry"
        )
    doc = {
        "version": version,
        "files": sorted(files),
        "note": note,
        "meta": meta,
        "stats": live_stats,
    }
    if schema_json is not None:
        doc["schema"] = schema_json
    with fh as f:
        json.dump(doc, f)
    tmp = os.path.join(path, f"{_CURRENT}.tmp.{version}")
    with open(tmp, "w") as f:
        f.write(name)
    os.replace(tmp, os.path.join(path, _CURRENT))
    return version


def read_manifest_meta(path: str) -> dict:
    """The committed manifest's caller-state document ({} if the index
    has no manifest yet or the manifest predates meta support)."""
    m = _read_manifest_doc(path)
    return dict(m.get("meta", {})) if m else {}


def read_manifest_stats(
    path: str, version: int | None = None
) -> dict[str, dict[str, list]]:
    """The committed per-file zone maps ({} if the index has no
    manifest or the manifest predates stats support). ``version``
    time-travels like :func:`read_manifest`."""
    m = _read_manifest_doc(path, version=version)
    return dict(m.get("stats", {})) if m else {}


def _survives_range(st: list, lo, hi) -> bool:
    """Whether a file with zone map ``[min, max, nulls, rows]`` could
    hold a row with ``lo <= col <= hi`` (None = unbounded side). The
    contract is one-sided: False is a PROOF of emptiness; True is just
    "cannot prove". Incomparable bound types (schema drift between the
    committed stat and the probe value) yield True — conservative."""
    mn, mx, nulls, rows = st
    if mn is None and mx is None:
        # no non-null value in the file: a range predicate matches none
        return not (nulls is not None and rows is not None and nulls >= rows)
    try:
        if lo is not None and mx is not None and mx < lo:
            return False
        if hi is not None and mn is not None and mn > hi:
            return False
    except TypeError:
        return True
    return True


def pruned_files(
    path: str,
    prune,
    version: int | None = None,
    files: list[str] | None = None,
    stats: dict | None = None,
) -> list[str]:
    """The subset of the committed file list that survives ``prune``
    under the committed zone maps — the skip decision itself, exposed
    so tests and planners can count skips without building a DataFrame.

    ``prune`` is one ``(col, lo, hi)`` inclusive range or a list of
    them, ANDed: a file is skipped if ANY conjunct is provably empty
    for it — the multi-dimensional case a Z-ORDERED cluster layout
    exists for (Morton-code clustering keeps every file's min/max
    narrow on every participating column, so each dimension's zone map
    is independently selective). An EMPTY conjunct list keeps every
    file (the empty AND is true — planners can pass their predicate
    set unconditionally). Files with no stats for a conjunct's column
    are kept for that conjunct (unknown ⇒ never skipped). ``stats``
    lets a caller that already holds the manifest document avoid a
    second read."""
    if files is None:
        m = read_manifest(path, version=version)
        files = m[1] if m else _list_data_files(path)
    if len(prune) == 0:
        return list(files)
    prunes = [prune] if isinstance(prune[0], str) else list(prune)
    if stats is None:
        stats = read_manifest_stats(path, version=version)
    return [
        f
        for f in files
        if all(
            col not in stats.get(f, {})
            or _survives_range(stats[f][col], lo, hi)
            for col, lo, hi in prunes
        )
    ]


def pruned_files_in(
    path: str,
    col: str,
    values,
    version: int | None = None,
    files: list[str] | None = None,
    stats: dict | None = None,
) -> list[str]:
    """Point-set skipping: the committed files that could hold ANY of
    ``values`` in ``col`` (each value checked as the degenerate range
    [v, v] against the zone maps — an OR, where :func:`pruned_files`
    conjuncts are an AND). The lake's most common lookup at scale:
    "re-fetch these N quarantined doc ids" opens only the files whose
    committed range contains one of them, instead of every file of the
    artifact. Same conservative contract: no stats ⇒ kept, and callers
    still apply the real ``isin`` filter. An empty value set keeps
    nothing — there is nothing to fetch — EXCEPT files without stats,
    which can never be proven empty."""
    if files is None:
        m = read_manifest(path, version=version)
        files = m[1] if m else _list_data_files(path)
    if stats is None:
        stats = read_manifest_stats(path, version=version)
    vals = list(values)
    return [
        f
        for f in files
        if col not in stats.get(f, {})
        or any(_survives_range(stats[f][col], v, v) for v in vals)
    ]


def read_index(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    prune: tuple | None = None,
    part_values=None,
    prune_in: tuple | None = None,
) -> DataFrame:
    """Manifest-aware index scan: exactly the committed file set, with
    ``basePath`` so the partition column (and its partition pruning)
    survives the explicit file list. Falls back to the plain directory
    scan for a never-published index.

    ``version`` time-travels to a retained older snapshot (see
    :func:`read_manifest`) — correct as long as vacuum's
    ``keep_versions`` retention covers it, because data files are
    append-only between commits and only :func:`vacuum_index` deletes:
    every file an un-expired manifest names is still on disk. This is
    the reader-side face of the same retention window that protects
    in-flight readers during maintenance.

    A committed manifest with ZERO live files (legal: a
    :func:`replace_parts_commit` that replaced every live partition
    with an empty set) cannot be handed to the parquet reader (zero
    paths is an error there, ADVICE r11) — the schema is recovered
    from the superseded physical files still on disk awaiting vacuum
    (``limit(0)`` over the directory scan), or, if vacuum already
    swept everything, fails with a message naming the index instead of
    a bare reader error.

    ``prune=(col, lo, hi)`` — or a list of such conjuncts, ANDed — is
    ADVISORY zone-map skipping (inclusive ranges, None = unbounded
    side): files whose committed stats prove any conjunct empty are
    dropped from the scan before Spark ever opens them. The caller
    MUST still apply the real filter — pruning only removes IO (files
    without stats always survive). A prune that skips every file
    returns a ``limit(0)`` over one committed file, schema identical
    to the full scan. On a never-published index there are no stats,
    so prune is a no-op.

    ``part_values`` (a set of partition VALUES, canonicalized to
    Spark's hive-path spelling — booleans to ``true``/``false``,
    ``None`` to ``__HIVE_DEFAULT_PARTITION__``, path-escaped segments
    unquoted before comparison) prunes at the METADATA level:
    non-matching files never enter the scan relation at all.
    Catalyst's partition pruning already avoids READING non-matching
    files' data, but the driver still lists, plans, and holds every
    committed file in the relation — at 10⁶ files per artifact that
    planning cost is real, and the manifest already knows each file's
    partition from its path (the Iceberg plan-files move). Callers
    should STILL apply the partition filter (same advisory contract as
    ``prune``).

    ``prune_in=(col, values)`` is point-set skipping (see
    :func:`pruned_files_in`) — the "fetch these N ids" lookup; keeps a
    file iff some value could fall inside its committed range. All
    three prune forms compose (applied in sequence to the shrinking
    file list).

    A manifest carrying a committed ``schema`` (see
    :func:`publish_manifest`) is applied to the scan: files written
    before a schema-evolving append project the missing columns as
    NULL (parquet matches by name), so old data never needs a rewrite
    when a column is added — and a time-traveled ``version`` resolves
    that snapshot's OWN schema, never a newer one."""
    import json as _json
    import os
    from urllib.parse import unquote

    doc = _read_manifest_doc(path, version=version)
    if doc is None:
        return spark.read.parquet(path)
    files = list(doc["files"])

    def reader():
        r = spark.read
        if doc.get("schema"):
            from pyspark.sql.types import StructType

            r = r.schema(StructType.fromJson(_json.loads(doc["schema"])))
        return r.option("basePath", path)

    def empty_scan(anchor: str) -> DataFrame:
        # schema anchor: one committed file, zero rows — partition
        # column and payload schema identical to the full scan
        return reader().parquet(os.path.join(path, anchor)).limit(0)

    if files and part_values is not None:
        vals = {_canon_part_value(v) for v in part_values}
        kept = [f for f in files if unquote(_part_val(f)) in vals]
        if not kept:
            return empty_scan(files[0])
        files = kept
    if files and prune is not None:
        kept = pruned_files(
            path,
            prune,
            version=version,
            files=files,
            stats=dict(doc.get("stats", {})),  # same doc: no second read
        )
        if not kept:
            return empty_scan(files[0])
        files = kept
    if files and prune_in is not None:
        col, values = prune_in
        kept = pruned_files_in(
            path,
            col,
            values,
            version=version,
            files=files,
            stats=dict(doc.get("stats", {})),
        )
        if not kept:
            return empty_scan(files[0])
        files = kept
    if not files:
        if _list_data_files(path):
            return reader().parquet(path).limit(0)
        raise ValueError(
            f"index at {path!r} has a committed manifest with no live "
            "files and no physical files to recover a schema from"
        )
    return reader().parquet(*[os.path.join(path, f) for f in files])


def clustered_write_commit(
    df: DataFrame,
    path: str,
    part_col: str,
    cluster_col: str,
    n_ranges: int,
    note: str = "clustered publish",
    stats_cols: list[str] | None = None,
) -> int:
    """Initial publish of a manifest-committed artifact laid out for
    zone-map skipping: ``repartitionByRange`` on ``cluster_col`` before
    the partitioned write gives each output task a contiguous
    cluster-key slice, so every (partition, file) holds a tight,
    near-disjoint range — then the file list AND the harvested zone
    maps commit in one manifest flip. This is the CLUSTER BY of a
    transactional table format: hive partitioning gives coarse pruning
    on ``part_col``, the zone maps give file skipping on
    ``cluster_col`` — two orthogonal key dimensions from one write.

    ``stats_cols`` defaults to ``[cluster_col]``; pass more columns
    when the cluster key co-locates several dimensions at once — the
    Z-ORDER composition: cluster on a Morton code
    (``sources.sinks.zorder_key``), harvest stats on the ORIGINAL
    dimensions, and every participating column's zone map stays narrow
    per file, so :func:`read_index` can skip on any of them.
    Returns the published manifest version."""
    (
        df.repartitionByRange(n_ranges, cluster_col)
        .write.partitionBy(part_col)
        .parquet(path)
    )
    files = _list_data_files(path)
    return publish_manifest(
        path,
        files,
        note=note,
        stats=file_column_stats(path, files, stats_cols or [cluster_col]),
    )


def _part_of(relpath: str) -> int:
    return int(relpath.split("/", 1)[0].rsplit("=", 1)[1])


def part_file_counts(path: str) -> dict[int, int]:
    """PHYSICAL parquet files per partition (manifest-blind — includes
    staged/retained files; use :func:`live_part_file_counts` for the
    committed view compaction decisions read)."""
    out: dict[int, int] = {}
    for f in _list_data_files(path):
        p = _part_of(f)
        out[p] = out.get(p, 0) + 1
    return out


def live_part_file_counts(path: str) -> dict[int, int]:
    """Committed (manifest) data files per partition."""
    m = read_manifest(path)
    files = m[1] if m else _list_data_files(path)
    out: dict[int, int] = {}
    for f in files:
        p = _part_of(f)
        out[p] = out.get(p, 0) + 1
    return out


def append_commit(
    path: str,
    write_append,
    note: str = "append",
    meta: dict | None = None,
    stats_cols: list[str] | None = None,
    schema_json: str | None = None,
    _before_publish=None,
) -> list[str]:
    """Run ``write_append()`` (a Spark append into ``path``) and commit
    the files it added into the manifest (bootstrapping one for a
    legacy plain-directory index). Base = the CURRENT manifest, not a
    directory listing: a listing would resurrect files an earlier
    compaction superseded but vacuum has not yet swept. ``meta``
    commits atomically with the added files (see
    :func:`publish_manifest`); ``stats_cols`` harvests zone maps for
    the ADDED files from their footers into the same flip (existing
    files keep their committed stats); ``schema_json`` commits an
    EVOLVED table schema with the files that introduced it (see
    :func:`publish_manifest` — omitted, the current schema carries
    forward); ``_before_publish`` is the same
    test seam as compaction's — the crash window between the physical
    append and the flip, in which the added files are uncommitted
    garbage. Returns the committed new relative paths."""
    before = set(_list_data_files(path))
    write_append()
    added = sorted(set(_list_data_files(path)) - before)
    cur = read_manifest(path)
    base = cur[1] if cur else sorted(before)
    stats = (
        file_column_stats(path, added, stats_cols) if stats_cols else None
    )
    if _before_publish is not None:
        _before_publish()
    publish_manifest(
        path,
        base + added,
        note=note,
        meta=meta,
        stats=stats,
        schema_json=schema_json,
    )
    return added


def _part_val(relpath: str) -> str:
    """The raw partition-value string of a data file's first path
    segment (``event_day=2024-03-01`` → ``2024-03-01``)."""
    return relpath.split("/", 1)[0].rsplit("=", 1)[1]


def _canon_part_value(v) -> str:
    """A caller-supplied partition value in Spark's hive-path spelling,
    so ``part_values={True, None}`` matches what the writer put on disk
    (``band=true``, ``band=__HIVE_DEFAULT_PARTITION__``) instead of
    silently matching nothing — unlike zone-map pruning, a partition
    mismatch here is not conservative, it drops every file."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def replace_parts_commit(
    path: str,
    write_append,
    part_values,
    note: str = "replace parts",
    meta: dict | None = None,
    stats_cols: list[str] | None = None,
    schema_json: str | None = None,
    _before_publish=None,
) -> list[str]:
    """Read-modify-write commit targeting a partition-VALUE set: run
    ``write_append()`` — which must APPEND the replacement files for
    exactly ``part_values``, never delete in place — then publish a
    manifest where those partitions' previous files are superseded and
    every other partition's live set is untouched. This is the
    'overwrite partitions' move of a transactional table format on the
    same two-phase commit :func:`append_commit` and compaction use: a
    reader resolves the old partition content XOR the new, a crash
    before the flip leaves the live view untouched (the appended files
    are vacuum-sweepable garbage), and ``meta`` (e.g. a streaming
    batch-id fence) commits in the SAME flip as the content it fences.
    ``stats_cols`` harvests zone maps for the replacement files;
    superseded files' stats drop with them (publish restricts stats to
    the live set). ``schema_json`` commits an evolved table schema
    with the rewrite (the backfill-a-new-column shape; see
    :func:`publish_manifest`). Raises if the replacement wrote outside
    the declared partitions —
    a silent stray file would otherwise supersede nothing and
    double-count forever."""
    from urllib.parse import unquote

    # Same canonicalization as read_index(part_values=) (ADVICE r12):
    # plain str(v) spells booleans 'True' and None 'None' while the
    # writer's hive paths say 'true'/'__HIVE_DEFAULT_PARTITION__', so
    # the stray-file guard would falsely fire and survivors would not
    # be filtered.
    vals = {_canon_part_value(v) for v in part_values}
    before = set(_list_data_files(path))
    write_append()
    added = sorted(set(_list_data_files(path)) - before)
    stray = [f for f in added if unquote(_part_val(f)) not in vals]
    if stray:
        raise ValueError(
            f"replacement wrote outside the declared partitions: {stray}"
        )
    cur = read_manifest(path)
    base = cur[1] if cur else sorted(before)
    survivors = [f for f in base if unquote(_part_val(f)) not in vals]
    stats = (
        file_column_stats(path, added, stats_cols) if stats_cols else None
    )
    if _before_publish is not None:
        _before_publish()
    publish_manifest(
        path,
        survivors + added,
        note=note,
        meta=meta,
        stats=stats,
        schema_json=schema_json,
    )
    return added


def merge_commit(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: list[str],
    part_col: str,
    note: str = "merge",
    stats_cols: list[str] | None = None,
    delete_col: str | None = None,
    n_ranges_per_part: int = 2,
    cluster_col: str | None = None,
    locate_cap: int = 100_000,
) -> list:
    """MERGE INTO for a manifest-committed artifact — the general keyed
    upsert of a transactional table format, built on
    :func:`replace_parts_commit`'s two-phase swap:

    - a target row whose key matches a source row is REPLACED by the
      source row (update; the row moves partitions if the source's
      ``part_col`` differs),
    - an unmatched source row is INSERTED into its own ``part_col``
      partition,
    - with ``delete_col``, a source row carrying true there DELETES its
      match instead (and inserts nothing) — the GDPR/re-annotation
      tombstone shape; a NULL flag is coalesced to false (update), so a
      source built with ``unionByName(allowMissingColumns=True)`` never
      deletes implicitly,
    - every other target row is untouched.

    Affected partitions are located FROM THE DATA, not declared: the
    partitions the source writes into ∪ the partitions currently
    holding a matched key (a distributed semi-join + distinct over the
    partition column). When the source is small (≤ ``locate_cap`` rows
    and a single key column — the typical re-annotation batch), the
    location scan goes through the committed zone maps instead
    (``prune_in`` over the collected source keys): only files whose
    committed key range holds a source key are ever opened, so
    locating a 10k-key merge against a 10⁶-file artifact costs a
    manifest read plus the overlapping files, not a table scan. Only
    the located partitions rewrite — the survivor read is
    metadata-pruned to them (``part_values=``) — and everything
    else's committed files survive byte-identical, which is what
    keeps a 100 TB MERGE proportional to the touched keys' partitions
    rather than the table. The rewrite re-clusters on ``cluster_col``
    (default: the first key column) so zone maps stay selective, and
    ``stats_cols`` (default: the cluster column) re-harvests in the
    SAME flip.

    ``source`` must carry the target's columns (plus ``delete_col`` if
    used) and at most one row per key (duplicate keys raise); keys are
    compared null-unsafely
    (a NULL key never matches — reject them upstream). Returns the
    affected partition VALUES (canonical spelling), mainly for tests
    and observability."""
    cluster_col = cluster_col or key_cols[0]
    stats_cols = stats_cols or [cluster_col]
    src = source.localCheckpoint(eager=False)  # consumed 3-4 times below
    src_keys = src.select(*key_cols)
    locate = read_index(spark, path)
    dup_checked = False
    if len(key_cols) == 1 and src_keys.count() <= locate_cap:
        keys = [r[0] for r in src_keys.collect()]  # bounded by locate_cap
        if len(keys) != len(set(keys)):
            raise ValueError(
                "merge_commit: source has duplicate keys "
                f"({len(keys) - len(set(keys))} extra rows) — the contract "
                "is at most one row per key"
            )
        dup_checked = True
        locate = read_index(spark, path, prune_in=(key_cols[0], keys))
    if not dup_checked:
        dup = (
            src_keys.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .take(1)
        )  # one bounded aggregate over the (small) source batch
        if dup:
            raise ValueError(
                "merge_commit: source has duplicate keys "
                f"(e.g. {tuple(dup[0][c] for c in key_cols)}) — the "
                "contract is at most one row per key"
            )
    matched_parts = (
        locate.join(src_keys, key_cols, "semi")
        .select(part_col)
        .distinct()
        .collect()
    )  # bounded by the partition count, not the data
    if delete_col is not None:
        # NULL tombstone flags (e.g. from unionByName(allowMissingColumns=
        # True)) mean "not a delete" — coalesce so a NULL-flag row updates
        # its match instead of silently deleting it.
        src = src.withColumn(
            delete_col, F.coalesce(F.col(delete_col), F.lit(False))
        )
    src_parts = (
        src.filter(~F.col(delete_col)) if delete_col is not None else src
    ).select(part_col).distinct().collect()
    parts = sorted({r[0] for r in matched_parts} | {r[0] for r in src_parts})
    if not parts:
        return []
    survivors = read_index(spark, path, part_values=parts).filter(
        F.col(part_col).isin(parts)
    ).join(src_keys, key_cols, "anti")
    incoming = (
        src.filter(~F.col(delete_col)).drop(delete_col)
        if delete_col is not None
        else src
    )
    replacement = survivors.unionByName(
        incoming.select(*survivors.columns)
    )
    replace_parts_commit(
        path,
        lambda: replacement.repartitionByRange(
            max(len(parts) * n_ranges_per_part, 1), part_col, cluster_col
        )
        .write.mode("append")
        .partitionBy(part_col)
        .parquet(path),
        part_values=parts,
        note=note,
        stats_cols=stats_cols,
    )
    return parts


def compact_index_parts(
    spark: SparkSession,
    path: str,
    part_col: str,
    max_files_per_part: int = 1,
    parts: list[int] | None = None,
    cluster_col: str | None = None,
    files_per_part: int = 1,
    _before_publish=None,
) -> dict[int, tuple[int, int]]:
    """Small-file maintenance for an append-merged partitioned index.

    Every snapshot merge appends one file set per partition, so after N
    snapshots each partition holds N file sets and scan/open overhead
    grows with snapshot count. Compaction is the place where
    read-union-rewrite IS the right shape — but applied per PARTITION,
    never to the whole index: only partitions whose live file count
    exceeds ``max_files_per_part`` (or the explicit ``parts`` override)
    are read — a pruned scan, the parquet reader touches no other
    partition — rewritten as one file per partition, STAGED beside the
    live files, and committed via the manifest flip (see the module
    protocol note: old files are not deleted here —
    :func:`vacuum_index` sweeps them after the retention window).
    Content is untouched (conservation pinned in test_round10_merge);
    at 100 TB this is the nightly job that keeps probe-time file counts
    flat while merges stay append-only.

    ``cluster_col`` makes the compaction SORT-AWARE (the bin-pack-with-
    sort-order of a transactional table format): without it each
    touched partition rewrites to one file, which is optimal for file
    COUNT but collapses that partition's zone map to its full key range
    — after enough unclustered appends, a compacted file is never
    skippable. With it, the rewrite range-partitions on
    ``(part_col, cluster_col)`` into ``files_per_part`` slices per
    touched partition, so each staged file holds a contiguous
    near-disjoint cluster-key slice and the committed stats (which this
    function re-harvests automatically for every tracked column) are
    selective again — compaction RESTORES skipping instead of
    destroying it. ``files_per_part`` is approximate at partition
    boundaries (a range slice straddling two partitions stages a file
    in each).

    ``_before_publish`` is a test seam: called after staging, before
    the manifest flip — the crash/concurrent-reader window the
    protocol tests pin.

    Returns {part: (live_files_before, live_files_after)}.
    """
    import os
    import shutil
    import tempfile

    doc = _read_manifest_doc(path)  # ONE resolve: files+stats together
    live = list(doc["files"]) if doc else _list_data_files(path)
    counts: dict[int, int] = {}
    for f in live:
        p = _part_of(f)
        counts[p] = counts.get(p, 0) + 1
    # Convergence: the sort-aware rewrite deliberately stages
    # ~files_per_part files per partition — plus possibly ONE more
    # when a range slice straddles two partitions (the docstring's
    # "approximate at partition boundaries") — so the trigger must not
    # re-touch a partition the previous run just compacted to either
    # shape, otherwise the nightly job rewrites identical content
    # forever (ADVICE r12: the straddle case re-triggered at exactly
    # files_per_part + 1). The effective threshold is the larger of
    # the two knobs, with one boundary-straddle file of slack.
    threshold = max(
        max_files_per_part,
        (files_per_part + 1) if cluster_col is not None else 0,
    )
    touched = (
        # Intersect an explicit override with the partitions that
        # actually have live rows (ADVICE r11): a named partition with
        # no live files produces no staged output directory, which
        # previously failed LATE (os.listdir on the missing src dir)
        # after the rewrite already ran.
        sorted(p for p in parts if p in counts)
        if parts is not None
        else sorted(p for p, n in counts.items() if n > threshold)
    )
    if not touched:
        return {}
    pruned = read_index(spark, path).filter(F.col(part_col).isin(touched))
    tmp = tempfile.mkdtemp(prefix="csb_idx_compact_")
    shaped = (
        pruned.repartitionByRange(
            len(touched) * files_per_part, part_col, cluster_col
        )
        if cluster_col is not None
        else pruned.repartition(len(touched), part_col)
    )
    (
        shaped.write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(tmp)
    )
    version = (int(doc["version"]) if doc else 0) + 1
    staged: list[str] = []
    for p in touched:
        src_dir = os.path.join(tmp, f"{part_col}={p}")
        if not os.path.isdir(src_dir):
            # live files but zero live rows: the rewrite stages nothing
            # for this partition; its old files are simply superseded
            continue
        dst_dir = os.path.join(path, f"{part_col}={p}")
        os.makedirs(dst_dir, exist_ok=True)
        for fn in sorted(os.listdir(src_dir)):
            if not fn.endswith(".parquet"):
                continue
            staged_name = f"compact-v{version}-{fn}"
            shutil.move(
                os.path.join(src_dir, fn), os.path.join(dst_dir, staged_name)
            )
            staged.append(f"{part_col}={p}/{staged_name}")
    shutil.rmtree(tmp, ignore_errors=True)
    # Zone maps survive compaction automatically: any column the
    # committed stats already track is re-harvested from the staged
    # files' footers, so the rewritten files stay skippable without the
    # caller re-declaring stats_cols at every maintenance run.
    tracked = sorted(
        {
            c
            for fs in (dict(doc.get("stats", {})) if doc else {}).values()
            for c in fs
        }
    )
    stats = file_column_stats(path, staged, tracked) if tracked else None
    if _before_publish is not None:
        _before_publish()
    survivors = [f for f in live if _part_of(f) not in touched]
    publish_manifest(
        path,
        survivors + staged,
        note=f"compact {part_col}s={touched}",
        stats=stats,
    )
    after = live_part_file_counts(path)
    return {p: (counts[p], after.get(p, 0)) for p in touched}


def vacuum_index(
    path: str, keep_versions: int = 2, orphan_grace_s: float = 0.0
) -> list[str]:
    """Delete physical data files referenced by NONE of the newest
    ``keep_versions`` COMMITTED manifests — the retention window that
    lets a reader holding an older manifest finish its scan before the
    files it resolved disappear. The only deletion in the index
    lifecycle; never called by commit paths. Returns the deleted
    relative paths.

    "Committed" = at or below the version ``_current`` names. A
    manifest NEWER than the pointer is a CRASH ORPHAN — a commit that
    died between manifest write and pointer flip. Orphans are (a)
    excluded from the keep set (an uncommitted file list must never
    protect files, and with a small ``keep_versions`` it could
    otherwise displace the LIVE manifest from the keep window — data
    loss for the current snapshot) and (b) deleted here, which is also
    the recovery path for the commit CAS: after a crash the stranded
    ``m-{N+1}`` blocks the next exclusive create until vacuum clears
    it (the commit-conflict error says so). Also sweeps crash-stranded
    ``_current.tmp.*`` pointer files.

    ``orphan_grace_s`` (ADVICE r12): an above-pointer manifest younger
    than this many seconds is LEFT ALONE (still excluded from the keep
    set) — at commit time a same-named manifest could also be a
    CONCURRENT writer between its manifest write and pointer flip, and
    deleting it would leave that writer's ``_current`` naming a dead
    file. The default 0.0 preserves the single-writer deployment
    contract (delete immediately); any deployment with a second
    possible writer should pass a grace exceeding its longest commit."""
    import glob
    import os
    import time

    cur = _read_manifest_doc(path)
    cur_version = int(cur["version"]) if cur else 0
    deleted = []
    all_manifests = sorted(
        glob.glob(os.path.join(path, _MANIFEST_DIR, "m-*.json"))
    )
    committed = []
    now = time.time()
    for mp in all_manifests:
        if int(os.path.basename(mp)[2:-5]) > cur_version:
            # crash orphan: never committed, excluded from the keep
            # set below either way; deletion unblocks the commit CAS
            # but waits out the grace window (a mid-commit concurrent
            # writer looks identical from here)
            if now - os.path.getmtime(mp) >= orphan_grace_s:
                os.remove(mp)
                deleted.append(os.path.relpath(mp, path))
        else:
            committed.append(mp)
    if not committed:
        return deleted
    import json

    keep: set[str] = set()
    for mp in committed[-keep_versions:]:
        with open(mp) as f:
            keep.update(json.load(f)["files"])
    for f in _list_data_files(path):
        if f not in keep:
            os.remove(os.path.join(path, f))
            deleted.append(f)
    # Expire metadata along with data (ADVICE r11: every commit adds a
    # manifest JSON, so _manifest/ otherwise grows unboundedly) —
    # Iceberg's expire-snapshots move. Only manifests OLDER than the
    # newest keep_versions go (``_current`` always names the newest
    # committed one, which is always kept).
    for mp in committed[:-keep_versions]:
        os.remove(mp)
        deleted.append(os.path.relpath(mp, path))
    for tmp in glob.glob(os.path.join(path, f"{_CURRENT}.tmp.*")):
        os.remove(tmp)
        deleted.append(os.path.relpath(tmp, path))
    return deleted


def snapshot_diff(
    path: str, from_version: int, to_version: int
) -> tuple[list[str], list[str]]:
    """``(removed, added)`` relative data-file lists between two
    RETAINED snapshots — the manifest-level diff every incremental
    consumer starts from. Both versions resolve under the committed-at-
    or-below-pointer rule (see :func:`read_manifest`), so a crash
    orphan can never appear as a snapshot edge. A file present in both
    manifests is untouched by definition (commits never modify a data
    file in place — the protocol is append + supersede), so the diff
    names EVERY file whose content could differ between the snapshots,
    and nothing else."""
    if from_version >= to_version:
        raise ValueError(
            f"snapshot_diff needs from_version < to_version, got "
            f"{from_version} >= {to_version}"
        )
    a = _read_manifest_doc(path, version=from_version)
    b = _read_manifest_doc(path, version=to_version)
    fa, fb = set(a["files"]), set(b["files"])
    return sorted(fa - fb), sorted(fb - fa)


def read_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level change feed between two retained snapshots — the
    change-data-feed of a transactional table format (Delta CDF /
    Iceberg changelog shape) derived post-hoc from plain manifests, no
    write-side logging required. Returns the ``to_version`` snapshot's
    columns plus ``_change_type`` in ``insert`` / ``delete`` /
    ``update_preimage`` / ``update_postimage`` (pre rows carry the old
    image, post rows the new).

    IO is proportional to the CHANGE, never the table: only the
    :func:`snapshot_diff` files are read — a file in both manifests is
    untouched and never enters either scan — and the classifying join
    shuffles only the rewritten partitions' rows. The key insight over
    a file-level diff: :func:`replace_parts_commit` and
    :func:`compact_index_parts` rewrite WHOLE partitions, carrying
    unchanged rows into new files, so the feed full-outer-joins the
    superseded rows against the replacement rows on ``key_cols`` and
    SUPPRESSES rows whose payload is unchanged — a pure compaction
    between the two versions yields an EMPTY feed (pinned in tests).

    ``key_cols`` must uniquely identify a row within the diff'd files
    on each side (the usual primary-key contract of any CDF).
    ``compare_cols`` defaults to every non-key column of the
    ``to_version`` schema; a column absent on the pre side (schema
    evolution between the versions) compares as NULL, so a backfilled
    value surfaces as an update — the same answer a write-side CDF
    gives. Each side is read under its OWN snapshot's committed schema."""
    import os

    removed, added = snapshot_diff(path, from_version, to_version)

    def side(files: list[str], version: int) -> DataFrame | None:
        if not files:
            return None
        doc = _read_manifest_doc(path, version=version)
        r = spark.read
        if doc.get("schema"):
            import json as _json

            from pyspark.sql.types import StructType

            r = r.schema(StructType.fromJson(_json.loads(doc["schema"])))
        return r.option("basePath", path).parquet(
            *[os.path.join(path, f) for f in files]
        )

    pre, post = side(removed, from_version), side(added, to_version)
    if pre is None and post is None:
        # metadata-only commit (e.g. a meta/fence update): empty feed
        # with the live schema
        anchor = read_index(spark, path, version=to_version).limit(0)
        return anchor.withColumn("_change_type", F.lit("insert")).limit(0)
    if pre is None:
        return post.withColumn("_change_type", F.lit("insert"))
    if post is None:
        return pre.withColumn("_change_type", F.lit("delete"))

    # align the pre side to the post (to_version) schema: a column the
    # old files lack projects as NULL, extra pre-only columns are
    # dropped (a column removal reads as an update on its peers only)
    out_cols = post.columns
    pre = pre.select(
        *[
            F.col(c) if c in pre.columns
            else F.lit(None).cast(post.schema[c].dataType).alias(c)
            for c in out_cols
        ]
    )
    cmp_cols = (
        [c for c in out_cols if c not in key_cols]
        if compare_cols is None
        else list(compare_cols)
    )
    a = pre.select(
        *key_cols,
        *[F.col(c).alias(f"__pre_{c}") for c in out_cols if c not in key_cols],
        F.lit(True).alias("__in_pre"),
    )
    b = post.select(
        *key_cols,
        *[F.col(c).alias(f"__post_{c}") for c in out_cols if c not in key_cols],
        F.lit(True).alias("__in_post"),
    )
    j = a.join(b, on=key_cols, how="full_outer")
    unchanged = F.lit(True)
    for c in cmp_cols:
        unchanged = unchanged & F.col(f"__pre_{c}").eqNullSafe(
            F.col(f"__post_{c}")
        )

    def image(side_prefix: str, change: str):
        return F.struct(
            *[
                F.col(f"__{side_prefix}_{c}").alias(c)
                for c in out_cols
                if c not in key_cols
            ],
            F.lit(change).alias("_change_type"),
        )

    # ONE pass over the joined rows: each row yields its change images
    # as an array that explode() flattens — a union of four filtered
    # branches would instead plan the classifying join (and the diff
    # files' scans) once PER branch, 4× the IO this operator exists to
    # bound.
    images = (
        F.when(F.col("__in_post").isNull(), F.array(image("pre", "delete")))
        .when(F.col("__in_pre").isNull(), F.array(image("post", "insert")))
        .when(
            ~unchanged,
            F.array(
                image("pre", "update_preimage"),
                image("post", "update_postimage"),
            ),
        )
        # copied unchanged: suppressed (explode of a NULL array emits
        # no row, and the null literal needs no struct-type spelling)
    )
    exploded = j.select(*key_cols, F.explode(images).alias("__img"))
    return exploded.select(
        *key_cols,
        *[
            F.col(f"__img.{c}").alias(c)
            for c in out_cols
            if c not in key_cols
        ],
        F.col("__img._change_type").alias("_change_type"),
    )


def drain_changes(
    spark: SparkSession,
    path: str,
    state_path: str,
    key_cols: list[str],
    apply_fn,
) -> tuple[int, int] | None:
    """Checkpointed incremental consumer of the change feed — the
    "keep a downstream store in sync" loop: resolve the consumer's
    last-drained version from its OWN checkpoint file (consumer state
    never lives in the producer's manifest — many consumers, one
    producer), compute :func:`read_changes` up to the current
    committed version, hand the feed to ``apply_fn(feed_df, v_from,
    v_to)``, and only then advance the checkpoint (atomic same-dir
    replace, the ``_current`` move). Crash BEFORE the checkpoint
    write ⇒ the next drain redelivers the same span — at-least-once,
    so ``apply_fn`` must be idempotent (keyed upserts/deletes are;
    blind increments are not). A consumer that has never drained
    starts from the OLDEST retained version — it must bootstrap from a
    snapshot read first and record that version itself via
    ``state_path``. Returns the (v_from, v_to) span drained, or None
    when already current."""
    import os

    cur = read_manifest(path)
    if cur is None:
        return None
    v_now = cur[0]
    last = None
    if os.path.exists(state_path):
        with open(state_path) as fh:
            last = int(fh.read().strip())
    if last is None:
        raise ValueError(
            f"consumer checkpoint {state_path!r} does not exist: bootstrap "
            "from a snapshot read (read_index(version=v)) and write v first"
        )
    if last >= v_now:
        return None
    feed = read_changes(spark, path, last, v_now, key_cols=key_cols)
    apply_fn(feed, last, v_now)
    tmp = f"{state_path}.tmp"
    with open(tmp, "w") as fh:
        fh.write(str(v_now))
    os.replace(tmp, state_path)
    return last, v_now
