"""Distributed graph operators: fixed-point PageRank, triangle counting.

DataFrame-level APIs over an edge list (``src``, ``dst``) so the
algorithms are testable on synthetic graphs with known closed-form
answers (K4, paths, stars — see ``tests/test_graph_ops.py``) and
reusable beyond the co-purchase queries in
``queries/round4_staging2.py``.

Design notes (both operators):

- **Exact integer arithmetic.** PageRank ranks are BIGINT micro-units
  with ×17 integer-div 20·outdeg damping; triangle counting is pure
  counting. No floats anywhere, so results are bit-identical across
  engines, partitionings, and scale factors — which is what lets the
  registry queries carry real DuckDB oracles for algorithms that are
  usually "approximately reproducible" at best.
- **Skew posture.** PageRank broadcasts the rank vector (one row per
  node) into the edge list — edges never shuffle inside the loop, only
  the dst-keyed contribution aggregate does. Triangle counting uses
  degree orientation: ranking nodes by (degree, id) and directing every
  edge low→high bounds out-degree at O(√E), so a celebrity node
  generates zero wedges from its low side instead of deg² of them.
- **Beyond the broadcast ceiling** (SURVEY §9h: ≳2M nodes ≈ 32 MB rank
  table, where Catalyst flips the rank join to SMJ and every iteration
  would re-shuffle the 100 TB-scale EDGE list): every fixpoint here
  takes ``edge_buckets=N`` to switch to the bucketed-edge layout —
  the loop-invariant edge table is written ONCE with
  ``bucketBy(N, src).sortBy(src)`` (:func:`bucketize_edges`), so each
  iteration's state join reads the bucketed scan with NO edge-side
  Exchange and shuffles only the |V|-row rank/dist/label table into
  the bucket partitioning. Map-side partial aggregation keeps the
  contribution shuffle |V|-bounded per partition too, so total
  per-iteration shuffle volume is O(|V|·P), independent of |E|. AQE
  skew-split handles supernode buckets. Plan-pinned in
  ``tests/test_plans.py`` with broadcast disabled; cross-mode parity
  pinned in ``tests/test_graph_ops.py``.

Reference parity note: the reference (`/root/reference/src/backend/`)
has no graph surface; these belong to the brief's large-scale-pipeline
extension next to dedup clustering (`operators/dedup.py`), which
already ships the connected-components side of the graph story.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile
import weakref

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

PR_BASE = 150_000  # (1 - d) in micro-units, d = 0.85
PR_INIT = 1_000_000

_BUCKET_SEQ = itertools.count()

# Bookkeeping for tables bucketize_edges created, so repeated calls
# don't grow catalog + disk without bound: {"app": applicationId,
# "adhoc": OrderedDict(name -> (dir, weakref-to-scan)), "pinned":
# [(name, dir)]}. Ad-hoc tables (per-invocation fixpoint internals,
# consumed within the call) are LRU-bounded at _ADHOC_KEEP, but an
# entry whose returned scan DataFrame is still reachable (live
# weakref) is never evicted below the _ADHOC_HARD backstop — a caller
# holding the scan across many later bucketize_edges calls must not
# hit FileNotFoundException at execution time. Holding a DERIVED lazy
# plan without the scan object itself does not protect the files (the
# JVM plan does not keep the Python object alive) — such callers pass
# pin=True. Pinned tables live until the applicationId changes; on a
# new applicationId the old context's catalog entries died with it —
# only the temp dirs need removing.
_ADHOC_KEEP = 4
_ADHOC_HARD = 16
_BKT_STATE: dict = {"app": None, "adhoc": {}, "pinned": []}


def _drop_bucket_table(spark, name: str, path: str) -> None:
    try:
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    except Exception:
        pass  # best-effort: session may already be stopped
    shutil.rmtree(path, ignore_errors=True)


def bucketize_edges(
    df: DataFrame, key: str = "src", n_buckets: int = 32, pin: bool = False
) -> DataFrame:
    """Materialize a loop-invariant edge table ONCE as a ``key``-bucketed,
    ``key``-sorted parquet table and return its re-read scan.

    The scan's output partitioning IS ``hashpartitioning(key,
    n_buckets)``, so an equi-join on ``key`` needs no Exchange on the
    edge side — the one-time bucket write replaces |iterations| edge
    shuffles. ``repartition(n, key)`` before the write yields one file
    per bucket, which lets the scan also report the sort order (multiple
    files per bucket would force a re-sort, though never a shuffle).

    Lifecycle: each call creates a fresh table; unpinned tables are
    dropped (catalog + temp dir) once more than ``_ADHOC_KEEP`` newer
    ones exist — callers consume the scan within the invocation, so the
    LRU margin is generous. Eviction is weakref-gated: an entry whose
    returned scan object is still reachable survives past the LRU bound
    (up to the ``_ADHOC_HARD`` backstop), so holding the scan keeps its
    files alive. Holding only a DERIVED lazy plan does not — the JVM
    plan doesn't keep the Python scan alive — so callers building
    multi-query lazy plans across invocations pass ``pin=True``
    (session-scoped build artifacts); pinned tables are cleaned only
    when a new applicationId appears. The write uses
    ``mode("overwrite")`` so a stale same-name metastore entry (pid
    reuse + counter reset against a persistent warehouse) can never
    fail the build.
    """
    spark = df.sparkSession
    app = spark.sparkContext.applicationId
    st = _BKT_STATE
    if st["app"] != app:
        # prior context's catalog is gone; reclaim its temp dirs
        for _n, entry in list(st["adhoc"].items()) + st["pinned"]:
            path = entry[0] if isinstance(entry, tuple) else entry
            shutil.rmtree(path, ignore_errors=True)
        st["adhoc"].clear()
        st["pinned"] = []
        st["app"] = app
    name = f"csb_bkt_edges_{os.getpid()}_{next(_BUCKET_SEQ)}"
    base = tempfile.mkdtemp(prefix="csb_graph_bkt_")
    (
        df.repartition(n_buckets, F.col(key))
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", f"{base}/{name}")
        .saveAsTable(name)
    )
    scan = spark.table(name)
    if pin:
        st["pinned"].append((name, base))
    else:
        st["adhoc"][name] = (base, weakref.ref(scan))
        if len(st["adhoc"]) > _ADHOC_KEEP:
            # oldest-first: drop unreachable scans down to the LRU
            # bound; live scans survive to the _ADHOC_HARD backstop.
            # Dead entries go first even past the backstop — a live
            # scan is dropped only when evicting every dead entry
            # still leaves the count above _ADHOC_HARD (ADVICE r7: the
            # old single pass could drop a live oldest entry while
            # younger dead entries existed).
            for old in list(st["adhoc"]):
                if len(st["adhoc"]) <= _ADHOC_KEEP:
                    break
                path, ref = st["adhoc"][old]
                if ref() is None:
                    del st["adhoc"][old]
                    _drop_bucket_table(spark, old, path)
            for old in list(st["adhoc"]):
                if len(st["adhoc"]) <= _ADHOC_HARD:
                    break
                path, ref = st["adhoc"][old]
                del st["adhoc"][old]
                _drop_bucket_table(spark, old, path)
    return scan


def fold_pagerank_edges(
    edges: DataFrame, weight_col: str | None = None
) -> DataFrame:
    """(src, dst, __w, d): edge list with weight and out-degree folded
    in — the loop-invariant table every PageRank iteration joins. A
    per-graph build artifact: callers running the fixpoint repeatedly
    (or in bucketed mode) should materialize/bucket it once and pass it
    back via ``prepared=True``."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    e = edges.select("src", "dst", w.cast("bigint").alias("__w"))
    deg = e.groupBy("src").agg(F.sum("__w").alias("d"))
    return e.join(deg, "src")


def pagerank_fixed_point(
    edges: DataFrame,
    n_iters: int = 5,
    weight_col: str | None = None,
    edge_buckets: int | None = None,
    prepared: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list, exact BIGINT micro-units.

    ``edges`` needs columns ``src`` and ``dst``. Every node must have at
    least one out-edge (symmetrize beforehand if the graph is
    undirected; dangling nodes would otherwise leak rank mass).
    Returns (node, rank_micro) for every node with an in-edge.

    Unweighted: r_{t+1}(v) = 150000 + Σ (r_t(u) * 17) div (20 * outdeg(u)).
    With ``weight_col`` (integer edge weights), rank flows proportional
    to weight: contribution = (r * 17 * w) div (20 * wdeg(u)) where
    wdeg = Σ out-weights — still all-BIGINT, still bit-exact.

    ``edge_buckets=None`` (default): the rank vector broadcasts into the
    edge list each iteration — right while |V| fits the broadcast
    threshold (~2M nodes at 32 MB). ``edge_buckets=N``: the degree-folded
    edge table is bucketed on ``src`` once and each iteration sort-merge
    joins the rank table INTO the bucket partitioning — the >2M-node
    layout where only the |V|-row rank table moves per iteration.
    Identical results either way (mode changes the physical plan only).
    ``prepared=True``: ``edges`` is already the
    :func:`fold_pagerank_edges` output (and already bucketed when
    ``edge_buckets`` is set) — the session-cached-artifact path, so
    repeated fixpoints skip the fold/bucket build.
    """
    if prepared:
        # caller supplies the fold_pagerank_edges output (bucketed when
        # edge_buckets is set) — the session-cached-artifact path
        ed = edges
    else:
        ed = fold_pagerank_edges(edges, weight_col)
        if edge_buckets is None:
            ed = ed.localCheckpoint(eager=False)
        else:
            ed = bucketize_edges(ed, "src", edge_buckets)

    # seed ranks from the folded table: distinct(src). In bucketed mode
    # the distinct rides the bucket partitioning — zero-exchange
    ranks = (
        ed.select("src")
        .distinct()
        .select(
            F.col("src").alias("node"),
            F.lit(PR_INIT).cast("bigint").alias("rank_micro"),
        )
    )
    for _ in range(n_iters):
        rank_side = F.broadcast(ranks) if edge_buckets is None else ranks
        contrib = ed.join(rank_side, ranks.node == ed.src).select(
            F.col("dst"),
            F.expr("(rank_micro * 17 * __w) div (20 * d)").alias("c"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                (F.lit(PR_BASE) + F.sum("c"))
                .cast("bigint")
                .alias("rank_micro")
            )
            .select(F.col("dst").alias("node"), "rank_micro")
        )
    return ranks


def _orient(edges: DataFrame):
    """Degree-oriented edge list: returns (e, deg, rk, oe) where oe has
    (lo, hi) vertex RANKS with rank(lo) < rank(hi), rank = row_number
    over (degree, id). The V-sized global window touches one row per
    vertex, never the edges."""
    e = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    rk = deg.select(
        "node",
        F.row_number()
        .over(Window.orderBy("d", "node"))
        .cast("bigint")
        .alias("r"),
    )
    ru = rk.select(F.col("node").alias("u"), F.col("r").alias("ru"))
    rv = rk.select(F.col("node").alias("v"), F.col("r").alias("rv"))
    oe = (
        e.join(F.broadcast(ru), "u")
        .join(F.broadcast(rv), "v")
        .select(
            F.least("ru", "rv").alias("lo"),
            F.greatest("ru", "rv").alias("hi"),
        )
        .localCheckpoint(eager=False)  # reused: adjacency build + probe
    )
    return e, deg, rk, oe


def triangle_count(
    edges: DataFrame | None = None, oriented: tuple | None = None
) -> DataFrame:
    """Global triangle count via degree orientation; 1-row DataFrame.

    ``edges`` needs columns ``src``/``dst`` holding each undirected edge
    exactly once (either direction). Returns (n_vertices, n_edges,
    n_triangles), all BIGINT. ``oriented``: a prebuilt
    :func:`_orient` tuple — the orientation is a per-graph build
    artifact (one global vertex window + one edge relabel join) that
    callers running several triangle-family queries on the same graph
    should build once and share (session-cached in the copurchase
    queries; ~1.5 s per avoided rebuild at sf0.1).
    """
    if (edges is None) == (oriented is None):
        raise ValueError("pass exactly one of edges / oriented")
    e, deg, rk, oe = oriented if oriented is not None else _orient(edges)
    # Edge-iterator with sorted out-adjacency arrays: each edge (lo,hi)
    # contributes |N+(lo) ∩ N+(hi)| triangles. 5x faster than the
    # explicit wedge join at sf0.1 (2.5 s vs 12 s, same count): the
    # Σ out_deg² wedge relation is never materialized or shuffled — the
    # intersection runs JVM-side per edge row. The orientation is what
    # makes the arrays safe to collect: out-degree is bounded by
    # O(sqrt E), so an adjacency array tops out around sqrt(2E) entries
    # even for a celebrity node (its low side keeps almost nothing).
    # no sort_array: array_intersect hashes the first array regardless
    # of order, so sorting buys nothing and costs O(d log d) per node
    # (measured 1.61 -> 1.49 s on the global count at sf0.1)
    adj = oe.groupBy("lo").agg(F.collect_list("hi").alias("nbrs"))
    al = adj.select("lo", F.col("nbrs").alias("nl"))
    ah = adj.select(F.col("lo").alias("hi"), F.col("nbrs").alias("nh"))
    # inner joins drop hi-nodes with no out-edges — their intersection
    # would be empty, so dropping the row leaves the count unchanged
    tri = (
        oe.join(al, "lo")
        .join(ah, "hi")
        .select(F.size(F.array_intersect("nl", "nh")).alias("c"))
        .groupBy()
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n"))
    )
    counts = e.groupBy().agg(F.count(F.lit(1)).alias("n_edges"))
    verts = rk.groupBy().agg(F.count(F.lit(1)).alias("n_vertices"))
    return (
        verts.crossJoin(counts)
        .crossJoin(tri)
        .select(
            F.col("n_vertices").cast("bigint").alias("n_vertices"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n").cast("bigint").alias("n_triangles"),
        )
    )


def minlabel_components(
    edges: DataFrame,
    n_iters: int = 8,
    edge_buckets: int | None = None,
    prepared: bool = False,
) -> DataFrame:
    """Connected components by min-label propagation, fixed iterations.

    ``edges`` needs ``src``/``dst`` with each undirected edge in ONE
    direction; self-loops and symmetrization are added here. Every node
    starts labeled with its own id; each round every node takes the
    minimum label among itself and its neighbors. After ``n_iters``
    rounds a node's label is the minimum node id within ``n_iters``
    hops, so the result equals true connected components once
    ``n_iters`` reaches the label-propagation diameter (distance from
    each node to its component's minimum). Unlike the star-contraction
    operator in ``operators/dedup.py`` (O(log d) rounds, rows-only
    check), the fixed iteration count makes the output a pure function
    of the input — which is what lets the registry query carry an exact
    DuckDB oracle for a graph algorithm. Per round: one broadcast of
    the |V|-row label vector into the edge list + one min-aggregate
    shuffle on dst — the same Pregel shape as PageRank above.
    ``edge_buckets=N`` switches to the bucketed-edge layout for the
    >2M-node regime (see :func:`pagerank_fixed_point`).
    ``prepared=True``: ``edges`` is already the symmetrized,
    self-looped edge table (and bucketed when ``edge_buckets`` is set)
    — the session-cached-artifact path for repeated fixpoints, same
    economics as :func:`pagerank_fixed_point`'s prepared mode.
    """
    if prepared:
        withself = edges
    else:
        sym = edges.select("src", "dst").unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        nodes = sym.select(F.col("src").alias("n")).distinct()
        withself = sym.unionAll(
            nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        )
        if edge_buckets is None:
            withself = withself.localCheckpoint(eager=False)
        else:
            withself = bucketize_edges(withself, "src", edge_buckets)

    if edge_buckets is None and not prepared:
        labels = nodes.select(
            F.col("n").alias("node"), F.col("n").alias("lab")
        )
    else:
        # seed labels off the edge table itself (self-loops guarantee
        # every node appears as src); on a bucketed scan the distinct
        # rides the bucket partitioning — zero-exchange
        labels = (
            withself.select("src")
            .distinct()
            .select(F.col("src").alias("node"), F.col("src").alias("lab"))
        )
    for _ in range(n_iters):
        lab_side = F.broadcast(labels) if edge_buckets is None else labels
        labels = (
            withself.join(lab_side, labels.node == withself.src)
            .groupBy("dst")
            .agg(F.min("lab").alias("lab"))
            .select(F.col("dst").alias("node"), "lab")
        )
    return labels


def sssp_fixed_rounds(
    es: DataFrame,
    n_iters: int = 6,
    edge_buckets: int | None = None,
) -> DataFrame:
    """Bellman-Ford min-plus relaxation from ``min(src)``, fixed rounds.

    ``es`` needs ``src``/``dst``/``w`` (BIGINT weights, each directed
    edge once — symmetrize beforehand for undirected graphs). Returns
    (node, dist) for every node reached within ``n_iters`` hops; with
    integer weights and a fixed round count the output is a pure
    function of the input (exactly oracle-able, like
    :func:`minlabel_components`). Per round: frontier distances join
    the edge list on src (broadcast by default; bucketed-edge SMJ with
    ``edge_buckets=N`` for the >2M-node regime), then a min-aggregate
    merges relaxations with the kept distances. ``dist`` is referenced
    twice per round (relax join + keep-old union), so each round cuts
    lineage with localCheckpoint — without it the executed plan inlines
    2^k-fold (SURVEY §9h: 63 broadcast joins for 6 rounds).
    """
    if edge_buckets is None:
        es = es.localCheckpoint(eager=False)  # relaxed against every round
    else:
        es = bucketize_edges(es, "src", edge_buckets)
    src0 = es.groupBy().agg(F.min("src").alias("node"))
    dist = src0.select("node", F.lit(0).cast("bigint").alias("dist"))
    for _ in range(n_iters):
        dist_side = F.broadcast(dist) if edge_buckets is None else dist
        relax = es.join(dist_side, dist.node == es.src).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.select("node", "dist")
            .unionAll(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist


def local_triangle_counts(
    edges: DataFrame | None = None, oriented: tuple | None = None
) -> DataFrame:
    """Per-node triangle participation: (node, n_triangles, degree).

    Same oriented edge-iterator as :func:`triangle_count`, but instead
    of counting intersections it EXPLODES them: each common neighbor w
    of oriented edge (lo, hi) witnesses triangle {lo, hi, w}, and all
    three corners get credit. Output volume is 3x the triangle count —
    linear in the answer, still no wedge relation materialized. Nodes
    in no triangle are absent (join back to ``deg`` for zeros).
    ``oriented``: prebuilt :func:`_orient` tuple (see
    :func:`triangle_count`).
    """
    if (edges is None) == (oriented is None):
        raise ValueError("pass exactly one of edges / oriented")
    _, deg, rk, oe = oriented if oriented is not None else _orient(edges)
    # no sort_array: array_intersect hashes the first array regardless
    # of order, so sorting buys nothing and costs O(d log d) per node
    # (measured 1.61 -> 1.49 s on the global count at sf0.1)
    adj = oe.groupBy("lo").agg(F.collect_list("hi").alias("nbrs"))
    al = adj.select("lo", F.col("nbrs").alias("nl"))
    ah = adj.select(F.col("lo").alias("hi"), F.col("nbrs").alias("nh"))
    tri = (
        oe.join(al, "lo")
        .join(ah, "hi")
        .select(
            "lo", "hi", F.explode(F.array_intersect("nl", "nh")).alias("w")
        )
    )
    # one explode of (lo, hi, w) per triangle — NOT a 3-way unionAll of
    # projections, whose branches each recompute the intersect join
    # (measured: the union formulation was the one superlinear row in
    # the scale sweep, 1.19 slope at 8x; single-pass explode fixed it)
    credit = (
        tri.select(
            F.explode(F.array(F.col("lo"), F.col("hi"), F.col("w"))).alias(
                "r"
            )
        )
        .groupBy("r")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        credit.join(F.broadcast(rk), rk.r == credit.r)
        .join(F.broadcast(deg), "node")
        .select("node", "n_triangles", F.col("d").cast("bigint").alias("degree"))
    )
