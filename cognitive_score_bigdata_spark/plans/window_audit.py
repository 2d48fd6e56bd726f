"""Mechanical window-skew audit (VERDICT r9 item 3).

Round 9's §9r audit classified every registry plan's Window nodes by
hand into four 100 TB postures (SURVEY.md §9r):

1. **wgl** — WindowGroupLimit fires: rank<=k is filtered AT the window,
   so hot keys collapse to local winners per map task before the
   shuffle;
2. **bounded** — the window's input is pre-aggregated / limited, so the
   window never sees raw-row cardinality;
3. **per-entity** — the frame IS per-entity order (``user_id`` /
   ``doc_id`` partition keys): bounded by per-entity history, the
   documented irreducible class (AQE cannot split a window partition);
3b. **partition-local** — partitioned by ``__pid``
   (``spark_partition_id()``): the local leg of the two-pass global
   prefix sum (``operators/sharding.py``), bounded by partition size
   (``spark.sql.files.maxPartitionBytes``), never by key skew;
4. **exposed** — global or low-cardinality key over raw rows: exact
   rank/cumsum semantics that exist as sf-scale oracles for their
   registry-resident approximate siblings, allowed only on an explicit
   exempt list.

That classification was prose; a round-11 query could reintroduce a
single-partition window over raw rows and nothing would fail. This
module makes it executable: walk the pre-AQE physical plan
(``queryExecution().sparkPlan()`` — no AdaptiveSparkPlanExec wrapper,
stable for static analysis), find every Window-family node, and
classify it. ``tests/test_plans.py::test_registry_window_skew_classes``
sweeps the whole registry and fails on any unclassified window.

KNOWN LIMIT — checkpoint-hidden stages: a lazy ``localCheckpoint``
truncates the SQL plan at an ExistingRDD scan, so windows upstream of
a checkpoint are invisible to the sweep. Any query that checkpoints a
window-bearing stage must classify that stage in a dedicated test on
the PRE-checkpoint DataFrame (the pattern:
``tests/test_winnowing.py::test_winnowing_windows_classify_per_entity``);
as of round 10 the only checkpoint users are aggregate-only stages
plus winnowing's fingerprint table, which carries that test.

Classification is structural, not name-based:

- class 1 iff a ``WindowGroupLimitExec`` sits in the window's subtree
  (Spark inserts the Partial/Final limit nodes BELOW the Window it
  rewrites);
- class 2 iff every path from the window's child down to a leaf passes
  through a cardinality-bounding node (final/partial aggregate, limit,
  TakeOrderedAndProject, or a local one-row relation) — joins follow
  all branches, except broadcast build sides, which bound the join's
  output multiplicity by the build row count, not the probe side's
  scan cardinality;
- class 3 iff every partition-spec column name is an entity key
  (``user_id``/``doc_id``/``vec_id`` — per-user event history,
  per-document chunk lists, per-vector component lists);
- class 3b iff the partition spec includes ``__pid``;
- anything else is **exposed** and must be exempt-listed by the test.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

WINDOW_NODES = {"WindowExec", "WindowInPandasExec"}
AGG_NODES = {
    "HashAggregateExec",
    "ObjectHashAggregateExec",
    "SortAggregateExec",
}
BOUNDING_NODES = AGG_NODES | {
    "WindowGroupLimitExec",
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "CollectLimitExec",
    "LocalTableScanExec",  # literal / driver-built relations
    "RDDScanExec",  # localCheckpoint results of bounded fixpoint state
}
# Build sides of broadcast joins bound output multiplicity by the
# build-relation row count; the window input cardinality is set by the
# probe side, so the bounded-input walk skips into broadcast subtrees.
BROADCAST_BUILD = {"BroadcastExchangeExec"}
ENTITY_KEYS = {"user_id", "doc_id", "vec_id"}
# An aggregate or group-limit keyed by one of these is NOT a
# cardinality bound: its output row count tracks the entity space
# (|users|, |docs|, ...), which grows with the data — per-user totals
# feeding a global window is the events_pareto_user_deciles shape the
# hand audit classified as exposed. Group keys are a cardinality
# judgment; this set encodes the registry's high-cardinality keys, and
# a key absent from it is treated as bounded (event_type, source, day,
# band — the low-cardinality dimensions).
HIGH_CARD_KEYS = ENTITY_KEYS | {"event_id", "chunk", "bkey", "url", "host"}


def _children(node) -> list:
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _name(node) -> str:
    return node.getClass().getSimpleName()


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def _subtree_has(node, names: set[str]) -> bool:
    return any(_name(n) in names for n in _walk(node))


def _wgl_guards_this_window(window_node, wgl_names: set[str], window_names: set[str]) -> bool:
    """True iff a WindowGroupLimit is reachable from this Window's
    child WITHOUT passing through another Window node. Spark inserts
    the Partial/Final limit nodes directly below the Window they
    rewrite, so a limit belonging to a LOWER window must not mark an
    exposed UPPER window safe (two-window plans: the sweep's one
    false-negative hole, closed by this barrier)."""

    def search(n) -> bool:
        nm = _name(n)
        if nm in wgl_names:
            return True
        if nm in window_names:  # a lower window owns everything below
            return False
        return any(search(c) for c in _children(n))

    return any(search(c) for c in _children(window_node))


def _group_keys(node) -> str:
    """String form of an aggregate's grouping keys / a group-limit's
    partition spec (empty for other nodes or on reflection failure)."""
    try:
        n = _name(node)
        if n in AGG_NODES or n == "Aggregate":
            exprs = node.groupingExpressions()
        elif n.startswith("WindowGroupLimit"):
            exprs = node.partitionSpec()
        else:
            return ""
        return "; ".join(exprs.apply(i).toString() for i in range(exprs.size()))
    except Exception:  # noqa: BLE001 - unexpected node shape: no keys
        return ""


def _keyed_by_high_card(node) -> bool:
    import re

    s = _group_keys(node)
    names = {m.lower() for m in re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", s)}
    return any(n in HIGH_CARD_KEYS for n in names)


def _bounded(node) -> bool:
    """Every leaf path from ``node`` crosses a cardinality bound.

    An aggregate / group-limit keyed by a HIGH_CARD_KEYS column is not
    itself a bound (output tracks the entity space) but the walk
    continues below it — a limit deeper down still caps the result.
    """
    n = _name(node)
    if (n in BOUNDING_NODES or n in BROADCAST_BUILD) and not _keyed_by_high_card(
        node
    ):
        return True
    kids = _children(node)
    if not kids:  # a raw scan leaf reached with no bound above it
        return False
    return all(_bounded(c) for c in kids)


def _partition_cols(node) -> list[str]:
    """Partition-spec column names of a Window-family node, without the
    exprId suffixes (``user_id#123`` -> ``user_id``)."""
    spec = node.partitionSpec()
    cols = []
    for i in range(spec.size()):
        s = spec.apply(i).toString()
        cols.append(s.split("#", 1)[0].strip().lower())
    return cols


@dataclass
class WindowClass:
    partition_cols: list[str]
    klass: str  # "wgl" | "bounded" | "per-entity" | "partition-local" | "exposed"


# Logical-plan analogues, used for windows hiding inside subquery
# expressions: subqueries are not planned into the physical tree until
# execution preparation (sparkPlan().subqueries() is empty), so they
# are swept on the optimized LOGICAL plan via subqueriesAll() — where
# InferWindowGroupLimit has already placed logical WindowGroupLimit
# nodes, making the same classification possible.
_L_WINDOW = {"Window"}
_L_BOUNDING = {
    "Aggregate",
    "WindowGroupLimit",
    "GlobalLimit",
    "LocalLimit",
    "LocalRelation",
    "OneRowRelation",
}


def _bounded_logical(node) -> bool:
    n = _name(node)
    if n in _L_BOUNDING and not _keyed_by_high_card(node):
        return True
    kids = _children(node)
    if not kids:
        return False
    return all(_bounded_logical(c) for c in kids)


def _classify_one(node, *, logical: bool) -> "WindowClass":
    cols = _partition_cols(node)
    wgl_names = {"WindowGroupLimit"} if logical else {"WindowGroupLimitExec"}
    window_names = _L_WINDOW if logical else WINDOW_NODES
    bounded = _bounded_logical if logical else _bounded
    if _wgl_guards_this_window(node, wgl_names, window_names):
        klass = "wgl"
    elif all(bounded(c) for c in _children(node)):
        klass = "bounded"
    elif cols and all(c in ENTITY_KEYS for c in cols):
        klass = "per-entity"
    elif "__pid" in cols:
        klass = "partition-local"
    else:
        klass = "exposed"
    return WindowClass(partition_cols=cols, klass=klass)


def _window_signature(node) -> tuple:
    """(partition cols, order spec incl. direction/null ordering, window
    expressions incl. function + frame) sans expr-id suffixes — the
    operator-level identity of a window computation. Two nodes with the
    same signature are the same window planned at two positions.

    The expression list matters (ADVICE r11): a partition/order-only
    signature would let a user-authored subquery window that merely
    shares partition+order columns with a main-plan window be skipped
    as a "DPP duplicate" even though it computes different functions —
    an audit false negative. The windowspecdefinition string inside
    each expression also carries the frame, so frame differences break
    the match too."""
    import re

    def strip(s: str) -> str:
        return re.sub(r"#\d+L?", "", s).strip().lower()

    try:
        order = node.orderSpec()
        order_cols = tuple(
            (
                strip(order.apply(i).child().toString()),
                str(order.apply(i).direction()).lower(),
                str(order.apply(i).nullOrdering()).lower(),
            )
            for i in range(order.size())
        )
    except Exception:  # noqa: BLE001 - node without an order spec
        order_cols = ()
    exprs = None
    for getter in ("windowExpression", "windowExpressions"):
        try:
            exprs = getattr(node, getter)()
            break
        except Exception:  # noqa: BLE001 - other node flavor
            continue
    funcs = (
        tuple(sorted(strip(exprs.apply(i).toString()) for i in range(exprs.size())))
        if exprs is not None
        else ()
    )
    return (tuple(_partition_cols(node)), order_cols, funcs)


def classify_windows(df: DataFrame) -> list[WindowClass]:
    """Classify every Window node in ``df``'s pre-AQE physical plan,
    plus any Window hiding inside subquery expressions (swept on the
    optimized logical plan — see module docstring).

    Engine-made duplicates: dynamic partition pruning COPIES a join's
    broadcast build side — windows and all — into a scan's pruning
    subquery, AFTER InferWindowGroupLimit ran, so the copy lacks the
    group-limit its main instance carries and would misclassify as
    exposed (first seen on ``vector_ivf_merge_topk``: probing the
    cell-partitioned inverted file DPP-duplicates the per-query
    cell-rank window). A subquery window whose (partition, order)
    signature matches a main-plan window is the SAME operator planned
    twice by the engine for pruning — the main instance's class is the
    audit verdict, so the duplicate is skipped. Genuinely novel
    subquery windows (no main-plan twin) still classify on their own.
    """
    qe = df._jdf.queryExecution()  # noqa: SLF001
    out: list[WindowClass] = []
    main_sigs: set[tuple] = set()
    for node in _walk(qe.sparkPlan()):
        if _name(node) in WINDOW_NODES:
            out.append(_classify_one(node, logical=False))
            main_sigs.add(_window_signature(node))
    subs = qe.optimizedPlan().subqueriesAll()
    for i in range(subs.size()):
        for node in _walk(subs.apply(i)):
            if _name(node) in _L_WINDOW:
                if _window_signature(node) in main_sigs:
                    continue  # DPP duplicate of a classified window
                out.append(_classify_one(node, logical=True))
    return out


def main() -> None:  # pragma: no cover - manual sweep report
    import sys

    from cognitive_score_bigdata_spark.queries import load_registry
    from cognitive_score_bigdata_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry = load_registry()
    spark = get_spark("csb-window-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name, spec in registry.items():
        try:
            wins = classify_windows(spec.fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc!r}")
            continue
        if wins:
            desc = "; ".join(f"{w.klass}[{','.join(w.partition_cols)}]" for w in wins)
            print(f"{name}: {desc}")
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
