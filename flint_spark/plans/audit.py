"""Physical-plan introspection shared by the gate assertions
(``entry_queries.common.count_exchanges``) and the PLANS.md generator
(``tests/plan_audit.py``) — ONE walker, so AQE/QueryStage traversal
fixes land in both consumers.

Counting is per final plan NODE, not the printed string (which repeats
cached subtrees once per consumer): cached ``InMemoryTableScan``
subtrees and ``ReusedExchange`` pointers are not re-entered, AQE
wrappers and query stages are followed into their current plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Arrow-batched Python stages — the only Python execution in the engine
PYTHON_NODES = ("FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython",
                "FlatMapCoGroupsInPandas", "FlatMapGroupsInPandasWithState")


def walk_plan(node):
    """Yield every node name in the final physical plan, following AQE
    wrappers and query stages but NOT re-entering cached subtrees (an
    InMemoryTableScan's cached plan executes once, not per consumer —
    string-counting the printed plan double-counts it). Delegates to
    :func:`walk_plan_flagged` — ONE traversal to maintain."""
    for name, _ in walk_plan_flagged(node):
        yield name


def walk_plan_flagged(node, under_broadcast=False):
    """Like :func:`walk_plan` but yields ``(name, under_broadcast)`` —
    whether the node sits inside a BroadcastExchange subtree. An
    Exchange under a broadcast shuffles only the DIM side being built
    for broadcast (e.g. the sorted-arrays aggregate of the JVM as-of
    engine); an Exchange outside one moves the probe-side data — the
    distinction the zero-big-side-exchange pins assert."""
    name = node.nodeName()
    yield name, under_broadcast
    if name.startswith("InMemoryTableScan"):
        return
    if name.startswith("AdaptiveSparkPlan"):
        yield from walk_plan_flagged(node.executedPlan(), under_broadcast)
        return
    if "QueryStage" in name:
        yield from walk_plan_flagged(node.plan(), under_broadcast)
        return
    if name.startswith("ReusedExchange"):
        return
    child_flag = under_broadcast or name.startswith("BroadcastExchange")
    for i in range(node.children().length()):
        yield from walk_plan_flagged(node.children().apply(i), child_flag)


def count_probe_exchanges(df: DataFrame, execute: bool = True) -> int:
    """Data-shuffle Exchange count OUTSIDE broadcast subtrees — the
    exchanges that move the big (probe) side. A broadcast as-of plan
    legitimately shuffles its dim side once while building the
    broadcast arrays; what must stay at zero is this count."""
    if execute:
        df._jdf.queryExecution().toRdd().count()
    return sum(1 for n, under in
               walk_plan_flagged(df._jdf.queryExecution().executedPlan())
               if n == "Exchange" and not under)


def plan_counts(df: DataFrame, execute: bool = True) -> dict[str, int]:
    """(shuffles, broadcasts, python stages, broadcast-NLJ) of ``df``'s
    plan. ``execute=True`` first runs ``queryExecution().toRdd().count()``
    — an action on df's OWN QueryExecution, so the inspected
    AdaptiveSparkPlan is genuinely AQE-final (a side-channel action
    like a noop write builds a separate QueryExecution and leaves this
    one un-finalized), and the count aggregates distributed — no
    result rows reach the driver, so gates can audit plans whose
    output would not fit there. Exchange nodes are counted bare —
    query stages wrap them, and counting both would double-count
    every AQE shuffle."""
    if execute:
        df._jdf.queryExecution().toRdd().count()
    names = list(walk_plan(df._jdf.queryExecution().executedPlan()))
    return {
        "shuffles": sum(1 for n in names if n == "Exchange"),
        "broadcasts": sum(1 for n in names if n.startswith("BroadcastExchange")),
        "python": sum(1 for n in names if n in PYTHON_NODES),
        "bnlj": sum(1 for n in names if n.startswith("BroadcastNestedLoopJoin")),
    }


def count_exchanges(df: DataFrame, execute: bool = True) -> int:
    """Data-shuffle Exchange count of the (finalized) plan."""
    return plan_counts(df, execute)["shuffles"]
