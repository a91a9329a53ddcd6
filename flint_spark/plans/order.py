"""Order-preservation analysis of analyzed logical plans.

Port of the reference's rule table (``org/apache/spark/sql/
OrderPreservingOperation.scala:34-96``, theory ``doc/partition.md:199-269``):
a DataFrame derived from a sorted one remains sorted iff every node
between them preserves row order. The Python wrapper uses this to keep
its ``is_sorted`` flag honest across arbitrary DataFrame ops, so
operators can skip re-sorting when provably unnecessary.

Unlike the reference we never cache physical partition metadata — this
is a logical-only check; Catalyst's own outputOrdering drives physical
planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: logical nodes through which row order survives (reference rule table)
ORDER_PRESERVING_NODES = {
    "Project", "Filter", "Generate", "SubqueryAlias", "SerializeFromObject",
    "DeserializeToObject", "TypedFilter", "LogicalRDD", "LocalRelation",
    "Relation", "LogicalRelation", "View", "GlobalLimit", "LocalLimit",
    "WithColumns",
}

#: nodes that definitively destroy or redefine order
ORDER_DESTROYING_NODES = {
    "Aggregate", "Join", "Window", "Sort", "Distinct", "Deduplicate",
    "Union", "Repartition", "RepartitionByExpression", "Sample",
    "FlatMapGroupsInPandas", "MapInPandas", "Intersect", "Except", "Pivot",
}


def _node_names(df: DataFrame) -> list[str]:
    plan = df._jdf.queryExecution().analyzed()
    out = []
    it = plan.collectLeaves()  # noqa: F841 - force analysis
    stack = [plan]
    while stack:
        node = stack.pop()
        out.append(node.nodeName())
        for i in range(node.children().length()):
            stack.append(node.children().apply(i))
    return out


def is_order_preserving(df: DataFrame) -> bool:
    """True iff every node in df's analyzed plan preserves row order.

    Conservative: unknown nodes count as order-destroying."""
    for name in _node_names(df):
        base = name.replace("Exec", "")
        if base in ORDER_DESTROYING_NODES:
            return False
        if base not in ORDER_PRESERVING_NODES:
            return False
    return True
