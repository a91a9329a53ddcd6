"""Distributed graph analytics over edge tables.

Companion to the connected-components canonicalizer
(``dedup.connected_components`` — min-label propagation with pointer
jumping): ``pagerank`` is the weighted-centrality half, used in data
curation to weight documents by their position in a similarity or
citation graph.

Scale shape: each power iteration is one edge-to-rank equi-join plus
one destination aggregation (two bounded exchanges over |E| rows);
the normalized edge table and node table persist across iterations,
per-iteration ``localCheckpoint`` keeps the lineage flat (the
connected-components lesson — unbounded iteration lineage measured
and fixed in r4), and driver state is TWO scalars per iteration
(node count once, dangling mass each round) — the ``train_logreg``
bounded-collect precedent. No driver collect ever touches nodes or
edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..session import ansi_guard


@ansi_guard("graph operators")
def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight_col: str | None = None, iterations: int = 8,
             damping: float = 0.85) -> DataFrame:
    """Weighted PageRank by fixed-iteration power method:
    ``r_{t+1}(v) = (1-d)/N + d * (Σ_{u->v} r_t(u) * w_uv / W_u +
    dangling_mass / N)`` — parallel edges merge additively, out-edge
    weights row-normalize once up front, dangling nodes (no
    out-edges) redistribute their rank uniformly (the standard
    stochastic-matrix completion, so total rank stays 1). Returns
    (node, rank) for every node appearing as a source or
    destination. Deterministic given the edge multiset; the oracle
    unrolls every iteration in SQL."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    w = (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0))
    e = (edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .select(F.col(src).alias("__s"), F.col(dst).alias("__d"),
                 w.alias("__w"))
         .filter(F.col("__w") > 0)
         .groupBy("__s", "__d").agg(F.sum("__w").alias("__w")))
    nodes = (e.select(F.col("__s").alias("node"))
             .unionByName(e.select(F.col("__d").alias("node")))
             .distinct().persist())
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    # rename the aggregation key: outw derives from e, so joining the
    # two on a shared attribute name is a self-join whose column
    # references Spark rejects as ambiguous
    outw = (e.select(F.col("__s").alias("__os"), "__w")
            .groupBy("__os").agg(F.sum("__w").alias("__W")))
    # qualified refs throughout: outw derives from e, and the resolver
    # sees BOTH branches' attributes after the self-join, so a bare
    # col("__w") is ambiguous even though outw's schema no longer
    # exposes it
    en = (e.join(outw, e["__s"] == outw["__os"])
          .select(e["__s"], e["__d"],
                  (e["__w"] / outw["__W"]).alias("__p"))
          .persist())
    en.count()
    base = (1.0 - damping) / n
    r = nodes.withColumn("rank", F.lit(1.0 / n))
    # the DANGLING SET is iteration-invariant — materialize it once
    # from the PERSISTED tables (outw's lineage reaches back through
    # the raw edge aggregation, so anti-joining against it would
    # re-run that scan every iteration just for one scalar)
    dang_nodes = (nodes.join(en.select(F.col("__s").alias("node"))
                             .distinct(),
                             "node", "left_anti").persist())
    for _ in range(iterations):
        dang = (r.join(dang_nodes, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0))).first()[0])
        contrib = (en.join(r, en["__s"] == r["node"])
                   .groupBy("__d")
                   .agg(F.sum(F.col("__p") * F.col("rank")).alias("__c")))
        r = (nodes.join(contrib, nodes["node"] == contrib["__d"], "left")
             .select("node",
                     (F.lit(base)
                      + F.lit(damping)
                      * (F.coalesce(F.col("__c"), F.lit(0.0))
                         + F.lit(dang / n))).alias("rank"))
             .localCheckpoint())
    dang_nodes.unpersist()
    nodes.unpersist()
    en.unpersist()
    return r
