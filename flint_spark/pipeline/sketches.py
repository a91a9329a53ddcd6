"""Deterministic mergeable frequency sketches.

Count-min (Cormode & Muthukrishnan 2005) over the engine's md5 hash
family: every cell position is a pure function of the key, so the
sketch is (a) MERGEABLE — two sketches over disjoint corpora add
cell-wise, the incremental-ingestion property the Bloom module gives
for membership — and (b) engine-portable — DuckDB replays build and
estimate bit-for-bit, which pins the gate including the sketch's
characteristic over-estimates.

Scale shape: the build is one hash aggregation over ``depth`` exploded
positions per row (map-side combine collapses it to ``width x depth``
partials per task); the materialized sketch is ``width x depth`` longs
(KBs), broadcastable; estimation is a map-only lookup against the
inlined cell literals — no join against the corpus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import h28, h28_sql

DEFAULT_WIDTH = 1024
DEFAULT_DEPTH = 4


def _pos(key: Column, j: int, width: int, salt: str) -> Column:
    return F.pmod(h28(F.concat(F.lit(f"{salt}{j}:"), key)), F.lit(width))


def _pos_sql(expr: str, j: int, width: int, salt: str) -> str:
    salted = "'" + salt + str(j) + ":' || " + expr
    return f"({h28_sql(salted)} % {width})"


def cms_build(df: DataFrame, key_col: str, width: int = DEFAULT_WIDTH,
              depth: int = DEFAULT_DEPTH, salt: str = "cms") -> DataFrame:
    """Build the sketch table: one row per non-empty (row ``j``,
    ``bucket``) cell with its ``cnt``. One exchange of at most
    ``width x depth`` map-side-combined partials per task; union two
    builds and re-sum to merge corpora incrementally."""
    key = F.col(key_col).cast("string")
    cells = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _pos(key, j, width, salt).alias("bucket"))
        for j in range(depth)
    ])).alias("cell")
    # NULL keys hash to NULL positions and would poison the cell table
    # (and crash the estimate-side literal build) — a sketch counts
    # present keys only
    return (df.filter(key.isNotNull()).select(cells)
            .select("cell.j", "cell.bucket")
            .groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with identical
    (width, depth, salt) — the mergeability contract."""
    return (a.unionByName(b).groupBy("j", "bucket")
            .agg(F.sum("cnt").alias("cnt")))


def cms_estimate(df: DataFrame, cms: DataFrame, key_col: str,
                 width: int = DEFAULT_WIDTH, depth: int = DEFAULT_DEPTH,
                 salt: str = "cms",
                 out_col: str = "est_count") -> DataFrame:
    """Append the count-min estimate (min over rows of the addressed
    cell; never under the true count) for ``key_col`` of each input
    row. The sketch is collected (width x depth longs) and inlined as
    a literal lookup array per row ``j`` — a map-only projection, the
    same shape as the inlined-centroid IVF assignment."""
    counts = [[0] * width for _ in range(depth)]
    for r in cms.collect():
        counts[r["j"]][r["bucket"]] = r["cnt"]
    key = F.col(key_col).cast("string")
    ests = []
    for j in range(depth):
        arr = F.array(*[F.lit(c).cast("long") for c in counts[j]])
        # element_at is 1-based
        ests.append(F.element_at(arr, (_pos(key, j, width, salt)
                                       + 1).cast("int")))
    # a NULL probe key was never counted: estimate 0, not NULL
    # (F.least requires >= 2 columns; depth=1 is a valid sketch)
    est = ests[0] if len(ests) == 1 else F.least(*ests)
    return df.withColumn(out_col, F.when(key.isNull(), F.lit(0).cast("long"))
                         .otherwise(est))


def cms_sql(corpus_key_sql: str, probe_key: str = "w",
            width: int = DEFAULT_WIDTH, depth: int = DEFAULT_DEPTH,
            salt: str = "cms") -> tuple[str, str]:
    """DuckDB fragments replaying build + estimate: a CTE body ``cms``
    of (j, bucket, cnt) cells over ``corpus_key_sql`` (a sub-select
    yielding one column ``k``), and a ``least(...)`` estimate
    expression addressed by ``probe_key``."""
    unions = " UNION ALL ".join(
        f"SELECT {j} AS j, {_pos_sql('k', j, width, salt)} AS bucket "
        f"FROM ({corpus_key_sql})" for j in range(depth))
    cte = (f"SELECT j, bucket, count(*) AS cnt FROM ({unions}) "
           f"GROUP BY 1, 2")
    parts = [f"coalesce((SELECT cnt FROM cms WHERE j = {j} "
             f"AND bucket = {_pos_sql(probe_key, j, width, salt)}), 0)"
             for j in range(depth)]
    est = f"least({', '.join(parts)})"
    return cte, est
