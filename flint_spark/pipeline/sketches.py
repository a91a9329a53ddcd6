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

from .hashing import h28, h28_sql, kmv_hash_expr

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
        # one parse call per row instead of `width` py4j literal
        # round-trips (r11 construction fix); bigint literals carry the
        # same long values the per-element Cast(Literal) form produced
        arr = F.expr("array(" + ",".join(f"{int(c)}L" for c in counts[j])
                     + ")")
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


# ----------------------------------------------------------------------
# KMV / theta sketch: mergeable distinct counting WITH set operations
# ----------------------------------------------------------------------

def kmv_sketch(df: DataFrame, col: str, k: int = 64,
               key: Sequence[str] = (),
               salt: str = "kmv") -> DataFrame:
    """K-minimum-values (theta) sketch per key: the ``k`` smallest
    distinct normalized hashes of ``col``. Returns
    (key..., hashes array<double>, theta, m, est_distinct) where
    ``est_distinct`` = (k-1)/theta when the stream held >= k distinct
    values, else the EXACT distinct count m (the sketch saw
    everything). Unlike HLL, theta sketches support set OPERATIONS
    (:func:`kmv_union`, :func:`kmv_intersect_est`) — union/intersection
    distinct estimates across corpora from the k-row summaries alone.

    md5-deterministic: the sketch (and therefore every estimate) is a
    pure function of the value set — layout-independent, mergeable,
    and bit-replayable in SQL. Plan: one distinct aggregation on
    (key, hash) + one k-cut window on the distinct table (cardinality-
    bounded, never raw rows); the sketch itself is k doubles per key.
    Null values are excluded (SQL COUNT DISTINCT convention)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keyc = [F.col(c) for c in key]
    h = kmv_hash_expr(F.col(col), salt)
    distinct = (df.filter(F.col(col).isNotNull())
                .select(*keyc, h.alias("__h")).distinct())
    from pyspark.sql import Window
    w = Window.partitionBy(*keyc).orderBy("__h")
    kept = (distinct.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k))
    ag = (kept.groupBy(*keyc)
          .agg(F.sort_array(F.collect_list("__h")).alias("hashes"),
               F.max("__h").alias("__kth"), F.count("*").alias("m")))
    theta = F.when(F.col("m") >= k, F.col("__kth")).otherwise(F.lit(1.0))
    est = F.when(F.col("m") >= k,
                 (F.lit(float(k - 1)) / F.col("__kth")))\
        .otherwise(F.col("m").cast("double"))
    return ag.select(*keyc, "hashes", theta.alias("theta"), "m",
                     est.alias("est_distinct"))


def kmv_union(a: DataFrame, b: DataFrame, k: int,
              key: Sequence[str] = ()) -> DataFrame:
    """Union estimate from two sketch tables (FULL outer on the key):
    merge the hash samples, keep the k smallest distinct, re-estimate.
    Works purely on the k-row summaries — the corpora are never
    rescanned."""
    keyl = list(key)
    av = a.select(*keyl, F.col("hashes").alias("__ha"))
    bv = b.select(*keyl, F.col("hashes").alias("__hb"))
    j = av.join(bv, keyl, "full") if keyl else av.crossJoin(bv)
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat(
            F.coalesce(F.col("__ha"), F.array().cast("array<double>")),
            F.coalesce(F.col("__hb"), F.array().cast("array<double>"))))),
        1, k)
    m = F.size(merged)
    kth = F.element_at(merged, -1)
    est = F.when(m >= k, F.lit(float(k - 1)) / kth) \
        .otherwise(m.cast("double"))
    return j.select(*keyl, merged.alias("hashes"),
                    F.when(m >= k, kth).otherwise(F.lit(1.0))
                    .alias("theta"), m.alias("m"),
                    est.alias("est_distinct"))


def kmv_intersect_est(a: DataFrame, b: DataFrame,
                      key: Sequence[str] = ()) -> DataFrame:
    """Intersection distinct estimate (theta-sketch rule): with
    theta = min(theta_a, theta_b), every common hash below theta is a
    uniform sample of the intersection at rate theta, so
    ``est = |common < theta| / theta``. Exact when both sketches saw
    everything (theta = 1)."""
    keyl = list(key)
    av = a.select(*keyl, F.col("hashes").alias("__ha"),
                  F.col("theta").alias("__ta"))
    bv = b.select(*keyl, F.col("hashes").alias("__hb"),
                  F.col("theta").alias("__tb"))
    j = av.join(bv, keyl, "inner") if keyl else av.crossJoin(bv)
    th = F.least(F.col("__ta"), F.col("__tb"))
    common = F.filter(
        F.array_intersect(F.col("__ha"), F.col("__hb")),
        lambda x: x < th)
    return j.select(*keyl,
                    (F.size(common).cast("double") / th)
                    .alias("est_distinct"),
                    F.size(common).alias("common"),
                    th.alias("theta"))
