"""Skew- and range-join strategies beyond stock equi-joins.

The reference delegates generic joins to Spark (`python/ts/flint/
dataframe.py:166-215`); these utilities are the 100 TB hardening layer
for the two equi-join failure modes Catalyst does not fully solve:

- **hot keys** in shuffle joins: AQE's skew-join split only rebalances
  *sort-merge* partitions after the fact; :func:`salted_join` is the
  explicit a-priori treatment — scatter same-key probe rows across
  ``salt`` buckets and replicate the build side per bucket, so no task
  receives a whole hot key.
- **inequality (point-in-interval) joins**: Catalyst plans a broadcast
  nested loop (O(n·m)) for pure range predicates;
  :func:`point_in_interval_join` discretizes intervals into fixed-width
  buckets and turns the range join into an equi-join on the bucket id
  plus a residual filter — work proportional to points + interval
  coverage, shuffled on bucket id.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..timeseries import TIME_COLUMN, floor_div, parse_duration_ns, time_ns_expr

_SALT = "__salt"


def salted_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Equi-join with explicit hot-key salting: left rows scatter over
    ``salt`` sub-buckets of their key (round-robin by a row hash, NOT
    by key — same-key rows must split); the right side replicates each
    row into all ``salt`` buckets. Result set is identical to
    ``left.join(right, on, how)`` for ``how`` in {inner, left}; other
    join types would duplicate unmatched replicated right rows and are
    rejected.

    Cost model: right shuffles ``salt``× its size, in exchange for the
    hottest key splitting across ``salt`` tasks — the right trade when
    the build side is too big to broadcast but small next to the
    probe side (else prefer ``F.broadcast`` or AQE skew-join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 2:
        raise ValueError("salt must be >= 2")
    on = list(on)
    scatter = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                     F.lit(salt)).cast("int")
    lhs = left.withColumn(_SALT, scatter)
    rhs = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt)])))
    return lhs.join(rhs, on + [_SALT], how).drop(_SALT)


def _bucket(ns: Column, width: int) -> Column:
    # exact floor division: double division loses precision at ns
    # magnitudes (~1.7e18 > 2^53); floor_div subtracts pmod first, and
    # pmod's non-negative remainder makes it round-down for negatives too
    return floor_div(ns, width)


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           begin_col: str = "begin", end_col: str = "end",
                           bucket: str = "1h", how: str = "inner",
                           point_time_col: str = TIME_COLUMN) -> DataFrame:
    """Join each point row to every interval row with
    ``begin <= point_time < end`` (close-open, the engine's interval
    convention) WITHOUT a nested-loop plan: intervals explode into the
    fixed-width buckets they overlap, points compute their bucket
    map-side, and the match becomes a bucket equi-join + residual
    range filter.

    ``begin_col``/``end_col`` are ns longs or timestamps on
    ``intervals``; ``bucket`` should be chosen near the typical
    interval length — shuffled interval rows scale with
    ``length/bucket`` per interval, and a bucket much larger than the
    intervals degrades toward all-pairs within a bucket.
    ``how='left'`` keeps unmatched points null-padded."""
    if how not in ("inner", "left"):
        raise ValueError("point_in_interval_join supports inner/left")
    width = parse_duration_ns(bucket)
    pns = time_ns_expr(points, point_time_col)
    p = points.withColumn("__pns", pns).withColumn("__b", _bucket(F.col("__pns"), width))
    bns = time_ns_expr(intervals, begin_col)
    ens = time_ns_expr(intervals, end_col)
    iv = (intervals.withColumn("__bns", bns).withColumn("__ens", ens)
          # degenerate guard: an empty interval (end <= begin) matches
          # nothing under close-open — drop it BEFORE the explode,
          # where sequence(hi, lo) would otherwise generate a
          # descending bucket list whose length grows with how corrupt
          # the interval is (the residual filter keeps results correct
          # but the blow-up is unbounded)
          .filter(F.col("__ens") > F.col("__bns"))
          .withColumn("__b", F.explode(F.sequence(
              _bucket(F.col("__bns"), width),
              # end is exclusive: the last covered bucket holds end-1
              _bucket(F.col("__ens") - F.lit(1), width)))))
    cond = ((p["__b"] == iv["__b"])
            & (p["__pns"] >= iv["__bns"]) & (p["__pns"] < iv["__ens"]))
    out = p.join(iv, cond, how)
    drop = [p["__pns"], p["__b"], iv["__bns"], iv["__ens"], iv["__b"]]
    for c in drop:
        out = out.drop(c)
    return out


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          left_begin: str = "begin", left_end: str = "end",
                          right_begin: str = "rbegin", right_end: str = "rend",
                          bucket: str = "1h",
                          key: Sequence[str] = ()) -> DataFrame:
    """Inner-join every pair of OVERLAPPING intervals — ``l.begin <
    r.end AND r.begin < l.end`` under the engine's close-open
    convention — without a nested-loop plan (the temporal-overlap
    counterpart of :func:`point_in_interval_join`; the reference's
    range machinery stops at as-of/point lookups).

    Both sides explode into the fixed-width buckets they cover and
    meet in a bucket equi-join; each overlapping pair is emitted
    EXACTLY once, from the bucket containing the overlap's start
    (``greatest(l.begin, r.begin)`` — covered by both sides whenever
    the overlap is non-empty, so no distinct pass is needed).
    Degenerate (end <= begin) intervals match nothing and are dropped
    before the explode; null begin/end fall out of the same predicate
    (a null interval has no extent to overlap). ``key`` columns (present on both inputs under
    the same names) tighten the equi-join.

    Scale: shuffled rows per side ~ ``interval_length/bucket``; choose
    ``bucket`` near the typical interval length. Hot buckets split
    further under AQE skew handling since the match is a plain
    equi-join."""
    width = parse_duration_ns(bucket)
    key = list(key)
    lb = time_ns_expr(left, left_begin)
    le = time_ns_expr(left, left_end)
    rb = time_ns_expr(right, right_begin)
    re_ = time_ns_expr(right, right_end)
    l = (left.withColumn("__lb", lb).withColumn("__le", le)
         .filter(F.col("__le") > F.col("__lb"))
         .withColumn("__b", F.explode(F.sequence(
             _bucket(F.col("__lb"), width),
             _bucket(F.col("__le") - F.lit(1), width)))))
    r = (right.withColumn("__rb", rb).withColumn("__re", re_)
         .filter(F.col("__re") > F.col("__rb"))
         .withColumn("__b", F.explode(F.sequence(
             _bucket(F.col("__rb"), width),
             _bucket(F.col("__re") - F.lit(1), width)))))
    cond = (l["__b"] == r["__b"]) \
        & (l["__lb"] < r["__re"]) & (r["__rb"] < l["__le"]) \
        & (l["__b"] == _bucket(F.greatest(l["__lb"], r["__rb"]), width))
    for k in key:
        cond = cond & (l[k] == r[k])
    out = l.join(r, cond, "inner")
    for c in ([l["__lb"], l["__le"], l["__b"], r["__rb"], r["__re"], r["__b"]]
              + [r[k] for k in key]):
        out = out.drop(c)
    return out
