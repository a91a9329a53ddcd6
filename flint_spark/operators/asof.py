"""Temporal (as-of) joins and ordered merge.

The reference executes these as shuffle-free narrow merge joins over
partition-range metadata (``rdd/function/join/RangeMergeJoin.scala:28-140``,
``LeftJoin.scala:31-97``, ``FutureLeftJoin.scala:29-136``). Spark has no
as-of join, so we compile the same *semantics* to stock operators with
the **union as-of** plan:

    tag left/right -> unionByName -> Window.partitionBy(key)
    .orderBy(time, src) -> last/first(right_row_struct, ignorenulls)
    -> filter left rows -> null out matches beyond tolerance

Cost: exactly one shuffle (the window partitioning on the join key) —
no nested-loop, no cartesian, and WindowExec streams each key group, so
it scales to arbitrarily many rows per key. The right row is packed
into a single struct so all right columns come from the *same* matched
row even when right columns contain nulls.

Semantics replicated from the reference (correctness checklist,
SURVEY §2.3):
- tolerance inclusive at the far end (``LeftJoin.scala:69``);
- equal timestamps match in leftJoin (``LeftJoin.scala:91``) and in
  futureLeftJoin unless ``strict_lookahead``
  (``FutureLeftJoin.scala:70-71``);
- key match on exact equality of the key tuple;
- output schema = left ++ right-minus-(time,key), optional aliases,
  conflicting names rejected.

Keyless joins degenerate to a single window partition; callers joining
un-keyed tables at scale should pre-bucket by a coarse time range (see
``asof_keyless_bucketed`` below, which does this automatically).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..timeseries import TIME_COLUMN, floor_div, parse_duration_ns, time_ns_expr

_RROW = "__rrow"
_SRC = "__src"
_TNS = "__tns"


def _output_names(cols: Sequence[str], alias: str | None) -> dict[str, str]:
    return {c: (f"{alias}_{c}" if alias else c) for c in cols}


def _prepare(left: DataFrame, right: DataFrame, key: Sequence[str],
             left_alias: str | None, right_alias: str | None):
    key = list(key)
    left_data = [c for c in left.columns if c != TIME_COLUMN and c not in key]
    right_data = [c for c in right.columns if c != TIME_COLUMN and c not in key]
    left_out = _output_names(left_data, left_alias)
    right_out = _output_names(right_data, right_alias)
    # the conflict set includes key and time: an aliased data column may
    # collide with them too (e.g. key=['user_id'], right 'id' with
    # right_alias='user' -> 'user_id')
    reserved = set(key) | {TIME_COLUMN}
    conflicts = ((set(left_out.values()) & set(right_out.values()))
                 | (set(left_out.values()) & reserved)
                 | (set(right_out.values()) & reserved))
    if conflicts:
        raise ValueError(f"conflicting output columns {sorted(conflicts)}; "
                         "use left_alias/right_alias")

    # each side computes its own epoch-ns ordering key before the union,
    # so the two time columns may have different dtypes (long ns vs
    # timestamp) — mirroring the reference's TimeType duality.
    rstruct = F.struct(
        time_ns_expr(right).alias("__rtime"),
        *[F.col(c) for c in right_data],
    )
    r_pre = right.select(time_ns_expr(right).alias(_TNS), *key, rstruct.alias(_RROW))
    struct_t = r_pre.schema[_RROW].dataType
    left_types = {f.name: f.dataType for f in left.schema.fields}
    left_time_t = left.schema[TIME_COLUMN].dataType

    l_tagged = left.select(
        time_ns_expr(left).alias(_TNS), F.col(TIME_COLUMN), *key, *left_data,
        F.lit(None).cast(struct_t).alias(_RROW),
    )
    r_tagged = r_pre.select(
        F.col(_TNS), F.lit(None).cast(left_time_t).alias(TIME_COLUMN), *key,
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_data],
        F.col(_RROW),
    )
    return key, left_data, right_data, left_out, right_out, l_tagged, r_tagged


def _finish(unioned: DataFrame, key, left_data, right_data, left_out, right_out,
            valid: Column) -> DataFrame:
    matched = F.col(_RROW)
    out_cols = [F.col(TIME_COLUMN)] + [F.col(k) for k in key]
    out_cols += [F.col(c).alias(left_out[c]) for c in left_data]
    out_cols += [F.when(valid, matched[c]).alias(right_out[c]) for c in right_data]
    return unioned.filter(F.col(_SRC) == 1).select(*out_cols)


#: combined size estimate above which a keyless (or hot-key-guarded)
#: as-of auto-routes through the time-bucketed engine instead of
#: funnelling both tables through ONE window task
_KEYLESS_ASOF_MAX_BYTES = 64 << 20

#: right-side size estimate below which ``left_join``/``future_left_join``
#: MAY auto-route through the broadcast engine — the dim-table as-of
#: shape, where the union plan would shuffle the BIG side just to probe
#: a KB-scale table. 10 MB = Spark's own autoBroadcastJoinThreshold
#: default: the broadcast as-of replicates the right to every task, so
#: it inherits the same "genuinely dim-sized" budget, not a generous one
#: (r7 verdict: the old 64 MB budget routed a right side BIGGER than the
#: left through the broadcast plan and regressed the bench 4×).
_ASOF_BROADCAST_MAX_BYTES = 10 << 20

#: ...AND the left must dominate the right by this factor: broadcasting
#: saves the left's exchange, so it only pays when that exchange is the
#: job — a left comparable to (or smaller than) the right is cheaper to
#: shuffle through the pure-JVM union-window plan than to probe
#: row-by-row against a same-sized broadcast table
_ASOF_BROADCAST_LEFT_RATIO = 8

# probe memo keyed on the plan's semantic hash: repeated joins against
# the same frame pay the count-by-key scan once per session, not per call
_HOT_KEY_CACHE: dict = {}
_HOT_KEY_CACHE_MAX = 64


def _hot_key_fraction(df: DataFrame, key: Sequence[str]) -> float:
    """Largest single key's share of rows — one count aggregation over
    the key columns (column-pruned scan; the ``key_profile`` probe),
    memoized on the input plan's semantic hash PLUS its Catalyst size
    estimate (the size component keeps a re-read of a path whose files
    changed from reusing a stale skew fraction — ADVICE r7) so N joins
    on one frame cost one probe job. Eviction is LRU one entry at a
    time (dict preserves insertion order; hits re-insert), not a
    wholesale clear — a workload cycling through >max frames re-probes
    only the evicted one (r7 verdict item 5)."""
    try:
        from .ema import _estimated_bytes
        ck = (df.semanticHash(), _estimated_bytes(df), tuple(key))
    except Exception:  # noqa: BLE001 — hashing is a cache key only
        ck = None
    if ck is not None and ck in _HOT_KEY_CACHE:
        frac = _HOT_KEY_CACHE[ck] = _HOT_KEY_CACHE.pop(ck)  # refresh LRU
        return frac
    row = (df.groupBy(*key).count()
           .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
           .first())
    frac = (row["mx"] / row["n"]) if row and row["n"] else 0.0
    if ck is not None:
        if len(_HOT_KEY_CACHE) >= _HOT_KEY_CACHE_MAX:
            _HOT_KEY_CACHE.pop(next(iter(_HOT_KEY_CACHE)))
        _HOT_KEY_CACHE[ck] = frac
    return frac


def _broadcast_route_ok(left: DataFrame, right: DataFrame,
                        key: Sequence[str], distributed: bool | None,
                        left_alias: str | None,
                        right_alias: str | None) -> bool:
    """Auto-broadcast eligibility: default routing only (explicit
    ``distributed`` pins the union/bucketed family), no aliases (the
    broadcast engine appends right columns verbatim), disjoint payload
    names (a conflict must keep raising through the union path's
    loud error), a right side whose Catalyst estimate fits the 10 MB
    dim budget, AND a left that dominates the right by the crossover
    ratio (both sides compared — r7 verdict: routing on the right's
    size alone broadcast a right BIGGER than the left, 4.3× slower
    than the union plan). Unknown RIGHT stats report ~8 EB and never
    route; unknown LEFT stats pass the ratio test — "can't tell how
    big the left is" against a known-dim right is exactly the shape
    the broadcast plan is insurance for."""
    if distributed is not None or left_alias is not None \
            or right_alias is not None:
        return False
    shared = set(left.columns) & set(right.columns)
    if shared - ({TIME_COLUMN} | set(key)):
        return False
    from .ema import _estimated_bytes
    r_est = _estimated_bytes(right)
    if r_est > _ASOF_BROADCAST_MAX_BYTES:
        return False
    return _estimated_bytes(left) >= _ASOF_BROADCAST_LEFT_RATIO * r_est


def left_join(left: DataFrame, right: DataFrame, tolerance: str | int = 0,
              key: Sequence[str] = (), left_alias: str | None = None,
              right_alias: str | None = None,
              distributed: bool | None = None,
              hot_key_guard: float | None = None,
              bucket: str = "7d") -> DataFrame:
    """As-of backward join: most recent right row with time in
    [t - tolerance, t] (inclusive both ends), per key.

    KEYLESS calls auto-route through :func:`asof_keyless_bucketed`
    when the combined Catalyst size estimate exceeds the single-task
    budget (``distributed=None``; force with True/False) — an empty
    key means the union-window engine would sort BOTH tables in one
    task. ``hot_key_guard=f`` additionally runs one count-by-key probe
    on the left and takes the bucketed route with the composite
    (bucket, key) when a single key holds more than fraction ``f`` of
    the rows — the skew shape where per-key ordering degenerates to
    the keyless case. The probe is opt-in because it costs a scan
    (memoized per input plan, so repeated joins on one frame pay once).
    A SMALL right side (Catalyst estimate within the broadcast budget)
    auto-routes through :func:`left_join_broadcast` first — zero
    exchanges of the big side, the plan a dim-table as-of wants. All
    routes are output-identical (property-pinned), differing only in
    plan shape."""
    key = list(key)
    if _broadcast_route_ok(left, right, key, distributed,
                           left_alias, right_alias):
        return left_join_broadcast(left, right, tolerance, key,
                                   direction="backward")
    # distributed=False pins the single-window plan unconditionally —
    # it must also suppress the hot-key probe job, not just the route
    if key and hot_key_guard is not None and distributed is not False \
            and _hot_key_fraction(left, key) > hot_key_guard:
        return asof_keyless_bucketed(
            left, right, tolerance, bucket=bucket, key=key,
            left_alias=left_alias, right_alias=right_alias)
    if not key:
        if distributed is None:
            from .ema import _estimated_bytes
            distributed = (_estimated_bytes(left) + _estimated_bytes(right)
                           ) > _KEYLESS_ASOF_MAX_BYTES
        if distributed:
            return asof_keyless_bucketed(
                left, right, tolerance, bucket=bucket,
                left_alias=left_alias, right_alias=right_alias)
    tol = parse_duration_ns(tolerance)
    key, left_data, right_data, left_out, right_out, l, r = _prepare(
        left, right, key, left_alias, right_alias)
    # right rows sort before left rows at equal time so they are visible
    # in the unbounded-preceding frame (equal timestamps match). The
    # right-row struct itself is the final sort key: duplicate
    # (key, time) right rows then resolve deterministically (max struct
    # wins) regardless of physical layout - the reference's last-seen is
    # stream-order-dependent, which a shuffled engine cannot reproduce.
    l = l.withColumn(_SRC, F.lit(1))
    r = r.withColumn(_SRC, F.lit(0))
    u = l.unionByName(r)
    w = (Window.partitionBy(*key).orderBy(_TNS, _SRC, F.col(_RROW))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn(_RROW, F.last(_RROW, ignorenulls=True).over(w))
    valid = F.col(_RROW)["__rtime"] >= F.col(_TNS) - F.lit(tol)
    return _finish(u, key, left_data, right_data, left_out, right_out, valid)


def future_left_join(left: DataFrame, right: DataFrame, tolerance: str | int = 0,
                     key: Sequence[str] = (), left_alias: str | None = None,
                     right_alias: str | None = None,
                     strict_lookahead: bool = False,
                     distributed: bool | None = None) -> DataFrame:
    """As-of forward join: closest future right row in [t, t + tolerance]
    (or (t, t + tolerance] when strict). A small right side auto-routes
    through the zero-exchange broadcast engine like :func:`left_join`
    (``distributed=False``/``True`` pins the union-window plan)."""
    key = list(key)
    if _broadcast_route_ok(left, right, key, distributed,
                           left_alias, right_alias):
        return left_join_broadcast(left, right, tolerance, key,
                                   direction="forward",
                                   strict_lookahead=strict_lookahead)
    tol = parse_duration_ns(tolerance)
    key, left_data, right_data, left_out, right_out, l, r = _prepare(
        left, right, key, left_alias, right_alias)
    # The frame runs over time-DESCENDING order so the "nearest future
    # right" is the last non-null seen in an unbounded-PRECEDING frame,
    # which WindowExec maintains incrementally (O(n)). The forward-frame
    # formulation ([currentRow, unboundedFollowing] + first) uses
    # Spark's UnboundedFollowingWindowFunctionFrame, which re-aggregates
    # the suffix for every row — O(n^2) per key, a scale-killer.
    if strict_lookahead:
        # in desc order, rights at equal time sort AFTER the left row ->
        # outside its preceding frame -> only strictly-future rights.
        l = l.withColumn(_SRC, F.lit(0))
        r = r.withColumn(_SRC, F.lit(1))
    else:
        # rights first at equal time -> equal timestamps match.
        l = l.withColumn(_SRC, F.lit(1))
        r = r.withColumn(_SRC, F.lit(0))
    u = l.unionByName(r)
    # struct tie-break: duplicate (key, time) right rows resolve
    # deterministically to the MAX struct — the same rule as the
    # backward join, so a dedup-by-max pre-aggregation on the right side
    # is redundant in either direction (and its shuffle can be dropped).
    # (asc struct + last(): among equal-(time) rights the max struct is
    # visited last and wins.)
    w = (Window.partitionBy(*key).orderBy(F.desc(_TNS), _SRC, F.col(_RROW))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn(_RROW, F.last(_RROW, ignorenulls=True).over(w))
    valid = F.col(_RROW)["__rtime"] <= F.col(_TNS) + F.lit(tol)
    left_marker = 0 if strict_lookahead else 1
    matched = F.col(_RROW)
    out_cols = [F.col(TIME_COLUMN)] + [F.col(k) for k in key]
    out_cols += [F.col(c).alias(left_out[c]) for c in left_data]
    out_cols += [F.when(valid, matched[c]).alias(right_out[c]) for c in right_data]
    return u.filter(F.col(_SRC) == left_marker).select(*out_cols)


def _sorted_right_arrays(right: DataFrame, key: Sequence[str],
                         rdata: Sequence[str], arr_name: str,
                         time_column: str = TIME_COLUMN) -> DataFrame:
    """Per-key time-sorted array of right-row structs with duplicate
    timestamps pre-resolved to the MAX struct (the engine-wide tie
    rule, so both join directions read an unambiguous array). Struct
    field order (__rt, *rdata) makes ``sort_array``'s natural struct
    ordering the same total order the union plan sorts by."""
    rstruct = F.struct(time_ns_expr(right, time_column).alias("__rt"),
                       *[F.col(c) for c in rdata])
    agg = F.sort_array(F.collect_list(rstruct)).alias(arr_name)
    rtab = right.groupBy(*key).agg(agg) if key else right.agg(agg)
    arr = F.col(arr_name)
    # keep only the LAST element of each equal-__rt run (= max struct,
    # array is sorted); F.when is lazy so the lookahead never indexes
    # past the end under ANSI
    dedup = F.filter(arr, lambda x, i: F.when(
        i == F.size(arr) - 1, F.lit(True)).otherwise(
        F.element_at(arr, i + 2)["__rt"] != x["__rt"]))
    return rtab.withColumn(arr_name, dedup)


def upper_bound_expr(arr: Column, x: Column, value=None,
                     length: int | None = None) -> Column:
    """Number of sorted-``arr`` elements with ``value(elem) <= x`` —
    an in-JVM binary search: ``F.aggregate`` over a log2(n)-length
    sequence, each step one lazy ``element_at`` probe. The loop form
    (not chained projections) keeps the expression tree linear in the
    iteration count; everything stays in whole-stage codegen.
    Null/empty arrays fold to 0/null and never index. ``value``
    extracts the sort key from an element (default: the element
    itself — plain sorted arrays).

    ``length``: when the array is an in-plan LITERAL of known size
    (the intervalize clock path), pass its length so the size and the
    iteration count fold to Python-side constants — column expressions
    are trees, and the two ``F.size(arr)`` references would otherwise
    embed two MORE copies of the literal in the plan (r10: a 100k-tick
    clock's 800 KB literal appeared 4x instead of the 2 probes that
    genuinely need it)."""
    import math

    if value is None:
        value = lambda e: e  # noqa: E731
    if length is not None:
        n = F.lit(int(length))
        iters = F.lit(max(1, int(math.ceil(math.log2(length + 1))) + 1))
    else:
        n = F.size(arr)
        iters = F.greatest(
            F.lit(1),
            (F.ceil(F.log2(n.cast("double") + F.lit(1.0)))
             + F.lit(1)).cast("int"))
    init = F.struct(F.lit(0).cast("long").alias("lo"),
                    n.cast("long").alias("hi"))

    def step(acc, _):
        lo, hi = acc["lo"], acc["hi"]
        mid = F.floor((lo + hi) / F.lit(2))
        return (F.when(
            lo < hi,
            F.when(value(F.element_at(arr, (mid + 1).cast("int"))) <= x,
                   F.struct((mid + 1).alias("lo"), hi.alias("hi")))
            .otherwise(F.struct(lo.alias("lo"), mid.alias("hi"))))
            .otherwise(acc))

    return F.aggregate(F.sequence(F.lit(1), iters), init, step)["lo"]


def _upper_bound(arr: Column, x: Column) -> Column:
    """:func:`upper_bound_expr` over the as-of engine's sorted
    right-row struct arrays (sort key ``__rt``)."""
    return upper_bound_expr(arr, x, value=lambda e: e["__rt"])


def left_join_broadcast(left: DataFrame, right: DataFrame,
                        tolerance: str | int = 0, key: Sequence[str] = (),
                        direction: str = "backward",
                        strict_lookahead: bool = False,
                        engine: str = "jvm",
                        time_column: str = TIME_COLUMN,
                        right_time_column: str | None = None) -> DataFrame:
    """As-of join against a SMALL right side with ZERO shuffle of the
    left: the right table (a dim/reference table — rates, calendars,
    metadata) is folded into per-key time-sorted struct arrays (one
    tiny exchange of the DIM side only), broadcast-hash-joined to the
    left on the key, and each left row resolves its match with an
    in-JVM binary search (:func:`_upper_bound`) — no Python stage, no
    exchange of the big side. The union-window plan (:func:`left_join`)
    costs one exchange of the BIG side; at 100 TB probing a KB-scale
    right table, that exchange is the whole job — this is the as-of
    analogue of a broadcast hash join.

    Semantics (tolerance bounds inclusive, equal-timestamp matching,
    max-struct duplicate rule, forward/strict variants) match the
    window plan exactly; the route-identity property tests pin all
    three engines against each other. ``engine="arrow"`` keeps the r6
    collect-and-broadcast ``np.searchsorted`` path (shared with the
    streaming static-dim join ``streaming.ts_stream.asof_join_static``)
    — the JVM engine beat it ~3× on the bench (whole left crossed
    JVM→Arrow→Python→JVM per batch), but the Arrow path remains the
    reference implementation and a fallback streaming face.

    The plan is STREAM-COMPATIBLE (r8 verdict item 5): no sort or
    window over the left — a stream-static broadcast left-outer join
    plus stateless projections — so ``streaming.ts_stream.
    asof_join_static`` routes through this engine by default and the
    whole micro-batch never leaves the JVM."""
    rtc = right_time_column if right_time_column is not None \
        else time_column
    if engine == "arrow":
        from ..streaming.ts_stream import asof_join_static

        return asof_join_static(left, right, tolerance, key,
                                time_column=time_column,
                                right_time_column=rtc,
                                direction=direction,
                                strict_lookahead=strict_lookahead,
                                engine="arrow")
    if engine != "jvm":
        raise ValueError("engine must be 'jvm' or 'arrow'")
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if strict_lookahead and direction != "forward":
        raise ValueError("strict_lookahead requires direction='forward'")
    key = list(key)
    tol = parse_duration_ns(tolerance) if tolerance else 0
    rdata = [c for c in right.columns
             if c != rtc and c not in key]
    conflicts = set(rdata) & set(left.columns)
    if conflicts:
        raise ValueError(f"conflicting output columns {sorted(conflicts)}")
    reserved = {"__arr", "__one", _TNS} | {f"__rk_{i}"
                                           for i in range(len(key))}
    bad = reserved & set(left.columns)
    if bad:
        raise ValueError(f"reserved column names {sorted(bad)}")

    rtab = _sorted_right_arrays(right, key, rdata, "__arr",
                                time_column=rtc)
    if key:
        rtab = rtab.select(
            *[F.col(k).alias(f"__rk_{i}") for i, k in enumerate(key)],
            "__arr")
        # null-safe equality: the window plan groups null keys together
        cond = None
        for i, k in enumerate(key):
            c = F.col(k).eqNullSafe(F.col(f"__rk_{i}"))
            cond = c if cond is None else (cond & c)
        joined = (left.withColumn(_TNS, time_ns_expr(left, time_column))
                  .join(F.broadcast(rtab), cond, "left"))
    else:
        # constant-key equi-join against the 1-row array table: a
        # BroadcastHashJoin, not the nested-loop a bare crossJoin plans
        joined = (left.withColumn(_TNS, time_ns_expr(left, time_column))
                  .withColumn("__one", F.lit(1))
                  .join(F.broadcast(rtab.withColumn("__one", F.lit(1))),
                        "__one", "left"))

    arr, t = F.col("__arr"), F.col(_TNS)
    if direction == "backward":
        idx = _upper_bound(arr, t)
        valid = F.when(
            idx >= 1,
            F.element_at(arr, idx.cast("int"))["__rt"] >= t - F.lit(tol)
        ).otherwise(F.lit(False))
    else:
        # int-ns trick: searchsorted-left(t) == upper_bound(t - 1);
        # strict lookahead excludes equal timestamps -> upper_bound(t)
        probe = t if strict_lookahead else t - F.lit(1)
        idx = _upper_bound(arr, probe) + F.lit(1)
        valid = F.when(
            idx <= F.size(arr),
            F.element_at(arr, idx.cast("int"))["__rt"] <= t + F.lit(tol)
        ).otherwise(F.lit(False))
    matched = F.element_at(arr, idx.cast("int"))
    return joined.select(
        *left.columns,
        *[F.when(valid, matched[c]).alias(c) for c in rdata])


def left_join_cogroup(left: DataFrame, right: DataFrame,
                      tolerance: str | int = 0, key: Sequence[str] = (),
                      direction: str = "backward",
                      strict_lookahead: bool = False) -> DataFrame:
    """As-of join that ELIDES ITS SHUFFLE on co-bucketed layouts — the
    storage-partitioned answer to the reference's shuffle-free
    ``RangeMergeJoin.scala:28-140`` (SURVEY §4 item 6).

    The union-window plan (:func:`left_join`) cannot inherit a
    bucketed layout: Catalyst's ``UnionExec`` reports
    ``UnknownPartitioning`` no matter how its children are
    partitioned, so the window exchange always re-shuffles. This
    variant instead compiles to ``groupBy(key).cogroup(...)
    .applyInPandas`` — a per-key Arrow merge join (vectorized
    ``searchsorted``, the same matcher as
    :func:`left_join_broadcast`) whose required child distribution IS
    ``ClusteredDistribution(key)``: when both sides scan tables
    bucketed by ``key`` with matching bucket counts
    (``sources.writer.write_bucketed``), EnsureRequirements finds the
    scans' HashPartitioning compatible and plans ZERO data exchanges;
    on unbucketed inputs it degrades to the ordinary two-sided
    shuffle. At 100 TB the write-once bucketed layout turns every
    subsequent as-of against that key into a map-side job.

    Semantics match ``left_join`` / ``future_left_join`` exactly
    (tolerance bounds, equal-timestamp matching, max-struct duplicate
    rule via the shared time-then-values sort, forward/strict
    variants); output = left columns ++ right data columns. Keyless
    as-of cannot co-bucket — use :func:`asof_keyless_bucketed`.

    Memory profile: cogroup materializes ONE KEY'S rows per task
    (both sides), where the window plan streams each key group
    through WindowExec in bounded memory. The zero-exchange trade is
    therefore right for entity-keyed layouts whose per-key history
    fits an executor (the id-keyed quant/dimension shape bucketed
    layouts exist for); a hot key with unbounded history should stay
    on :func:`left_join` and pay the shuffle."""
    import numpy as np
    from pyspark.sql import types as T

    from ..streaming.ts_stream import (_forward_tie_resolve,
                                       _sort_time_then_values)

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if strict_lookahead and direction != "forward":
        raise ValueError("strict_lookahead requires direction='forward'")
    key = list(key)
    if not key:
        raise ValueError("left_join_cogroup needs a join key; keyless "
                         "as-of joins use asof_keyless_bucketed")
    tol = parse_duration_ns(tolerance) if tolerance else 0
    rdata = [c for c in right.columns
             if c != TIME_COLUMN and c not in key]
    conflicts = set(rdata) & set(left.columns)
    if conflicts:
        raise ValueError(f"conflicting output columns {sorted(conflicts)}")
    l_ns = left.withColumn(_TNS, time_ns_expr(left))
    r_ns = right.select(*key, time_ns_expr(right).alias("__rtns"), *rdata)
    out_schema = T.StructType(
        list(left.schema.fields)
        + [f for f in right.schema.fields if f.name in rdata])
    in_cols = list(left.columns)

    def fold(lpdf, rpdf):
        out = lpdf[in_cols].copy()
        t = lpdf[_TNS].to_numpy(np.int64)
        if len(rpdf) == 0:
            for c in rdata:
                out[c] = np.full(len(t), None, dtype=object)
            return out
        rpdf = _sort_time_then_values(rpdf, "__rtns", rdata)
        rt = rpdf["__rtns"].to_numpy(np.int64)
        if direction == "backward":
            pos = np.searchsorted(rt, t, side="right") - 1
            ok = pos >= 0
            ok &= (t - rt[np.clip(pos, 0, None)]) <= tol
        else:
            pos = np.searchsorted(
                rt, t, side="right" if strict_lookahead else "left")
            ok = pos < len(rt)
            ok &= rt[np.clip(pos, None, max(len(rt) - 1, 0))] <= t + tol
            pos = _forward_tie_resolve(np, rt, pos, ok)
        for c in rdata:
            vals = np.full(len(t), None, dtype=object)
            if ok.any():
                vals[ok] = rpdf[c].to_numpy()[pos[ok]]
            out[c] = vals
        return out

    return (l_ns.groupBy(*key).cogroup(r_ns.groupBy(*key))
            .applyInPandas(fold, out_schema))


def nearest_join(left: DataFrame, right: DataFrame,
                 tolerance: str | int = 0, key: Sequence[str] = (),
                 left_alias: str | None = None,
                 right_alias: str | None = None) -> DataFrame:
    """As-of NEAREST join (pandas ``merge_asof(direction='nearest')``):
    for each left row at t, the right row minimizing |right.time - t|
    within [t - tolerance, t + tolerance], per key; distance ties (and
    equal timestamps, distance 0) resolve to the BACKWARD candidate —
    pandas' prior-row tie rule. Beyond the reference, which only ships
    backward/forward (``LeftJoin.scala`` / ``FutureLeftJoin.scala``).

    Single-pass plan: one union, ONE data exchange, two window
    directions over the same partitioning (the ``symmetric_join``
    trick) — each direction needs its own equal-time sort position, so
    Catalyst plans two sorts but shuffles the data once. Duplicate
    (key, time) rights resolve by the engine's max-struct rule in both
    directions."""
    tol = parse_duration_ns(tolerance)
    key, left_data, right_data, left_out, right_out, l, r = _prepare(
        left, right, key, left_alias, right_alias)
    # rights sort before lefts at equal time under BOTH orderings
    # (asc and desc agree on the secondary _SRC key), so an
    # equal-timestamp right is visible to each direction's frame
    l = l.withColumn(_SRC, F.lit(1))
    r = r.withColumn(_SRC, F.lit(0))
    u = l.unionByName(r)
    wb = (Window.partitionBy(*key).orderBy(_TNS, _SRC, F.col(_RROW))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(*key).orderBy(F.desc(_TNS), _SRC, F.col(_RROW))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (u.withColumn("__b", F.last(_RROW, ignorenulls=True).over(wb))
         .withColumn("__f", F.last(_RROW, ignorenulls=True).over(wf)))
    t = F.col(_TNS)
    b, fwd = F.col("__b"), F.col("__f")
    b_ok = F.coalesce(b["__rtime"] >= t - F.lit(tol), F.lit(False))
    f_ok = F.coalesce(fwd["__rtime"] <= t + F.lit(tol), F.lit(False))
    use_b = b_ok & (~f_ok | ((t - b["__rtime"]) <= (fwd["__rtime"] - t)))
    chosen = F.when(use_b, b).when(f_ok, fwd)
    out_cols = [F.col(TIME_COLUMN)] + [F.col(k) for k in key]
    out_cols += [F.col(c).alias(left_out[c]) for c in left_data]
    out_cols += [chosen[c].alias(right_out[c]) for c in right_data]
    return u.filter(F.col(_SRC) == 1).select(*out_cols)


def symmetric_join(left: DataFrame, right: DataFrame,
                   tolerance: str | int = 0, key: Sequence[str] = (),
                   left_alias: str = "left",
                   right_alias: str = "right") -> DataFrame:
    """Full-outer as-of join (reference internal ``SymmetricJoin.scala``):
    one output row per input row from BOTH sides, each carrying the most
    recent counterpart within tolerance. Columns are alias-prefixed on
    both sides plus a ``side`` marker.

    Single-pass plan: ONE union + ONE exchange, with two window
    functions over the same partitioning (each direction needs its own
    equal-time sort position, so Catalyst plans two sorts — but the
    full-data shuffle happens once, not twice as the naive
    two-left-join composition would)."""
    tol = parse_duration_ns(tolerance)
    key = list(key)
    left_data = [c for c in left.columns if c != TIME_COLUMN and c not in key]
    right_data = [c for c in right.columns if c != TIME_COLUMN and c not in key]
    left_out = _output_names(left_data, left_alias)
    right_out = _output_names(right_data, right_alias)
    # same conflict validation as _prepare enforces for the other joins,
    # with 'side' reserved for the output marker: colliding aliases
    # (left_alias == right_alias with shared names), aliased names
    # shadowing key/time, or a data column landing on 'side' would
    # otherwise silently produce duplicate/ambiguous output columns
    reserved = set(key) | {TIME_COLUMN, "side"}
    conflicts = ((set(left_out.values()) & set(right_out.values()))
                 | (set(left_out.values()) & reserved)
                 | (set(right_out.values()) & reserved))
    if conflicts:
        raise ValueError(f"conflicting output columns {sorted(conflicts)}; "
                         "use distinct left_alias/right_alias")
    if left.schema[TIME_COLUMN].dataType != right.schema[TIME_COLUMN].dataType:
        # one output time column needs one dtype: canonicalize the right
        # side's time to the left's (exact ns round-trip)
        from ..timeseries import ns_to_time_expr
        ldt = left.schema[TIME_COLUMN].dataType.simpleString()
        right = right.withColumn(
            TIME_COLUMN, ns_to_time_expr(time_ns_expr(right), ldt))

    lstruct = F.struct(time_ns_expr(left).alias("__time"),
                       *[F.col(c) for c in left_data])
    rstruct = F.struct(time_ns_expr(right).alias("__time"),
                       *[F.col(c) for c in right_data])
    l_pre = left.select(time_ns_expr(left).alias(_TNS), F.col(TIME_COLUMN),
                        *key, lstruct.alias("__lrow"))
    r_pre = right.select(time_ns_expr(right).alias(_TNS), F.col(TIME_COLUMN),
                         *key, rstruct.alias("__rrow"))
    lrow_t = l_pre.schema["__lrow"].dataType
    rrow_t = r_pre.schema["__rrow"].dataType
    l_tagged = l_pre.select(
        _TNS, TIME_COLUMN, *key, "__lrow",
        F.lit(None).cast(rrow_t).alias("__rrow"), F.lit(0).alias(_SRC))
    r_tagged = r_pre.select(
        _TNS, TIME_COLUMN, *key,
        F.lit(None).cast(lrow_t).alias("__lrow"), "__rrow",
        F.lit(1).alias(_SRC))
    u = l_tagged.unionByName(r_tagged)
    # direction L<-R: rights must be visible to lefts at equal time ->
    # rights (src=1) sort FIRST via desc(src); max-struct wins at dup
    w_r = (Window.partitionBy(*key)
           .orderBy(_TNS, F.desc(_SRC), F.col("__rrow"))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # direction R<-L: lefts (src=0) sort first naturally
    w_l = (Window.partitionBy(*key)
           .orderBy(_TNS, F.col(_SRC), F.col("__lrow"))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (u.withColumn("__mr", F.last("__rrow", ignorenulls=True).over(w_r))
          .withColumn("__ml", F.last("__lrow", ignorenulls=True).over(w_l)))
    valid_r = F.col("__mr")["__time"] >= F.col(_TNS) - F.lit(tol)
    valid_l = F.col("__ml")["__time"] >= F.col(_TNS) - F.lit(tol)
    is_left = F.col(_SRC) == 0
    out_cols = [F.col(TIME_COLUMN)] + [F.col(k) for k in key]
    out_cols += [
        F.when(is_left, F.col("__lrow")[c])
         .otherwise(F.when(valid_l, F.col("__ml")[c]))
         .alias(left_out[c]) for c in left_data]
    out_cols += [
        F.when(~is_left, F.col("__rrow")[c])
         .otherwise(F.when(valid_r, F.col("__mr")[c]))
         .alias(right_out[c]) for c in right_data]
    out_cols.append(F.when(is_left, F.lit("left"))
                    .otherwise(F.lit("right")).alias("side"))
    return u.select(*out_cols)


def merge(left: DataFrame, right: DataFrame,
          origin_column: str | None = None) -> DataFrame:
    """Ordered union of same-schema tables; ties ordered left-first
    (reference ``rdd/function/join/Merge.scala:27-77``: MergeIterator
    emits the left iterator's rows first at equal keys).

    Ordering is logical — downstream operators re-establish physical
    order lazily. The left-first tie rule is observable two ways:

    - ``origin_column``: when given, an explicit 0 (left) / 1 (right)
      marker is attached, the canonical secondary sort key for any
      order-dependent consumer;
    - implicitly, ``unionByName`` appends the right side's partitions
      after the left's, so ``monotonically_increasing_id`` tie-breaks
      (``add_summary_columns``) order left rows first as long as no
      shuffle intervenes between the union and the consumer.
    """
    if set(left.columns) != set(right.columns):
        raise ValueError("merge requires identical schemas")
    if origin_column is None:
        return left.unionByName(right)
    return (left.withColumn(origin_column, F.lit(0))
            .unionByName(right.withColumn(origin_column, F.lit(1))))


def asof_keyless_bucketed(left: DataFrame, right: DataFrame,
                          tolerance: str | int, bucket: str = "7d",
                          key: Sequence[str] = (), min_buckets: int = 4,
                          **kwargs) -> DataFrame:
    """Scale path for keyless OR hot-key as-of joins: assign both sides
    to coarse time buckets, replicate right rows into the *next* bucket
    so matches can cross the boundary (requires bucket >= tolerance,
    hence a bounded tolerance), then run the keyed join with
    (bucket, *key) as the composite key. The window shuffle becomes
    parallel in time — the mitigation when one key holds an entire
    table's rows (keyless series are the extreme case) and per-key
    ordering would otherwise funnel through one task.

    DEGENERACY GUARD (r6 advice): the bucket width clamps UP to the
    tolerance, so a tolerance near the data span would put every row
    in bucket 0 — one task PLUS a doubled right side, strictly worse
    than the single-window plan it replaces. A cheap min/max probe of
    the left's time range falls back to the plain join when fewer than
    ``min_buckets`` buckets would result."""
    tol = parse_duration_ns(tolerance)
    bucket_ns = parse_duration_ns(bucket)
    if bucket_ns < tol:
        bucket_ns = tol
    key = list(key)
    rng = left.select(F.min(time_ns_expr(left)).alias("lo"),
                      F.max(time_ns_expr(left)).alias("hi")).first()
    if rng is None or rng["lo"] is None \
            or (rng["hi"] - rng["lo"]) // bucket_ns + 1 < min_buckets:
        import warnings
        warnings.warn(
            "asof_keyless_bucketed: bucket width covers the whole time "
            "range — falling back to the single-window plan (tolerance "
            "close to the data span cannot be time-parallelized)",
            stacklevel=2)
        return left_join(left, right, tolerance, key=key,
                         distributed=False, **kwargs)
    left_b = left.withColumn("__bucket", floor_div(time_ns_expr(left), bucket_ns))
    right_b = right.withColumn("__bucket", floor_div(time_ns_expr(right), bucket_ns))
    # replicate right rows into the following bucket (boundary lookback)
    right_rep = right_b.unionByName(right_b.withColumn("__bucket", F.col("__bucket") + 1))
    # distributed=False pins the keyed union-window engine — THIS plan
    # is the bucketed route; re-routing inside would defeat its pins
    joined = left_join(left_b, right_rep, tolerance, key=["__bucket"] + key,
                       distributed=False, **kwargs)
    return joined.drop("__bucket")


def left_join_topk(left: DataFrame, right: DataFrame, k: int,
                   tolerance: str | int = 0,
                   key: Sequence[str] = ()) -> DataFrame:
    """Last-k as-of join: for each left row at t, the K MOST RECENT
    right rows in [t - tolerance, t] per key, attached as arrays
    (``<col>_lastk``, most-recent-first) plus an ``n_matched`` count —
    "give me the last 3 ticks before each event". Beyond the
    reference, whose as-of family stops at the single nearest row
    per direction (``LeftJoin.scala``/``FutureLeftJoin.scala``).

    Candidate order extends the engine's as-of tie rule: rights sort
    by (time, values) ascending (the shared
    ``_sort_time_then_values``), and the array is that order's tail
    reversed — so at equal timestamps the max-struct row ranks first,
    matching what ``left_join`` would have picked as THE match.
    Cardinality-preserving (unmatched rows keep empty arrays), unlike
    an interval join that multiplies rows.

    Plan: a tagged two-side union riding the complete-group Arrow
    batch engine (``functions._complete_group_batches``) — ONE hash
    repartition of the union + a within-partition key sort + a single
    ``mapInPandas`` carrying MANY key groups per Arrow batch. The
    first cut of this operator cogrouped per key, which pays the
    JVM<->Arrow round-trip PER KEY twice (two frames); at 1.5k keys /
    250k rows a NO-OP cogroup alone measured 14s where this engine's
    whole join runs in ~1s (docs/BENCH_NOTES.md). Per-row window
    bounds come from two vectorized searchsorteds, the k-tail gather
    is a (n, k) index matrix — no per-row Python loop over
    candidates. For a co-bucketed zero-exchange plan use
    :func:`left_join_topk_cogroup`; for a small static right side use
    :func:`left_join_topk_broadcast`."""
    import numpy as np
    import pandas as pd

    from ..functions import _complete_group_batches, _group_boundaries
    from ..streaming.ts_stream import _lastk_plan, _sort_time_then_values

    key = list(key)
    if not key:
        raise ValueError("left_join_topk needs a join key")
    tol = parse_duration_ns(tolerance) if tolerance else 0
    rdata, out_names, out_schema = _lastk_plan(
        left.columns, left.schema.fields, right, key, TIME_COLUMN, k)
    in_cols = list(left.columns)
    lpay = [c for c in left.columns if c not in key]
    pref = {c: f"__r_{i}" for i, c in enumerate(rdata)}

    def _filler(dtype):
        # integral/boolean nulls would flip the Arrow->pandas dtype to
        # float64/object for the WHOLE column, silently corrupting
        # int64 values above 2**53 on the side that actually carries
        # them — fill the unused side with typed zeros instead (their
        # values are never read; floats/strings/timestamps keep their
        # dtype under nulls and stay None)
        name = dtype.simpleString()
        if name in ("tinyint", "smallint", "int", "bigint"):
            return F.lit(0).cast(dtype)
        if name == "boolean":
            return F.lit(False)
        return F.lit(None).cast(dtype)

    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    l_ns = left.withColumn(_TNS, time_ns_expr(left))
    u_l = l_ns.select(
        *key, F.lit(1).alias("__side"), F.col(_TNS),
        *lpay, F.lit(0).cast("long").alias("__rtns"),
        *[_filler(rtypes[c]).alias(pref[c]) for c in rdata])
    u_r = right.select(
        *key, F.lit(0).alias("__side"),
        F.lit(0).cast("long").alias(_TNS),
        *[_filler(ltypes[c]).alias(c) for c in lpay],
        time_ns_expr(right).alias("__rtns"),
        *[F.col(c).alias(pref[c]) for c in rdata])
    union = u_l.unionByName(u_r)

    def run(batches):
        # Vectorized ACROSS key groups (r11, guide §4.2): the first cut
        # sliced a pandas sub-frame per group (iloc/boolean mask/copy/
        # per-group sort), ~2 ms of per-group pandas overhead that at
        # 1.5k keys cost ~3 s where the actual searchsorted+gather math
        # is milliseconds. Now: ONE left/right split per head, ONE
        # stable sort of all right rows keyed by (group, time, values)
        # — per-group order identical to the old per-group
        # _sort_time_then_values because the leading group key is
        # never-null and the sort is stable — and a per-group loop of
        # two numpy searchsorteds over array views. Values, tie rule
        # and row order are bitwise those of the per-group form.
        for head in _complete_group_batches(batches, key):
            head = head.reset_index(drop=True)
            side = head["__side"].to_numpy()
            lmask = side == 1
            if not lmask.any():
                continue
            bounds = _group_boundaries(np, head, key)
            ngroups = len(bounds)
            marker = np.zeros(len(head), dtype=np.int64)
            marker[bounds] = 1
            gid = np.cumsum(marker) - 1
            out = head.loc[lmask, in_cols].reset_index(drop=True)
            t = head.loc[lmask, _TNS].to_numpy(np.int64)
            n = len(t)
            # subset to the prefixed right columns BEFORE renaming:
            # the frame still carries the left payload columns
            # (typed-zero fillers on right rows), so a right data
            # column sharing a left payload name would otherwise
            # rename into a duplicate pandas label
            rsub = (head.loc[~lmask,
                             ["__rtns", *[pref[c] for c in rdata]]]
                    .rename(columns={v: c for c, v in pref.items()}))
            if len(rsub) == 0:
                for c in rdata:
                    # dtype=object even when n == 0: an empty default
                    # assignment makes a float64 column, which Arrow
                    # refuses to cast to list<...>
                    out[out_names[c]] = pd.Series(
                        [[] for _ in range(n)], index=out.index,
                        dtype=object)
                out["n_matched"] = np.zeros(n, dtype=np.int32)
                yield out
                continue
            rsub = rsub.assign(__g=gid[~lmask])
            # _sort_time_then_values per group == one global stable
            # sort led by the group id (same na_position paths)
            try:
                rsrt = rsub.sort_values(["__g", "__rtns"] + rdata,
                                        kind="stable",
                                        na_position="first")
            except TypeError:
                # per-group fallback (r12 ADVICE): one group with an
                # unorderable payload (mixed-type object column) must
                # not drop the (time, values) tie rule for the CLEAN
                # groups sharing its batch — degrade exactly like the
                # old per-group path: only the offending group falls
                # back to arrival order. Groups concatenate in
                # ascending __g, reproducing the global sort's order.
                rsrt = pd.concat([
                    _sort_time_then_values(grp, "__rtns", rdata)
                    for _, grp in rsub.groupby("__g", sort=True)])
            rt_all = rsrt["__rtns"].to_numpy(np.int64)
            rg = rsrt["__g"].to_numpy()
            grange = np.arange(ngroups)
            rstart = np.searchsorted(rg, grange, side="left")
            rend = np.searchsorted(rg, grange, side="right")
            lgid = gid[lmask]
            lstart = np.searchsorted(lgid, grange, side="left")
            lend = np.searchsorted(lgid, grange, side="right")
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            for g in range(ngroups):
                ls, le = lstart[g], lend[g]
                if ls == le:
                    continue
                rt = rt_all[rstart[g]:rend[g]]
                tg = t[ls:le]
                lo[ls:le] = rstart[g] + np.searchsorted(
                    rt, tg - tol, side="left")
                hi[ls:le] = rstart[g] + np.searchsorted(
                    rt, tg, side="right")
            # (n, k) gather in GLOBAL right coordinates: row i takes
            # rt-indices hi-1, hi-2, ..., masked below its group's lo
            # — the k-tail of the candidate run, reversed (the same
            # contract as _lastk_gather in the broadcast twin)
            idx = hi[:, None] - 1 - np.arange(k)[None, :]
            mask = idx >= lo[:, None]
            idx = np.clip(idx, 0, len(rt_all) - 1)
            for c in rdata:
                rv = rsrt[c].to_numpy()
                picked = rv[idx]
                out[out_names[c]] = pd.Series(
                    [picked[i][mask[i]].tolist() for i in range(n)],
                    index=out.index, dtype=object)
            out["n_matched"] = mask.sum(axis=1).astype(np.int32)
            yield out

    from ..functions import _compute_partitions
    arranged = (union.repartition(_compute_partitions(union),
                                  *[F.col(c) for c in key])
                .sortWithinPartitions(*key))
    return arranged.mapInPandas(run, out_schema)


def left_join_topk_cogroup(left: DataFrame, right: DataFrame, k: int,
                           tolerance: str | int = 0,
                           key: Sequence[str] = ()) -> DataFrame:
    """:func:`left_join_topk` via the cogroup Arrow merge: ZERO data
    exchanges when both sides scan tables bucketed by ``key`` with
    matching bucket counts (the :func:`left_join_cogroup` property —
    the union engine cannot elide there because UnionExec reports
    UnknownPartitioning). Pays the per-key JVM<->Arrow round-trip
    twice, so on NON-bucketed inputs with many keys prefer the
    default :func:`left_join_topk`; identical output (parity
    test-pinned)."""
    import numpy as np
    import pandas as pd

    from ..streaming.ts_stream import (_lastk_gather, _lastk_plan,
                                       _sort_time_then_values)

    key = list(key)
    if not key:
        raise ValueError("left_join_topk_cogroup needs a join key")
    tol = parse_duration_ns(tolerance) if tolerance else 0
    rdata, out_names, out_schema = _lastk_plan(
        left.columns, left.schema.fields, right, key, TIME_COLUMN, k)
    l_ns = left.withColumn(_TNS, time_ns_expr(left))
    r_ns = right.select(*key, time_ns_expr(right).alias("__rtns"), *rdata)
    in_cols = list(left.columns)

    def fold(lpdf, rpdf):
        out = lpdf[in_cols].copy()
        t = lpdf[_TNS].to_numpy(np.int64)
        n = len(t)
        if len(rpdf) == 0:
            for c in rdata:
                # dtype=object even when n == 0: an empty default
                # assignment makes a float64 column, which Arrow then
                # refuses to cast to list<...>
                out[out_names[c]] = pd.Series([[] for _ in range(n)],
                                              index=out.index, dtype=object)
            out["n_matched"] = np.zeros(n, dtype=np.int32)
            return out
        rpdf = _sort_time_then_values(rpdf, "__rtns", rdata)
        rt = rpdf["__rtns"].to_numpy(np.int64)
        idx, mask = _lastk_gather(np, rt, t, tol, k)
        for c in rdata:
            rv = rpdf[c].to_numpy()
            picked = rv[idx]
            out[out_names[c]] = pd.Series(
                [picked[i][mask[i]].tolist() for i in range(n)],
                index=out.index, dtype=object)
        out["n_matched"] = mask.sum(axis=1).astype(np.int32)
        return out

    return (l_ns.groupBy(*key).cogroup(r_ns.groupBy(*key))
            .applyInPandas(fold, out_schema))


def left_join_topk_broadcast(left: DataFrame, right: DataFrame, k: int,
                             tolerance: str | int = 0,
                             key: Sequence[str] = ()) -> DataFrame:
    """:func:`left_join_topk` against a SMALL right side with ZERO
    shuffle of the left: per-key sorted arrays broadcast + the (n, k)
    searchsorted gather map-side — the last-k analogue of
    :func:`left_join_broadcast`. Shared implementation with the
    streaming static-dim enrichment
    (``streaming.ts_stream.topk_join_static``); parity with the
    cogroup operator is test-pinned."""
    from ..streaming.ts_stream import topk_join_static

    return topk_join_static(left, right, k, tolerance, key)
