"""Structured Streaming extensions.

The reference is batch-only (no streaming anywhere in its source —
SURVEY §2.9); its interval/cycle semantics are the batch analogues of
streaming tumbling windows. This module is the natural extension path:
the same summarizer expression registry runs under watermarked
streaming aggregation, so a batch pipeline's aggregates move to a
stream without rewriting.

All entry points accept any streaming DataFrame (``spark.readStream``)
with an event-time column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..summarizers import Summarizer
from ..timeseries import TIME_COLUMN


def summarize_intervals_stream(stream: DataFrame, frequency: str,
                               summarizer: Summarizer,
                               key: Sequence[str] = (),
                               watermark: str = "10 minutes",
                               time_column: str = TIME_COLUMN,
                               slide: str | None = None) -> DataFrame:
    """Streaming analogue of ``summarize_intervals`` with a uniform
    clock: watermarked tumbling (or sliding) windows + the same
    summarizer expressions. Late rows beyond the watermark are dropped
    (batch drops rows outside the clock range)."""
    key = list(key)
    win = F.window(F.col(time_column), frequency, slide or frequency)
    out = (stream.withWatermark(time_column, watermark)
           .groupBy(win.alias("interval"), *key)
           .agg(*summarizer.exprs(stream)))
    return out.select(F.col("interval.start").alias(TIME_COLUMN), *key,
                      *[out[n] for n in summarizer.names])


def build_rollup_stream(stream: DataFrame, freq: str,
                        measures: Sequence[str], key: Sequence[str] = (),
                        watermark: str = "10 minutes",
                        time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming refresh of the continuous-aggregate partial table: the
    incremental half of ``operators.intervals.build_rollup``. Each
    closed watermarked tumbling window appends one partial row with the
    SAME reaggregable struct schema (count/sum/sumsq/min/max +
    ``n_rows``), so the sink table feeds ``rollup_to``/
    ``rollup_finalize``/``rollup_quantile`` unchanged — a stream keeps
    the 1h partials fresh, coarse queries never touch raw data."""
    from ..operators.intervals import partial_aggs
    from ..timeseries import parse_duration_ns

    key = list(key)
    ns = parse_duration_ns(freq)
    if ns % 1_000_000 != 0:
        raise ValueError(f"build_rollup_stream needs a whole-millisecond "
                         f"granularity, got {freq!r} ({ns} ns) — "
                         f"F.window cannot express sub-ms buckets")
    win = F.window(F.col(time_column), f"{ns // 1_000_000} milliseconds")
    out = (stream.withWatermark(time_column, watermark)
           .groupBy(win.alias("interval"), *key).agg(*partial_aggs(measures)))
    return out.select(F.col("interval.start").alias(TIME_COLUMN), *key,
                      "n_rows", *[f"{m}_partial" for m in measures])


def sessionize_stream(stream: DataFrame, gap: str = "30 minutes",
                      key: Sequence[str] = (),
                      watermark: str = "10 minutes",
                      time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming session aggregation via ``session_window`` (the batch
    twin is ``operators.sessions.session_stats``)."""
    key = list(key)
    return (stream.withWatermark(time_column, watermark)
            .groupBy(F.session_window(F.col(time_column), gap).alias("session"),
                     *key)
            .agg(F.count("*").alias("n_events"))
            .select(F.col("session.start").alias("session_start"),
                    F.col("session.end").alias("session_end"),
                    *key, "n_events"))


def ewma_stream(stream: DataFrame, column: str, key: Sequence[str],
                alpha: float = 0.05, duration_per_period: str = "1d",
                time_column: str = TIME_COLUMN) -> DataFrame:
    """Custom stateful streaming operator: running EWMA per key via
    ``applyInPandasWithState`` — the state carries (last event-time ns,
    running numerator) across triggers, so the stream converges to the
    batch ``operators.ema.ewma`` result when events arrive in order.

    Within a trigger, rows are processed in event-time order; rows that
    arrive across triggers out of order decay from the stored state
    (the standard streaming tradeoff — use a watermark upstream to
    bound it).
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..operators.ema import _affine_scan
    from ..timeseries import parse_duration_ns, time_ns_expr

    key = list(key)
    lam = -math.log1p(-alpha) / parse_duration_ns(duration_per_period)
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(column, T.DoubleType()),
           T.StructField(f"{column}_ewma", T.DoubleType())])
    state_schema = T.StructType([T.StructField("last_tns", T.LongType()),
                                 T.StructField("e", T.DoubleType())])

    def fold(key_vals, pdf_iter, state):
        # same vectorized block-renormalized scan as the batch engine
        # (operators.ema._affine_scan); the carried state enters as
        # E_{-1} decayed through the cumulative decay of the batch
        last_tns, e = state.get if state.exists else (None, 0.0)
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            t = pdf["__tns"].to_numpy(dtype=np.int64)
            x = pdf[column].to_numpy(dtype=np.float64)
            n = len(x)
            (out,) = _decayed_carry_scan(np, _affine_scan, lam,
                                         last_tns, t, [x], [e])
            e = float(out[-1])
            last_tns = int(t[-1])
            res = pd.DataFrame({c: [v] * n for c, v in zip(key, key_vals)})
            res["__tns"] = t
            res[column] = x
            res[f"{column}_ewma"] = out
            frames.append(res)
        state.update((last_tns, float(e)))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def dedup_stream(stream: DataFrame, subset: Sequence[str],
                 watermark: str = "10 minutes",
                 time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming exact dedup within the watermark horizon — the
    streaming face of ``pipeline.dedup.exact_duplicate_groups``."""
    return (stream.withWatermark(time_column, watermark)
            .dropDuplicatesWithinWatermark(list(subset)))



def _decayed_carry_scan(np, affine_scan, lam, last_tns, t, arrays,
                        carries):
    """ONE definition of the step/decay/carry scan shared by the
    stateful EWMA-family folds (the batch engine's `_affine_scan`
    plus cross-trigger state): build the per-row decay steps from the
    time gaps (boundary step decays from ``last_tns``), scan each
    contribution vector, and add each carry through the cumulative
    decay. NaN contributions are zeroed first — the ``ewma_native``
    null-skip semantics (a null row decays state and counts in any
    all-ones normalizer, but contributes nothing), and a raw NaN
    would poison the key's state forever. Returns the per-row outputs
    in ``arrays`` order."""
    n = len(t)
    steps = np.empty(n, dtype=np.float64)
    steps[0] = lam * (t[0] - last_tns) if last_tns is not None else 0.0
    steps[1:] = lam * np.diff(t).astype(np.float64)
    with np.errstate(under="ignore"):
        decay = np.exp(-np.cumsum(steps))
    outs = []
    for arr, c0 in zip(arrays, carries):
        out = affine_scan(steps, np.where(np.isnan(arr), 0.0, arr))
        if last_tns is not None and c0 != 0.0:
            out = out + c0 * decay
        outs.append(out)
    return outs


def _trigger_pdf(pd, pdf_iter, sort_col="__tns"):
    """Materialize a group's ENTIRE trigger into one pandas frame,
    sorted by event time.

    ``applyInPandasWithState`` hands each group's micro-batch rows as
    an ITERATOR of Arrow chunks (split at
    ``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k) in
    arbitrary post-shuffle order. Every fold in this module assumes
    event-time order WITHIN the trigger — processing chunk-by-chunk
    silently breaks batch parity the moment a group exceeds one chunk
    (chunk 1 is scored/trimmed before chunk 2's possibly-earlier rows
    exist). Memory is O(group rows per trigger) — the bound the batch
    parity contract already implies, and no more than the Arrow
    transfer itself."""
    frames = [p for p in pdf_iter if len(p)]
    if not frames:
        return None
    pdf = frames[0] if len(frames) == 1 else \
        pd.concat(frames, ignore_index=True)
    return pdf.sort_values(sort_col, kind="stable")


#: driver/broadcast budget for the stream-static dim table — the
#: static-right pattern collects the WHOLE right side to the driver,
#: which is fine for a dim table and fatal for a fact table; refuse
#: loudly instead of OOMing the driver mid-stream
_STATIC_RIGHT_MAX_BYTES = 256 << 20

#: Catalyst reports ~Long.Max for plans with no stats
_STATS_UNKNOWN = 1 << 60


def _static_right_size_guard(right: DataFrame, cols) -> DataFrame:
    """Refuse an oversized static right side UP FRONT (never as a
    driver OOM or executor broadcast OOM mid-stream), shared by both
    engines: the Arrow path collects the right to the driver, the JVM
    path broadcasts its folded per-key arrays to every task — the same
    dim-table budget applies either way. Stats-less plans are PRICED
    (count + sampled row size) instead of warn-and-hoped (r6 verdict
    item 8). Returns the projected frame."""
    from ..operators.ema import _estimated_bytes

    projected = right.select(*cols)
    est = _estimated_bytes(projected)
    if est >= _STATS_UNKNOWN:
        # a distributed count (nothing collected) plus a 1000-row
        # sample prices the materialization before paying it. Persist
        # FIRST so the pricing scan and the downstream fold/collect are
        # one evaluation, not two (ADVICE r9) — bounded by the same
        # budget the guard enforces, and reused by every micro-batch
        # that re-evaluates the static subtree.
        projected = projected.persist()
        n = projected.count()
        if n == 0:
            est = 0
        else:
            sample = projected.limit(1000).toPandas()
            per_row = max(
                float(sample.memory_usage(index=False, deep=True).sum())
                / max(len(sample), 1), 8.0)
            est = int(n * per_row)
    if est > _STATIC_RIGHT_MAX_BYTES:
        if projected.is_cached:  # never leak the pricing cache of a
            projected.unpersist()  # right side we are REFUSING
        raise ValueError(
            f"stream-static join materializes the entire right side "
            f"(driver collect on the arrow engine, task broadcast on "
            f"the jvm engine); its estimate {est} bytes exceeds the "
            f"{_STATIC_RIGHT_MAX_BYTES}-byte budget. Pre-aggregate or "
            f"filter the right side to dim-table size, or use the "
            f"stateful stream-stream as-of instead.")
    return projected


def _collect_static_right(right: DataFrame, cols) -> "pd.DataFrame":
    """Guarded ``toPandas()`` of the static right side."""
    projected = _static_right_size_guard(right, cols)
    pdf = projected.toPandas()
    if projected.is_cached:  # pricing cache is spent once collected
        projected.unpersist()
    return pdf


def _null_safe_key(pd, kv):
    """Normalize a pandas group key tuple so null keys round-trip:
    pandas renders missing keys as NaN/NaT whose dict identity is
    unreliable (hash(float('nan')) is id-based) — map every missing
    value to None so the broadcast-table lookup matches the way
    Spark's window/cogroup plans group nulls together.

    Known limit: for FLOAT key columns pandas renders Spark NULL and
    Spark NaN identically (both NaN), so this path merges them into
    one group where Spark's own grouping keeps them distinct. Float
    keys holding actual NaN VALUES therefore break exact parity with
    the window/cogroup plans — use non-float key columns (the normal
    id/string case) when exact null-semantics parity matters."""
    return tuple(None if pd.isna(v) else v for v in kv)


def _lastk_plan(left_cols, left_fields, right, key, right_time_column, k):
    """Shared output contract of the last-k join pair: right data
    columns, their ``<col>_lastk`` names, conflict check, and the
    output schema (left fields ++ array fields ++ n_matched)."""
    from pyspark.sql import types as T

    if k < 1:
        raise ValueError("k must be >= 1")
    rdata = [c for c in right.columns
             if c != right_time_column and c not in key]
    out_names = {c: f"{c}_lastk" for c in rdata}
    conflicts = (set(out_names.values()) | {"n_matched"}) & set(left_cols)
    if conflicts:
        raise ValueError(f"conflicting output columns {sorted(conflicts)}")
    reserved = {"__side", "__rtns", "__tns"}
    bad = reserved & (set(left_cols) | set(rdata))
    if bad:
        raise ValueError(f"reserved column names {sorted(bad)}")
    rfields = {f.name: f.dataType for f in right.schema.fields}
    out_schema = T.StructType(
        list(left_fields)
        + [T.StructField(out_names[c], T.ArrayType(rfields[c]))
           for c in rdata]
        + [T.StructField("n_matched", T.IntegerType())])
    return rdata, out_names, out_schema


def _lastk_gather(np, rt, t, tol, k):
    """(idx, mask) for the k-tail gather shared by the cogroup and
    broadcast last-k joins: row i's candidates are rt in
    [t_i - tol, t_i]; idx[i, j] addresses the j-th most recent, mask
    marks real candidates (fewer than k available -> masked off)."""
    lo = np.searchsorted(rt, t - tol, side="left")
    hi = np.searchsorted(rt, t, side="right")
    idx = hi[:, None] - 1 - np.arange(k)[None, :]
    mask = idx >= lo[:, None]
    return np.clip(idx, 0, max(len(rt) - 1, 0)), mask


def asof_join_static(stream: DataFrame, right: DataFrame,
                     tolerance: str | int = 0, key: Sequence[str] = (),
                     time_column: str = TIME_COLUMN,
                     right_time_column: str = TIME_COLUMN,
                     direction: str = "backward",
                     strict_lookahead: bool = False,
                     engine: str = "jvm") -> DataFrame:
    """Streaming as-of enrichment against a STATIC right side (the
    common stream case: tick stream x reference/dimension table).

    The batch engine's union-window as-of (``operators.asof.left_join``)
    needs a global sort, which streaming cannot do; instead the static
    side — bounded by assumption, like any broadcast dim table — is
    folded into per-key time-sorted arrays, broadcast, and probed per
    stream row.

    ``engine="jvm"`` (default, r8 verdict item 5): routes through the
    batch broadcast engine (``operators.asof.left_join_broadcast``) —
    a stream-static broadcast left-outer join plus an in-JVM binary
    search (``upper_bound_expr``), all stateless map-side expressions,
    so the micro-batch never crosses into Python (the JVM engine beat
    the Arrow path ~3× on the batch bench for exactly this shape).
    ``engine="arrow"`` keeps the collect-and-broadcast vectorized
    ``np.searchsorted`` path (one Arrow round-trip per batch) as the
    reference implementation / fallback. Both work identically on a
    batch DataFrame (route-identity and replay gates pin jvm == arrow
    == the batch window engine).

    Right columns (minus key/time) are appended; rows with no match
    within ``tolerance`` get nulls — backward semantics matching
    ``left_join`` by default; ``direction="forward"`` gives
    ``future_left_join`` semantics (earliest right in [t, t+tol], or
    (t, t+tol] with ``strict_lookahead``) — the static side is fully
    known, so the forward lookup needs no left-row buffering.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if strict_lookahead and direction != "forward":
        raise ValueError("strict_lookahead requires direction='forward'")
    if engine == "jvm":
        from ..operators.asof import left_join_broadcast

        # the guard returns the (possibly persisted) priced projection;
        # feeding IT to the fold reuses that evaluation instead of
        # recomputing the right side from scratch (ADVICE r9)
        right = _static_right_size_guard(right, right.columns)
        return left_join_broadcast(
            stream, right, tolerance, key, direction=direction,
            strict_lookahead=strict_lookahead, engine="jvm",
            time_column=time_column,
            right_time_column=right_time_column)
    if engine != "arrow":
        raise ValueError("engine must be 'jvm' or 'arrow'")
    # Arrow path only below: the pure-JVM default must not pay (or
    # require) the numpy/pandas imports it never uses
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import parse_duration_ns, time_ns_expr
    key = list(key)
    tol = parse_duration_ns(tolerance) if tolerance else 0
    rdata = [c for c in right.columns if c != right_time_column and c not in key]

    rpdf = _collect_static_right(
        right, [*key,
                time_ns_expr(right, right_time_column).alias("__rtns"),
                *rdata])
    # batch tie rule: duplicate (key, time) rights resolve to the
    # max-struct row, so sort by (time, values) — last of a group wins
    rpdf = _sort_time_then_values(rpdf, "__rtns", rdata)
    tables: dict = {}
    if key:
        for kv, grp in rpdf.groupby(key, sort=False, dropna=False):
            kv = _null_safe_key(pd, kv if isinstance(kv, tuple) else (kv,))
            tables[kv] = (grp["__rtns"].to_numpy(np.int64),
                          {c: grp[c].to_numpy() for c in rdata})
    else:
        tables[()] = (rpdf["__rtns"].to_numpy(np.int64),
                      {c: rpdf[c].to_numpy() for c in rdata})
    b = stream.sparkSession.sparkContext.broadcast(tables)

    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        list(stream.schema.fields)
        + [f for f in right.schema.fields if f.name in rdata])
    in_cols = list(stream.columns)

    def lookup(batches):
        tbl = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            res = {c: np.full(len(pdf), None, dtype=object) for c in rdata}
            if key:
                groups = pdf.groupby(key, sort=False, dropna=False).indices
            else:
                groups = {(): np.arange(len(pdf))}
            for kv, idx in groups.items():
                kv = _null_safe_key(pd, kv if isinstance(kv, tuple) else (kv,))
                if kv not in tbl:
                    continue
                rt, rcols = tbl[kv]
                if len(rt) == 0:
                    continue  # empty right buffer: keep nulls
                t = pdf["__tns"].to_numpy(np.int64)[idx]
                if direction == "backward":
                    pos = np.searchsorted(rt, t, side="right") - 1
                    ok = pos >= 0
                    # unconditional: tolerance=0 means exact-timestamp
                    # match, same as batch left_join (ADVICE r2)
                    ok &= (t - rt[np.clip(pos, 0, None)]) <= tol
                else:
                    pos = np.searchsorted(
                        rt, t, side="right" if strict_lookahead else "left")
                    ok = pos < len(rt)
                    ok &= rt[np.clip(pos, None, max(len(rt) - 1, 0))] \
                        <= t + tol
                    # earliest matching time, max-struct among its dups
                    pos = _forward_tie_resolve(np, rt, pos, ok)
                for c in rdata:
                    vals = res[c]
                    sel = idx[ok]
                    vals[sel] = rcols[c][pos[ok]]
            out = pdf[in_cols].copy()
            for c in rdata:
                out[c] = res[c]
            yield out

    return with_ns.mapInPandas(lookup, out_schema)




def topk_join_static(stream: DataFrame, right: DataFrame, k: int,
                     tolerance: str | int = 0, key: Sequence[str] = (),
                     time_column: str = TIME_COLUMN,
                     right_time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming last-k enrichment against a STATIC right side: the
    broadcast-table twin of ``operators.asof.left_join_topk`` — per
    stream row, the k most recent static rows in [t - tolerance, t]
    per key as most-recent-first arrays + ``n_matched``. Same
    broadcast/searchsorted machinery as :func:`asof_join_static`
    (map-only, no shuffle of the stream, no state store; identical on
    a batch DataFrame, which the parity test pins against the cogroup
    operator)."""
    import numpy as np
    import pandas as pd

    from ..timeseries import parse_duration_ns, time_ns_expr

    key = list(key)
    tol = parse_duration_ns(tolerance) if tolerance else 0
    rdata, out_names, out_schema = _lastk_plan(
        stream.columns, stream.schema.fields, right, key,
        right_time_column, k)

    rpdf = _collect_static_right(
        right, [*key,
                time_ns_expr(right, right_time_column).alias("__rtns"),
                *rdata])
    rpdf = _sort_time_then_values(rpdf, "__rtns", rdata)
    tables: dict = {}
    if key:
        for kv, grp in rpdf.groupby(key, sort=False, dropna=False):
            kv = _null_safe_key(pd, kv if isinstance(kv, tuple) else (kv,))
            tables[kv] = (grp["__rtns"].to_numpy(np.int64),
                          {c: grp[c].to_numpy() for c in rdata})
    else:
        tables[()] = (rpdf["__rtns"].to_numpy(np.int64),
                      {c: rpdf[c].to_numpy() for c in rdata})
    b = stream.sparkSession.sparkContext.broadcast(tables)

    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    in_cols = list(stream.columns)

    def lookup(batches):
        tbl = b.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            res = {c: [[] for _ in range(n)] for c in rdata}
            cnt = np.zeros(n, dtype=np.int32)
            if key:
                groups = pdf.groupby(key, sort=False, dropna=False).indices
            else:
                groups = {(): np.arange(n)}
            tall = pdf["__tns"].to_numpy(np.int64)
            for kv, idx in groups.items():
                kv = _null_safe_key(pd, kv if isinstance(kv, tuple) else (kv,))
                if kv not in tbl:
                    continue
                rt, rcols = tbl[kv]
                if len(rt) == 0:
                    continue  # empty right buffer: keep empty arrays
                t = tall[idx]
                im, mask = _lastk_gather(np, rt, t, tol, k)
                for c in rdata:
                    picked = rcols[c][im]
                    lists = res[c]
                    for j, i in enumerate(idx):
                        lists[i] = picked[j][mask[j]].tolist()
                cnt[idx] = mask.sum(axis=1)
            out = pdf[in_cols].copy()
            for c in rdata:
                out[out_names[c]] = pd.Series(res[c], index=out.index,
                                              dtype=object)
            out["n_matched"] = cnt
            yield out

    return with_ns.mapInPandas(lookup, out_schema)


def _sort_time_then_values(pdf, tcol, data_cols):
    """Time-sort with the batch engine's tie rule: duplicate timestamps
    order by the data-column tuple (Spark struct comparison, nulls
    first), so the LAST row of any timestamp group is the batch
    max-struct winner and position-based lookups resolve duplicate
    (key, time) rights identically to ``operators.asof`` regardless of
    arrival order. Unorderable payloads (arrays/structs) fall back to
    arrival order — the same rows batch cannot order either."""
    try:
        return pdf.sort_values([tcol] + list(data_cols), kind="stable",
                               na_position="first")
    except TypeError:
        return pdf.sort_values(tcol, kind="stable")


def _forward_tie_resolve(np, rt, pos, ok):
    """Given forward searchsorted candidates ``pos`` into time array
    ``rt``, move each valid position to the LAST entry of its timestamp
    group — with the buffer sorted by (time, values), that is the batch
    max-struct row for duplicate right timestamps."""
    if not len(rt):
        return pos
    safe = np.clip(pos, None, len(rt) - 1)
    ct = rt[safe]
    resolved = np.searchsorted(rt, ct, side="right") - 1
    return np.where(ok, resolved, pos)


def _merge_right_buffer(np, buf_t, buf_v, r_new, rcols, rtypes):
    """Append new right rows to the (time, values)-sorted buffer WITHOUT
    a pandas DataFrame round-trip: rebuilding the buffer as a DataFrame
    re-coerces nullable integer columns to float64 (10 -> 10.0, None ->
    NaN), and storing those floats into an ArrayType(LongType) state
    field silently nulls them — exactly what _typed_list guards
    against. Plain-list stable sort keeps values typed; the key orders
    nulls first like the pandas sort it replaces (the batch max-struct
    tie rule), and unorderable payloads fall back to arrival order."""
    cat_t = np.concatenate([buf_t, r_new["__tns"].to_numpy(np.int64)])
    cat_v = {c: list(buf_v[c]) + _typed_list(r_new[c], rtypes[c])
             for c in rcols}
    idx = list(range(len(cat_t)))
    try:
        idx.sort(key=lambda i: (cat_t[i],) + tuple(
            (cat_v[c][i] is not None, cat_v[c][i]) for c in rcols))
    except TypeError:
        idx.sort(key=lambda i: cat_t[i])  # stable: arrival order on ties
    return (cat_t[np.asarray(idx, dtype=np.int64)]
            if len(idx) else cat_t,
            {c: [cat_v[c][i] for i in idx] for c in rcols})


def _typed_list(values, spark_type):
    """Buffer values coerced to match an ArrayType(spark_type) state
    field. The tagged union pads each side's columns with nulls, which
    promotes integer pandas columns to float64 — storing those floats
    into a Long state array silently nulls them (Arrow cast), so
    integral Spark types convert back to int here."""
    import numpy as np
    from pyspark.sql import types as T

    vals = list(values)
    if isinstance(spark_type, (T.ByteType, T.ShortType, T.IntegerType,
                               T.LongType)):
        return [None if v is None or (isinstance(v, float) and np.isnan(v))
                else int(v) for v in vals]
    return vals


def asof_join_stream(left: DataFrame, right: DataFrame,
                     tolerance: str | int, key: Sequence[str],
                     watermark: str = "10 minutes",
                     time_column: str = TIME_COLUMN) -> DataFrame:
    """Stream-stream backward as-of join: enrich each left row with the
    most recent right row (same key) within ``tolerance``.

    Built the same way Spark builds stream-stream equi-joins — buffer
    the right side per key, bounded by the watermark — but with as-of
    semantics Spark's join operator cannot express: both tagged streams
    union into one ``applyInPandasWithState`` group per key whose state
    is the right-row buffer; each micro-batch resolves its left rows
    against buffer+batch via vectorized ``searchsorted`` and evicts
    buffered right rows older than (max event time - tolerance -
    watermark). Rows arriving out of order across micro-batches beyond
    the watermark may miss matches — the standard streaming bound; a
    time-ordered arrival (one micro-batch at a time) reproduces the
    batch ``operators.asof.left_join`` exactly (parity test).

    Output: key cols + ``__tns`` (event ns) + left data cols + right
    data cols (null when no match). Left/right data column names must
    be disjoint.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import parse_duration_ns, time_ns_expr

    key = list(key)
    tol = parse_duration_ns(tolerance)
    wm_ns = parse_duration_ns(watermark)
    lcols = [c for c in left.columns if c not in key and c != time_column]
    rcols = [c for c in right.columns if c not in key and c != time_column]
    if set(lcols) & set(rcols):
        raise ValueError(f"overlapping data columns {set(lcols) & set(rcols)}; "
                         "rename before joining")
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtypes = {f.name: f.dataType for f in right.schema.fields}

    lt = (left.withWatermark(time_column, watermark)
          .select(*key, time_ns_expr(left, time_column).alias("__tns"),
                  F.lit(0).alias("__side"), *lcols,
                  *[F.lit(None).cast(rtypes[c]).alias(c) for c in rcols]))
    rt = (right.withWatermark(time_column, watermark)
          .select(*key, time_ns_expr(right, time_column).alias("__tns"),
                  F.lit(1).alias("__side"),
                  *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
                  *rcols))
    u = lt.unionByName(rt)

    out_schema = T.StructType(
        [left.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType())]
        + [left.schema[c] for c in lcols]
        + [right.schema[c] for c in rcols])
    state_schema = T.StructType(
        [T.StructField("rt", T.ArrayType(T.LongType()))]
        + [T.StructField(c, T.ArrayType(rtypes[c])) for c in rcols])

    def fold(key_vals, pdf_iter, state):
        if state.exists:
            st = state.get
            buf_t = np.asarray(st[0] or [], dtype=np.int64)
            buf_v = {c: list(st[i + 1] or []) for i, c in enumerate(rcols)}
        else:
            buf_t = np.empty(0, dtype=np.int64)
            buf_v = {c: [] for c in rcols}
        frames = []
        max_t = int(buf_t[-1]) if len(buf_t) else None
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            r_new = pdf[pdf["__side"] == 1]
            # append new right rows, keep buffer sorted by (time, values)
            # — the batch max-struct tie rule for duplicate timestamps,
            # independent of arrival order across triggers
            if len(r_new):
                buf_t, buf_v = _merge_right_buffer(np, buf_t, buf_v,
                                                   r_new, rcols, rtypes)
            l_rows = pdf[pdf["__side"] == 0]
            if len(l_rows):
                t = l_rows["__tns"].to_numpy(np.int64)
                pos = np.searchsorted(buf_t, t, side="right") - 1
                ok = pos >= 0
                ok &= (t - buf_t[np.clip(pos, 0, None)]) <= tol
                res = l_rows[key + ["__tns"] + lcols].copy() if key else \
                    l_rows[["__tns"] + lcols].copy()
                for i, kcol in enumerate(key):
                    res[kcol] = key_vals[i]
                for c in rcols:
                    col = np.full(len(t), None, dtype=object)
                    vals = buf_v[c]
                    col[ok] = [vals[p] for p in pos[ok]]
                    res[c] = col
                frames.append(res[key + ["__tns"] + lcols + rcols])
            bt = int(pdf["__tns"].max())
            max_t = bt if max_t is None else max(max_t, bt)
        # evict right rows no future left row (bounded by watermark) can use
        if max_t is not None and len(buf_t):
            cutoff = max_t - tol - wm_ns
            keep = buf_t >= cutoff
            # always retain the newest row so the next batch has a floor
            if not keep.any():
                keep[-1] = True
            buf_t = buf_t[keep]
            for c in rcols:
                buf_v[c] = [v for v, k in zip(buf_v[c], keep) if k]
        state.update((buf_t.tolist(), *[buf_v[c] for c in rcols]))
        yield from frames

    return u.groupBy(*key).applyInPandasWithState(
        fold, out_schema, state_schema, "append", "NoTimeout")


def asof_join_stream_future(left: DataFrame, right: DataFrame,
                            tolerance: str | int, key: Sequence[str],
                            watermark: str = "10 minutes",
                            strict_lookahead: bool = False,
                            time_column: str = TIME_COLUMN) -> DataFrame:
    """Stream-stream FORWARD as-of join: enrich each left row with the
    EARLIEST right row (same key) in ``[t, t + tolerance]`` —
    ``(t, t + tolerance]`` when ``strict_lookahead`` — matching batch
    ``operators.asof.future_left_join``.

    Unlike the backward join, a left row cannot be resolved on arrival:
    its lookahead window only closes once event time passes
    ``t + tolerance + watermark``. So state buffers BOTH sides per key:
    pending left rows emit exactly when their window is closed w.r.t.
    the key's max seen event time (ties resolve like batch
    ``future_left_join``: earliest right time, and among duplicate right
    timestamps the max-struct row — the buffer is kept sorted by (time,
    values) so arrival order never shows); buffered right rows evict once no
    pending or future-arriving left can reach them. Per-key closure is
    conservative — a key that stops receiving rows holds its tail in
    state until more data (the streaming analogue of an open window).

    Output schema matches :func:`asof_join_stream`.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import parse_duration_ns, time_ns_expr

    key = list(key)
    tol = parse_duration_ns(tolerance)
    wm_ns = parse_duration_ns(watermark)
    lcols = [c for c in left.columns if c not in key and c != time_column]
    rcols = [c for c in right.columns if c not in key and c != time_column]
    if set(lcols) & set(rcols):
        raise ValueError(f"overlapping data columns {set(lcols) & set(rcols)}; "
                         "rename before joining")
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtypes = {f.name: f.dataType for f in right.schema.fields}

    lt = (left.withWatermark(time_column, watermark)
          .select(*key, time_ns_expr(left, time_column).alias("__tns"),
                  F.lit(0).alias("__side"), *lcols,
                  *[F.lit(None).cast(rtypes[c]).alias(c) for c in rcols]))
    rt = (right.withWatermark(time_column, watermark)
          .select(*key, time_ns_expr(right, time_column).alias("__tns"),
                  F.lit(1).alias("__side"),
                  *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
                  *rcols))
    u = lt.unionByName(rt)

    out_schema = T.StructType(
        [left.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType())]
        + [left.schema[c] for c in lcols]
        + [right.schema[c] for c in rcols])
    state_schema = T.StructType(
        [T.StructField("max_t", T.ArrayType(T.LongType()))]
        + [T.StructField("lt", T.ArrayType(T.LongType()))]
        + [T.StructField(f"l_{c}", T.ArrayType(ltypes[c])) for c in lcols]
        + [T.StructField("rt", T.ArrayType(T.LongType()))]
        + [T.StructField(f"r_{c}", T.ArrayType(rtypes[c])) for c in rcols])

    side = "right" if strict_lookahead else "left"

    def fold(key_vals, pdf_iter, state):
        if state.exists:
            st = state.get
            i = 0
            max_t = int(st[0][0]) if st[0] else None
            i += 1
            pend_t = np.asarray(st[i] or [], dtype=np.int64); i += 1
            pend_v = {}
            for c in lcols:
                pend_v[c] = list(st[i] or []); i += 1
            buf_t = np.asarray(st[i] or [], dtype=np.int64); i += 1
            buf_v = {}
            for c in rcols:
                buf_v[c] = list(st[i] or []); i += 1
        else:
            max_t = None
            pend_t = np.empty(0, dtype=np.int64)
            pend_v = {c: [] for c in lcols}
            buf_t = np.empty(0, dtype=np.int64)
            buf_v = {c: [] for c in rcols}

        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            r_new = pdf[pdf["__side"] == 1]
            if len(r_new):
                buf_t, buf_v = _merge_right_buffer(np, buf_t, buf_v,
                                                   r_new, rcols, rtypes)
            l_new = pdf[pdf["__side"] == 0]
            if len(l_new):
                all_t = np.concatenate([pend_t,
                                        l_new["__tns"].to_numpy(np.int64)])
                order = np.argsort(all_t, kind="stable")
                for c in lcols:
                    vals = list(pend_v[c]) + _typed_list(l_new[c], ltypes[c])
                    pend_v[c] = [vals[i] for i in order]
                pend_t = all_t[order]
            bt = int(pdf["__tns"].max())
            max_t = bt if max_t is None else max(max_t, bt)

        frames = []
        if max_t is not None and len(pend_t):
            closed = pend_t + tol + wm_ns <= max_t
            if closed.any():
                t = pend_t[closed]
                pos = np.searchsorted(buf_t, t, side=side)
                ok = pos < len(buf_t)
                ok &= buf_t[np.clip(pos, None, max(len(buf_t) - 1, 0))] \
                    <= t + tol
                # earliest matching time; max-struct among its duplicates
                # (same rule as batch future_left_join)
                pos = _forward_tie_resolve(np, buf_t, pos, ok)
                res = pd.DataFrame({"__tns": t})
                for i, kcol in enumerate(key):
                    res[kcol] = key_vals[i]
                for c in lcols:
                    vals = pend_v[c]
                    res[c] = [v for v, m in zip(vals, closed) if m]
                for c in rcols:
                    col = np.full(len(t), None, dtype=object)
                    vals = buf_v[c]
                    col[ok] = [vals[p] for p in pos[ok]]
                    res[c] = col
                frames.append(res[key + ["__tns"] + lcols + rcols])
                for c in lcols:
                    pend_v[c] = [v for v, m in zip(pend_v[c], closed) if not m]
                pend_t = pend_t[~closed]
        # rights below every pending left AND below any possible future
        # left (>= max_t - wm) are unreachable in the forward direction
        if max_t is not None and len(buf_t):
            cutoff = max_t - wm_ns
            if len(pend_t):
                cutoff = min(cutoff, int(pend_t[0]))
            keep = buf_t >= cutoff
            buf_t = buf_t[keep]
            for c in rcols:
                buf_v[c] = [v for v, k in zip(buf_v[c], keep) if k]
        state.update((
            [max_t if max_t is not None else 0],
            pend_t.tolist(), *[pend_v[c] for c in lcols],
            buf_t.tolist(), *[buf_v[c] for c in rcols]))
        yield from frames

    return u.groupBy(*key).applyInPandasWithState(
        fold, out_schema, state_schema, "append", "NoTimeout")


def detect_anomalies_stream(stream: DataFrame, column: str,
                            key: Sequence[str],
                            window: str | int = "1d", k: float = 3.0,
                            min_baseline: int = 5,
                            time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of ``operators.windows_ops.detect_anomalies``:
    per-key rolling z-score against the trailing [t - window, t)
    baseline (current row and equal-time rows excluded, matching the
    batch range frame), via ``applyInPandasWithState``. State is the
    (time, value) buffer inside the window horizon — trimmed every
    trigger, so memory is bounded by window x arrival rate. The merged
    (buffer + batch) timeline is re-sorted every trigger, so
    cross-batch out-of-order arrival inside the horizon still yields
    the batch baselines; only events older than the already-trimmed
    horizon are lost. Null values are scored null/False and EXCLUDED
    from the baseline buffer — matching the batch avg/stddev/count
    null-skip. Per-row stats are O(1) via prefix sums + searchsorted."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import parse_duration_ns, time_ns_expr

    key = list(key)
    w_ns = parse_duration_ns(window)
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(column, T.DoubleType()),
           T.StructField(f"{column}_zscore", T.DoubleType()),
           T.StructField(f"{column}_anomaly", T.BooleanType())])
    state_schema = T.StructType([
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("vs", T.ArrayType(T.DoubleType()))])

    def fold(key_vals, pdf_iter, state):
        buf_t, buf_v = state.get if state.exists else ([], [])
        buf_t = np.asarray(buf_t or [], dtype=np.int64)
        buf_v = np.asarray(buf_v or [], dtype=np.float64)
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            t_new = pdf["__tns"].to_numpy(np.int64)
            v_new = pdf[column].to_numpy(np.float64)
            # baseline buffer: merged, NaN-free (nulls never contribute
            # to avg/stddev/count in the batch frame), and re-sorted so
            # late arrivals within the horizon land in timeline order
            mt = np.concatenate([buf_t, t_new[~np.isnan(v_new)]])
            mv = np.concatenate([buf_v, v_new[~np.isnan(v_new)]])
            order = np.argsort(mt, kind="stable")
            allt, allv = mt[order], mv[order]
            # prefix sums over the sorted baseline: baseline of a row
            # at time ti = entries in [ti - w, ti) -> O(log) per row
            ps = np.concatenate([[0.0], np.cumsum(allv)])
            ps2 = np.concatenate([[0.0], np.cumsum(allv * allv)])
            lo = np.searchsorted(allt, t_new - w_ns, side="left")
            hi = np.searchsorted(allt, t_new, side="left")
            n = (hi - lo).astype(np.int64)
            z = np.full(len(t_new), np.nan)
            ok = n >= min_baseline
            with np.errstate(invalid="ignore", divide="ignore"):
                sm = ps[hi] - ps[lo]
                sq = ps2[hi] - ps2[lo]
                mean = np.where(n > 0, sm / np.maximum(n, 1), np.nan)
                var = np.where(n > 1,
                               (sq - np.maximum(n, 1) * mean * mean)
                               / np.maximum(n - 1, 1), np.nan)
                sd = np.sqrt(np.maximum(var, 0.0))
                good = ok & (sd > 0)
                z[good] = ((v_new - mean) / sd)[good]
            res = pd.DataFrame({c: [kv] * len(t_new)
                                for c, kv in zip(key, key_vals)})
            res["__tns"] = t_new
            res[column] = v_new
            res[f"{column}_zscore"] = [None if math.isnan(x) else x
                                       for x in z]
            res[f"{column}_anomaly"] = [
                (not math.isnan(x)) and abs(x) > k for x in z]
            frames.append(res)
            # trim against the max time SEEN (null-valued rows advance
            # the clock too), not the last buffer entry
            max_seen = int(t_new[-1])
            if len(allt):
                max_seen = max(max_seen, int(allt[-1]))
            keepm = allt >= max_seen - w_ns
            buf_t, buf_v = allt[keepm], allv[keepm]
        state.update((buf_t.tolist(), buf_v.tolist()))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def exponential_smoothing_stream(stream: DataFrame, column: str,
                                 key: Sequence[str], alpha: float = 0.05,
                                 priming_periods: float = 0.0,
                                 duration_per_period: str = "1d",
                                 interpolation: str = "current",
                                 convention: str = "core",
                                 time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming exponentialSmoothing per key — the stateful twin of
    ``operators.ema.exponential_smoothing`` (full interpolation ×
    convention matrix, priming). Reuses the batch engine's coefficient
    builder and vectorized affine scan; the state carries
    (prev event-time, prev value, primary accumulator, aux accumulator)
    so in-order arrival reproduces the batch result exactly.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..operators.ema import _affine_scan, _smoothing_coeffs
    from ..timeseries import parse_duration_ns, time_ns_expr

    key = list(key)
    period_ns = float(parse_duration_ns(duration_per_period))
    coeff_fn = _smoothing_coeffs(alpha, priming_periods, period_ns,
                                 interpolation, convention)
    divide = convention == "core"
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(column, T.DoubleType()),
           T.StructField(f"{column}_ema", T.DoubleType())])
    state_schema = T.StructType([
        T.StructField("prev_t", T.LongType()),
        T.StructField("prev_x", T.DoubleType()),
        T.StructField("e", T.DoubleType()),
        T.StructField("a", T.DoubleType())])

    def fold(key_vals, pdf_iter, state):
        prev_t, prev_x, e, a = state.get if state.exists \
            else (None, None, 0.0, 0.0)
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            t = pdf["__tns"].to_numpy(dtype=np.int64)
            x = pdf[column].to_numpy(dtype=np.float64)
            n = len(x)
            steps, c, aux_c = coeff_fn(t, x, prev_t, prev_x)
            with np.errstate(under="ignore"):
                decay = np.exp(-np.cumsum(steps))
            evals = _affine_scan(steps, c) + e * decay
            avals = _affine_scan(steps, aux_c) + a * decay
            if divide:
                with np.errstate(divide="ignore", invalid="ignore"):
                    out = evals / avals
            else:
                out = evals
            e, a = float(evals[-1]), float(avals[-1])
            prev_t, prev_x = int(t[-1]), float(x[-1])
            res = pd.DataFrame({c_: [v] * n for c_, v in zip(key, key_vals)})
            res["__tns"] = t
            res[column] = x
            res[f"{column}_ema"] = out
            frames.append(res)
        state.update((prev_t, prev_x, float(e), float(a)))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def summarize_windows_stream(stream: DataFrame, window, reducer,
                             out_name: str, key: Sequence[str],
                             value_col: str = "value",
                             watermark: str = "10 minutes",
                             out_type: str = "double",
                             time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming per-row sliding-window aggregate — the stateful twin of
    ``functions.summarize_windows_udf``: for each arriving row, apply
    ``reducer(pandas_series) -> scalar`` over the values in its past
    window ``[t - w, t]``.

    State buffers (time, value) pairs per key within
    ``window + watermark``; each micro-batch resolves its rows against
    buffer+batch via searchsorted slices and evicts expired entries.
    In-order arrival reproduces the batch operator exactly (parity
    test); rows arriving out of order beyond the watermark may miss
    window members — the standard streaming bound.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import parse_duration_ns, time_ns_expr
    from ..windows import TimeWindow

    if not isinstance(window, TimeWindow):
        raise TypeError("window must be a TimeWindow")
    lo, hi = window.range_bounds()
    if hi != 0 or lo > 0:
        raise ValueError("streaming supports past windows ([t-w, t]) only")
    w_ns = -lo
    wm_ns = parse_duration_ns(watermark)
    key = list(key)
    with_ns = (stream.withWatermark(time_column, watermark)
               .withColumn("__tns", time_ns_expr(stream, time_column)))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(value_col, stream.schema[value_col].dataType),
           T.StructField(out_name,
                         out_type if isinstance(out_type, T.DataType)
                         else T._parse_datatype_string(out_type))])
    state_schema = T.StructType([
        T.StructField("bt", T.ArrayType(T.LongType())),
        T.StructField("bv", T.ArrayType(T.DoubleType()))])

    def fold(key_vals, pdf_iter, state):
        if state.exists:
            st = state.get
            buf_t = np.asarray(st[0] or [], dtype=np.int64)
            buf_v = np.asarray(st[1] or [], dtype=np.float64)
        else:
            buf_t = np.empty(0, dtype=np.int64)
            buf_v = np.empty(0, dtype=np.float64)
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            t = pdf["__tns"].to_numpy(np.int64)
            x = pdf[value_col].to_numpy(np.float64)
            all_t = np.concatenate([buf_t, t])
            all_v = np.concatenate([buf_v, x])
            order = np.argsort(all_t, kind="stable")
            buf_t, buf_v = all_t[order], all_v[order]
            los = np.searchsorted(buf_t, t - w_ns, side="left")
            his = np.searchsorted(buf_t, t, side="right")
            vals = [reducer(pd.Series(buf_v[lo_:hi_]))
                    for lo_, hi_ in zip(los, his)]
            res = pd.DataFrame({c: [v] * len(t)
                                for c, v in zip(key, key_vals)})
            res["__tns"] = t
            res[value_col] = x
            res[out_name] = vals
            frames.append(res)
        if len(buf_t):
            cutoff = int(buf_t[-1]) - w_ns - wm_ns
            keep = buf_t >= cutoff
            buf_t, buf_v = buf_t[keep], buf_v[keep]
        state.update((buf_t.tolist(), buf_v.tolist()))
        yield from frames

    return (with_ns.select(*key, "__tns", value_col)
            .groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def rolling_ols_stream(stream: DataFrame, y: str, x: str,
                       key: Sequence[str],
                       window: str | int = "7d",
                       min_samples: int = 3,
                       time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of ``operators.regression.rolling_ols``: per-key
    closed-form simple OLS (beta/alpha/r2) over the trailing
    ``[t - window, t]`` frame (current and equal-time rows INCLUDED,
    matching the batch rangeBetween(lo, 0)), via
    ``applyInPandasWithState``. State is the (t, x, y) buffer of
    COMPLETE pairs inside the horizon — pairwise masking exactly like
    the batch operator (a row with either side null contributes to no
    sum, but is still scored against its window). The merged buffer is
    re-sorted every trigger, so late in-horizon arrivals converge to
    the batch result for rows scored after they land; per-row sums are
    O(1) via prefix sums + searchsorted (the anomaly-stream recipe)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import parse_duration_ns, time_ns_expr

    key = list(key)
    w_ns = parse_duration_ns(window)
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(x, T.DoubleType()),
           T.StructField(y, T.DoubleType()),
           T.StructField("beta", T.DoubleType()),
           T.StructField("alpha", T.DoubleType()),
           T.StructField("r2", T.DoubleType())])
    state_schema = T.StructType([
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("xs", T.ArrayType(T.DoubleType())),
        T.StructField("ys", T.ArrayType(T.DoubleType()))])

    def fold(key_vals, pdf_iter, state):
        bt, bx, by = state.get if state.exists else ([], [], [])
        bt = np.asarray(bt or [], dtype=np.int64)
        bx = np.asarray(bx or [], dtype=np.float64)
        by = np.asarray(by or [], dtype=np.float64)
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            t_new = pdf["__tns"].to_numpy(np.int64)
            x_new = pdf[x].to_numpy(np.float64)
            y_new = pdf[y].to_numpy(np.float64)
            # complete pairs only enter the sums (batch pairwise rule)
            comp = ~np.isnan(x_new) & ~np.isnan(y_new)
            mt = np.concatenate([bt, t_new[comp]])
            mx = np.concatenate([bx, x_new[comp]])
            my = np.concatenate([by, y_new[comp]])
            order = np.argsort(mt, kind="stable")
            allt, allx, ally = mt[order], mx[order], my[order]
            pre = lambda v: np.concatenate([[0.0], np.cumsum(v)])
            psx, psy = pre(allx), pre(ally)
            psxx, psyy = pre(allx * allx), pre(ally * ally)
            psxy = pre(allx * ally)
            lo = np.searchsorted(allt, t_new - w_ns, side="left")
            hi = np.searchsorted(allt, t_new, side="right")
            n = (hi - lo).astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                sx = psx[hi] - psx[lo]
                sy = psy[hi] - psy[lo]
                sxx = psxx[hi] - psxx[lo]
                syy = psyy[hi] - psyy[lo]
                sxy = psxy[hi] - psxy[lo]
                det = n * sxx - sx * sx
                ok = (n >= min_samples) & (det > 0)
                beta = np.where(ok, (n * sxy - sx * sy)
                                / np.where(det != 0, det, 1.0), np.nan)
                alpha = np.where(ok, (sy - beta * sx)
                                 / np.maximum(n, 1), np.nan)
                deny = n * syy - sy * sy
                r2 = np.where(ok & (deny > 0),
                              (n * sxy - sx * sy) ** 2
                              / (np.where(det != 0, det, 1.0)
                                 * np.where(deny != 0, deny, 1.0)),
                              np.nan)
            res = pd.DataFrame({c: [kv] * len(t_new)
                                for c, kv in zip(key, key_vals)})
            res["__tns"] = t_new
            res[x] = x_new
            res[y] = y_new
            fin = lambda a: [None if np.isnan(v) else float(v) for v in a]
            res["beta"], res["alpha"], res["r2"] = \
                fin(beta), fin(alpha), fin(r2)
            frames.append(res)
            max_seen = int(t_new[-1])
            if len(allt):
                max_seen = max(max_seen, int(allt[-1]))
            keep = allt >= max_seen - w_ns
            allt, allx, ally = allt[keep], allx[keep], ally[keep]
            bt, bx, by = allt, allx, ally
        state.update((bt.tolist(), bx.tolist(), by.tolist()))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def rolling_ols_multi_stream(stream: DataFrame, y: str,
                             xs: Sequence[str], key: Sequence[str],
                             window: str | int = "7d",
                             min_samples: int | None = None,
                             min_rel_det: float = 1e-9,
                             time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of ``operators.regression.rolling_ols_multi``:
    per-key k-regressor OLS (alpha, beta[], r2) over the trailing
    ``[t - window, t]`` frame via prefix sums of every Gramian product
    over the sorted complete-case state buffer, then stacked
    ``np.linalg.solve`` per micro-batch — the batch operator's two
    stages (windowed sums + batched solve) fused into one stateful
    fold. Same late-arrival (sorted-merge) and complete-case
    contracts as :func:`rolling_ols_stream`; ``min_rel_det`` is the
    batch operator's relative singularity knob, threaded here so a
    non-default batch setting keeps batch/stream parity (r10
    ADVICE)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import parse_duration_ns, time_ns_expr

    key = list(key)
    xs = list(xs)
    k = len(xs)
    if k == 0:
        raise ValueError("xs must name at least one regressor")
    if min_samples is None:
        min_samples = k + 2
    w_ns = parse_duration_ns(window)
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType())]
        + [T.StructField(c, T.DoubleType()) for c in xs]
        + [T.StructField(y, T.DoubleType()),
           T.StructField("alpha", T.DoubleType()),
           T.StructField("beta", T.ArrayType(T.DoubleType())),
           T.StructField("r2", T.DoubleType())])
    state_schema = T.StructType(
        [T.StructField("ts", T.ArrayType(T.LongType()))]
        + [T.StructField(f"x{j}", T.ArrayType(T.DoubleType()))
           for j in range(k)]
        + [T.StructField("ys", T.ArrayType(T.DoubleType()))])
    m = k + 2  # terms: [1, x1..xk, y]

    def fold(key_vals, pdf_iter, state):
        if state.exists:
            st = state.get
            bt = np.asarray(st[0] or [], dtype=np.int64)
            bx = [np.asarray(st[1 + j] or [], dtype=np.float64)
                  for j in range(k)]
            by = np.asarray(st[k + 1] or [], dtype=np.float64)
        else:
            bt = np.asarray([], dtype=np.int64)
            bx = [np.asarray([], dtype=np.float64) for _ in range(k)]
            by = np.asarray([], dtype=np.float64)
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            t_new = pdf["__tns"].to_numpy(np.int64)
            x_new = [pdf[c].to_numpy(np.float64) for c in xs]
            y_new = pdf[y].to_numpy(np.float64)
            comp = ~np.isnan(y_new)
            for xv in x_new:
                comp &= ~np.isnan(xv)
            mt = np.concatenate([bt, t_new[comp]])
            mx = [np.concatenate([bx[j], x_new[j][comp]])
                  for j in range(k)]
            my = np.concatenate([by, y_new[comp]])
            order = np.argsort(mt, kind="stable")
            allt = mt[order]
            terms = [np.ones(len(allt))] \
                + [mx[j][order] for j in range(k)] + [my[order]]
            pre = lambda v: np.concatenate([[0.0], np.cumsum(v)])
            ps = {}
            for i in range(m):
                for j in range(i, m):
                    ps[(i, j)] = pre(terms[i] * terms[j])
            lo = np.searchsorted(allt, t_new - w_ns, side="left")
            hi = np.searchsorted(allt, t_new, side="right")
            N = len(t_new)
            S = np.zeros((N, m, m))
            for i in range(m):
                for j in range(i, m):
                    v = ps[(i, j)][hi] - ps[(i, j)][lo]
                    S[:, i, j] = v
                    S[:, j, i] = v
            n = S[:, 0, 0]
            A = S[:, :k + 1, :k + 1]
            b = S[:, :k + 1, k + 1]
            syy = S[:, k + 1, k + 1]
            sy = S[:, 0, k + 1]
            with np.errstate(all="ignore"):
                det = np.linalg.det(A)
                # relative Hadamard-scale guard, in lockstep with the
                # batch operator (r10: det != 0 admits cancellation
                # noise and breaks batch/stream parity); shared helper
                # handles diagonal-product overflow in log space
                from ..operators.regression import _rel_det_ok
                ok = (n >= min_samples) & np.isfinite(det) \
                    & _rel_det_ok(det, A, min_rel_det)
                coef = np.full((N, k + 1), np.nan)
                if ok.any():
                    coef[ok] = np.linalg.solve(A[ok], b[ok])
                sse = syy - np.einsum("np,np->n", coef, b)
                sst = syy - sy * sy / np.maximum(n, 1)
                r2 = np.where(ok & (sst > 0), 1.0 - sse / sst, np.nan)
            res = pd.DataFrame({c: [kv] * N
                                for c, kv in zip(key, key_vals)})
            res["__tns"] = t_new
            for j, c in enumerate(xs):
                res[c] = x_new[j]
            res[y] = y_new
            fin = lambda a: [None if np.isnan(v) else float(v) for v in a]
            res["alpha"] = fin(coef[:, 0])
            res["beta"] = [None if not o else [float(v) for v in row[1:]]
                           for o, row in zip(ok, coef)]
            res["r2"] = fin(r2)
            frames.append(res)
            max_seen = int(t_new[-1])
            if len(allt):
                max_seen = max(max_seen, int(allt[-1]))
            keep = allt >= max_seen - w_ns
            bt = allt[keep]
            bx = [terms[1 + j][keep] for j in range(k)]
            by = terms[k + 1][keep]
        state.update((bt.tolist(), *[v.tolist() for v in bx],
                      by.tolist()))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def token_shift_stream(stream_docs: DataFrame, ref: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """Bounded-state streaming corpus-drift monitor: the live document
    stream's tokens bucket into a STATIC reference vocabulary
    (``pipeline.text.token_shift_reference`` — top-K rows + pooled
    ``__OOV__``) via a broadcast stream-static join, and a streaming
    aggregation keeps one running count per bucket. State is K+1 rows
    REGARDLESS of stream volume (out-of-vocab tokens pool map-side),
    so the monitor runs forever on an unbounded crawl. Write with
    ``outputMode('complete')`` and feed the sink through
    ``pipeline.text.token_shift_finalize(ref, sink)`` for the
    KL/total-variation columns — the identical math as the batch
    :func:`~flint_spark.pipeline.text.token_distribution_shift`, which
    the replay gate pins against the batch oracle."""
    from pyspark.sql import functions as F

    from ..pipeline.text import _words

    vocab = (ref.filter(F.col("w") != "__OOV__")
             .select("w").withColumn("__v", F.lit(1)))
    # ONE tokenization definition (pipeline.text._words) — an inline
    # re-implementation here would silently diverge from the batch
    # operator the replay gate pins against (the shingles principle)
    tok = stream_docs.select(F.explode(_words(text_col)).alias("w"))
    tagged = tok.join(F.broadcast(vocab), "w", "left")
    bucket = F.when(F.col("__v").isNotNull(), F.col("w")) \
        .otherwise(F.lit("__OOV__"))
    return (tagged.select(bucket.alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("ncnt")))


def ohlc_bars_stream(stream: DataFrame, frequency: str, price_col: str,
                     key: Sequence[str] = (),
                     volume_col: str | None = None,
                     tie_break: Sequence[str] = (),
                     watermark: str = "10 minutes",
                     time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of :func:`operators.bars.ohlc_bars` (no TWAP —
    the holding-interval ``lead`` is not expressible under streaming
    aggregation): watermarked tumbling windows + the SAME
    ``bar_aggs`` column list as the batch operator, so the two cannot
    drift. Every bar column is a mergeable declarative aggregate
    (min_by/max_by over the deterministic order struct), state is one
    partial row per open (key, window)."""
    from ..operators.bars import _order_struct, bar_aggs
    from ..timeseries import time_ns_expr

    key = list(key)
    price = F.col(price_col)
    base = stream.filter(price.isNotNull())
    ord_ = _order_struct(time_ns_expr(base, time_column), tie_break, price)
    win = F.window(F.col(time_column), frequency)
    out = (base.withWatermark(time_column, watermark)
           .groupBy(win.alias("interval"), *key)
           .agg(*bar_aggs(price, ord_, volume_col)))
    names = [c for c in ("open", "high", "low", "close", "n",
                         "volume", "vwap") if c in out.columns]
    return out.select(F.col("interval.start").alias(TIME_COLUMN), *key,
                      *names)


def cms_build_stream(stream: DataFrame, key_col: str,
                     frequency: str = "1 day",
                     width: int = 1024, depth: int = 4,
                     salt: str = "cms",
                     watermark: str = "10 minutes",
                     time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming count-min ingestion: one (time, j, bucket, cnt) cell
    row per closed tumbling window — the sketch analogue of
    ``build_rollup_stream``'s partial table. State is bounded at
    ``width x depth`` cells per open window REGARDLESS of stream
    volume or key cardinality (the whole point of sketching a
    stream); closed-window cell tables re-sum into the corpus sketch
    with ``pipeline.sketches.cms_merge`` (drop ``time`` first), and
    the merged table feeds ``cms_estimate`` unchanged — a live
    heavy-hitters monitor over an unbounded stream.

    Cell positions are the same md5 family as the batch build, so a
    replayed stream's merged cells equal ``cms_build`` on the same
    rows bit-for-bit (oracle-gated)."""
    from ..pipeline.sketches import _pos

    key = F.col(key_col).cast("string")
    cells = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _pos(key, j, width, salt).alias("bucket"))
        for j in range(depth)
    ])).alias("cell")
    win = F.window(F.col(time_column), frequency)
    out = (stream.filter(key.isNotNull())
           .select(F.col(time_column), cells)
           .select(time_column, "cell.j", "cell.bucket")
           .withWatermark(time_column, watermark)
           .groupBy(win.alias("interval"), "j", "bucket")
           .agg(F.count(F.lit(1)).alias("cnt")))
    return out.select(F.col("interval.start").alias(TIME_COLUMN),
                      "j", "bucket", "cnt")


def funnel_stream(stream: DataFrame, steps: Sequence[str],
                  event_col: str = "event_type",
                  key: Sequence[str] = ("user_id",),
                  time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of :func:`operators.sessions.funnel`: per-key
    funnel state advanced by ``applyInPandasWithState`` — state is
    EXACTLY k nullable timestamps per key (the chosen step times),
    bounded regardless of stream volume. Each trigger emits the key's
    current (step times, n_steps, converted) row; the funnel is
    monotone, so the final emission per key is its max-``n_steps``
    row, and a fully in-order replay equals the batch walk (the
    per-trigger chained-min pass is the same greedy assignment).
    Out-of-order arrival across triggers follows the
    ``ewma_stream`` contract: already-fixed earlier steps do not
    reopen. Step times travel as epoch-ns longs."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import time_ns_expr

    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    key = list(key)
    k = len(steps)
    idx = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(steps))):
        idx = F.when(F.col(event_col) == F.lit(s), F.lit(i)).otherwise(idx)
    tns = time_ns_expr(stream, time_column)
    ev = (stream.filter(F.col(event_col).isin(steps) & tns.isNotNull())
          .select(*key, tns.alias("__tns"), idx.alias("__i")))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField(f"step{i + 1}_tns", T.LongType())
           for i in range(k)]
        + [T.StructField("n_steps", T.IntegerType()),
           T.StructField("converted", T.BooleanType())])
    state_schema = T.StructType(
        [T.StructField(f"s{i}", T.LongType()) for i in range(k)])

    def fold(key_vals, pdf_iter, state):
        ts = list(state.get) if state.exists else [None] * k
        # whole trigger at once: the chained-min pass is monotone and
        # never reopens earlier steps, so running it per Arrow CHUNK
        # loses step-i events that arrive in a chunk before the chunk
        # holding their step-(i-1) predecessor
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            t = pdf["__tns"].to_numpy(np.int64)
            si = pdf["__i"].to_numpy(np.int64)
            # chained-min pass in step order (min needs no row sort) —
            # the same greedy assignment as the batch walk for the
            # rows present; an unfilled step leaves every later step
            # unfillable this trigger (checked via ts[i-1])
            for i in range(k):
                if ts[i] is not None:
                    continue
                if i == 0:
                    cand = t[si == 0]
                elif ts[i - 1] is None:
                    break
                else:
                    cand = t[(si == i) & (t > ts[i - 1])]
                if len(cand):
                    ts[i] = int(cand.min())
        state.update(tuple(ts))
        n = sum(1 for v in ts if v is not None)
        row = {c: [v] for c, v in zip(key, key_vals)}
        for i in range(k):
            row[f"step{i + 1}_tns"] = [ts[i]]
        row["n_steps"] = np.array([n], dtype=np.int32)
        row["converted"] = [n == k]
        yield pd.DataFrame(row)

    return (ev.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def drawdown_stream(stream: DataFrame, column: str,
                    key: Sequence[str] = (),
                    time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of :func:`operators.bars.drawdown`: per-key
    running peak + fractional drawdown via ``applyInPandasWithState``
    — state is ONE double per key. Within a trigger rows process in
    event-time order (vectorized ``maximum.accumulate``); null values
    inherit the running peak with a null drawdown, exactly the batch
    null-skip rule. In-order replay equals the batch operator
    (the ``ewma_stream`` contract for late cross-trigger rows)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import time_ns_expr

    key = list(key)
    if not key:
        raise ValueError("drawdown_stream needs a key")
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(column, T.DoubleType()),
           T.StructField("peak", T.DoubleType()),
           T.StructField("drawdown", T.DoubleType())])
    state_schema = T.StructType([T.StructField("peak", T.DoubleType())])

    def fold(key_vals, pdf_iter, state):
        peak = state.get[0] if state.exists else None
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            v = pdf[column].to_numpy(np.float64)
            filled = np.where(np.isnan(v),
                              -np.inf if peak is None else peak, v)
            if peak is not None:
                filled = np.maximum(filled, peak)
            peaks = np.maximum.accumulate(filled)
            if peak is None:
                # rows before the first non-null value have no peak
                seen = np.cumsum(~np.isnan(v)) > 0
                peaks = np.where(seen, peaks, np.nan)
            out = pd.DataFrame({c: [kv] * len(pdf)
                                for c, kv in zip(key, key_vals)})
            out["__tns"] = pdf["__tns"].to_numpy(np.int64)
            dd = np.where((peaks > 0) & ~np.isnan(v),
                          (peaks - v) / peaks, np.nan)
            # NaN -> None: Arrow keeps float NaN as NaN, but the batch
            # operator emits SQL NULL (the anomaly-stream recipe)
            import math as _math
            for name, arr in ((column, v), ("peak", peaks),
                              ("drawdown", dd)):
                out[name] = [None if _math.isnan(x) else x for x in arr]
            frames.append(out)
            last = peaks[-1] if len(peaks) else np.nan
            if not np.isnan(last):
                peak = float(last)
        state.update((peak,))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def ewm_volatility_stream(stream: DataFrame, column: str,
                          key: Sequence[str],
                          alpha: float = 0.05,
                          duration_per_period: str = "1d",
                          time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of :func:`operators.ema.ewm_volatility`: per-key
    time-decayed mean / population variance / volatility via
    ``applyInPandasWithState`` — state is FOUR doubles per key
    (last event-time ns + the three decayed accumulators Σw·x, Σw·x²,
    Σw). All three accumulators share the batch engine's vectorized
    block-renormalized scan (``operators.ema._affine_scan``) over one
    step vector, so an in-order replay reproduces the batch operator;
    late cross-trigger rows follow the ``ewma_stream`` contract."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..operators.ema import _affine_scan
    from ..timeseries import parse_duration_ns, time_ns_expr

    key = list(key)
    lam = -math.log1p(-alpha) / parse_duration_ns(duration_per_period)
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(column, T.DoubleType()),
           T.StructField(f"{column}_ewm_mean", T.DoubleType()),
           T.StructField(f"{column}_ewm_var", T.DoubleType()),
           T.StructField(f"{column}_ewm_vol", T.DoubleType())])
    state_schema = T.StructType([T.StructField("last_tns", T.LongType()),
                                 T.StructField("e", T.DoubleType()),
                                 T.StructField("q", T.DoubleType()),
                                 T.StructField("a", T.DoubleType())])

    def fold(key_vals, pdf_iter, state):
        last_tns, e, q, a = state.get if state.exists \
            else (None, 0.0, 0.0, 0.0)
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            # (time, value) tie rule: same pin as cusum/kalman and the
            # batch engine — per-row outputs on duplicate timestamps
            # must match a batch replay regardless of arrival order
            pdf = _sort_time_then_values(pdf, "__tns", [column])
            t = pdf["__tns"].to_numpy(dtype=np.int64)
            x = pdf[column].to_numpy(dtype=np.float64)
            n = len(x)
            E, Q, A = _decayed_carry_scan(
                np, _affine_scan, lam, last_tns, t,
                [x, x * x, np.ones(n)], [e, q, a])
            e, q, a = float(E[-1]), float(Q[-1]), float(A[-1])
            last_tns = int(t[-1])
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = E / A
                var = np.maximum(Q / A - mean * mean, 0.0)
            res = pd.DataFrame({c: [v] * n for c, v in zip(key, key_vals)})
            res["__tns"] = t
            res[column] = x
            res[f"{column}_ewm_mean"] = mean
            res[f"{column}_ewm_var"] = var
            res[f"{column}_ewm_vol"] = np.sqrt(var)
            frames.append(res)
        state.update((last_tns, float(e), float(q), float(a)))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def brown_double_smoothing_stream(stream: DataFrame, column: str,
                                  key: Sequence[str],
                                  alpha: float = 0.05,
                                  duration_per_period: str = "1d",
                                  time_column: str = TIME_COLUMN
                                  ) -> DataFrame:
    """Streaming twin of :func:`operators.ema.brown_double_smoothing`:
    per-key DEMA level / per-period trend / one-period forecast via
    ``applyInPandasWithState``. State is FOUR doubles (last t, Σw·x,
    Σw, Σw·s1): the single smooth s1 resolves per row from the first
    decayed scan, then the SAME step vector scans the s1 series for
    the double smooth — both through the shared
    ``_decayed_carry_scan`` (null-skip, block-renormalized), so an
    in-order replay reproduces the batch operator."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..operators.ema import _affine_scan, _check_alpha
    from ..timeseries import parse_duration_ns, time_ns_expr

    _check_alpha(alpha)
    key = list(key)
    lam = -math.log1p(-alpha) / parse_duration_ns(duration_per_period)
    ab = alpha / (1.0 - alpha)
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(column, T.DoubleType()),
           T.StructField(f"{column}_dema_level", T.DoubleType()),
           T.StructField(f"{column}_dema_trend", T.DoubleType()),
           T.StructField(f"{column}_dema_fcst", T.DoubleType())])
    state_schema = T.StructType([T.StructField("last_tns", T.LongType()),
                                 T.StructField("e1", T.DoubleType()),
                                 T.StructField("a", T.DoubleType()),
                                 T.StructField("e2", T.DoubleType())])

    def fold(key_vals, pdf_iter, state):
        last_tns, e1, a, e2 = state.get if state.exists \
            else (None, 0.0, 0.0, 0.0)
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            # (time, value) tie pin — see ewm_volatility_stream
            pdf = _sort_time_then_values(pdf, "__tns", [column])
            t = pdf["__tns"].to_numpy(dtype=np.int64)
            x = pdf[column].to_numpy(dtype=np.float64)
            n = len(x)
            E1, A = _decayed_carry_scan(np, _affine_scan, lam, last_tns,
                                        t, [x, np.ones(n)], [e1, a])
            with np.errstate(invalid="ignore", divide="ignore"):
                s1 = E1 / A
            (E2,) = _decayed_carry_scan(np, _affine_scan, lam, last_tns,
                                        t, [s1], [e2])
            with np.errstate(invalid="ignore", divide="ignore"):
                s2 = E2 / A
            e1, a, e2 = float(E1[-1]), float(A[-1]), float(E2[-1])
            last_tns = int(t[-1])
            level = 2.0 * s1 - s2
            trend = ab * (s1 - s2)
            res = pd.DataFrame({c: [v] * n for c, v in zip(key, key_vals)})
            res["__tns"] = t
            res[column] = x
            res[f"{column}_dema_level"] = level
            res[f"{column}_dema_trend"] = trend
            res[f"{column}_dema_fcst"] = level + trend
            frames.append(res)
        state.update((last_tns, float(e1), float(a), float(e2)))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def log_returns_stream(stream: DataFrame, price_col: str,
                       key: Sequence[str],
                       tie_break: Sequence[str] = (),
                       time_column: str = TIME_COLUMN) -> DataFrame:
    """Stateful per-key log-return chain — the streaming front half of
    :func:`operators.bars.realized_volatility`: state is TWO numbers
    per key (last event-time ns, last positive price). Non-positive /
    null / NaN prices drop BEFORE the chain exactly like the batch
    filter (they neither emit nor break the chain); each key's first
    positive tick emits no return. Duplicate timestamps chain in
    (time, tie_break..., price) order — the batch ``_order_struct``
    rule — so the squared returns match the batch operator; pass the
    same ``tie_break`` columns to both. Emits (key..., __tns, price,
    ``<col>_logret``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import time_ns_expr

    key = list(key)
    tie_break = list(tie_break)
    p0 = F.col(price_col)
    with_ns = (stream.filter(p0.isNotNull() & (p0 > 0)
                             & ~F.isnan(p0.cast("double")))
               .withColumn("__tns", time_ns_expr(stream, time_column)))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(price_col, T.DoubleType()),
           T.StructField(f"{price_col}_logret", T.DoubleType())])
    state_schema = T.StructType([T.StructField("last_tns", T.LongType()),
                                 T.StructField("last_p", T.DoubleType())])

    def fold(key_vals, pdf_iter, state):
        last_tns, last_p = state.get if state.exists else (None, None)
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            # duplicate timestamps: chain in the batch _order_struct
            # order (time, tie_break..., price), not arrival order
            pdf = pdf.sort_values(["__tns", *tie_break, price_col],
                                  kind="stable")
            t = pdf["__tns"].to_numpy(np.int64)
            p = pdf[price_col].to_numpy(np.float64)
            prev = np.concatenate(
                [[np.nan if last_p is None else last_p], p[:-1]])
            with np.errstate(invalid="ignore", divide="ignore"):
                r = np.log(p / prev)
            res = pd.DataFrame({c: [v] * len(t)
                                for c, v in zip(key, key_vals)})
            res["__tns"] = t
            res[price_col] = p
            res[f"{price_col}_logret"] = [
                None if np.isnan(v) else float(v) for v in r]
            frames.append(res)
            last_tns = int(t[-1])
            last_p = float(p[-1])
        state.update((last_tns, last_p))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def realized_volatility_stream(stream: DataFrame, interval: str | int,
                               price_col: str, key: Sequence[str],
                               tie_break: Sequence[str] = (),
                               watermark: str = "10 minutes",
                               time_column: str = TIME_COLUMN
                               ) -> DataFrame:
    """Streaming twin of :func:`operators.bars.realized_volatility`:
    the stateful log-return chain above feeds Spark's OWN watermarked
    tumbling-window aggregation (sum of squared returns is a plain
    mergeable monoid — no custom state needed past the two-number
    chain). ``interval`` uses the SAME duration grammar as the batch
    operator ("1d"/"6h"/int ns — converted to milliseconds for
    ``F.window``). Returns (time = bucket begin, key..., rv, vol,
    n_returns); boundary-crossing returns land in the later tick's
    bucket, matching the batch convention by construction."""
    from ..timeseries import floor_div, parse_duration_ns

    width_ns = parse_duration_ns(interval)
    if width_ns <= 0 or width_ns % 1_000_000:
        raise ValueError("interval must be a positive whole number "
                         "of milliseconds")
    rets = log_returns_stream(stream, price_col, key,
                              tie_break=tie_break,
                              time_column=time_column)
    r = F.col(f"{price_col}_logret")
    # exact integer ns -> µs: (ns / 1000).cast(long) detours through a
    # double whose 53-bit mantissa cannot hold epoch-ns (~1.7e18) —
    # half of all µs-granular timestamps would land 1µs early and the
    # first tick of a bucket would fall into the previous window
    tcol = F.timestamp_micros(floor_div(F.col("__tns"), 1000))
    return (rets.filter(r.isNotNull())
            .withColumn("__t", tcol)
            .withWatermark("__t", watermark)
            .groupBy(F.window("__t",
                              f"{width_ns // 1_000_000} milliseconds")
                     .alias("__w"), *key)
            .agg(F.sum(r * r).alias("rv"),
                 F.count(F.lit(1)).alias("n_returns"))
            .select(F.col("__w.start").alias(time_column), *key,
                    "rv", F.sqrt(F.col("rv")).alias("vol"),
                    "n_returns"))


def ewm_corr_stream(stream: DataFrame, x: str, y: str,
                    key: Sequence[str],
                    alpha: float = 0.05,
                    duration_per_period: str = "1d",
                    min_rel_var: float = 1e-9,
                    time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of :func:`operators.ema.ewm_corr`: per-key
    time-decayed covariance / correlation / hedge-beta via
    ``applyInPandasWithState`` — state is SEVEN numbers (last t + the
    six decayed sums Σw·x, Σw·y, Σw·x², Σw·y², Σw·xy, Σw). All six
    ride the shared carry scan over one step vector; combine math and
    clamps match the batch operator expression-for-expression
    (including the ``min_rel_var`` relative support guard, threaded
    so a non-default batch setting keeps parity). Rows with either
    side null keep the complete-pair caveat documented on the batch
    operator (each numerator null-skips independently)."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..operators.ema import _affine_scan, _check_alpha
    from ..timeseries import parse_duration_ns, time_ns_expr

    _check_alpha(alpha)
    key = list(key)
    lam = -math.log1p(-alpha) / parse_duration_ns(duration_per_period)
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    pfx = f"{x}_{y}"
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(x, T.DoubleType()),
           T.StructField(y, T.DoubleType()),
           T.StructField(f"{pfx}_ewm_cov", T.DoubleType()),
           T.StructField(f"{pfx}_ewm_corr", T.DoubleType()),
           T.StructField(f"{pfx}_ewm_beta", T.DoubleType())])
    state_schema = T.StructType(
        [T.StructField("last_tns", T.LongType())]
        + [T.StructField(n, T.DoubleType())
           for n in ("sx", "sy", "sxx", "syy", "sxy", "sw")])

    def fold(key_vals, pdf_iter, state):
        st = state.get if state.exists else (None,) + (0.0,) * 6
        last_tns, carries = st[0], list(st[1:])
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            # (time, x, y) tie pin — see ewm_volatility_stream
            pdf = _sort_time_then_values(pdf, "__tns", [x, y])
            t = pdf["__tns"].to_numpy(dtype=np.int64)
            xv = pdf[x].to_numpy(dtype=np.float64)
            yv = pdf[y].to_numpy(dtype=np.float64)
            n = len(t)
            arrays = [xv, yv, xv * xv, yv * yv, xv * yv, np.ones(n)]
            outs = _decayed_carry_scan(np, _affine_scan, lam, last_tns,
                                       t, arrays, carries)
            carries = [float(o[-1]) for o in outs]
            last_tns = int(t[-1])
            SX, SY, SXX, SYY, SXY, SW = outs
            with np.errstate(invalid="ignore", divide="ignore"):
                ex, ey = SX / SW, SY / SW
                cov = SXY / SW - ex * ey
                vx = np.maximum(SXX / SW - ex * ex, 0.0)
                vy = np.maximum(SYY / SW - ey * ey, 0.0)
                corr = np.clip(cov / np.sqrt(vx * vy), -1.0, 1.0)
                beta = cov / vy
            res = pd.DataFrame({c: [v] * n for c, v in zip(key, key_vals)})
            res["__tns"] = t
            res[x] = xv
            res[y] = yv
            fin = lambda arr, okm: [
                None if (not o) or np.isnan(v) else float(v)
                for v, o in zip(arr, okm)]
            # relative support guard, in lockstep with batch ewm_corr
            # (r10): variance below min_rel_var of its own second
            # moment is E[x^2]-E[x]^2 cancellation noise; the knob is
            # threaded from the signature so a non-default batch
            # setting keeps batch/stream parity (r10 ADVICE)
            vx_ok = vx > min_rel_var * (SXX / SW)
            vy_ok = vy > min_rel_var * (SYY / SW)
            res[f"{pfx}_ewm_cov"] = cov
            res[f"{pfx}_ewm_corr"] = fin(corr, vx_ok & vy_ok)
            res[f"{pfx}_ewm_beta"] = fin(beta, vy_ok)
            frames.append(res)
        state.update((last_tns, *carries))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def cusum_stream(stream: DataFrame, column: str, key: Sequence[str],
                 k: float = 0.5, h: float = 5.0, *, mu: float,
                 sigma: float,
                 time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of ``operators.changepoint.cusum`` for the
    classical monitoring setup (known in-control ``mu``/``sigma`` —
    the estimated mode needs the whole series and is batch-only).

    State is four doubles per key: the two prefix sums and their
    running minima — the exact quantities the batch identity
    ``s = c - min(0, running_min(c))`` tracks, so in-order replay
    reproduces the batch operator bitwise. Null values freeze the
    detector (zero contribution) and score null, the EWMA-family
    null-skip contract; duplicate timestamps fold in the batch
    engine's time-then-value order.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import time_ns_expr

    if not sigma > 0:
        raise ValueError(f"sigma must be > 0, got {sigma}")
    key = list(key)
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(column, T.DoubleType()),
           T.StructField(f"{column}_cusum_pos", T.DoubleType()),
           T.StructField(f"{column}_cusum_neg", T.DoubleType()),
           T.StructField(f"{column}_alarm", T.BooleanType())])
    state_schema = T.StructType([
        T.StructField("c_up", T.DoubleType()),
        T.StructField("c_dn", T.DoubleType()),
        T.StructField("m_up", T.DoubleType()),
        T.StructField("m_dn", T.DoubleType())])

    def fold(key_vals, pdf_iter, state):
        c_up, c_dn, m_up, m_dn = state.get if state.exists \
            else (0.0, 0.0, np.inf, np.inf)
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            pdf = _sort_time_then_values(pdf, "__tns", [column])
            t = pdf["__tns"].to_numpy(dtype=np.int64)
            x = pdf[column].to_numpy(dtype=np.float64)
            obs = ~np.isnan(x)
            z = np.where(obs, (x - mu) / sigma, 0.0)
            cup = c_up + np.cumsum(np.where(obs, z - k, 0.0))
            cdn = c_dn + np.cumsum(np.where(obs, -z - k, 0.0))
            mup = np.minimum(m_up, np.minimum.accumulate(cup))
            mdn = np.minimum(m_dn, np.minimum.accumulate(cdn))
            s_pos = cup - np.minimum(0.0, mup)
            s_neg = cdn - np.minimum(0.0, mdn)
            n = len(x)
            c_up, c_dn = float(cup[-1]), float(cdn[-1])
            m_up, m_dn = float(mup[-1]), float(mdn[-1])
            res = pd.DataFrame({c: [v] * n for c, v in zip(key, key_vals)})
            res["__tns"] = t
            res[column] = x
            res[f"{column}_cusum_pos"] = np.where(obs, s_pos, np.nan)
            res[f"{column}_cusum_neg"] = np.where(obs, s_neg, np.nan)
            res[f"{column}_alarm"] = pd.Series(
                [bool(p > h or q > h) if o else None
                 for p, q, o in zip(s_pos, s_neg, obs)],
                index=res.index, dtype=object)
            frames.append(res)
        state.update((float(c_up), float(c_dn), float(m_up), float(m_dn)))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def kalman_stream(stream: DataFrame, column: str, key: Sequence[str],
                  q: float, r: float, period: str | int = "1d",
                  p0: float | None = None,
                  time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of ``operators.kalman.kalman_local_level``: the
    (last observed time, level, variance) triple is the ENTIRE filter
    state, carried across triggers through the same scan the batch
    engine runs — in-order replay reproduces the batch levels bitwise.
    Null/NaN observations score null and leave the state untouched
    (diffusion measured from the last observed row).

    Late arrival (a cross-trigger straggler older than the carried
    state): the observation folds as a SAME-TIME correction — diffusion
    is clamped at zero and the state clock never rewinds — so a late
    chunk nudges the level without poisoning the variance, and
    subsequent in-order rows see correctly-measured gaps. Append mode
    cannot retract already-emitted rows, so unlike the buffered
    window streams (anomaly/rolling-OLS) a recurrence stream does not
    bitwise-reconverge to batch after late data; the documented fold
    above is pinned in ``test_kalman_stream_late_arrival_semantics``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..operators.kalman import _kf_scan_factory
    from ..timeseries import parse_duration_ns, time_ns_expr

    if not q >= 0 or not r > 0:
        raise ValueError(f"need q >= 0 and r > 0, got q={q} r={r}")
    p0 = float(r) if p0 is None else float(p0)
    scan = _kf_scan_factory(float(q), float(r), p0,
                            float(parse_duration_ns(period)))
    key = list(key)
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(column, T.DoubleType()),
           T.StructField(f"{column}_kf", T.DoubleType())])
    state_schema = T.StructType([
        T.StructField("last_t", T.LongType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("var", T.DoubleType())])

    def fold(key_vals, pdf_iter, state):
        st = state.get if state.exists else None
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            pdf = _sort_time_then_values(pdf, "__tns", [column])
            t = pdf["__tns"].to_numpy(dtype=np.int64)
            x = pdf[column].to_numpy(dtype=np.float64)
            out, st = scan(t, x, st)
            res = pd.DataFrame({c: [v] * len(x)
                                for c, v in zip(key, key_vals)})
            res["__tns"] = t
            res[column] = x
            res[f"{column}_kf"] = out
            frames.append(res)
        if st is not None:
            # never persist a spurious never-observed state for a key
            # whose trigger delivered no rows
            state.update(st)
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def holt_winters_stream(stream: DataFrame, column: str,
                        key: Sequence[str], period: int,
                        alpha: float = 0.3, beta: float = 0.1,
                        gamma: float = 0.1, unit: str | int = "1d",
                        time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of ``operators.holtwinters.holt_winters``: the
    (init, level, trend, seasonal-vector) state — 2 + period floats
    per key — carries across triggers through the same scan the batch
    engine runs; in-order replay is bitwise batch-identical. Null/NaN
    observations score null and leave the state untouched."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..operators.holtwinters import _hw_scan_factory, _validate
    from ..timeseries import parse_duration_ns, time_ns_expr

    _validate(alpha, beta, gamma, period)
    scan = _hw_scan_factory(float(alpha), float(beta), float(gamma),
                            int(period), parse_duration_ns(unit))
    key = list(key)
    with_ns = stream.withColumn("__tns", time_ns_expr(stream, time_column))
    names = [f"{column}_hw_level", f"{column}_hw_trend", f"{column}_hw"]
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("__tns", T.LongType()),
           T.StructField(column, T.DoubleType())]
        + [T.StructField(n, T.DoubleType()) for n in names])
    state_schema = T.StructType([
        T.StructField("init", T.BooleanType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("seas", T.ArrayType(T.DoubleType()))])

    def fold(key_vals, pdf_iter, state):
        st = state.get if state.exists else None
        if st is not None:
            st = (bool(st[0]), float(st[1]), float(st[2]), list(st[3]))
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            pdf = _sort_time_then_values(pdf, "__tns", [column])
            t = pdf["__tns"].to_numpy(dtype=np.int64)
            x = pdf[column].to_numpy(dtype=np.float64)
            (ol, ob, of), st = scan(t, x, st)
            res = pd.DataFrame({c: [v] * len(x)
                                for c, v in zip(key, key_vals)})
            res["__tns"] = t
            res[column] = x
            for nm, o in zip(names, (ol, ob, of)):
                res[nm] = o
            frames.append(res)
        if st is not None:
            state.update(st)
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def kmv_stream(stream: DataFrame, col: str, key: Sequence[str],
               k: int = 64, salt: str = "kmv",
               time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming KMV/theta distinct counting — the sketch's
    mergeability IS the streaming story: state per key is the k
    smallest hashes seen so far; each trigger's distinct hashes merge
    in (k smallest of old ∪ new), exactly ``pipeline.sketches
    .kmv_union``'s rule, so after any replay the state equals the
    batch sketch of everything ingested. Emits one row per trigger per
    key with the running (m, theta, est_distinct).

    The normalized hash is computed IN SPARK before the stateful fold
    (the shared ``kmv_hash_expr``), so the streaming sketch and the
    batch sketch hash the exact same bytes — a Python-side
    ``str(value)`` would diverge from Spark's ``cast('string')`` on
    booleans ('True' vs 'true') and scientific-notation doubles,
    silently breaking the history-independence contract for
    non-string columns."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..pipeline.hashing import kmv_hash_expr
    from ..timeseries import time_ns_expr

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    key = list(key)
    with_ns = (stream
               .withColumn("__tns", time_ns_expr(stream, time_column))
               .withColumn("__kh", F.when(
                   F.col(col).isNotNull(),
                   kmv_hash_expr(F.col(col), salt))))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("last_tns", T.LongType()),
           T.StructField("m", T.IntegerType()),
           T.StructField("theta", T.DoubleType()),
           T.StructField("est_distinct", T.DoubleType())])
    state_schema = T.StructType([
        T.StructField("hashes", T.ArrayType(T.DoubleType()))])

    def fold(key_vals, pdf_iter, state):
        hashes = list(state.get[0]) if state.exists else []
        frames = []
        pdf = _trigger_pdf(pd, pdf_iter)
        if pdf is not None:
            new = set(pdf["__kh"].dropna().astype(float))
            hashes = sorted(set(hashes) | new)[:k]
            m = len(hashes)
            theta = hashes[-1] if m >= k else 1.0
            est = (k - 1) / theta if m >= k else float(m)
            res = pd.DataFrame({c: [v] for c, v in zip(key, key_vals)})
            res["last_tns"] = np.int64(pdf["__tns"].max())
            res["m"] = np.int32(m)
            res["theta"] = theta
            res["est_distinct"] = est
            frames.append(res)
            state.update(([float(h) for h in hashes],))
        yield from frames

    return (with_ns.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def volume_bars_stream(stream: DataFrame, threshold: float,
                       price_col: str, volume_col: str,
                       key: Sequence[str],
                       tie_break: Sequence[str] = (),
                       time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming twin of :func:`operators.bars.volume_bars`: per-key
    state is the running volume total plus the OPEN bar's partial
    OHLCV — a bar is emitted exactly once, when it CLOSES (a later
    tick lands in a higher ``bar_seq``); the still-open bar is never
    emitted, so an in-order replay equals the batch operator minus
    each key's final (incomplete) bar. The per-trigger scan computes
    the same exclusive volume prefix left-to-right over the same
    (time, tie_break, price) order as batch, so bar boundaries and
    every bar column replay bitwise. Volumes must be non-negative
    (bar ids are then nondecreasing in time; same contract as any
    volume clock); null volumes count 0, null prices are dropped.
    ``tns`` is the bar's first tick time in epoch ns."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..timeseries import time_ns_expr

    if not float(threshold) > 0:
        raise ValueError("threshold must be positive")
    key = list(key)
    thr = float(threshold)
    price = F.col(price_col)
    base = (stream.filter(price.isNotNull())
            .withColumn("__tns", time_ns_expr(stream, time_column))
            .withColumn("__vol", F.coalesce(
                F.col(volume_col).cast("double"), F.lit(0.0))))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [T.StructField("bar_seq", T.LongType()),
           T.StructField("tns", T.LongType()),
           T.StructField("open", T.DoubleType()),
           T.StructField("high", T.DoubleType()),
           T.StructField("low", T.DoubleType()),
           T.StructField("close", T.DoubleType()),
           T.StructField("n", T.LongType()),
           T.StructField("volume", T.DoubleType()),
           T.StructField("pv", T.DoubleType())])
    # state: running volume + the open bar's partials
    state_schema = T.StructType([
        T.StructField("cum", T.DoubleType()),
        T.StructField("bar", T.LongType()),
        T.StructField("tns", T.LongType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("vol", T.DoubleType()),
        T.StructField("pv", T.DoubleType())])

    def fold(key_vals, pdf_iter, state):
        cum = state.get[0] if state.exists else 0.0
        open_bar = list(state.get[1:]) if state.exists else None
        pdf = _trigger_pdf(pd, pdf_iter)
        closed = []
        if pdf is not None and len(pdf):
            pdf = _sort_time_then_values(
                pdf, "__tns", [*tie_break, price_col])
            v = pdf["__vol"].to_numpy(np.float64)
            px = pdf[price_col].to_numpy(np.float64)
            t = pdf["__tns"].to_numpy(np.int64)
            pv = px * v
            # EVERY float fold below is a SEEDED SEQUENTIAL cumsum
            # (np.cumsum accumulates left-to-right, no pairwise
            # splits), so prefixes and per-bar volume/pv reproduce
            # Spark's F.sum fold bit-for-bit across any chunking —
            # `cum + np.cumsum(v)` or `.sum()` would drift in the
            # last ulp on long bars (r6 advice)
            # batch shape is `F.sum(vol).over(frame) - vol`: the
            # INCLUSIVE sequential prefix minus the current row —
            # subtract the same way, never a rearranged exclusive fold
            pre = np.cumsum(np.r_[cum, v])
            before = pre[1:] - v
            bars = np.floor(before / thr).astype(np.int64)
            cum = float(pre[-1])
            starts = np.flatnonzero(np.r_[True, bars[1:] != bars[:-1]])
            bounds = np.r_[starts, len(bars)]
            for s0, s1 in zip(bounds, bounds[1:]):
                if open_bar is not None and int(bars[s0]) == open_bar[0]:
                    # extend the open bar: seed the folds with its
                    # partials (open px/tns keep)
                    open_bar = [
                        open_bar[0], open_bar[1], open_bar[2],
                        max(open_bar[3], float(px[s0:s1].max())),
                        min(open_bar[4], float(px[s0:s1].min())),
                        float(px[s1 - 1]), open_bar[6] + int(s1 - s0),
                        float(np.cumsum(np.r_[open_bar[7], v[s0:s1]])[-1]),
                        float(np.cumsum(np.r_[open_bar[8], pv[s0:s1]])[-1])]
                else:
                    if open_bar is not None:
                        closed.append(open_bar)  # a later bar started
                    open_bar = [int(bars[s0]), int(t[s0]), float(px[s0]),
                                float(px[s0:s1].max()),
                                float(px[s0:s1].min()),
                                float(px[s1 - 1]), int(s1 - s0),
                                float(np.cumsum(v[s0:s1])[-1]),
                                float(np.cumsum(pv[s0:s1])[-1])]
        frames = []
        if closed:
            res = pd.DataFrame(
                closed, columns=["bar_seq", "tns", "open", "high",
                                 "low", "close", "n", "volume", "pv"])
            for c, val in zip(key, key_vals):
                res.insert(0, c, val)
            frames.append(res[[f.name for f in out_schema.fields]])
        if open_bar is not None:
            state.update((cum, *open_bar))
        yield from frames

    out = (base.groupBy(*key)
           .applyInPandasWithState(fold, out_schema, state_schema,
                                   "append", "NoTimeout"))
    vwap = F.when(F.col("volume") != 0, F.col("pv") / F.col("volume"))
    return out.withColumn("vwap", vwap).drop("pv")


def pack_sequences_stream(stream: DataFrame, seq_len: int,
                          tokens_col: str, key: Sequence[str],
                          on: str = "doc_id") -> DataFrame:
    """Streaming twin of ``pipeline.sampling.pack_sequences`` (the
    sharded form; ``key`` = the shard columns): per-key state is ONE
    long — the running token count — and an arriving document's
    segment rows depend only on that prefix, so every row emits
    exactly once, IMMEDIATELY (nothing is held open, unlike the volume
    clock whose final bar never emits). Integer arithmetic end to end:
    an in-order replay (ascending ``on`` within key, the file-replay
    contract) equals the batch operator BITWISE on ALL rows, final
    document included. Out-of-order arrivals across triggers pack in
    arrival order — the standard streaming tradeoff; within a trigger
    rows sort by ``on``. Token-count semantics are the batch
    operator's (``sampling._tok_long``): NULL packs as 0 (one
    zero-token row at the document's stream position), fractional
    truncates, and NEGATIVE counts fail the query loudly — ``F.size``
    of a NULL split is -1 under legacy sizeOfNull, and a -1 would
    silently shift every later document's offsets."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..pipeline.sampling import _tok_long

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    reserved = [c for c in stream.columns if c.startswith("__")]
    if reserved:
        raise ValueError(
            f"pack_sequences_stream reserves '__'-prefixed columns for "
            f"its scratch state (would silently overwrite {reserved}); "
            f"rename them — same contract as the batch twin")
    key = list(key)
    L = int(seq_len)
    base = stream.withColumn("__n", _tok_long(tokens_col))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [stream.schema[on],
           T.StructField("seq_id", T.LongType()),
           T.StructField("doc_off", T.LongType()),
           T.StructField("seq_off", T.LongType()),
           T.StructField("seg_tokens", T.LongType())])
    state_schema = T.StructType([T.StructField("cum", T.LongType())])

    def fold(key_vals, pdf_iter, state):
        cum = state.get[0] if state.exists else 0
        pdf = _trigger_pdf(pd, pdf_iter, sort_col=on)
        frames = []
        if pdf is not None and len(pdf):
            n = pdf["__n"].to_numpy(np.int64)
            doc = pdf[on].to_numpy()
            # exclusive integer prefix seeded by the carried state —
            # exact, so any chunking replays the batch cumsum bitwise
            cb = cum + np.cumsum(np.r_[np.int64(0), n])[:-1]
            k0 = cb // L
            k1 = np.where(n > 0, (cb + np.maximum(n, 1) - 1) // L, k0)
            counts = (k1 - k0 + 1).astype(np.int64)
            total = int(counts.sum())
            # per-document 0..counts-1 ramp -> overlapped sequence ids
            ramp = (np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(counts) - counts, counts))
            seq = np.repeat(k0, counts) + ramp
            cbr = np.repeat(cb, counts)
            nr = np.repeat(n, counts)
            doc_off = np.maximum(np.int64(0), seq * L - cbr)
            seg_end = np.minimum(nr, (seq + 1) * L - cbr)
            seg = np.where(nr > 0, seg_end - doc_off, np.int64(0))
            cum = int(cb[-1] + n[-1])
            res = pd.DataFrame({on: np.repeat(doc, counts)})
            for c, v in zip(key, key_vals):
                res[c] = np.repeat([v], total)
            res["seq_id"] = seq
            res["doc_off"] = doc_off
            res["seq_off"] = cbr + doc_off - seq * L
            res["seg_tokens"] = seg
            frames.append(res[[f.name for f in out_schema.fields]])
        state.update((int(cum),))
        yield from frames

    return (base.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))


def pack_bins_stream(stream: DataFrame, budget: int, tokens_col: str,
                     key: Sequence[str],
                     on: str = "doc_id") -> DataFrame:
    """Streaming twin of ``pipeline.sampling.pack_bins`` (next-fit
    capacity packing; ``key`` = the shard columns): per-key state is
    (open bin id, its fill), and a document's bin depends only on that
    running pair, so rows emit exactly once, immediately. The seeded
    fold replays the batch recurrence exactly — an in-order replay
    (ascending ``on`` within key) equals the batch operator BITWISE on
    all rows. Token-count semantics are ``sampling._tok_long``'s
    (NULL->0, truncate, negatives fail the query).

    .. note:: **Checkpoint compatibility** — the state schema gained a
       third field (``used``, the open bin's doc count) with the
       zero-token-doc fix; a query restarted from a checkpoint written
       by the two-field version will fail on the
       ``applyInPandasWithState`` state-schema mismatch. Start such
       queries with a fresh checkpoint directory."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..pipeline.sampling import _next_fit, _tok_long

    if budget <= 0:
        raise ValueError("budget must be positive")
    reserved = [c for c in stream.columns if c.startswith("__")]
    if reserved:
        raise ValueError(
            f"pack_bins_stream reserves '__'-prefixed columns for its "
            f"scratch state (would silently overwrite {reserved}); "
            f"rename them — same contract as the batch twin")
    key = list(key)
    bud = int(budget)
    base = stream.withColumn("__n", _tok_long(tokens_col))
    out_schema = T.StructType(
        [stream.schema[c] for c in key]
        + [stream.schema[on],
           T.StructField("bin_id", T.LongType())])
    state_schema = T.StructType([T.StructField("bin", T.LongType()),
                                 T.StructField("fill", T.LongType()),
                                 T.StructField("used", T.LongType())])

    def fold(key_vals, pdf_iter, state):
        b, fill, used = state.get if state.exists else (0, 0, 0)
        pdf = _trigger_pdf(pd, pdf_iter, sort_col=on)
        frames = []
        if pdf is not None and len(pdf):
            # the batch recurrence body, seeded with the carried state
            bins, b, fill, used = _next_fit(
                np, pdf["__n"].to_numpy(np.int64), bud, b, fill, used)
            res = pd.DataFrame({on: pdf[on].to_numpy()})
            for c, v in zip(key, key_vals):
                res[c] = v
            res["bin_id"] = bins
            frames.append(res[[f.name for f in out_schema.fields]])
        state.update((int(b), int(fill), int(used)))
        yield from frames

    return (base.groupBy(*key)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", "NoTimeout"))
