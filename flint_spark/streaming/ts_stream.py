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
        for pdf in pdf_iter:
            pdf = pdf.sort_values("__tns", kind="stable")
            t = pdf["__tns"].to_numpy(dtype=np.int64)
            x = pdf[column].to_numpy(dtype=np.float64)
            n = len(x)
            if n == 0:
                continue
            steps = np.empty(n, dtype=np.float64)
            steps[0] = lam * (t[0] - last_tns) if last_tns is not None else 0.0
            steps[1:] = lam * np.diff(t).astype(np.float64)
            out = _affine_scan(steps, x)
            if last_tns is not None and e != 0.0:
                with np.errstate(under="ignore"):
                    out = out + e * np.exp(-np.cumsum(steps))
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
