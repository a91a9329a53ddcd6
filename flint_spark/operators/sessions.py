"""Sessionization: split per-key event streams on inactivity gaps.

Batch analogue of Structured Streaming's ``session_window`` (which
``flint_spark.streaming`` uses for the streaming path): a lag +
conditional-cumsum over one keyed window — one shuffle, O(n) scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..timeseries import TIME_COLUMN, parse_duration_ns, time_ns_expr


def sessionize(df: DataFrame, gap: str | int = "30m",
               key: Sequence[str] = ()) -> DataFrame:
    """Adds ``session_id`` (0-based per key), new session when the gap
    from the previous event exceeds ``gap``."""
    gap_ns = parse_duration_ns(gap)
    key = list(key)
    w = Window.partitionBy(*key).orderBy(time_ns_expr(df))
    tns = time_ns_expr(df)
    prev = F.lag(tns).over(w)
    new_sess = F.when(prev.isNull() | ((tns - prev) > F.lit(gap_ns)), 1).otherwise(0)
    cum = Window.partitionBy(*key).orderBy(tns) \
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", (F.sum(new_sess).over(cum) - 1).cast("long"))


def session_stats(df: DataFrame, gap: str | int = "30m",
                  key: Sequence[str] = ()) -> DataFrame:
    """One row per session: start/end time, event count, duration seconds."""
    key = list(key)
    s = sessionize(df, gap, key)
    tns = time_ns_expr(s)
    return (
        s.groupBy(*key, "session_id")
        .agg(
            F.min(TIME_COLUMN).alias("session_start"),
            F.max(TIME_COLUMN).alias("session_end"),
            F.count("*").alias("n_events"),
            ((F.max(tns) - F.min(tns)) / F.lit(1_000_000_000.0)).alias("duration_s"),
        )
    )
