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


def dedup_stream(stream: DataFrame, subset: Sequence[str],
                 watermark: str = "10 minutes",
                 time_column: str = TIME_COLUMN) -> DataFrame:
    """Streaming exact dedup within the watermark horizon — the
    streaming face of ``pipeline.dedup.exact_duplicate_groups``."""
    return (stream.withWatermark(time_column, watermark)
            .dropDuplicatesWithinWatermark(list(subset)))
