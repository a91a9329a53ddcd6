"""Per-row time-window aggregation.

Reference ``summarizeWindows``/``addWindows``
(``timeseries/TimeSeriesRDD.scala:919-950,1128-1158``) build a 1000-LoC
custom overlap/flipper machinery (``rdd/function/window/SummarizeWindows.scala``)
to evaluate a close-close time window around every row without a
shuffle. Spark's ``WindowExec`` already evaluates range frames
incrementally (O(n) per partition for subtractable aggregates), so the
whole operator is ``agg_expr.over(Window.partitionBy(key)
.orderBy(time_ns).rangeBetween(lo, hi))`` — one shuffle on the key,
matching the reference's [t+lo, t+hi] inclusive-bounds semantics.
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


def summarize_windows(df: DataFrame, window: TimeWindow, summarizer: Summarizer,
                      key: Sequence[str] = ()) -> DataFrame:
    w = _range_window(df, window, list(key))
    return df.withColumns(dict(summarizer.over_exprs(df, w)))


def add_windows(df: DataFrame, window: TimeWindow, key: Sequence[str] = ()) -> DataFrame:
    """Adds ``window_<name>`` = array of member-row structs
    (reference emits Array[Struct] of the rows in each row's window)."""
    w = _range_window(df, window, list(key))
    members = F.collect_list(F.struct(*[F.col(c) for c in df.columns])).over(w)
    return df.withColumn(f"window_{window.name}", members)
