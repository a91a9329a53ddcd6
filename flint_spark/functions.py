"""User-defined aggregation over cycles, intervals and windows.

The reference routes Python UDFs through a custom Arrow batch protocol
(``ts.flint.functions.udf``, reference ``python/ts/flint/functions.py:31-196``,
``dataframe.py:729-1491``). PySpark ships Arrow natively, so the whole
machinery collapses to ``applyInPandas`` / pandas UDFs:

- ``summarize_cycles_udf`` / ``summarize_intervals_udf`` — one pandas
  DataFrame per group in, one row out;
- ``add_columns_for_cycle_udf`` — cardinality-preserving per-cycle fn
  (see ``operators.cycles.add_columns_for_cycle``);
- ``summarize_windows_udf`` — per-row window aggregation with a pandas
  fn: materializes each row's window as an array column and applies an
  Arrow-batched UDF over it. Memory is O(rows x window) — fine for
  bounded windows; use built-in summarizers (WindowExec, O(n)) wherever
  the aggregate is expressible.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .timeseries import TIME_COLUMN
from .windows import TimeWindow


def summarize_cycles_udf(df: DataFrame, fn: Callable[[pd.DataFrame], Mapping],
                         out_schema: str | T.StructType,
                         key: Sequence[str] = ()) -> DataFrame:
    """Aggregate each cycle with a pandas function returning a dict of
    scalars. Output: (time, *key, **fn outputs)."""
    key = list(key)
    if isinstance(out_schema, str):
        out_schema = T.StructType.fromDDL(out_schema)
    group_cols = [TIME_COLUMN] + key
    full = T.StructType(
        [df.schema[c] for c in group_cols] + list(out_schema.fields))

    def apply(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        res = dict(zip(group_cols, keys))
        res.update(fn(pdf))
        return pd.DataFrame([res], columns=[f.name for f in full.fields])

    return df.groupBy(*group_cols).applyInPandas(apply, full)


def summarize_intervals_udf(df: DataFrame, clock, fn, out_schema,
                            key: Sequence[str] = (), inclusion: str = "begin",
                            rounding: str = "end") -> DataFrame:
    from .operators.intervals import _INTERVAL, _interval_time_col, intervalize

    bucketed = intervalize(df, clock, inclusion, rounding)
    bucketed = bucketed.withColumn(TIME_COLUMN, _interval_time_col(bucketed)) \
                       .drop(_INTERVAL)
    return summarize_cycles_udf(bucketed, fn, out_schema, key)


def summarize_windows_udf(df: DataFrame, window: TimeWindow,
                          fn: Callable[[pd.DataFrame], float],
                          out_name: str, key: Sequence[str] = (),
                          out_type: T.DataType = T.DoubleType()) -> DataFrame:
    """Per-row pandas aggregation of the row's time window.

    Plan: collect_list(struct(*)) over the range frame (WindowExec), then
    an Arrow-batched pandas UDF maps each window-array to a scalar.
    Replaces the reference's 460-LoC Arrow window-batch machinery
    (``summarizeWindowBatches``, ``TimeSeriesRDD.scala:1648-1748``)."""
    from .operators.windows_ops import _range_window

    w = _range_window(df, window, list(key))
    data_cols = [c for c in df.columns]
    arr = F.collect_list(F.struct(*[F.col(c) for c in data_cols])).over(w)

    @F.pandas_udf(out_type)
    def apply(windows: pd.Series) -> pd.Series:
        return windows.map(lambda rows: fn(pd.DataFrame(list(rows))))

    return df.withColumn(out_name, apply(arr))
