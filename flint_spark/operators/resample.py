"""Grid resampling: project irregular observations onto a clock grid.

The reference's recipe for this is a clock table + ``leftJoin``
(README's clock examples); ``resample`` packages it with three fill
methods. Plans stay in the engine's as-of machinery — one data
exchange per direction, no Python:

- ``ffill``: most recent observation at or before each tick
  (backward as-of join against the grid);
- ``nearest``: closest observation within tolerance (both-direction
  single-exchange :func:`~flint_spark.operators.asof.nearest_join`);
- ``linear``: straight-line interpolation between the enclosing
  observations; a tick exactly on an observation takes its value, a
  tick before the first / after the last observation is null (the
  pandas ``interpolate`` boundary convention).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..clocks import UniformClock
from ..timeseries import TIME_COLUMN, parse_duration_ns, time_ns_expr
from . import asof

_OBS = "__obs_time"


def _grid(spark: SparkSession, clock: UniformClock, df: DataFrame,
          key: Sequence[str]) -> DataFrame:
    ticks = clock.ticks_df(spark)
    if not key:
        return ticks
    # per-key grid: every key gets every tick (ticks broadcast — they
    # are the small side by construction)
    return df.select(*key).distinct().crossJoin(F.broadcast(ticks))


def resample(df: DataFrame, clock: UniformClock, value_col: str,
             key: Sequence[str] = (), method: str = "ffill",
             tolerance: str | int = "36500d") -> DataFrame:
    """One row per (clock tick [, key]) with ``<value_col>`` filled by
    ``method``. ``tolerance`` bounds how far a fill may reach
    (ffill/nearest; linear is bounded by its enclosing observations)."""
    key = list(key)
    spark = df.sparkSession
    grid = _grid(spark, clock, df, key)
    obs = df.select(TIME_COLUMN, *key,
                    F.col(value_col),
                    time_ns_expr(df).alias(_OBS))
    if method == "ffill":
        out = asof.left_join(grid, obs, tolerance=tolerance, key=key)
        return out.select(TIME_COLUMN, *key, value_col)
    if method == "nearest":
        out = asof.nearest_join(grid, obs, tolerance=tolerance, key=key)
        return out.select(TIME_COLUMN, *key, value_col)
    if method != "linear":
        raise ValueError(f"unknown resample method {method!r}")
    # single-pass: ONE union + ONE data exchange with both window
    # directions (the nearest_join plan) instead of two separate as-of
    # joins re-joined on (time, key) — which costs 6 exchanges where
    # this costs the grid build + one
    from pyspark.sql import Window

    from .asof import _RROW, _SRC, _TNS, _prepare

    tol = parse_duration_ns(tolerance)
    key2, _, _, _, _, l, r = _prepare(grid, obs, key, None, None)
    l = l.withColumn(_SRC, F.lit(1))
    r = r.withColumn(_SRC, F.lit(0))
    u = l.unionByName(r)
    wb = (Window.partitionBy(*key2).orderBy(_TNS, _SRC, F.col(_RROW))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(*key2).orderBy(F.desc(_TNS), _SRC, F.col(_RROW))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (u.withColumn("__b", F.last(_RROW, ignorenulls=True).over(wb))
         .withColumn("__f", F.last(_RROW, ignorenulls=True).over(wf))
         .filter(F.col(_SRC) == 1))
    t = F.col(_TNS)
    tb = F.col("__b")["__rtime"]
    tf = F.col("__f")["__rtime"]
    vb = F.col("__b")[value_col]
    vf = F.col("__f")[value_col]
    b_ok = F.coalesce(tb >= t - F.lit(tol), F.lit(False))
    f_ok = F.coalesce(tf <= t + F.lit(tol), F.lit(False))
    # tick-on-observation => tb == t (backward matched at distance 0)
    frac = (t - tb).cast("double") / (tf - tb).cast("double")
    val = (F.when(b_ok & (tb == t), vb)
           .when(b_ok & f_ok, vb + (vf - vb) * frac))
    return u.select(TIME_COLUMN, *key, val.alias(value_col))
