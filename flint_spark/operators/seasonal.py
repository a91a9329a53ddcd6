"""Seasonal decomposition (classical additive, STL-lite).

``x = trend + seasonal + residual`` over an irregular time series:
trend is a centered time-window mean (the classical moving average,
generalized to irregular spacing as a range frame), the seasonal
component is the per-phase mean of the detrended series centered to
sum to zero across phases, and the residual is what remains — the
anomaly-detection / deseasonalization primitive behind capacity
planning and calendar-effect removal.

Spark-first shape: ONE keyed exchange drives both the trend window and
the (key, phase) aggregation (HashPartitioning(key) already satisfies
ClusteredDistribution(key, phase)); the phase table is period-bounded
(key-count x period rows), so the join back is AQE-broadcast at any
corpus size. Zero Python. The whole algebra replays in SQL.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..timeseries import parse_duration_ns, time_ns_expr

__all__ = ["seasonal_decompose"]


def seasonal_decompose(df: DataFrame, column: str, period: int,
                       unit: str | int = "1d",
                       key: Sequence[str] = ()) -> DataFrame:
    """Additive decomposition with a ``period``-slot cycle of width
    ``unit`` (e.g. period=7, unit='1d' for day-of-week; period=24,
    unit='1h' for hour-of-day). Adds ``<column>_trend``,
    ``<column>_seasonal``, ``<column>_resid`` and ``__phase``.

    Conventions (documented, oracle-pinned): trend is the mean over
    the centered time window [t - floor(p/2)*unit, t + floor(p/2)*unit]
    (the irregular-series generalization of the classical centered MA);
    phase = floor(epoch / unit) mod period; seasonal components are
    centered so the simple mean of the per-phase means is zero per key.
    Null values get null trend contribution skipped (window avg
    null-skips) and null seasonal/residual rows.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    unit_ns = parse_duration_ns(unit)
    half = (period // 2) * unit_ns
    keyc = [F.col(c) for c in key]
    tns = time_ns_expr(df)

    w_trend = (Window.partitionBy(*keyc).orderBy(tns)
               .rangeBetween(-half, half))
    # NaN == null here (EWMA-family contract): a raw NaN would poison
    # every window mean whose frame contains it
    x = F.when(~F.isnan(F.col(column).cast("double")), F.col(column))
    d = df.withColumns({
        "__phase": F.pmod(F.floor(tns / F.lit(unit_ns)),
                          F.lit(period)).cast("int"),
        f"{column}_trend": F.avg(x).over(w_trend),
    })
    detr = x - F.col(f"{column}_trend")
    # phase means reuse the key partitioning (no new exchange); the
    # result is period-bounded per key
    pm = (d.select(*keyc, "__phase", detr.alias("__detr"))
          .groupBy(*keyc, "__phase")
          .agg(F.avg("__detr").alias("__pmean")))
    grand = Window.partitionBy(*keyc)
    pm = pm.withColumn("__seasonal",
                       F.col("__pmean") - F.avg("__pmean").over(grand)) \
           .drop("__pmean")
    out = d.join(pm, [*key, "__phase"], "left")
    seasonal = F.when(x.isNotNull(), F.col("__seasonal"))
    return (out
            .withColumn(f"{column}_seasonal", seasonal)
            .withColumn(f"{column}_resid",
                        x - F.col(f"{column}_trend") - seasonal)
            .drop("__seasonal"))
