"""Holt-Winters additive triple exponential smoothing.

Completes the smoothing family (EWMA -> Brown double -> Holt-Winters):
level + trend + a ``period``-slot additive seasonal vector, updated per
observation,

    l_i = a (x_i - s[p_i]) + (1-a)(l_{i-1} + b_{i-1})
    b_i = B (l_i - l_{i-1}) + (1-B) b_{i-1}
    s[p_i] += g (x_i - l_i) - g s[p_i]          (other slots unchanged)

with phase ``p_i = floor(epoch_i / unit) mod period`` (the same phase
convention as `operators.seasonal`). Deterministic init: the first
observed row sets l = x, b = 0, s = zeros (oracle-replayed verbatim).

The recursion's state is a (2 + period)-float vector per key — not
window algebra, so the per-key scan rides the complete-group Arrow
engine like `kalman`, and the oracle replays it EXACTLY as a DuckDB
recursive CTE carrying the seasonal vector as a LIST column.

Null/NaN observations freeze the state and score null (family
contract). Per-observation recursion: gaps do not decay the state —
resample onto a uniform clock first if slots must stay calendar-true.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..timeseries import parse_duration_ns, time_ns_expr

__all__ = ["holt_winters"]


def _hw_scan_factory(alpha: float, beta: float, gamma: float,
                     period: int, unit_ns: int):
    def scan(t, x, state=None):
        if state is None:
            init, level, trend, seas = False, 0.0, 0.0, [0.0] * period
        else:
            init, level, trend, seas = state
        seas = np.asarray(seas, dtype=np.float64).copy()
        n = len(x)
        out_l = np.empty(n)
        out_b = np.empty(n)
        out_f = np.empty(n)
        for i in range(n):
            xi = x[i]
            if np.isnan(xi):
                out_l[i] = out_b[i] = out_f[i] = np.nan
                continue
            p = int((t[i] // unit_ns) % period)
            if not init:
                init, level, trend = True, xi, 0.0
            else:
                prev_l = level
                level = (alpha * (xi - seas[p])
                         + (1.0 - alpha) * (level + trend))
                trend = beta * (level - prev_l) + (1.0 - beta) * trend
                seas[p] = gamma * (xi - level) + (1.0 - gamma) * seas[p]
            out_l[i], out_b[i], out_f[i] = level, trend, level + seas[p]
        return (out_l, out_b, out_f), (init, float(level), float(trend),
                                       [float(v) for v in seas])

    return scan


def holt_winters(df: DataFrame, column: str, period: int,
                 alpha: float = 0.3, beta: float = 0.1,
                 gamma: float = 0.1, unit: str | int = "1d",
                 key: Sequence[str] = ()) -> DataFrame:
    """Adds ``<column>_hw_level``, ``<column>_hw_trend`` and
    ``<column>_hw`` (level + the just-updated seasonal of the row's
    phase — the in-sample fit; forecast h steps with
    ``level + h*trend + seas[phase(t+h)]`` downstream). One keyed
    exchange; (time, value) tie order matches the EMA engines."""
    for name, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"{name}={v} outside [0, 1]")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    unit_ns = parse_duration_ns(unit)
    scan = _hw_scan_factory(float(alpha), float(beta), float(gamma),
                            int(period), unit_ns)
    key = list(key)
    with_ns = df.withColumn("__tns", time_ns_expr(df))
    in_cols = list(df.columns)
    schema = T.StructType(list(df.schema.fields) + [
        T.StructField(f"{column}_hw_level", T.DoubleType()),
        T.StructField(f"{column}_hw_trend", T.DoubleType()),
        T.StructField(f"{column}_hw", T.DoubleType())])
    names = [f"{column}_hw_level", f"{column}_hw_trend", f"{column}_hw"]

    if key:
        from ..functions import _complete_group_batches, _group_boundaries

        def run(batches):
            for head in _complete_group_batches(batches, key):
                head = head.reset_index(drop=True)
                t_all = head["__tns"].to_numpy(np.int64)
                x_all = head[column].to_numpy(np.float64)
                outs = [np.empty(len(head)) for _ in range(3)]
                segs = _group_boundaries(np, head, key).tolist() \
                    + [len(head)]
                for s0, s1 in zip(segs, segs[1:]):
                    vals, _ = scan(t_all[s0:s1], x_all[s0:s1])
                    for o, v in zip(outs, vals):
                        o[s0:s1] = v
                res = head[in_cols].copy()
                for nm, o in zip(names, outs):
                    res[nm] = o
                yield res

        arranged = (with_ns.repartition(*[F.col(k) for k in key])
                    .sortWithinPartitions(
                        *key, F.col("__tns").asc_nulls_last(),
                        F.col(column).asc_nulls_last()))
        return arranged.mapInPandas(run, schema)

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__tns", column], kind="stable")
        (ol, ob, of), _ = scan(pdf["__tns"].to_numpy(np.int64),
                               pdf[column].to_numpy(np.float64))
        for nm, o in zip(names, (ol, ob, of)):
            pdf[nm] = o
        return pdf[in_cols + names]

    return with_ns.groupBy().applyInPandas(compute, schema)
