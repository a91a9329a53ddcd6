"""Deterministic test-data generator (reference ``TimeSeriesGenerator``,
``timeseries/TimeSeriesGenerator.scala:17-122``): cycles at a fixed
frequency over [begin, end], an id panel per cycle (optionally
subsampled), seeded random measure columns. Fully distributed
(``spark.range`` + md5-derived uniforms) — no driver data, and the
values are a pure function of (seed, cycle, id): identical on any
partition layout (``F.rand(seed)`` is not) and replayable in ANSI SQL
(the 48-bit md5 fraction divides a power of two, so the double is
exact in every engine)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..clocks import _to_ns
from ..timeseries import TIME_COLUMN, floor_div, parse_duration_ns


def generate(spark: SparkSession, begin, end, frequency: str | int,
             ids: Sequence[int] = (1, 2, 3, 4, 5),
             columns: Sequence[str] = ("x1", "x2"),
             id_ratio: float = 1.0, seed: int = 42,
             timestamp_type: bool = False) -> DataFrame:
    b, e, f = _to_ns(begin), _to_ns(end), parse_duration_ns(frequency)

    def u01(salt: str) -> F.Column:
        h = F.conv(F.substring(F.md5(F.concat(
            F.lit(salt), F.col("__tns").cast("string"), F.lit(":"),
            F.col("id").cast("string"))), 1, 12), 16, 10).cast("long")
        return h / F.lit(float(1 << 48))

    base = spark.range(b, e + 1, f).select(F.col("id").alias("__tns"))
    panel = base.select("__tns", F.explode(F.array(
        *[F.lit(i) for i in ids])).alias("id"))
    if id_ratio < 1.0:
        panel = panel.filter(u01(f"g{seed}s:") < id_ratio)
    for i, c in enumerate(columns):
        panel = panel.withColumn(c, u01(f"g{seed}c{i}:"))
    time_col = (F.timestamp_micros(floor_div(F.col("__tns"), 1000))
                if timestamp_type else F.col("__tns").cast("long"))
    return panel.select(time_col.alias(TIME_COLUMN), "id", *columns)
