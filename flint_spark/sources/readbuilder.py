"""Fluent reader facade mirroring the reference's ReadBuilder
(``timeseries/io/read/ReadBuilder.scala:37-290``,
``python/ts/flint/readwriter.py:30-456``):

    ts = (TSRead(spark).option("mergeSchema", "true")
          .range("2024-01-01", "2025-01-01")
          .time_column("ts")
          .parquet("/data/events"))

``.range(begin, end)`` prunes [begin, end) — pushed to the parquet scan
by Catalyst (the reference's DFBetween, 10x pruning claim). ``.clock``
expands into a generated uniform clock instead of reading files.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


from .. import clocks as clocks_mod
from ..timeseries import TIME_COLUMN, TimeSeriesDataFrame, parse_duration_ns


class TSRead:
    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._options: dict[str, Any] = {}
        self._begin = None
        self._end = None
        self._time_column = TIME_COLUMN
        self._time_unit: str | None = None
        self._timezone: str | None = None
        self._columns = None
        self._expand_begin = 0
        self._expand_end = 0

    def option(self, key: str, value) -> "TSRead":
        self._options[key] = value
        return self

    def options(self, **kv) -> "TSRead":
        self._options.update(kv)
        return self

    def range(self, begin, end, timezone: str | None = None) -> "TSRead":
        """[begin, end) time pruning, begin-inclusive end-exclusive
        (reference ``DFBetween``, ``TimeSeriesRDD.scala:199-232``).
        ``timezone`` (IANA name) parses naive begin/end strings or
        datetimes in that zone (reference ``readwriter.py:118``
        ``range(begin, end, timezone='UTC')``); bounds stay literal, so
        the prune still pushes to the scan."""
        self._begin, self._end = begin, end
        self._timezone = timezone
        return self

    def expand(self, begin: str | int | None = None,
               end: str | int | None = None) -> "TSRead":
        """Widen the ``range`` by a duration on either side (reference
        ``ReadBuilder.expand``, ``io/read/ReadBuilder.scala:126-146``;
        python ``readwriter.py:174``): the effective scan range becomes
        ``[begin - expand_begin, end + expand_end)``. The canonical use
        is priming an as-of join — reading ``[b, e)`` expanded by the
        join tolerance on the left edge so rows near ``b`` still find
        their backward match. Both prunes stay pushed to the parquet
        scan; only the literal bound changes."""
        self._expand_begin = parse_duration_ns(begin) if begin is not None else 0
        self._expand_end = parse_duration_ns(end) if end is not None else 0
        return self

    def columns(self, *cols: str) -> "TSRead":
        self._columns = list(cols)
        return self

    def time_column(self, name: str, unit: str | None = None) -> "TSRead":
        self._time_column, self._time_unit = name, unit
        return self

    def _finish(self, df) -> TimeSeriesDataFrame:
        def bound(value, shift_ns: int = 0):
            # long time columns hold epoch-ns: convert date strings/datetimes
            dtype = dict(df.dtypes).get(self._time_column, "")
            is_long = dtype in ("bigint", "long", "int")
            tz = self._timezone
            if isinstance(value, int) and shift_ns == 0:
                return F.lit(value)
            if is_long:
                ns = value if isinstance(value, int) \
                    else clocks_mod._to_ns(value, tz)
                return F.lit(ns + shift_ns)
            if tz and not isinstance(value, int) and dtype != "date":
                # non-UTC zone: resolve to the absolute instant
                # driver-side (engine convention: session TZ is UTC and
                # every timestamp — NTZ included — denotes a UTC
                # instant, so timestamp_micros IS the bound); still a
                # literal, still pushed. DATE columns skip this: a date
                # has no intra-day resolution, so the zone cannot move
                # day membership — the plain date literal keeps the
                # filter pushed as a date predicate (an instant bound
                # would force a cast and drop day-boundary rows)
                us = (clocks_mod._to_ns(value, tz) + shift_ns) // 1000
                return F.timestamp_micros(F.lit(us))
            if shift_ns == 0:
                return F.lit(value)
            # native timestamp/date bound: shift the unshifted literal by a
            # Spark interval so shifted and unshifted bounds agree in ANY
            # session timezone (ADVICE r2 — a naive datetime rebuilt from
            # epoch is reinterpreted in spark.sql.session.timeZone).
            # Catalyst constant-folds literal+interval, so the pruned scan
            # still sees a literal bound.
            us = shift_ns // 1000
            return (F.lit(value).cast(dtype)
                    + F.expr(f"INTERVAL '{us}' MICROSECOND"))

        if self._begin is not None:
            df = df.filter(F.col(self._time_column)
                           >= bound(self._begin, -self._expand_begin))
        if self._end is not None:
            df = df.filter(F.col(self._time_column)
                           < bound(self._end, self._expand_end))
        if self._columns is not None:
            keep = [self._time_column] + [c for c in self._columns
                                          if c != self._time_column]
            df = df.select(*keep)
        return TimeSeriesDataFrame.from_df(df, time_column=self._time_column,
                                           time_unit=self._time_unit)

    def parquet(self, *paths: str) -> TimeSeriesDataFrame:
        """Accepts multiple paths like the reference
        (``readwriter.py:366`` ``parquet(*paths)``)."""
        return self._finish(
            self._spark.read.options(**self._options).parquet(*paths))

    def csv(self, path: str, schema=None, header: bool = True) -> TimeSeriesDataFrame:
        reader = self._spark.read.options(header=header, **self._options)
        df = reader.csv(path, schema=schema) if schema else \
            reader.option("inferSchema", True).csv(path)
        return self._finish(df)

    def json(self, path: str, schema=None) -> TimeSeriesDataFrame:
        return self._finish(self._spark.read.options(**self._options)
                            .json(path, schema=schema))

    def dataframe(self, df) -> TimeSeriesDataFrame:
        return self._finish(df)

    def pandas(self, pdf) -> TimeSeriesDataFrame:
        return self._finish(self._spark.createDataFrame(pdf))

    def clock(self, kind, frequency=None, offset=None,
              end_inclusive: bool = True, begin=None, end=None,
              seed: int = 42) -> TimeSeriesDataFrame:
        """Clock over the reader's range: ``clock('uniform', '30s',
        offset, end_inclusive)`` — the reference call shape, kind
        first (``readwriter.py:199``) — or the one-arg shorthand
        ``clock('30s')`` (kind defaults to uniform). Kinds:
        ``uniform`` | ``random`` (md5-jittered, ``seed=``). The
        range's ``timezone`` applies to the begin/end parse.

        The pre-r6 positional shape ``clock('30s', begin, end)`` is
        still accepted: a duration-like first argument with more
        positionals shifts them into (begin, end) — the r6 reorder
        (kind first, matching the reference) was otherwise a silent
        API break for existing callers (r6 advice)."""
        if frequency is None:
            kind, frequency = "uniform", kind
        elif kind not in ("uniform", "random"):
            from ..timeseries import parse_duration_ns
            try:
                parse_duration_ns(kind)
            except (ValueError, TypeError):
                raise ValueError(f"unknown clock kind {kind!r} "
                                 f"(supported: uniform, random)") from None
            # legacy shape: clock(frequency, begin, end)
            legacy_begin, legacy_end = frequency, offset
            kind, frequency, offset = "uniform", kind, None
            if begin is None:
                begin = legacy_begin
            if end is None:
                end = legacy_end
        if kind not in ("uniform", "random"):
            raise ValueError(f"unknown clock kind {kind!r} "
                             f"(supported: uniform, random)")
        b = begin if begin is not None else self._begin
        e = end if end is not None else self._end
        if b is None or e is None:
            raise ValueError("clock() needs a range: .range(begin, end)")
        if kind == "random":
            ticks = clocks_mod.random(self._spark, b, e, frequency,
                                      seed=seed, tz=self._timezone)
            return TimeSeriesDataFrame(ticks)
        ck = clocks_mod.uniform(b, e, frequency, offset or 0,
                                end_inclusive=end_inclusive,
                                tz=self._timezone)
        return TimeSeriesDataFrame(ck.ticks_df(self._spark))
