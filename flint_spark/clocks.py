"""Clock tables: evenly or randomly spaced tick streams.

Reference: ``timeseries/Clocks.scala:44-89`` builds clock
TimeSeriesRDDs (a table with only a ``time`` column; two sequential
ticks define an interval). Here a uniform clock is generated
distributively with ``spark.range`` (no driver materialization), and
carries its (begin, freq) so interval operators can take the pure
arithmetic bucketing fast path instead of a lookup join.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .timeseries import TIME_COLUMN, floor_div, parse_duration_ns


def _zone(tz: str | None):
    from zoneinfo import ZoneInfo

    return ZoneInfo(tz) if tz else timezone.utc


def _to_ns(value, tz: str | None = None) -> int:
    """Accept int ns, ISO date string, or datetime -> epoch ns.

    Naive datetimes and strings parse in ``tz`` (IANA name; default
    UTC) — the reference's ``timeZone`` parameter
    (``timeseries/Clocks.scala:38-83``): a clock built for an
    exchange calendar in ``America/New_York`` must tick at NY
    midnights, not silently-shifted UTC ones. Aware datetimes and raw
    ns ints are absolute already and ignore ``tz``."""
    if isinstance(value, int):
        return value
    if isinstance(value, datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=_zone(tz))
        return int(value.timestamp() * 1_000_000_000)
    if isinstance(value, str):
        for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y%m%d"):
            try:
                dt = datetime.strptime(value, fmt).replace(tzinfo=_zone(tz))
                return int(dt.timestamp() * 1_000_000_000)
            except ValueError:
                continue
    raise ValueError(f"cannot interpret {value!r} as a time")


@dataclass(frozen=True)
class UniformClock:
    """Uniform tick spec: ticks at begin, begin+freq, ... <= end (or < end)."""

    begin_ns: int
    end_ns: int
    frequency_ns: int
    offset_ns: int = 0
    end_inclusive: bool = True
    timestamp_type: bool = True  # emit TimestampType (µs) vs Long ns

    def __post_init__(self):
        # reference semantics: an offset larger than the frequency
        # wraps (offset % frequency) instead of dropping leading ticks
        # (``timeseries/Clocks.scala`` documents the modulo behavior;
        # r6 advice). Normalized HERE so every consumer — ticks_df and
        # the interval operators' arithmetic bucketing on
        # (begin_ns + offset_ns) — sees the same grid.
        if self.frequency_ns > 0 and not (
                0 <= self.offset_ns < self.frequency_ns):
            object.__setattr__(self, "offset_ns",
                               self.offset_ns % self.frequency_ns)

    def ticks_df(self, spark: SparkSession) -> DataFrame:
        start = self.begin_ns + self.offset_ns
        stop = self.end_ns + (1 if self.end_inclusive else 0)
        rng = spark.range(start, stop, self.frequency_ns)
        if self.timestamp_type:
            # floor_div, not (x/1000).cast: double division is lossy for
            # epoch-ns magnitudes (~1.7e18 > 2^53)
            tick = F.timestamp_micros(floor_div(F.col("id"), 1000))
        else:
            tick = F.col("id")
        return rng.select(tick.alias(TIME_COLUMN))


def uniform(begin, end, frequency: str | int, offset: str | int = 0,
            end_inclusive: bool = True, timestamp_type: bool = True,
            tz: str | None = None) -> UniformClock:
    return UniformClock(
        begin_ns=_to_ns(begin, tz),
        end_ns=_to_ns(end, tz),
        frequency_ns=parse_duration_ns(frequency),
        offset_ns=parse_duration_ns(offset) if offset else 0,
        end_inclusive=end_inclusive,
        timestamp_type=timestamp_type,
    )


def random(spark: SparkSession, begin, end, frequency: str | int,
           seed: int = 42, timestamp_type: bool = True,
           tz: str | None = None) -> DataFrame:
    """Random ticks: one tick uniformly placed in each frequency bucket
    (reference ``timeseries/clock/Clock.scala``). Deterministic per seed.

    The jitter is a pure md5 function of (seed, bucket start) — NOT
    ``F.rand(seed)``, whose output depends on the physical partition
    layout and so differs across cluster sizes. This form is identical
    on any layout and replayable in ANSI SQL (DuckDB oracle)."""
    b, e, f = _to_ns(begin, tz), _to_ns(end, tz), parse_duration_ns(frequency)
    rng = spark.range(b, e, f)
    h = F.conv(F.substring(F.md5(F.concat(
        F.lit(f"ck{seed}:"), F.col("id").cast("string"))), 1, 12), 16, 10)
    ticks = F.col("id") + F.pmod(h.cast("long"), F.lit(f))
    if timestamp_type:
        tick = F.timestamp_micros(floor_div(ticks, 1000))
    else:
        tick = ticks
    return rng.select(tick.alias(TIME_COLUMN)).sort(TIME_COLUMN)


def business(spark: SparkSession, begin, end, frequency: str | int = "1d",
             weekend: tuple[int, ...] = (6, 7),
             holidays: tuple[str, ...] = (),
             timestamp_type: bool = True,
             tz: str | None = None) -> DataFrame:
    """Business-calendar ticks: the uniform clock with weekend
    days-of-week (ISO: 1=Monday .. 7=Sunday) and explicit holiday
    DATES removed — the trading-calendar shape the reference's users
    build clock tables for (``Clocks.scala`` only ships uniform/
    random; a calendar mask composes on top exactly like this).
    Generated distributively from ``spark.range`` like the uniform
    clock (no driver materialization); the mask is a pure dayofweek/
    to_date projection, so Catalyst prunes it into the range scan.
    Sub-daily frequencies keep only ticks landing on business days
    (the overnight ticks of a 6h clock on a Saturday drop).

    ``tz`` (IANA name) makes the whole clock LOCAL: the tick grid
    steps by ``frequency`` in the zone's WALL time (a daily NY clock
    ticks every NY midnight — 23h or 25h of absolute time across DST
    transitions, the actual trading-calendar contract), weekend /
    holiday masks evaluate on that wall time, and only the final
    emitted instants convert to UTC. Evaluating masks on a FIXED-UTC
    grid instead would misclassify every tick after a fall-back
    transition (a 24h-UTC step lands at 23:00 of the previous local
    day, so Mondays drop as 'Sunday' and holidays slip a day)."""
    # grid arithmetic and masks run on NAIVE local wall-clock ns
    # (tz-independent); the tz enters only in the final wall->instant
    # conversion, so there is no drift for the grid to accumulate.
    # Absolute bounds (aware datetimes, raw epoch ns) would silently
    # shift by the UTC offset when reinterpreted as wall time — reject
    # them rather than guess (r6 advice)
    if tz:
        for v in (begin, end):
            if isinstance(v, int) or (isinstance(v, datetime)
                                      and v.tzinfo is not None):
                raise ValueError(
                    "business(tz=...) interprets begin/end as LOCAL "
                    "wall time; pass a naive datetime or a date string "
                    "(an aware datetime / raw epoch-ns is an absolute "
                    "instant and would shift by the UTC offset)")
    b, e, f = _to_ns(begin), _to_ns(end), parse_duration_ns(frequency)
    rng = spark.range(b, e + 1, f)
    wall = F.timestamp_micros(floor_div(F.col("id"), 1000))
    dow = F.dayofweek(wall)  # Spark: 1=Sunday .. 7=Saturday
    iso = F.when(dow == 1, F.lit(7)).otherwise(dow - 1)
    keep = ~iso.isin(list(weekend))
    if holidays:
        # compare as ISO strings: isin takes literal VALUES, and the
        # string form needs no implicit date coercion to replay in SQL
        keep = keep & ~F.to_date(wall).cast("string").isin(list(holidays))
    out = rng.filter(keep)
    instant = F.to_utc_timestamp(wall, tz) if tz else wall
    if timestamp_type:
        tick = instant
    else:
        tick = (F.unix_micros(instant) * F.lit(1000)) if tz \
            else F.col("id")
    return out.select(tick.alias(TIME_COLUMN))
