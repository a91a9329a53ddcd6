"""Time-window specifications.

``past_absolute_time`` / ``future_absolute_time`` mirror the reference
factory (reference ``timeseries/Windows.scala:32-50``): close-close
windows [t-d, t] / [t, t+d]. They compile to Spark
``Window.rangeBetween`` bounds over an epoch-ns ordering column —
Spark's rangeBetween bounds are inclusive at both ends, matching the
reference's close-close semantics
(reference ``rdd/function/window/SummarizeWindows.scala:178-183``).
"""

from __future__ import annotations

from dataclasses import dataclass

from .timeseries import parse_duration_ns


@dataclass(frozen=True)
class TimeWindow:
    """Inclusive window [lower_ns, upper_ns] relative to each row's time."""

    lower_ns: int
    upper_ns: int
    name: str

    def range_bounds(self) -> tuple[int, int]:
        return (self.lower_ns, self.upper_ns)


def past_absolute_time(duration: str | int) -> TimeWindow:
    ns = parse_duration_ns(duration)
    return TimeWindow(-ns, 0, f"past_{duration}")


def future_absolute_time(duration: str | int) -> TimeWindow:
    ns = parse_duration_ns(duration)
    return TimeWindow(0, ns, f"future_{duration}")
