"""flint_spark — a PySpark-native time-series analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of
twosigma/flint (reference at /root/reference) on modern PySpark:
DataFrame/Catalyst-first, Arrow-batched pandas UDFs only where the
semantics are genuinely order-dependent, plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).
"""

from . import clocks, summarizers, windows
from . import compat  # noqa: F401 — installs the camelCase reference aliases
from .context import FlintContext
from .session import get_spark
from .timeseries import TimeSeriesDataFrame, canonize, parse_duration_ns, time_ns_expr

__all__ = [
    "FlintContext",
    "TimeSeriesDataFrame",
    "canonize",
    "clocks",
    "get_spark",
    "parse_duration_ns",
    "summarizers",
    "time_ns_expr",
    "windows",
]

__version__ = "0.7.0"  # single source of truth is pyproject.toml
