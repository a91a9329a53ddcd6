"""``ts.flint`` — reference-compatible namespace over flint_spark.

The reference's Python bindings live at ``python/ts/flint/__init__.py``
(exports FlintContext, TimeSeriesDataFrame, udf) with sibling modules
``summarizers``, ``windows``, ``clocks``. This mirror re-exports the
flint_spark equivalents so a reference user's imports run verbatim::

    from ts.flint import FlintContext, summarizers, windows
    fc = FlintContext(sqlContext)
    df = fc.read.dataframe(spark_df)
    joined = df.leftJoin(other, tolerance='1d', key='id')
    means = df.summarizeCycles(summarizers.mean('price'))

The camelCase method surface is installed by ``flint_spark.compat``
(imported transitively here).
"""

from flint_spark import clocks, summarizers, windows  # noqa: F401
from flint_spark.compat import FlintContext  # noqa: F401
from flint_spark.functions import udf  # noqa: F401
from flint_spark.summarizers import (  # noqa: F401
    ema_halflife,
    linear_regression,
)
from flint_spark.timeseries import TimeSeriesDataFrame  # noqa: F401

__all__ = [
    "FlintContext",
    "TimeSeriesDataFrame",
    "clocks",
    "summarizers",
    "udf",
    "windows",
]
