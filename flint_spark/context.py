"""FlintContext — the reference's main Python entry point
(``python/ts/flint/context.py:32-120``): holds the session and exposes
``.read`` as the fluent reader builder.

A user of the reference writes::

    flintContext = FlintContext(sqlContext)
    df = flintContext.read.range('2017-01-01', '2017-02-01').uri(...)

Here the same shape delegates to :class:`flint_spark.sources.readbuilder.TSRead`::

    fc = FlintContext(spark)
    ts = fc.read.range("2024-01-01", "2024-02-01").time_column("ts") \\
           .parquet("/data/events.parquet")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .sources.readbuilder import TSRead


class FlintContext:
    def __init__(self, spark: SparkSession):
        # the reference is constructed over a SQLContext
        # (``context.py:32``) — accept anything carrying a session
        self._spark = getattr(spark, "sparkSession", spark)

    @property
    def spark(self) -> SparkSession:
        return self._spark

    @property
    def read(self) -> TSRead:
        """A fresh reader builder per access (matches the reference's
        ``readwriter.TSDataFrameReader`` lifecycle)."""
        return TSRead(self._spark)
