"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the config below is chosen so the
same logical plans scale to a real cluster: AQE on (runtime coalescing,
skew-join splitting), Arrow transport for the pandas paths, UTC session
timezone so results compare bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "flint_spark", master: str | None = None) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        # ANSI off: we want permissive numeric semantics matching the
        # reference engine (nulls on bad casts, wrap-free via explicit pmod).
        .config("spark.sql.ansi.enabled", "false")
        # read parquet TIMESTAMP(NANOS) columns as LongType epoch-ns —
        # Spark has no ns timestamp; Long ns is this engine's canonical
        # exact time representation (same duality as the reference's
        # TimeType: long ns vs timestamp µs).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
