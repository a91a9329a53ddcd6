"""Key-distribution profiling: the measurement half of the engine's
skew toolkit.

Every skew mitigation in this engine (``salted_join``'s salt factor,
``minhash``/``simhash``'s ``max_bucket`` caps, AQE skew-join
thresholds) starts from a number somebody has to measure: how skewed
IS this key? These operators answer it with bounded driver state so
the answer is cheap at 100 TB:

- ``key_profile``: ONE row of distribution statistics over the
  per-key counts (count-of-counts shape: the first aggregation is the
  only corpus-scale exchange; the second aggregates n_keys rows).
  Exact quantiles over per-key counts buffer n_keys values — fine for
  realistic key cardinalities (the count table is tiny next to the
  data); the corpus-scale stage is plain hash aggregation.
- ``heavy_keys``: the top-k keys by count with their corpus share —
  ``orderBy().limit(k)`` plans a TakeOrderedAndProject (per-partition
  heaps, P*k driver rows), never a global sort.

Null keys are real skew producers (a null-heavy join key is the
classic hot partition), so they are COUNTED as a key group here,
unlike the dedup operators which drop them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _key_counts(df: DataFrame, key: Sequence[str]) -> DataFrame:
    return df.groupBy(*key).agg(F.count(F.lit(1)).alias("cnt"))


def key_profile(df: DataFrame, key: Sequence[str],
                probabilities: Sequence[float] = (0.5, 0.9, 0.99)
                ) -> DataFrame:
    """One row: n_rows, n_keys, max/avg per-key count, exact R-7
    count quantiles, and ``skew`` = max/avg (1.0 = perfectly uniform;
    the number that decides whether a join needs salting)."""
    counts = _key_counts(df, list(key))
    aggs = [
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.avg("cnt").alias("avg_cnt"),
    ]
    for p in probabilities:
        name = f"p{str(p)[2:].ljust(2, '0')}_cnt"
        aggs.append(F.percentile(F.col("cnt"), F.lit(p)).alias(name))
    out = counts.agg(*aggs)
    return out.withColumn(
        "skew", F.col("max_cnt").cast("double") / F.col("avg_cnt"))


def heavy_keys(df: DataFrame, key: Sequence[str], k: int = 10) -> DataFrame:
    """The k heaviest key groups: (key..., cnt, share), ordered by
    (cnt desc, key...) for a deterministic cut. The 1-row total is
    broadcast; the cut is a distributed top-k."""
    key = list(key)
    counts = _key_counts(df, key)
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (counts.crossJoin(F.broadcast(total))
            .select(*key, "cnt",
                    (F.col("cnt").cast("double") / F.col("__total"))
                    .alias("share"))
            .orderBy(F.desc("cnt"), *key).limit(k))
