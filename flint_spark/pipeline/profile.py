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
from ..session import ansi_guard


def _key_counts(df: DataFrame, key: Sequence[str]) -> DataFrame:
    return df.groupBy(*key).agg(F.count(F.lit(1)).alias("cnt"))


@ansi_guard("profiling operators")
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
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probability out of range: {p}")
        # pXX = percent, fractional percents with '_' (p99_9); the
        # old string-slice mangled boundaries (1.0 -> 'p00')
        name = "p" + f"{p * 100:g}".replace(".", "_") + "_cnt"
        aggs.append(F.percentile(F.col("cnt"), F.lit(p)).alias(name))
    out = counts.agg(*aggs)
    return out.withColumn(
        "skew", F.col("max_cnt").cast("double") / F.col("avg_cnt"))


@ansi_guard("profiling operators")
def heavy_keys(df: DataFrame, key: Sequence[str], k: int = 10) -> DataFrame:
    """The k heaviest key groups: (key..., cnt, share), ordered by
    (cnt desc, key... NULLS LAST) for a deterministic cut — nulls
    last explicitly, because Spark's ascending default is NULLS FIRST
    while ANSI/DuckDB's is NULLS LAST, and a null key group tying at
    the k boundary would otherwise make the two engines keep
    different rows. The 1-row total is broadcast; the cut is a
    distributed top-k."""
    key = list(key)
    counts = _key_counts(df, key)
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (counts.crossJoin(F.broadcast(total))
            .select(*key, "cnt",
                    (F.col("cnt").cast("double") / F.col("__total"))
                    .alias("share"))
            .orderBy(F.desc("cnt"),
                     *[F.col(c).asc_nulls_last() for c in key])
            .limit(k))


@ansi_guard("profiling operators")
def winsorize(df: DataFrame, value_col: str, key: Sequence[str] = (),
              p_lo: float = 0.01, p_hi: float = 0.99,
              mode: str = "clip", exact: bool = True,
              accuracy: int = 10000) -> DataFrame:
    """Quantile-based outlier handling per key: compute the
    [``p_lo``, ``p_hi``] bounds of ``value_col`` and either ``clip``
    values into them (adds ``<col>_winsorized``), ``filter`` rows
    outside them, or ``flag`` them (adds ``<col>_outlier``). Null
    values pass through untouched (null quantile contribution is
    skipped in both engines).

    ``exact=True`` uses R-7 quantiles (buffers each key group's values
    in the aggregate — the ``summarizers.quantile`` memory bound);
    ``exact=False`` switches to the mergeable ``percentile_approx``
    sketch, the 100 TB default when key groups are unbounded. The
    bounds table is one row per key; the join back is left to AQE
    (broadcast when small, shuffle otherwise)."""
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError("need 0 <= p_lo < p_hi <= 1")
    if mode not in ("clip", "filter", "flag"):
        raise ValueError("mode must be clip|filter|flag")
    key = list(key)
    v = F.col(value_col)
    if exact:
        qlo = F.percentile(v, F.lit(p_lo))
        qhi = F.percentile(v, F.lit(p_hi))
    else:
        qlo = F.percentile_approx(v, F.lit(p_lo), F.lit(accuracy))
        qhi = F.percentile_approx(v, F.lit(p_hi), F.lit(accuracy))
    bounds = df.groupBy(*key).agg(qlo.alias("__lo"), qhi.alias("__hi"))
    if key:
        joined = df.join(bounds, key, "left")
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    lo, hi = F.col("__lo"), F.col("__hi")
    if mode == "clip":
        # guard the null case explicitly: least/greatest IGNORE null
        # arguments in both engines, so the raw expression would clip
        # a null value to the lower bound instead of passing it through
        out = joined.withColumn(
            f"{value_col}_winsorized",
            F.when(v.isNotNull(), F.least(F.greatest(v, lo), hi)))
    elif mode == "filter":
        out = joined.filter(v.isNull() | ((v >= lo) & (v <= hi)))
    else:
        out = joined.withColumn(f"{value_col}_outlier",
                                F.when(v.isNotNull(),
                                       (v < lo) | (v > hi)))
    return out.drop("__lo", "__hi")
