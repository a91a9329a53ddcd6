"""SURVEY §2 operator gate queries + DuckDB oracles (part 1:
cycles, intervals, summarizers, as-of, shift, EWMA/EMA, OLS, sessions)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flint_spark import clocks, summarizers as S, windows as W
from flint_spark.operators import aggregate as agg_ops
from flint_spark.operators import asof, cycles, intervals, windows_ops
from flint_spark.operators import ema as ema_ops
from flint_spark.operators import regression, sessions
from flint_spark.pipeline import dedup, multimodal, similarity, text as text_ops
from flint_spark.pipeline.hashing import P, minhash_params, hyperplanes
from flint_spark.timeseries import TIME_COLUMN, as_time_expr, ns_to_time_expr

from .common import (R, _ensure_session_confs, _t, _events, _lineitem,
                     _orders_right, _ORDERS_RIGHT_SQL)
def q_cycle_agg(spark, sf):
    # EXACT gate arithmetic (r10 sf1 sweep): prices are 2-decimal, so
    # the mean runs over integer CENTS — integer-double sums are exact
    # in any fold order at any scale and the single exact division is
    # engine-identical, where a raw-double mean over 10x-longer groups
    # carried enough summation-order noise to coin-flip the half-up
    # boundary (~0.1% of groups). Operator under test is unchanged.
    li = _lineitem(spark, sf).withColumn(
        "price_c", F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)))
    summ = S.compose(S.count(), S.sum_("l_quantity"), S.mean("price_c"))
    out = cycles.summarize_cycles(li, summ, key=["l_returnflag"])
    return out.select(
        TIME_COLUMN, "l_returnflag", "count",
        R("l_quantity_sum", 2).alias("sum_qty"),
        R(F.col("price_c_mean") / 100, 2).alias("avg_price"))


SQL_CYCLE_AGG = """
  SELECT l_shipdate AS time, l_returnflag, count(*) AS count,
         floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
         floor((avg(floor(l_extendedprice * 100 + 0.5)) / 100)
               * 100 + 0.5) / 100 AS avg_price
  FROM lineitem GROUP BY 1, 2
"""


def q_group_cycle_rows(spark, sf):
    # array rendered as a CSV string: the driver's pandas canonicalizer
    # sorts every output column and cannot hash python lists (r1 err).
    li = _lineitem(spark, sf)
    keys = F.sort_array(F.collect_list("l_orderkey")).cast("array<string>")
    return (li.groupBy(TIME_COLUMN)
            .agg(F.array_join(keys, ",").alias("orderkeys")))


SQL_GROUP_CYCLE_ROWS = """
  SELECT l_shipdate AS time,
         array_to_string(list_sort(list(l_orderkey)), ',') AS orderkeys
  FROM lineitem GROUP BY 1
"""


def q_interval_uniform(spark, sf):
    ev = _events(spark, sf)
    clock = clocks.uniform("2024-01-01", "2027-01-01", "1d")
    out = intervals.summarize_intervals(
        ev, clock, S.compose(S.count(), S.sum_("value")),
        key=["event_type"], inclusion="begin", rounding="begin")
    return out.select(TIME_COLUMN, "event_type", "count",
                      R("value_sum", 4).alias("value_sum"))


SQL_INTERVAL_UNIFORM = """
  SELECT date_trunc('day', ts) AS time, event_type, count(*) AS count,
         floor((sum(value)) * 10000 + 0.5) / 10000 AS value_sum
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2027-01-01'
  GROUP BY 1, 2
"""


def q_interval_end_end(spark, sf):
    ev = _events(spark, sf)
    clock = clocks.uniform("2024-01-01", "2027-01-01", "1h")
    out = intervals.summarize_intervals(
        ev, clock, S.count(), key=[], inclusion="end", rounding="end")
    return out.select(TIME_COLUMN, "count")


SQL_INTERVAL_END_END = """
  SELECT date_trunc('hour', ts - INTERVAL 1 MICROSECOND) + INTERVAL 1 HOUR AS time,
         count(*) AS count
  FROM events
  WHERE ts > TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2027-01-01'
  GROUP BY 1
"""


def q_summarize_stats(spark, sf):
    ev = _events(spark, sf)
    summ = S.compose(S.count(), S.mean("value"), S.stddev("value"),
                     S.variance("value"), S.min_("value"), S.max_("value"))
    out = agg_ops.summarize(ev, summ)
    return out.select(
        "count", R("value_mean", 6).alias("value_mean"),
        R("value_stddev", 6).alias("value_stddev"),
        R("value_variance", 4).alias("value_variance"),
        "value_min", "value_max")


SQL_SUMMARIZE_STATS = """
  SELECT count(*) AS count, floor((avg(value)) * 1000000 + 0.5) / 1000000 AS value_mean,
         floor((stddev_samp(value)) * 1000000 + 0.5) / 1000000 AS value_stddev,
         floor((var_samp(value)) * 10000 + 0.5) / 10000 AS value_variance,
         min(value) AS value_min, max(value) AS value_max
  FROM events
"""


def q_summarize_keyed(spark, sf):
    li = _lineitem(spark, sf)
    summ = S.compose(
        S.count(), S.covariance("l_quantity", "l_discount"),
        S.correlation("l_quantity", "l_extendedprice"),
        S.dot_product("l_quantity", "l_discount"),
        S.geometric_mean("l_quantity"),
    )
    out = agg_ops.summarize(li, summ, key=["l_returnflag"])
    return out.select(
        "l_returnflag", "count",
        R("l_quantity_l_discount_covariance", 6).alias("cov_qd"),
        R("l_quantity_l_extendedprice_correlation", 6).alias("corr_qp"),
        R("l_quantity_l_extendedprice_correlationTStat", 4).alias("corr_qp_t"),
        R("l_quantity_l_discount_dotProduct", 4).alias("dot_qd"),
        R("l_quantity_geometricMean", 6).alias("geo_qty"))


SQL_SUMMARIZE_KEYED = """
  SELECT l_returnflag, count(*) AS count,
         floor((covar_pop(l_quantity, l_discount)) * 1000000 + 0.5) / 1000000 AS cov_qd,
         floor((corr(l_quantity, l_extendedprice)) * 1000000 + 0.5) / 1000000 AS corr_qp,
         floor((corr(l_quantity, l_extendedprice)
               * sqrt((count(*) - 2)
                      / (1 - corr(l_quantity, l_extendedprice)^2))) * 10000 + 0.5) / 10000 AS corr_qp_t,
         floor((sum(l_quantity * l_discount)) * 10000 + 0.5) / 10000 AS dot_qd,
         floor((exp(avg(ln(abs(l_quantity))))) * 1000000 + 0.5) / 1000000 AS geo_qty
  FROM lineitem GROUP BY 1
"""


def q_moments(spark, sf):
    ev = _events(spark, sf)
    summ = S.compose(S.skewness("value"), S.kurtosis("value"),
                     S.nth_moment("value", 3), S.nth_central_moment("value", 2))
    out = agg_ops.summarize(ev, summ)
    return out.select(
        R("value_skewness", 6).alias("skew"),
        R("value_kurtosis", 6).alias("kurt"),
        R("value_3thMoment", 2).alias("m3"),
        R("value_2thCentralMoment", 4).alias("cm2"))


SQL_MOMENTS = """
  WITH m AS (
    SELECT avg(value) AS m1, avg(value^2) AS r2,
           avg(value^3) AS r3, avg(value^4) AS r4
    FROM events
  )
  SELECT floor(((r3 - 3*m1*r2 + 2*m1^3) / (r2 - m1^2)^1.5) * 1000000 + 0.5) / 1000000 AS skew,
         floor(((r4 - 4*m1*r3 + 6*m1^2*r2 - 3*m1^4) / (r2 - m1^2)^2 - 3) * 1000000 + 0.5) / 1000000 AS kurt,
         floor((r3) * 100 + 0.5) / 100 AS m3,
         floor((r2 - m1^2) * 10000 + 0.5) / 10000 AS cm2
  FROM m
"""


def q_quantiles(spark, sf):
    ev = _events(spark, sf)
    out = agg_ops.summarize(ev, S.quantile("value", [0.25, 0.5, 0.9, 0.99]))
    return out.select(
        R("value_0_25quantile", 6).alias("q25"),
        R("value_0_5quantile", 6).alias("q50"),
        R("value_0_9quantile", 6).alias("q90"),
        R("value_0_99quantile", 6).alias("q99"))


SQL_QUANTILES = """
  SELECT floor((quantile_cont(value, 0.25)) * 1000000 + 0.5) / 1000000 AS q25,
         floor((quantile_cont(value, 0.5)) * 1000000 + 0.5) / 1000000 AS q50,
         floor((quantile_cont(value, 0.9)) * 1000000 + 0.5) / 1000000 AS q90,
         floor((quantile_cont(value, 0.99)) * 1000000 + 0.5) / 1000000 AS q99
  FROM events
"""


def q_zscore(spark, sf):
    ev = _events(spark, sf)
    out = agg_ops.summarize(ev, S.z_score("value", in_sample=True), key=["user_id"])
    return out.select("user_id", R("value_zScore", 6).alias("zscore"))


SQL_ZSCORE = """
  SELECT user_id,
         floor(((arg_max(value, ts) - avg(value)) / stddev_samp(value)) * 1000000 + 0.5) / 1000000 AS zscore
  FROM events GROUP BY 1
"""


def q_weighted(spark, sf):
    li = _lineitem(spark, sf)
    summ = S.compose(
        S.weighted_mean_test("l_extendedprice", "l_quantity"),
        S.weighted_covariance("l_extendedprice", "l_discount", "l_quantity"),
        S.weighted_correlation("l_extendedprice", "l_discount", "l_quantity"),
    )
    out = agg_ops.summarize(li, summ, key=["l_linestatus"])
    return out.select(
        "l_linestatus",
        R("l_extendedprice_l_quantity_weightedMean", 1).alias("wmean"),
        R("l_extendedprice_l_quantity_weightedStandardDeviation", 1).alias("wstd"),
        R("l_extendedprice_l_quantity_weightedTStat", 4).alias("wtstat"),
        F.col("l_extendedprice_l_quantity_observationCount").alias("n_obs"),
        R("l_extendedprice_l_discount_l_quantity_weightedCovariance", 1)
         .alias("wcov"),
        R("l_extendedprice_l_discount_l_quantity_weightedCorrelation", 6)
         .alias("wcorr"))


SQL_WEIGHTED = """
  WITH s AS (
    SELECT l_linestatus,
           sum(l_quantity) AS sw, sum(l_quantity*l_quantity) AS sw2,
           sum(l_quantity*l_extendedprice) AS swx,
           sum(l_quantity*l_extendedprice*l_extendedprice) AS swxx,
           sum(l_quantity*l_discount) AS swy,
           sum(l_quantity*l_discount*l_discount) AS swyy,
           sum(l_quantity*l_extendedprice*l_discount) AS swxy,
           count(*) AS n
    FROM lineitem GROUP BY 1
  )
  SELECT l_linestatus,
         floor((swx/sw) * 10 + 0.5) / 10 AS wmean,
         floor((sqrt((swxx - swx*swx/sw) / (sw - sw2/sw))) * 10 + 0.5) / 10 AS wstd,
         floor(((swx/sw) * sw / sqrt(((swxx - swx*swx/sw) / (sw - sw2/sw)) * sw2)) * 10000 + 0.5) / 10000
           AS wtstat,
         n AS n_obs,
         floor(((swxy - swx*swy/sw) / (sw - sw2/sw)) * 10 + 0.5) / 10 AS wcov,
         floor(((swxy - swx*swy/sw)
               / sqrt((swxx - swx*swx/sw) * (swyy - swy*swy/sw))) * 1000000 + 0.5) / 1000000 AS wcorr
  FROM s
"""


def q_asof_backward(spark, sf):
    ev = _events(spark, sf)
    # raw (un-deduped) right side: duplicate (user_id, time) orders
    # resolve via the operator's max-struct tie rule == the oracle's
    # dedup-by-max pre-aggregation, without that pre-agg's shuffle
    right = _t(spark, sf, "orders").select(
        F.col("o_orderdate").alias(TIME_COLUMN),
        F.col("o_custkey").alias("user_id"), "o_totalprice")
    out = asof.left_join(ev, right, tolerance="9000d", key=["user_id"])
    return out.select(TIME_COLUMN, "event_id", "user_id", "value", "o_totalprice")


SQL_ASOF_BACKWARD = f"""
  WITH r AS ({_ORDERS_RIGHT_SQL}),
       l AS (SELECT CAST(ts AS TIMESTAMP) AS time, event_id, user_id, value
             FROM events)
  SELECT l.time, l.event_id, l.user_id, l.value,
         CASE WHEN r.rt >= l.time - INTERVAL 9000 DAY THEN r.o_totalprice END
           AS o_totalprice
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.time >= r.rt
"""


def q_asof_forward(spark, sf):
    left = _orders_right(spark, sf).select(TIME_COLUMN, "user_id", "o_totalprice")
    # raw right side: the forward join's max-struct tie rule replaces
    # the dedup-by-max pre-aggregation (one less shuffle)
    ev = _events(spark, sf).select(TIME_COLUMN, "user_id", "value")
    out = asof.future_left_join(left, ev, tolerance="9500d", key=["user_id"])
    return out.select(TIME_COLUMN, "user_id", "o_totalprice", "value")


SQL_ASOF_FORWARD = f"""
  WITH l AS (SELECT rt AS time, user_id, o_totalprice FROM ({_ORDERS_RIGHT_SQL})),
       r AS (SELECT CAST(ts AS TIMESTAMP) AS rt, user_id, max(value) AS value
             FROM events GROUP BY 1, 2)
  SELECT l.time, l.user_id, l.o_totalprice,
         CASE WHEN r.rt <= l.time + INTERVAL 9500 DAY THEN r.value END AS value
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.time <= r.rt
"""


def q_asof_strict(spark, sf):
    """Strict lookahead: an event joining to itself must be excluded."""
    ev = (_events(spark, sf).groupBy(TIME_COLUMN, "user_id")
          .agg(F.max("value").alias("value")))
    # raw right side (max-struct tie rule == the oracle's dedup-by-max)
    nxt = _events(spark, sf).select(TIME_COLUMN, "user_id",
                                    F.col("value").alias("next_value"))
    out = asof.future_left_join(ev, nxt, tolerance="7d", key=["user_id"],
                                strict_lookahead=True)
    return out.select(TIME_COLUMN, "user_id", "value", "next_value")


SQL_ASOF_STRICT = """
  WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, user_id, max(value) AS value
             FROM events GROUP BY 1, 2)
  SELECT l.t AS time, l.user_id, l.value,
         CASE WHEN r.t <= l.t + INTERVAL 7 DAY THEN r.value END AS next_value
  FROM e l ASOF LEFT JOIN e r ON l.user_id = r.user_id AND l.t < r.t
"""


def q_merge(spark, sf):
    ev = _events(spark, sf)
    a = ev.filter(F.col("event_type") == "click").select(TIME_COLUMN, "event_id", "value")
    b = ev.filter(F.col("event_type") == "view").select(TIME_COLUMN, "event_id", "value")
    return asof.merge(a, b)


SQL_MERGE = """
  SELECT CAST(ts AS TIMESTAMP) AS time, event_id, value FROM events
  WHERE event_type = 'click'
  UNION ALL
  SELECT CAST(ts AS TIMESTAMP) AS time, event_id, value FROM events
  WHERE event_type = 'view'
"""


def q_shift(spark, sf):
    from flint_spark import TimeSeriesDataFrame
    ev = TimeSeriesDataFrame(_events(spark, sf))
    return ev.shift("1h").df.select(TIME_COLUMN, "event_id")


SQL_SHIFT = """
  SELECT CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS time, event_id FROM events
"""


def q_filter_project(spark, sf):
    from flint_spark import TimeSeriesDataFrame
    ev = TimeSeriesDataFrame(_events(spark, sf))
    out = (ev.keep_columns("event_id", "event_type", "value")
           .filter((F.col("value") > 100) & F.col("event_type").isin("click", "error"))
           .add_columns(value_2x=R(F.col("value") * 2, 2))
           .cast({"event_id": "int"}))
    return out.df


SQL_FILTER_PROJECT = """
  SELECT CAST(ts AS TIMESTAMP) AS time, CAST(event_id AS INT) AS event_id,
         event_type, value, floor((value * 2) * 100 + 0.5) / 100 AS value_2x
  FROM events WHERE value > 100 AND event_type IN ('click', 'error')
"""


def q_clock_uniform(spark, sf):
    _ensure_session_confs(spark)  # no table load; still needs UTC rendering
    clock = clocks.uniform("2024-01-01", "2024-02-01", "1h")
    return clock.ticks_df(spark)


SQL_CLOCK_UNIFORM = """
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01',
                                INTERVAL 1 HOUR)) AS time
"""


def q_cumulative(spark, sf):
    ev = _events(spark, sf)
    out = agg_ops.add_summary_columns(ev, S.compose(S.sum_("value"), S.count()),
                                      key=["user_id"])
    return out.select(TIME_COLUMN, "user_id", "value",
                      R("value_sum", 4).alias("cum_value"),
                      F.col("count").alias("cum_n"))


SQL_CUMULATIVE = """
  SELECT CAST(ts AS TIMESTAMP) AS time, user_id, value,
         floor((sum(value) OVER w) * 10000 + 0.5) / 10000 AS cum_value,
         count(*) OVER w AS cum_n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_window_rolling(spark, sf):
    ev = _events(spark, sf)
    summ = S.compose(S.count(), S.sum_("value"), S.min_("value"), S.max_("value"))
    out = windows_ops.summarize_windows(ev, W.past_absolute_time("1h"), summ,
                                        key=["user_id"])
    return out.select(TIME_COLUMN, "user_id", "value", "count",
                      R("value_sum", 4).alias("w_sum"),
                      F.col("value_min").alias("w_min"),
                      F.col("value_max").alias("w_max"))


SQL_WINDOW_ROLLING = """
  SELECT CAST(ts AS TIMESTAMP) AS time, user_id, value,
         count(*) OVER w AS count,
         floor((sum(value) OVER w) * 10000 + 0.5) / 10000 AS w_sum,
         min(value) OVER w AS w_min,
         max(value) OVER w AS w_max
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_window_future_rows(spark, sf):
    ev = _events(spark, sf)
    out = windows_ops.add_windows(ev.select(TIME_COLUMN, "user_id", "event_id"),
                                  W.future_absolute_time("30m"), key=["user_id"])
    ids = F.sort_array(F.transform(F.col("window_future_30m"),
                                   lambda r: r["event_id"])).cast("array<string>")
    return out.select(TIME_COLUMN, "user_id", "event_id",
                      F.array_join(ids, ",").alias("future_ids"))


SQL_WINDOW_FUTURE_ROWS = """
  SELECT CAST(ts AS TIMESTAMP) AS time, user_id, event_id,
         array_to_string(list_sort(list(event_id) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN CURRENT ROW AND INTERVAL 30 MINUTE FOLLOWING)), ',')
           AS future_ids
  FROM events
"""


def q_ewma(spark, sf):
    # native (pure-JVM) running EWMA: the 2-year/1-day exponent span is
    # safely inside double range; the pandas scan (ema_ops.ewma) is the
    # unbounded-span fallback and is exercised by tests/goldens
    ev = _events(spark, sf)
    out = ema_ops.ewma_native(ev, "value", alpha=0.05, duration_per_period="1d",
                              convention="legacy", key=["user_id"])
    return out.select(TIME_COLUMN, "user_id",
                      R("value_ewma", 4).alias("ewma"))


# closed form: ewma_n = exp(-lam*(t_n-t0)) * cumsum(x_i * exp(lam*(t_i-t0)))
SQL_EWMA = """
  WITH e AS (
    SELECT CAST(ts AS TIMESTAMP) AS time, user_id, value,
           epoch_us(ts)::DOUBLE AS tus,
           min(epoch_us(ts)) OVER (PARTITION BY user_id) :: DOUBLE AS base
    FROM events
  )
  SELECT time, user_id,
         floor((exp(-(tus - base) * {lam}) *
               sum(value * exp((tus - base) * {lam})) OVER (
                 PARTITION BY user_id ORDER BY time
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000 AS ewma
  FROM e
""".format(lam=-__import__("math").log1p(-0.05) / 86_400e6)


def q_ema_core(spark, sf):
    ev = _events(spark, sf)
    out = ema_ops.exponential_smoothing(
        ev, "value", alpha=0.05, priming_periods=1.0, duration_per_period="1d",
        interpolation="current", convention="core", key=["user_id"])
    return out.select(TIME_COLUMN, "user_id",
                      R("value_ema", 4).alias("ema"))


# E_n = sum_i c_i exp(-lam (t_n - t_i)), c_i = (1-d_i) x_i,
# d_i from the lag gap (priming_periods=1d for the first row); core = E/A.
SQL_EMA_CORE = """
  WITH e AS (
    SELECT CAST(ts AS TIMESTAMP) AS time, user_id, value,
           epoch_us(ts)::DOUBLE AS tus,
           min(epoch_us(ts)) OVER (PARTITION BY user_id)::DOUBLE AS base,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)::DOUBLE AS prev
    FROM events
  ), d AS (
    SELECT *, CASE WHEN prev IS NULL THEN exp(-{lam_day})
                   ELSE exp(-(tus - prev) * {lam}) END AS dec
    FROM e
  )
  SELECT time, user_id,
         floor(((sum((1 - dec) * value * exp((tus - base) * {lam})) OVER w)
           / (sum((1 - dec) * exp((tus - base) * {lam})) OVER w)) * 10000 + 0.5) / 10000 AS ema
  FROM d
  WINDOW w AS (PARTITION BY user_id ORDER BY time
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""".format(lam=-__import__("math").log1p(-0.05) / 86_400e6,
           lam_day=-__import__("math").log1p(-0.05))


def q_ols(spark, sf):
    li = _lineitem(spark, sf)
    out = regression.ols_regression(li, "l_extendedprice", ["l_quantity"],
                                    key=["l_returnflag"])
    return out.select(
        "l_returnflag", "samples",
        R(F.col("beta")[0], 2).alias("slope"),
        R("intercept", 1).alias("icpt"),
        R("rSquared", 6).alias("r2"),
        R(F.col("tStat_beta")[0], 2).alias("t_slope"))


SQL_OLS = """
  SELECT l_returnflag, count(*) AS samples,
         floor((regr_slope(l_extendedprice, l_quantity)) * 100 + 0.5) / 100 AS slope,
         floor((regr_intercept(l_extendedprice, l_quantity)) * 10 + 0.5) / 10 AS icpt,
         floor((regr_r2(l_extendedprice, l_quantity)) * 1000000 + 0.5) / 1000000 AS r2,
         floor((regr_slope(l_extendedprice, l_quantity)
               / (sqrt((regr_syy(l_extendedprice, l_quantity)
                        - regr_slope(l_extendedprice, l_quantity)^2
                          * regr_sxx(l_extendedprice, l_quantity))
                       / (count(*) - 2))
                  / sqrt(regr_sxx(l_extendedprice, l_quantity)))) * 100 + 0.5) / 100 AS t_slope
  FROM lineitem GROUP BY 1
"""


def q_ols_multi(spark, sf):
    """Weighted 3-regressor OLS, full-field surface (betas, intercept,
    r², logLikelihood, AIC). ``cond`` (eigenvalue ratio) is checked by
    pytest only — eigen-decomposition has no SQL form."""
    li = _lineitem(spark, sf)
    out = regression.ols_regression(
        li, "l_extendedprice", ["l_quantity", "l_discount", "l_tax"],
        weight="l_quantity")
    return out.select(
        "samples",
        R(F.col("beta")[0], 2).alias("b_qty"),
        R(F.col("beta")[1], 2).alias("b_disc"),
        R(F.col("beta")[2], 2).alias("b_tax"),
        R("intercept", 2).alias("icpt"),
        R("rSquared", 6).alias("r2"),
        R("logLikelihood", 2).alias("ll"),
        R("akaikeIC", 2).alias("aic"))


# Weighted multi-OLS oracle: centered weighted moments -> 3x3 normal
# equations solved by Cramer's rule (far better conditioned than the
# raw 4x4 Gramian), then rss/r2/loglik from the same identities the
# engine uses (regression._solve_row): rss = Cyy - b'Cxy,
# ll = -n/2 (ln(2 pi rss/n) + 1) + (sum ln w - n ln(mean w)) / 2.
SQL_OLS_MULTI = """
  WITH m AS (
    SELECT count(*) AS n, sum(l_quantity) AS sw, sum(ln(l_quantity)) AS slw,
           sum(l_quantity * l_quantity)   AS sx1,
           sum(l_quantity * l_discount)   AS sx2,
           sum(l_quantity * l_tax)        AS sx3,
           sum(l_quantity * l_extendedprice) AS sy,
           sum(l_quantity * l_quantity * l_quantity) AS s11,
           sum(l_quantity * l_quantity * l_discount) AS s12,
           sum(l_quantity * l_quantity * l_tax)      AS s13,
           sum(l_quantity * l_discount * l_discount) AS s22,
           sum(l_quantity * l_discount * l_tax)      AS s23,
           sum(l_quantity * l_tax * l_tax)           AS s33,
           sum(l_quantity * l_quantity * l_extendedprice) AS s1y,
           sum(l_quantity * l_discount * l_extendedprice) AS s2y,
           sum(l_quantity * l_tax * l_extendedprice)      AS s3y,
           sum(l_quantity * l_extendedprice * l_extendedprice) AS syy
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
      AND l_discount IS NOT NULL AND l_tax IS NOT NULL
  ), c AS (
    SELECT n, sw, slw, sx1, sx2, sx3, sy,
           s11 - sx1 * sx1 / sw AS c11, s12 - sx1 * sx2 / sw AS c12,
           s13 - sx1 * sx3 / sw AS c13, s22 - sx2 * sx2 / sw AS c22,
           s23 - sx2 * sx3 / sw AS c23, s33 - sx3 * sx3 / sw AS c33,
           s1y - sx1 * sy / sw AS c1y, s2y - sx2 * sy / sw AS c2y,
           s3y - sx3 * sy / sw AS c3y, syy - sy * sy / sw AS cyy
    FROM m
  ), solved AS (
    SELECT *,
      c11*(c22*c33 - c23*c23) - c12*(c12*c33 - c23*c13)
        + c13*(c12*c23 - c22*c13) AS det,
      (c1y*(c22*c33 - c23*c23) - c12*(c2y*c33 - c23*c3y)
        + c13*(c2y*c23 - c22*c3y)) AS det1,
      (c11*(c2y*c33 - c23*c3y) - c1y*(c12*c33 - c23*c13)
        + c13*(c12*c3y - c2y*c13)) AS det2,
      (c11*(c22*c3y - c2y*c23) - c12*(c12*c3y - c2y*c13)
        + c1y*(c12*c23 - c22*c13)) AS det3
    FROM c
  ), beta AS (
    SELECT *, det1 / det AS b1, det2 / det AS b2, det3 / det AS b3
    FROM solved
  ), fit AS (
    SELECT *, cyy - (b1 * c1y + b2 * c2y + b3 * c3y) AS rss,
           slw - n * ln(sw / n) AS nlw
    FROM beta
  )
  SELECT n AS samples,
         floor(b1 * 100 + 0.5) / 100 AS b_qty,
         floor(b2 * 100 + 0.5) / 100 AS b_disc,
         floor(b3 * 100 + 0.5) / 100 AS b_tax,
         floor(((sy - b1 * sx1 - b2 * sx2 - b3 * sx3) / sw) * 100 + 0.5) / 100 AS icpt,
         floor((1 - rss / cyy) * 1000000 + 0.5) / 1000000 AS r2,
         floor((-0.5 * n * (ln(2 * pi() * rss / n) + 1) + 0.5 * nlw) * 100 + 0.5) / 100 AS ll,
         floor((2 * (0.5 * n * (ln(2 * pi() * rss / n) + 1) - 0.5 * nlw) + 10) * 100 + 0.5) / 100 AS aic
  FROM fit
"""


def q_summarize_state(spark, sf):
    """summarizeState: raw sufficient-statistic accumulators per key
    (reference ``TimeSeriesRDD.scala:1188-1196``) — count / Σx / Σx²
    behind a composed mean+variance summarizer, deduplicated."""
    # EXACT accumulators (r10 sf1 sweep): values are 2-decimal, so the
    # state runs over integer CENTIVALUES — Σx and Σx² are then exact
    # integer-double sums (|Σx²| < 2^53 through ~sf10) instead of
    # fold-order-dependent float accumulations whose error exceeded
    # the rounding grid at 10x data. Operator under test is unchanged.
    ev = _events(spark, sf).withColumn(
        "value_c", F.floor(F.col("value") * 100 + F.lit(0.5)))
    summ = S.compose(S.mean("value_c"), S.variance("value_c"))
    out = agg_ops.summarize_state(ev, summ, key=["event_type"])
    return out.select(
        "event_type", F.col("value_c_state_count").alias("n_obs"),
        R(F.col("value_c_state_sum") / 100, 4).alias("state_sum"),
        R(F.col("value_c_state_sumSq") / 10000, 2).alias("state_sum_sq"))


SQL_SUMMARIZE_STATE = """
  WITH e AS (SELECT event_type, floor(value * 100 + 0.5) AS vc
             FROM events)
  SELECT event_type, count(vc) AS n_obs,
         floor((sum(vc) / 100) * 10000 + 0.5) / 10000 AS state_sum,
         floor((sum(vc * vc) / 10000) * 100 + 0.5) / 100 AS state_sum_sq
  FROM e GROUP BY 1
"""


def q_read_expand(spark, sf):
    """ReadBuilder ``.range(b, e).expand(begin=tol)``: the as-of right
    side is scanned over [b - tol, e) so left rows at the range edge
    still find their backward match (reference ``ReadBuilder.expand``,
    ``io/read/ReadBuilder.scala:126-146``, python ``readwriter.py:174``).
    Left: all events in [2024-01-15, 2024-02-01). Right: per-(time,user)
    max click value, primed 2d before the window."""
    from flint_spark.sources.readbuilder import TSRead
    _ensure_session_confs(spark)
    right = (TSRead(spark).range("2024-01-15", "2024-02-01")
             .expand(begin="2d")
             .time_column("ts")
             .parquet(f"{sf}/events.parquet")).df
    right = (right.withColumn(TIME_COLUMN,
                              as_time_expr(right, TIME_COLUMN, "timestamp"))
             .filter(F.col("event_type") == "click")
             .groupBy(TIME_COLUMN, "user_id")
             .agg(F.max("value").alias("click_value")))
    lo = F.to_timestamp(F.lit("2024-01-15"))
    hi = F.to_timestamp(F.lit("2024-02-01"))
    left = (_events(spark, sf)
            .filter((F.col(TIME_COLUMN) >= lo) & (F.col(TIME_COLUMN) < hi))
            .select(TIME_COLUMN, "user_id", "event_id"))
    out = asof.left_join(left, right, tolerance="2d", key=["user_id"])
    return out.select(TIME_COLUMN, "user_id", "event_id",
                      R("click_value", 4).alias("click_value"))


SQL_READ_EXPAND = """
  WITH r AS (
    SELECT CAST(ts AS TIMESTAMP) AS rt, user_id, max(value) AS click_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15' - INTERVAL 2 DAY
      AND ts < TIMESTAMP '2024-02-01' AND event_type = 'click'
    GROUP BY 1, 2
  ), l AS (
    SELECT CAST(ts AS TIMESTAMP) AS time, user_id, event_id
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-02-01'
  )
  SELECT l.time, l.user_id, l.event_id,
         CASE WHEN r.rt >= l.time - INTERVAL 2 DAY
              THEN floor(r.click_value * 10000 + 0.5) / 10000 END AS click_value
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.rt <= l.time
"""


def q_sessionize(spark, sf):
    ev = _events(spark, sf)
    out = sessions.session_stats(ev, gap="1h", key=["user_id"])
    return out.select("user_id", "session_id", "session_start", "session_end",
                      "n_events", R("duration_s", 6).alias("duration_s"))


SQL_SESSIONIZE = """
  WITH e AS (
    SELECT CAST(ts AS TIMESTAMP) AS t, user_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
  ), s AS (
    -- CAST: DuckDB integer sum() is HUGEINT, which lands in pandas as
    -- float64 and hash-mismatches Spark's int64 even when values agree
    -- (the r1 sessionize red row: bitwise-equal values, dtype-only diff)
    SELECT t, user_id,
           CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
    FROM e
  )
  SELECT user_id, session_id, min(t) AS session_start, max(t) AS session_end,
         count(*) AS n_events,
         floor(((epoch_us(max(t)) - epoch_us(min(t))) / 1e6) * 1000000 + 0.5) / 1000000 AS duration_s
  FROM s GROUP BY 1, 2
"""

