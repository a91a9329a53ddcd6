"""Summarizer registry — aggregation factories compiling to Column expressions.

The reference implements each summarizer as a stateful commutative-monoid
aggregator (zero/add/merge/render, reference
``rdd/function/summarize/summarizer/Summarizer.scala:25-73``) with a
registry in ``timeseries/Summarizers.scala`` (755 LoC). Spark's hash
aggregation *is* that monoid, so here every summarizer compiles to one or
more aliased ``Column`` aggregate expressions — JVM-side, codegen'd,
partial+final (tree) aggregation for free. Only the order-dependent EMA
family and OLS need pandas (see ``operators/ema.py``,
``operators/regression.py``).

Builders have signature ``(df, mask, over) -> Column``:
- ``mask`` is applied to every input column (``where`` support; Spark
  aggregates skip nulls, same effect as the reference's
  PredicateSummarizerFactory, ``timeseries/summarize/Summarizer.scala:104-144``);
- ``over`` is applied to every *aggregate function call* — identity for
  ``groupBy().agg()`` use, ``.over(window)`` for per-row window /
  cumulative use. This is what lets one compound summarizer (e.g.
  z-score = (last-mean)/stddev) compile to either a hash aggregate or a
  set of window functions sharing one WindowExec.

Output naming matches the reference (``<col>_sum``, ``<x>_<y>_covariance``,
...). ``compose`` concatenates summarizers, ``prefix`` prefixes output
names, ``where`` masks inputs.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Mask = Callable[[Column], Column]
Over = Callable[[Column], Column]
Builder = Callable[[DataFrame, Mask, Over], Column]
_IDENT: Mask = lambda c: c


class Summarizer:
    """A named list of aggregate-expression builders.

    ``state_items`` (optional) are the raw sufficient-statistic
    accumulators behind the rendered outputs — the analogue of the
    reference's summarizer state (zero/add/merge before render). For
    summarizers without an explicit state list, the rendered outputs
    stand in (Catalyst's internal aggregation buffer is not exposable).
    """

    def __init__(self, items: Sequence[tuple[str, Builder]], prefix: str = "",
                 mask: Mask = _IDENT,
                 state_items: Sequence[tuple[str, Builder]] | None = None):
        self._items = list(items)
        self._prefix = prefix
        self._mask = mask
        self._state_items = list(state_items) if state_items is not None else None

    def exprs(self, df: DataFrame) -> list[Column]:
        """Aliased Columns for ``groupBy().agg(...)``."""
        return [fn(df, self._mask, _IDENT).alias(self._prefix + name)
                for name, fn in self._items]

    @property
    def _effective_state(self) -> list[tuple[str, Builder]]:
        return self._state_items if self._state_items is not None else self._items

    def state_exprs(self, df: DataFrame) -> list[Column]:
        """Aliased Columns for the raw accumulator state, deduplicated by
        name (compose(mean, variance) shares count/sum)."""
        seen: set[str] = set()
        out = []
        for name, fn in self._effective_state:
            full = self._prefix + name
            if full in seen:
                continue
            seen.add(full)
            out.append(fn(df, self._mask, _IDENT).alias(full))
        return out

    def over_exprs(self, df: DataFrame, window) -> list[tuple[str, Column]]:
        """(name, Column) pairs with every aggregate evaluated over ``window``."""
        over: Over = lambda c: c.over(window)
        return [(self._prefix + name, fn(df, self._mask, over))
                for name, fn in self._items]

    @property
    def names(self) -> list[str]:
        return [self._prefix + name for name, _ in self._items]

    def prefix(self, p: str) -> "Summarizer":
        return Summarizer(self._items, prefix=f"{p}_{self._prefix}" if self._prefix
                          else f"{p}_", mask=self._mask)

    def where(self, predicate: Column) -> "Summarizer":
        outer = self._mask
        return Summarizer(self._items, self._prefix,
                          mask=lambda c: F.when(predicate, outer(c)))


def compose(*summarizers: Summarizer) -> Summarizer:
    """Concatenate outputs (reference ``Summarizers.compose``,
    ``timeseries/Summarizers.scala:387-418``)."""
    items: list[tuple[str, Builder]] = []
    state: list[tuple[str, Builder]] = []
    for s in summarizers:
        for name, fn in s._items:
            pfx, msk = s._prefix, s._mask
            items.append((pfx + name,
                          (lambda df, m, o, fn=fn, msk=msk:
                           fn(df, lambda c: m(msk(c)), o))))
        for name, fn in s._effective_state:
            pfx, msk = s._prefix, s._mask
            state.append((pfx + name,
                          (lambda df, m, o, fn=fn, msk=msk:
                           fn(df, lambda c: m(msk(c)), o))))
    return Summarizer(items, state_items=state)


def stack(*summarizers: Summarizer) -> Summarizer:
    """Same-schema summarizers -> one ``stack`` array-of-structs column
    (reference ``Summarizers.stack``, ``timeseries/Summarizers.scala:420-443``,
    ``StackSummarizerFactory.scala``)."""
    names0 = summarizers[0].names
    for s in summarizers[1:]:
        if s.names != names0:
            raise ValueError("stack requires identical output schemas")

    def build(df: DataFrame, m: Mask, o: Over) -> Column:
        structs = []
        for s in summarizers:
            cols = [fn(df, lambda c: m(s._mask(c)), o).alias(s._prefix + n)
                    for n, fn in s._items]
            structs.append(F.struct(*cols))
        return F.array(*structs)

    return Summarizer([("stack", build)])


def _moment_state(column: str, order: int) -> list[tuple[str, Builder]]:
    """Raw accumulators (count, Σx, Σx², ...) up to the given moment
    order — the reference's NthMomentSummarizer state vector."""
    items: list[tuple[str, Builder]] = [
        (f"{column}_state_count",
         lambda df, m, o: o(F.count(m(F.col(column))))),
        (f"{column}_state_sum",
         lambda df, m, o: o(F.sum(m(F.col(column)))).cast("double")),
    ]
    if order >= 2:
        items.append((f"{column}_state_sumSq",
                      lambda df, m, o:
                      o(F.sum(m(F.col(column)) * m(F.col(column)))).cast("double")))
    return items


def _simple(name_fmt: str, agg: Callable[[Column], Column],
            post: Callable[[Column], Column] = lambda c: c,
            state_order: int | None = None):
    def factory(column: str) -> Summarizer:
        return Summarizer(
            [(name_fmt.format(col=column),
              lambda df, m, o: post(o(agg(m(F.col(column))))))],
            state_items=(_moment_state(column, state_order)
                         if state_order else None))
    return factory


# -- basic aggregates (reference Summarizers.scala:63-130,665-712) ------
def count(column: str | None = None) -> Summarizer:
    if column is None:
        return Summarizer([("count", lambda df, m, o: o(F.count(m(F.lit(1)))))])
    return Summarizer([(f"{column}_count",
                        lambda df, m, o: o(F.count(m(F.col(column)))))])


sum_ = _simple("{col}_sum", F.sum, lambda c: c.cast("double"), state_order=1)
mean = _simple("{col}_mean", F.avg, state_order=1)
stddev = _simple("{col}_stddev", F.stddev_samp, state_order=2)  # Bessel, ref :108-118
variance = _simple("{col}_variance", F.var_samp, state_order=2)  # Bessel, ref :120-130
min_ = _simple("{col}_min", F.min)
max_ = _simple("{col}_max", F.max)
product = _simple("{col}_product", F.product)
skewness = _simple("{col}_skewness", F.skewness)    # population g1, ref :726-739
kurtosis = _simple("{col}_kurtosis", F.kurtosis)    # excess, ref :741-754


def geometric_mean(column: str) -> Summarizer:
    """Zero/sign-aware geometric mean (reference
    ``rdd/.../GeometricMeanSummarizer.scala``): any zero -> 0; sign is
    the parity of negative inputs."""
    def build(df: DataFrame, m: Mask, o: Over) -> Column:
        c = m(F.col(column))
        zeros = o(F.sum(F.when(c == 0, 1).otherwise(0)))
        negs = o(F.sum(F.when(c < 0, 1).otherwise(0)))
        mag = F.exp(o(F.avg(F.log(F.abs(c)))))
        sign = F.when(F.pmod(negs, F.lit(2)) == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
        return F.when(zeros > 0, F.lit(0.0)).otherwise(mag * sign)
    return Summarizer([(f"{column}_geometricMean", build)])


def dot_product(x: str, y: str) -> Summarizer:
    return Summarizer([(f"{x}_{y}_dotProduct",
                        lambda df, m, o: o(F.sum(m(F.col(x)) * m(F.col(y)))))])


def covariance(x: str, y: str) -> Summarizer:
    """Population covariance (reference ``CovarianceSummarizer.scala``)."""
    return Summarizer([(f"{x}_{y}_covariance",
                        lambda df, m, o: o(F.covar_pop(m(F.col(x)), m(F.col(y)))))])


def correlation(x: str, y: str) -> Summarizer:
    """Pearson r plus its t-statistic (reference
    ``subtractable/CorrelationSummarizer.scala``)."""
    def tstat(df: DataFrame, m: Mask, o: Over) -> Column:
        cx, cy = m(F.col(x)), m(F.col(y))
        r = o(F.corr(cx, cy))
        n = o(F.count(F.when(cx.isNotNull() & cy.isNotNull(), 1)))
        return r * F.sqrt((n - 2) / (1 - r * r))
    return Summarizer([
        (f"{x}_{y}_correlation",
         lambda df, m, o: o(F.corr(m(F.col(x)), m(F.col(y))))),
        (f"{x}_{y}_correlationTStat", tstat),
    ])


def correlation_matrix(*columns: str) -> Summarizer:
    """All-pairs Pearson correlation (reference ``correlation(cols*)``
    form, ``Summarizers.scala:211-261``): one output pair per unordered
    column pair."""
    pairs = [(x, y) for i, x in enumerate(columns) for y in columns[i + 1:]]
    items: list[tuple[str, Builder]] = []
    for x, y in pairs:
        s = correlation(x, y)
        items.extend(s._items)
    return Summarizer(items)


def nth_moment(column: str, n: int) -> Summarizer:
    return Summarizer([(f"{column}_{n}thMoment",
                        lambda df, m, o: o(F.avg(F.pow(m(F.col(column)), F.lit(n)))))])


def nth_central_moment(column: str, n: int) -> Summarizer:
    """Central moment via binomial expansion of raw moments — single pass
    (reference ``subtractable/NthCentralMomentSummarizer.scala``)."""
    def build(df: DataFrame, m: Mask, o: Over) -> Column:
        c = m(F.col(column))
        mu = o(F.avg(c))
        total = F.lit(0.0)
        for k in range(n + 1):
            raw_k = o(F.avg(F.pow(c, F.lit(k)))) if k > 0 else F.lit(1.0)
            coef = math.comb(n, k) * ((-1) ** (n - k))
            total = total + F.lit(float(coef)) * raw_k * F.pow(mu, F.lit(n - k))
        return total
    return Summarizer([(f"{column}_{n}thCentralMoment", build)])


def z_score(column: str, in_sample: bool = True) -> Summarizer:
    """z-score of the most recent value (reference
    ``subtractable/ZScoreSummarizer.scala``). Out-of-sample excludes the
    last observation from mean/stddev, via raw-sum algebra."""
    def build(df: DataFrame, m: Mask, o: Over) -> Column:
        c = m(F.col(column))
        last = o(F.max_by(c, F.when(c.isNotNull(), F.col("time"))))
        if in_sample:
            return (last - o(F.avg(c))) / o(F.stddev_samp(c))
        n = o(F.count(c)).cast("double")
        s, q = o(F.sum(c)), o(F.sum(c * c))
        n1 = n - 1
        s1, q1 = s - last, q - last * last
        var1 = (q1 - s1 * s1 / n1) / (n1 - 1)
        return (last - s1 / n1) / F.sqrt(var1)
    return Summarizer([(f"{column}_zScore", build)])


# -- weighted family (reference Summarizers.scala:74-95,145-166,263-280) --
def _wsums(o: Over, x: Column, y: Column | None, w: Column):
    sw = o(F.sum(w))
    sw2 = o(F.sum(w * w))
    swx = o(F.sum(w * x))
    swxx = o(F.sum(w * x * x))
    if y is None:
        return sw, sw2, swx, swxx, None, None, None
    swy = o(F.sum(w * y))
    swyy = o(F.sum(w * y * y))
    swxy = o(F.sum(w * x * y))
    return sw, sw2, swx, swxx, swy, swyy, swxy


def weighted_covariance(x: str, y: str, weight: str) -> Summarizer:
    """Unbiased weighted covariance (reference
    ``rdd/.../WeightedCovarianceSummarizer.scala``):
    (Σwxy − ΣwxΣwy/Σw) / (Σw − Σw²/Σw)."""
    def build(df: DataFrame, m: Mask, o: Over) -> Column:
        cx, cy, cw = m(F.col(x)), m(F.col(y)), m(F.col(weight))
        sw, sw2, swx, _, swy, _, swxy = _wsums(o, cx, cy, cw)
        return (swxy - swx * swy / sw) / (sw - sw2 / sw)
    return Summarizer([(f"{x}_{y}_{weight}_weightedCovariance", build)])


def weighted_correlation(x: str, y: str, weight: str) -> Summarizer:
    def build(df: DataFrame, m: Mask, o: Over) -> Column:
        cx, cy, cw = m(F.col(x)), m(F.col(y)), m(F.col(weight))
        sw, _, swx, swxx, swy, swyy, swxy = _wsums(o, cx, cy, cw)
        num = swxy - swx * swy / sw
        vx = swxx - swx * swx / sw
        vy = swyy - swy * swy / sw
        return num / F.sqrt(vx * vy)
    return Summarizer([(f"{x}_{y}_{weight}_weightedCorrelation", build)])


def weighted_mean_test(column: str, weight: str) -> Summarizer:
    """weightedMean / weightedStandardDeviation / weightedTStat /
    observationCount (reference ``subtractable/WeightedMeanTestSummarizer.scala``;
    the reference also ships this as a Spark UDAF —
    ``sql/function/aggregate/WeightedMeanTest.scala``)."""
    def parts(df: DataFrame, m: Mask, o: Over):
        cx, cw = m(F.col(column)), m(F.col(weight))
        sw, sw2, swx, swxx, *_ = _wsums(o, cx, None, cw)
        wmean = swx / sw
        wvar = (swxx - swx * swx / sw) / (sw - sw2 / sw)  # unbiased
        return cx, sw, sw2, wmean, wvar

    return Summarizer([
        (f"{column}_{weight}_weightedMean",
         lambda df, m, o: parts(df, m, o)[3]),
        (f"{column}_{weight}_weightedStandardDeviation",
         lambda df, m, o: F.sqrt(parts(df, m, o)[4])),
        (f"{column}_{weight}_weightedTStat",
         lambda df, m, o: (lambda cx, sw, sw2, wmean, wvar:
                           wmean * sw / F.sqrt(wvar * sw2))(*parts(df, m, o))),
        (f"{column}_{weight}_observationCount",
         lambda df, m, o: o(F.count(m(F.col(column))))),
    ])


def quantile(column: str, probabilities: Sequence[float]) -> Summarizer:
    """Exact quantiles with linear (R-7) interpolation, matching the
    reference's commons-math Percentile
    (``subtractable/QuantileSummarizer.scala``). Use ``approx_quantile``
    for the sketch-based 100TB path, or ``quantile_auto`` to pick by a
    measured group-size bound.

    Memory bound: ``F.percentile`` buffers EVERY group value in the
    aggregation operator — ~8 bytes x rows per (group, column), held on
    one executor at final aggregation. At 1e8 rows in one group that is
    ~800 MB: exact quantiles are only safe when the largest group is
    bounded; beyond that the sketch (``approx_quantile``, fixed ~KB per
    group at any scale, rank error <= 1/accuracy) is the right plan.

    Output name: ``<col>_<p>quantile`` with '.' replaced by '_'
    (reference uses e.g. ``price_0.25quantile``; dots in column names
    fight Spark's nested-field resolution at every turn)."""
    items = [
        (f"{column}_{str(p).replace('.', '_')}quantile",
         (lambda df, m, o, p=p: o(F.percentile(m(F.col(column)), F.lit(p)))))
        for p in probabilities
    ]
    return Summarizer(items)


def approx_quantile(column: str, probabilities: Sequence[float],
                    accuracy: int = 10000) -> Summarizer:
    """Scale path: mergeable quantile sketch across partitions."""
    items = [
        (f"{column}_{str(p).replace('.', '_')}quantile",
         (lambda df, m, o, p=p: o(F.percentile_approx(m(F.col(column)), F.lit(p),
                                                      F.lit(accuracy)))))
        for p in probabilities
    ]
    return Summarizer(items)


class EmaWindowSummarizer:
    """Marker summarizer for the EMA family inside ``summarize_windows``
    — mirrors the reference's ``summarizeWindows(window,
    Summarizers.ewma(...))`` call shape (its flagship left-subtractable
    case, ``doc/ema.md:120-121``). The EMA recurrence is
    order-dependent, not a frame aggregate, so ``summarize_windows``
    routes this marker to the closed-form O(n) implementations
    (``operators.ema.ewma_windowed`` / ``exponential_smoothing_windowed``)
    instead of rendering ``.over(frame)`` expressions."""

    def __init__(self, kind: str, column: str, **kwargs):
        assert kind in ("ewma", "exponential_smoothing")
        self.kind = kind
        self.column = column
        self.kwargs = kwargs


def ewma(column: str, alpha: float = 0.05, duration_per_period: str = "1d",
         convention: str = "legacy") -> EmaWindowSummarizer:
    """Reference ``Summarizers.ewma`` for use in ``summarize_windows``
    (for the running form call ``operators.ema.ewma`` directly)."""
    return EmaWindowSummarizer("ewma", column, alpha=alpha,
                               duration_per_period=duration_per_period,
                               convention=convention)


def exponential_smoothing(column: str, alpha: float = 0.05,
                          priming_periods: float = 0.0,
                          duration_per_period: str = "1d",
                          interpolation: str = "current",
                          convention: str = "core") -> EmaWindowSummarizer:
    """Reference ``Summarizers.exponentialSmoothing`` for
    ``summarize_windows`` (running form: ``operators.ema``)."""
    return EmaWindowSummarizer(
        "exponential_smoothing", column, alpha=alpha,
        priming_periods=priming_periods,
        duration_per_period=duration_per_period,
        interpolation=interpolation, convention=convention)


#: largest per-group row count for which exact quantiles are planned by
#: default (~32 MB of doubles buffered on the final aggregator)
EXACT_QUANTILE_MAX_ROWS = 4_000_000


def quantile_auto(column: str, probabilities: Sequence[float],
                  df=None, key: Sequence[str] = (),
                  max_exact_rows: int = EXACT_QUANTILE_MAX_ROWS,
                  accuracy: int = 10000) -> Summarizer:
    """Exact quantiles when the largest group is measured (or assumed)
    to fit the per-group buffer bound; the mergeable sketch otherwise.

    The switch must happen at PLANNING time — a ``CASE WHEN`` over both
    aggregates would still evaluate (and buffer) the exact branch. With
    ``df`` given, one cheap count-by-key probe measures the real largest
    group (column-pruned scan, same cost class as any pre-flight
    statistics pass); without it, the conservative choice is the sketch.
    """
    if df is not None:
        key = list(key)
        if key:
            largest = (df.groupBy(*key).agg(F.count(column).alias("__n"))
                       .agg(F.max("__n")).first()[0]) or 0
        else:
            largest = df.select(F.count(column)).first()[0] or 0
        if largest <= max_exact_rows:
            return quantile(column, probabilities)
    return approx_quantile(column, probabilities, accuracy)


def rows(column: str = "rows") -> Summarizer:
    """Collect member rows per group as a sorted array of structs
    (reference ``subtractable/RowsSummarizer.scala``; used by
    ``groupByCycle``/``addWindows``)."""
    def build(df: DataFrame, m: Mask, o: Over) -> Column:
        cols = [F.col(c) for c in df.columns if not c.startswith("__")]
        return F.sort_array(o(F.collect_list(F.struct(*cols))))
    return Summarizer([(column, build)])


# ----------------------------------------------------------------------
# reference python-name aliases (python/ts/flint/summarizers.py exports
# max/min/sum — shadowing builtins, as the reference itself does —
# plus zscore / weighted_mean). The reference's ewma / ema_halflife /
# linear_regression summarizers are per-row scan operators here:
# operators.ema.ewma / ema_half_life and operators.regression.
# ols_regression (an exact single-pass aggregate form does not exist —
# the exponent needs the group's min time, and aggregates cannot nest).
# ----------------------------------------------------------------------

max = max_          # noqa: A001 - reference API shadows the builtin
min = min_          # noqa: A001
sum = sum_          # noqa: A001
zscore = z_score
weighted_mean = weighted_mean_test


def approx_count_distinct(column: str, rsd: float = 0.05) -> Summarizer:
    """HyperLogLog++ distinct-count sketch (the 100 TB path for
    cardinality: mergeable across partitions, O(1) state; the reference
    has no distinct-count summarizer at all). ``rsd`` = relative
    standard deviation. Not DuckDB-oracle-able (different sketch);
    pytest-gated against exact distinct counts."""
    return Summarizer([(f"{column}_approxCountDistinct",
                        lambda df, m, o:
                        o(F.approx_count_distinct(m(F.col(column)), rsd)))])


def histogram(column: str, bins: Sequence[float]) -> Summarizer:
    """Fixed-bin histogram as one aggregate expression per bin edge
    pair: counts of rows in [b_i, b_{i+1}) plus underflow/overflow.
    Pure codegen (a masked count per bin), single pass."""
    items: list[tuple[str, Builder]] = [
        (f"{column}_hist_under",
         lambda df, m, o: o(F.count(F.when(m(F.col(column)) < bins[0], 1)))),
    ]
    for i in range(len(bins) - 1):
        lo, hi = bins[i], bins[i + 1]
        items.append((
            f"{column}_hist_{i}",
            (lambda df, m, o, lo=lo, hi=hi:
             o(F.count(F.when((m(F.col(column)) >= lo)
                              & (m(F.col(column)) < hi), 1))))))
    items.append((f"{column}_hist_over",
                  lambda df, m, o:
                  o(F.count(F.when(m(F.col(column)) >= bins[-1], 1)))))
    return Summarizer(items)


class OlsSummarizerSpec:
    """Marker returned by :func:`linear_regression` (reference
    ``python/ts/flint/summarizers.py:337``): OLS is not a frame
    aggregate in this engine, so ``TimeSeriesDataFrame.summarize``
    routes this marker to the Gramian engine
    (``operators.regression.ols_regression`` — one hash aggregation +
    per-group numpy solve, same 15 output fields)."""

    def __init__(self, y, xs, weight=None, use_intercept=True,
                 ignore_constants=False):
        self.y = y
        self.xs = [xs] if isinstance(xs, str) else list(xs)
        self.weight = weight
        self.use_intercept = use_intercept
        self.ignore_constants = ignore_constants


def linear_regression(y_column, x_columns, weight_column=None, *,
                      use_intercept=True, ignore_constants=False):
    """Reference ``summarizers.linear_regression``
    (``python/ts/flint/summarizers.py:337``): returns a marker that
    ``summarize`` routes to the distributed Gramian OLS."""
    return OlsSummarizerSpec(y_column, x_columns, weight_column,
                             use_intercept, ignore_constants)


def ema_halflife(column: str, halflife_duration: str,
                 time_column: str = "time",
                 interpolation: str = "previous",
                 convention: str = "legacy"):
    """Reference ``summarizers.ema_halflife``
    (``python/ts/flint/summarizers.py:236``): EMA with alpha=0.5 and
    one period per half-life (``Summarizers.scala:623-663``), for use
    in ``summarize_windows`` — the running form is
    ``TimeSeriesDataFrame.ema_half_life``."""
    if convention == "legacy" and interpolation == "previous":
        return ewma(column, alpha=0.5,
                    duration_per_period=halflife_duration,
                    convention="legacy")
    return exponential_smoothing(
        column, alpha=0.5, priming_periods=0.0,
        duration_per_period=halflife_duration,
        interpolation=interpolation, convention=convention)
