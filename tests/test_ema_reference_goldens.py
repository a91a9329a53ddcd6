"""EMA parity against the reference's own golden fixture
(src/test/resources/timeseries/summarize/summarizer/
exponentialsmoothingsummarizer/Price.csv + ExponentialSmoothingSummarizerSpec):
alpha=0.5, period=100s (timestampsToPeriods=(b-a)/1e11), priming=0 for
the 3x3 variant matrix; the 'expected' column is the keyed default
(alpha=0.05, priming=1, current/core). NaN goldens (core 0/0 priming)
must stay NaN."""

import math

import numpy as np

import pandas as pd
import pytest

from flint_spark.operators.ema import ema_half_life, exponential_smoothing

GOLDEN_CSV = ("/root/reference/src/test/resources/timeseries/summarize/"
              "summarizer/exponentialsmoothingsummarizer/Price.csv")

PERIOD = "100s"  # 1e11 ns


@pytest.fixture(scope="module")
def golden(spark):
    pdf = pd.read_csv(GOLDEN_CSV)
    df = spark.createDataFrame(pdf[["time", "id", "price"]],
                               "time long, id int, price double")
    return pdf, df.coalesce(1)  # single partition preserves file order at ties


def _check(got_df, pdf, col):
    got = got_df.toPandas().sort_values(["time", "id"], kind="stable")
    exp = pdf.sort_values(["time", "id"], kind="stable")
    for g, e in zip(got["price_ema"], exp[col]):
        if math.isnan(e):
            assert math.isnan(g), (col, g, e)
        else:
            assert g == pytest.approx(e, rel=1e-12), (col, g, e)


@pytest.mark.parametrize("convention", ["core", "convolution", "legacy"])
@pytest.mark.parametrize("interpolation", ["previous", "current", "linear"])
def test_smoothing_matrix_vs_reference_golden(spark, golden, convention,
                                              interpolation):
    pdf, df = golden
    # distributed=False: keyless single group keeps file order at ties
    # (the distributed parity test lives in test_extensions.py)
    out = exponential_smoothing(df, "price", alpha=0.5, priming_periods=0.0,
                                duration_per_period=PERIOD,
                                interpolation=interpolation,
                                convention=convention, distributed=False)
    _check(out, pdf, f"expected_{convention}_{interpolation}")


def test_smoothing_default_keyed_vs_reference_golden(spark, golden):
    pdf, df = golden
    out = exponential_smoothing(df, "price", alpha=0.05, priming_periods=1.0,
                                duration_per_period=PERIOD,
                                interpolation="current", convention="core",
                                key=["id"])
    _check(out, pdf, "expected")


def test_half_life_vs_reference_golden(spark, golden):
    pdf, df = golden
    out = ema_half_life(df, "price", "100s", interpolation="previous",
                        convention="legacy", distributed=False)
    _check(out, pdf, "expected_legacy_previous")


def _reference_scalar_es(times, xs, alpha, priming, period_ns,
                         interpolation, convention):
    """Direct scalar transcription of the reference's
    ExponentialSmoothingSummarizer add()/render() recurrence
    (rdd/function/summarize/summarizer/ExponentialSmoothingSummarizer.scala)
    — the independent oracle for priming_periods > 0 where the golden
    CSVs have no coverage."""
    log_decay = math.log(1.0 - alpha)

    def interp(start, end, periods):
        if periods == 0.0:
            return 0.0
        t = periods * log_decay
        d = math.exp(t)
        if interpolation == "previous":
            return (1.0 - d) * start
        if interpolation == "linear":
            idec = (d - 1.0) / t
            return (idec - d) * start + (1.0 - idec) * end
        return (1.0 - d) * end

    def decay(v, periods):
        return math.exp(periods * log_decay) * v

    outs = []
    prim = aux = 0.0
    first_t = first_x = prev_t = None
    for i, (t, x) in enumerate(zip(times, xs)):
        if i == 0:
            first_t, first_x = t, x
        else:
            p = (t - prev_t) / period_ns
            prim = decay(prim, p) + interp(prev_x, x, p)
            aux = decay(aux, p) + interp(1.0, 1.0, p)
        prev_t, prev_x = t, x
        # render() at each row
        ap = (first_t / period_ns) if convention == "legacy" else priming
        primed_p = interp(0.0, first_x, ap)
        primed_a = interp(0.0, 1.0, ap)
        periods = max((prev_t - first_t) / period_ns, 0)
        fp = decay(primed_p, periods) + prim
        fa = decay(primed_a, periods) + aux
        if convention == "core":
            # Scala double division: 0/0 -> NaN, x/0 -> +-inf
            if fa == 0.0:
                outs.append(float("nan") if fp == 0.0
                            else math.copysign(math.inf, fp))
            else:
                outs.append(fp / fa)
        else:
            outs.append(fp)
    return outs


@pytest.mark.parametrize("convention", ["core", "convolution", "legacy"])
@pytest.mark.parametrize("interpolation", ["previous", "current", "linear"])
@pytest.mark.parametrize("priming", [0.5, 2.0])
def test_smoothing_priming_vs_reference_recurrence(spark, convention,
                                                   interpolation, priming):
    period_ns = 100 * 10**9
    times = [100 * 10**9 * k for k in (1, 2, 4, 7, 8, 12)]
    xs = [10.0, 12.0, 9.0, 14.0, 11.0, 13.0]
    df = spark.createDataFrame(list(zip(times, xs)), "time long, x double") \
        .coalesce(1)
    got = (exponential_smoothing(df, "x", alpha=0.3, priming_periods=priming,
                                 duration_per_period="100s",
                                 interpolation=interpolation,
                                 convention=convention, distributed=False)
           .toPandas().sort_values("time")["x_ema"].tolist())
    exp = _reference_scalar_es(times, xs, 0.3, priming, period_ns,
                               interpolation, convention)
    for g, e in zip(got, exp):
        if math.isnan(e):
            assert math.isnan(g)
        else:
            assert g == pytest.approx(e, rel=1e-12), (convention, interpolation)


@pytest.mark.parametrize("convention", ["core", "legacy", "convolution"])
@pytest.mark.parametrize("interpolation", ["current", "previous", "linear"])
def test_windowed_smoothing_matches_per_window_recompute(spark, convention,
                                                         interpolation):
    """exponential_smoothing_windowed == brute-force ES re-run on every
    window slice (the reference's summarizeWindows(exponentialSmoothing)
    semantics, re-primed at each window's first row)."""
    from flint_spark import windows as W
    from flint_spark.operators.ema import exponential_smoothing_windowed

    rng = np.random.default_rng(7)
    n = 200
    times = np.cumsum(rng.integers(3600, 7200, n)) * 10**9
    xs = rng.normal(5, 2, n)
    df = spark.createDataFrame(
        [(int(t), float(x)) for t, x in zip(times, xs)],
        "time long, value double")

    WIN = 24 * 3600 * 10**9
    period_ns = 6 * 3600 * 10**9
    alpha, priming = 0.2, 1.5
    lam = -np.log1p(-alpha)

    def es_slice(tt, xx):
        periods = np.diff(tt) / period_ns
        first = (tt[0] - 0) / period_ns if convention == "legacy" else priming
        T = np.concatenate(([first], periods)) * lam
        d = np.exp(-T)
        xp = np.concatenate(([0.0], xx[:-1]))
        if interpolation == "current":
            c = (1 - d) * xx
        elif interpolation == "previous":
            c = (1 - d) * xp
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                nu = np.where(T > 1e-12, (1 - d) / T, 1.0)
            c = (nu - d) * xp + (1 - nu) * xx
        ev = 0.0
        for k in range(len(tt)):
            ev = d[k] * ev + c[k]
        if convention != "core":
            return ev
        ac = 1 - d
        if interpolation == "previous":
            ac[0] = 0.0
        elif interpolation == "linear":
            nu0 = (1 - d[0]) / T[0] if T[0] > 1e-12 else 1.0
            ac[0] = 1 - nu0
        av = 0.0
        for k in range(len(tt)):
            av = d[k] * av + ac[k]
        return ev / av

    exp = np.array([es_slice(times[(times >= times[j] - WIN)
                                   & (times <= times[j])],
                             xs[(times >= times[j] - WIN)
                                & (times <= times[j])])
                    for j in range(n)])
    got = (exponential_smoothing_windowed(
               df, "value", W.past_absolute_time("1d"), alpha=alpha,
               priming_periods=priming, duration_per_period="6h",
               interpolation=interpolation, convention=convention)
           .toPandas().sort_values("time")["value_ema"].to_numpy())
    assert np.nanmax(np.abs(got - exp) / np.maximum(np.abs(exp), 1e-9)) < 1e-9
