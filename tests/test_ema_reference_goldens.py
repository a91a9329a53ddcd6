"""EMA parity against the reference's own golden fixture
(src/test/resources/timeseries/summarize/summarizer/
exponentialsmoothingsummarizer/Price.csv + ExponentialSmoothingSummarizerSpec):
alpha=0.5, period=100s (timestampsToPeriods=(b-a)/1e11), priming=0 for
the 3x3 variant matrix; the 'expected' column is the keyed default
(alpha=0.05, priming=1, current/core). NaN goldens (core 0/0 priming)
must stay NaN."""

import math

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
