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
    out = exponential_smoothing(df, "price", alpha=0.5, priming_periods=0.0,
                                duration_per_period=PERIOD,
                                interpolation=interpolation,
                                convention=convention)
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
                        convention="legacy")
    _check(out, pdf, "expected_legacy_previous")
