"""Holt-Winters (functions/forecast.py): closed-form anchors on exact
series, then the distributed operator."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from yatsm_spark.functions.forecast import holt_winters, hw_forecast


def test_hw_constant_series_is_exact():
    y = np.full(40, 7.5)
    fitted, fc = holt_winters(y, m=5, horizon=10)
    np.testing.assert_allclose(fitted, 7.5, atol=1e-12)
    np.testing.assert_allclose(fc, 7.5, atol=1e-12)


def test_hw_pure_seasonal_is_exact():
    """Zero trend + exact periodic pattern: the textbook init recovers
    the pattern exactly and every update is a fixed point."""
    pat = np.array([2.0, -1.0, 0.5, -1.5])
    y = np.tile(pat, 12) + 10.0
    fitted, fc = holt_winters(y, m=4, horizon=8)
    np.testing.assert_allclose(fitted, y, atol=1e-12)
    np.testing.assert_allclose(fc, np.tile(pat, 2) + 10.0, atol=1e-12)


def test_hw_exact_linear_forecast_continues_slope():
    t = np.arange(60, dtype=np.float64)
    y = 3.0 + 0.5 * t
    fitted, fc = holt_winters(y, m=6, horizon=6)
    # init is exact for a line (level = first-season mean at its center
    # + ..., trend = b), so the recursion stays on the line
    np.testing.assert_allclose(fc, 3.0 + 0.5 * np.arange(60, 66), atol=1e-8)
    np.testing.assert_allclose(fitted[6:], y[6:], atol=1e-8)


def test_hw_trend_plus_seasonal_is_exact():
    """level+trend+season inputs are a FIXED POINT of the recursion
    under the detrended init — fitted and forecasts exact to 1e-12."""
    k = np.arange(96.0)
    pat = np.array([1.0, -2.0, 0.5, 0.5])
    y = 2.0 + 0.25 * k + np.tile(pat, 24)
    fitted, fc = holt_winters(y, m=4, horizon=8)
    np.testing.assert_allclose(fitted, y, atol=1e-12)
    expect = 2.0 + 0.25 * np.arange(96, 104) + np.tile(pat, 2)
    np.testing.assert_allclose(fc, expect, atol=1e-12)


def test_hw_needs_two_seasons():
    with pytest.raises(ValueError, match="2 seasons"):
        holt_winters(np.arange(9.0), m=5)


@pytest.fixture(scope="module")
def hourly_tier(spark):
    rows = []
    for u in range(3):
        for k in range(24 * 10):  # 10 days hourly
            val = 50.0 + u + 0.01 * k + 5.0 * np.sin(2 * np.pi * (k % 24) / 24)
            rows.append(
                (
                    f"https://hw{u}.example/",
                    pd.Timestamp("2024-03-01") + pd.Timedelta(hours=k),
                    float(val),
                )
            )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "ts", "val"])
    ).cache()


def test_hw_forecast_distributed(spark, hourly_tier):
    out = hw_forecast(hourly_tier, period_rows=24, horizon=12).toPandas()
    fits = out[out["kind"] == "fit"]
    fcs = out[out["kind"] == "forecast"]
    assert len(fits) == 3 * 240 and len(fcs) == 3 * 12
    # forecast timestamps continue the hourly cadence
    g = fcs[fcs["url"] == "https://hw0.example/"].sort_values("ts")
    assert g["ts"].iloc[0] == pd.Timestamp("2024-03-10 23:00:00") + pd.Timedelta(hours=1)
    # near-deterministic input: fitted tracks observed closely after warmup
    w = fits[fits["url"] == "https://hw0.example/"].iloc[48:]
    assert np.abs(w["fitted"] - w["val"]).mean() < 0.5
    # forecasts continue the level+trend+season shape
    k = 240 + np.arange(12)
    expect = 50.0 + 0.01 * k + 5.0 * np.sin(2 * np.pi * (k % 24) / 24)
    assert np.abs(g["fitted"].to_numpy() - expect).mean() < 0.5


def test_hw_refuses_irregular_and_short(spark):
    pdf = pd.DataFrame(
        {
            "url": ["https://bad.example/"] * 3,
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-05"]),
            "val": [1.0, 2.0, 3.0],
        }
    )
    out = hw_forecast(spark.createDataFrame(pdf), period_rows=24, horizon=2)
    assert out.count() == 0


def test_hw_partitioning_invariant(spark, hourly_tier):
    a = (
        hw_forecast(hourly_tier, period_rows=24, horizon=6)
        .toPandas().sort_values(["url", "ts", "kind"]).reset_index(drop=True)
    )
    b = (
        hw_forecast(hourly_tier.repartition(11), period_rows=24, horizon=6)
        .toPandas().sort_values(["url", "ts", "kind"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
