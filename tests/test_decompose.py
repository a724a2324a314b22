"""STL-style seasonal decomposition (functions/decompose.py): analytic
anchors on planted trend+season+spike series, then the distributed
operator."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from yatsm_spark.functions.decompose import seasonal_decompose, stl_decompose


def _planted(n=400, period=7.0, slope=0.05, amp=3.0, spike_at=200):
    t = np.arange(n, dtype=np.float64) * 0.5  # 2 obs/day over 200 days
    season = amp * np.sin(2 * np.pi * (t % period) / period)
    trend = 10.0 + slope * t
    y = trend + season
    y[spike_at] += 40.0
    return t, y, trend, season


def test_stl_recovers_planted_components():
    t, y, trend_true, season_true = _planted()
    trend, seas, rem, anom = stl_decompose(t, y, period_days=7.0, n_bins=14)
    interior = slice(30, -30)  # lowess edges are wider
    ok = np.ones(t.size, dtype=bool)
    ok[200] = False  # ignore the planted spike row itself
    m = ok[interior]
    assert np.abs((trend[interior] - trend_true[interior])[m]).mean() < 0.6
    assert np.abs((seas[interior] - season_true[interior])[m]).mean() < 0.6
    # remainder is near zero off the spike
    assert np.abs(rem[interior][m]).mean() < 0.6


def test_stl_flags_the_spike_only():
    t, y, _, _ = _planted()
    _, _, _, anom = stl_decompose(t, y, period_days=7.0, n_bins=14)
    assert anom[200]
    assert anom.sum() <= 3  # the spike (plus at most its lowess shoulder)


def test_stl_seasonal_is_centered_and_periodic():
    t, y, _, _ = _planted()
    trend, seas, _, _ = stl_decompose(t, y, period_days=7.0, n_bins=14)
    # same cycle position -> identical seasonal value (subseries means)
    pos = np.floor((t % 7.0) / 7.0 * 14).astype(int)
    for p in np.unique(pos):
        vals = seas[pos == p]
        assert np.allclose(vals, vals[0])
    assert abs(seas.mean()) < 0.2


def test_stl_constant_series():
    t = np.arange(50, dtype=np.float64)
    y = np.full(50, 5.0)
    trend, seas, rem, anom = stl_decompose(t, y, period_days=7.0)
    np.testing.assert_allclose(trend, 5.0, atol=1e-9)
    np.testing.assert_allclose(seas, 0.0, atol=1e-9)
    assert not anom.any()


@pytest.fixture(scope="module")
def planted_obs(spark):
    rows = []
    for u in range(4):
        t, y, _, _ = _planted(spike_at=100 + 40 * u)
        for ti, yi in zip(t, y):
            rows.append(
                (
                    f"https://stl{u}.example/",
                    pd.Timestamp("2024-01-01") + pd.Timedelta(days=ti),
                    float(yi),
                )
            )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "ts", "val"])
    ).cache()


def test_seasonal_decompose_distributed(spark, planted_obs):
    out = seasonal_decompose(planted_obs, period_days=7.0).toPandas()
    assert len(out) == 4 * 400
    assert set(out.columns) == {
        "url", "ts", "val", "trend", "seasonal", "remainder", "is_anomaly"
    }
    # identity holds exactly (post-quantization tolerance)
    recon = out["trend"] + out["seasonal"] + out["remainder"]
    assert np.abs(recon - out["val"]).max() < 1e-5
    # each url flags its own planted spike
    for u in range(4):
        g = out[out["url"] == f"https://stl{u}.example/"].sort_values("ts")
        assert g["is_anomaly"].iloc[100 + 40 * u]


def test_seasonal_decompose_partitioning_invariant(spark, planted_obs):
    a = (
        seasonal_decompose(planted_obs, period_days=7.0)
        .toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    )
    b = (
        seasonal_decompose(planted_obs.repartition(13), period_days=7.0)
        .toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
