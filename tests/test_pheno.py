"""K12 phenology: smoothing-spline numerics (analytic anchors) + the
distributed long-term-mean operator (functions/pheno.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from yatsm_spark.functions.pheno import (
    _halfmax_doys,
    longterm_pheno,
    smooth_spline_fit,
    spline_eval,
)


def _sine(doy, phase=80.0, amp=2.0, base=5.0, period=365.0):
    return base + amp * np.sin(2 * np.pi * (doy - phase) / period)


# ------------------------------------------------------ spline numerics


def test_spline_interpolates_at_tiny_lambda():
    x = np.arange(1.0, 21.0)
    y = np.sin(x / 3.0)
    f, g, _ = smooth_spline_fit(x, y, np.ones_like(x), lam=1e-10)
    np.testing.assert_allclose(f, y, atol=1e-6)
    # and the spline EVALUATES back to its own knot values exactly
    np.testing.assert_allclose(spline_eval(x, f, g, x), f, atol=1e-9)


def test_spline_huge_lambda_is_weighted_line():
    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(0, 100, 40))
    y = 3.0 + 0.5 * x + rng.normal(0, 1, 40)
    w = np.ones_like(x)
    # 1e9 is deep in the line limit but still well-conditioned in float64
    # (past ~1e12 the dense solve loses the null-space projection; the GCV
    # grid tops out at 1e6, far inside the safe regime)
    f, _, _ = smooth_spline_fit(x, y, w, lam=1e9)
    # closed-form weighted least-squares line
    b = np.polyfit(x, y, 1)
    np.testing.assert_allclose(f, b[1] + b[0] * x, atol=1e-3)


def test_spline_line_is_fixed_point():
    """A straight line has zero curvature penalty: any lam returns it."""
    x = np.arange(1.0, 31.0)
    y = 2.0 - 0.25 * x
    for lam in (1e-6, 1.0, 1e6):
        f, g, _ = smooth_spline_fit(x, y, np.ones_like(x), lam=lam)
        np.testing.assert_allclose(f, y, atol=1e-8)
        np.testing.assert_allclose(g, 0.0, atol=1e-8)


def test_gcv_beats_raw_noise():
    """GCV-smoothed fit is closer to the noiseless truth than the noisy
    observations are (the point of smoothing)."""
    rng = np.random.default_rng(42)
    x = np.arange(1.0, 366.0, 4.0)
    truth = _sine(x)
    y = truth + rng.normal(0, 0.6, x.size)
    f, _, lam = smooth_spline_fit(x, y, np.ones_like(x), lam=None)
    assert np.sqrt(np.mean((f - truth) ** 2)) < 0.5 * np.sqrt(
        np.mean((y - truth) ** 2)
    )
    assert np.isfinite(lam)


def test_spline_weights_pull_fit():
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    y = np.array([0.0, 0.0, 10.0, 0.0, 0.0])
    light, _, _ = smooth_spline_fit(x, y, np.array([1, 1, 0.1, 1, 1.0]), lam=1.0)
    heavy, _, _ = smooth_spline_fit(x, y, np.array([1, 1, 10.0, 1, 1.0]), lam=1.0)
    assert heavy[2] > light[2]  # heavier center point -> fit tracks it


def test_spline_eval_extrapolates_linearly():
    x = np.arange(10.0, 20.0)
    y = x * 1.5 + 1.0
    f, g, _ = smooth_spline_fit(x, y, np.ones_like(x), lam=1e-8)
    out = spline_eval(x, f, g, np.array([0.0, 30.0]))
    np.testing.assert_allclose(out, np.array([1.0, 46.0]), atol=1e-5)


def test_halfmax_analytic_sine():
    """For base+amp*sin(2pi (d-phase)/365): peak at phase+91.25, half-max
    (= base) upward crossing at the phase day, downward at phase+182.5."""
    doys = np.arange(1.0, 366.0)
    curve = _sine(doys, phase=80.0)
    spring, autumn = _halfmax_doys(doys, curve)
    assert abs(spring - 81) <= 1  # first dense doy at/above base
    assert abs(autumn - 263) <= 1  # 80 + 182.5 -> first doy below
    assert abs(int(doys[np.argmax(curve)]) - 171) <= 1


def test_halfmax_monotone_returns_none_side():
    doys = np.arange(1.0, 101.0)
    spring, autumn = _halfmax_doys(doys, doys.copy())  # monotone rise
    assert autumn is None and spring is not None


# ------------------------------------------------- distributed operator


@pytest.fixture(scope="module")
def seasonal_obs(spark):
    """3 years of 3-daily observations for 6 urls with url-specific phase
    (20 + 15*u) and amplitude; two interleaved 'years' worth of noise-free
    values so per-DOY means are exact."""
    rows = []
    for u in range(6):
        for day in range(0, 3 * 365, 3):
            doy = day % 365 + 1
            val = _sine(np.array([float(doy)]), phase=20.0 + 15 * u, amp=1.0 + u)[0]
            rows.append(
                (
                    f"https://s{u}.example/",
                    pd.Timestamp("2021-01-01") + pd.Timedelta(days=day),
                    float(val),
                )
            )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "ts", "val"])
    ).cache()


def test_longterm_pheno_recovers_planted_seasonality(spark, seasonal_obs):
    out = longterm_pheno(seasonal_obs, lam=None).toPandas().set_index("url")
    assert len(out) == 6
    for u in range(6):
        r = out.loc[f"https://s{u}.example/"]
        phase = 20.0 + 15 * u
        assert abs(r["peak_doy"] - (phase + 91.25)) <= 4
        assert abs(r["spring_doy"] - (phase + 1)) <= 4
        assert abs(r["autumn_doy"] - (phase + 183)) <= 4
        # amplitude 2*(1+u), quantized x1e4
        assert abs(r["amp_x1e4"] - 2 * (1.0 + u) * 1e4) <= 0.05 * 1e4
        assert r["cor_x1e4"] >= 9990  # fit ~= exact per-DOY means
        assert r["n_obs"] == 365


def test_longterm_pheno_sparse_group_nulls(spark):
    pdf = pd.DataFrame(
        {
            "url": ["https://sparse.example/"] * 3,
            "ts": pd.to_datetime(["2021-01-01", "2021-06-01", "2021-09-01"]),
            "val": [1.0, 2.0, 3.0],
        }
    )
    out = longterm_pheno(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == 1
    assert out["n_doy"].iloc[0] == 3 and out["n_obs"].iloc[0] == 3
    assert pd.isna(out["peak_doy"].iloc[0]) and pd.isna(out["cor_x1e4"].iloc[0])


def test_longterm_pheno_partitioning_invariant(spark, seasonal_obs):
    a = longterm_pheno(seasonal_obs, lam=None).toPandas().sort_values("url")
    b = (
        longterm_pheno(seasonal_obs.repartition(17), lam=None)
        .toPandas()
        .sort_values("url")
    )
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
