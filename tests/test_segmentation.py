"""Spark-side segmentation plumbing + changemap queries (SURVEY §2.4-2.5)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from yatsm_spark.functions.ccdc import CCDCParams
from yatsm_spark.operators.changemap import (
    break_magnitude,
    change_summary,
    coef_at,
    predict_at,
)
from yatsm_spark.operators.rollup import rollup, series_clean
from yatsm_spark.plans.segmentation import segment_series

BASE = pd.Timestamp("2020-01-01")


def _mk_series(url: str, rng, n_days=3 * 365, cadence=8, shift_at=None, shift=800.0):
    t = np.arange(0, n_days, cadence, dtype=np.float64)
    y = 2000.0 + 300.0 * np.cos(2 * math.pi * t / 365.25) + rng.normal(0, 20.0, t.size)
    if shift_at is not None:
        y = y + np.where(t >= shift_at, shift, 0.0)
    return pd.DataFrame(
        {"url": url, "bucket_ts": BASE + pd.to_timedelta(t, unit="D"), "mean_len": y}
    )


@pytest.fixture(scope="module")
def segments(spark):
    rng = np.random.default_rng(7)
    pdf = pd.concat(
        [
            _mk_series("fx://stable", rng),
            _mk_series("fx://break-step", rng, shift_at=547.0),
            _mk_series("fx://short", rng)[:6],
        ]
    )
    sdf = spark.createDataFrame(pdf)
    return segment_series(sdf, CCDCParams()).cache()


def test_segment_statuses(segments):
    rows = {r["url"]: r for r in segments.groupBy("url").agg(F.count("*").alias("n")).collect()}
    assert rows["fx://stable"]["n"] == 1
    assert rows["fx://break-step"]["n"] == 2
    assert rows["fx://short"]["n"] == 1
    stable = segments.filter("url = 'fx://stable'").first()
    assert stable["status"] == "stable" and stable["break_ts"] is None
    # time axis is absolute epoch-days, so the raw intercept extrapolates to
    # 1970 — assert the origin-invariant seasonal amplitude instead
    amp = math.hypot(stable["coef"][2], stable["coef"][3])
    assert abs(amp - 300.0) < 25
    assert abs(stable["rmse"] - 20.0) < 8
    short = segments.filter("url = 'fx://short'").first()
    assert short["status"] == "insufficient"


def test_break_location_and_magnitude(segments):
    broken = segments.filter("url = 'fx://break-step' and status = 'broken'").first()
    assert broken is not None
    expected = BASE + pd.Timedelta(days=547)
    assert abs((broken["break_ts"] - expected).total_seconds()) <= 50 * 86400
    assert abs(broken["magnitude"] - 800.0) < 150


def test_change_summary_and_magnitude_queries(segments):
    cs = change_summary(segments, "2020-01-01", "2023-01-01")
    rows = {r["url"]: r for r in cs.collect()}
    assert list(rows) == ["fx://break-step"]
    assert rows["fx://break-step"]["n_breaks"] == 1
    bm = break_magnitude(segments, "2020-01-01", "2023-01-01").first()
    assert abs(bm["magnitude"] - 800.0) < 150


def test_coef_and_predict_at(segments):
    at = "2020-06-01"
    c = coef_at(segments, at)
    assert c.filter("url = 'fx://stable'").count() == 1
    p = {r["url"]: r["prediction"] for r in predict_at(segments, at).collect()}
    t_rel = (pd.Timestamp(at) - BASE).days
    truth = 2000.0 + 300.0 * math.cos(2 * math.pi * t_rel / 365.25)
    assert abs(p["fx://stable"] - truth) < 40


def test_segmentation_over_crawl(spark):
    """End-to-end: crawl -> clean -> 1d rollup -> segmentation. Hot break-step
    urls must be detected with short-series params (no annual harmonic)."""
    from yatsm_spark.datagen import generate_crawl

    crawl = generate_crawl(spark, n_urls=12, span_days=400)
    r1d = rollup(series_clean(crawl), "1d")
    # datagen signal is a weekly cycle: weekly harmonic, 3-week min span
    params = CCDCParams(harmonic_order=1, period=7.0, min_span=21.0, retrain_time=30.0)
    segs = segment_series(r1d, params).cache()
    assert segs.filter(F.col("url").isNull()).count() == 0
    # every url produced at least one record
    n_urls = r1d.select("url").distinct().count()
    assert segs.select("url").distinct().count() == n_urls
    # urls 3 and 10 are break-step by construction (kind = url_id % 7 == 3)
    broken_urls = {r["url"] for r in segs.filter("status = 'broken'").collect()}
    assert any("page000003" in u for u in broken_urls)
    segs.unpersist()


def _multi_break_series(rng, n_days=9 * 365, cadence=4):
    """Long series with a level shift every ~18 months (several breaks)."""
    t = np.arange(0, n_days, cadence, dtype=np.float64)
    y = 2000.0 + 300.0 * np.cos(2 * math.pi * t / 365.25) + rng.normal(0, 20.0, t.size)
    for k, shift_at in enumerate(range(540, n_days - 200, 540)):
        y = y + np.where(t >= shift_at, 700.0 * (1 if k % 2 == 0 else -1), 0.0)
    return t, y


def _seg_key(s):
    return (
        round(s.start_t, 6),
        round(s.end_t, 6),
        None if math.isnan(s.break_t) else round(s.break_t, 6),
        s.n_obs,
        s.status,
        tuple(round(float(c), 9) for c in s.coef),
        None if math.isnan(s.rmse) else round(s.rmse, 9),
    )


def test_chunked_fit_equals_single_pass():
    """Split-and-stitch over small windows == the single-pass fit, exactly
    (same segments, same coefficients) — the no-loss replacement for the
    old downsampling guard."""
    from yatsm_spark.functions.ccdc import fit_series, fit_series_chunked

    rng = np.random.default_rng(11)
    t, y = _multi_break_series(rng)
    params = CCDCParams()
    full = fit_series(t, y, params)
    assert sum(s.status.startswith("broken") for s in full) >= 3
    for chunk_rows in (150, 301):
        chunked = fit_series_chunked(t, y, params, chunk_rows=chunk_rows)
        assert [_seg_key(s) for s in chunked] == [_seg_key(s) for s in full]


def test_chunked_fit_equals_single_pass_with_postpasses():
    """Equality must survive the Chow-merge and CUSUM-omission post-passes
    (they run once over the stitched list) and the global MAD screen."""
    from yatsm_spark.functions.ccdc import fit_series, fit_series_chunked

    rng = np.random.default_rng(13)
    t, y = _multi_break_series(rng)
    params = CCDCParams(commission_alpha=0.01, omission_alpha=0.05, screen="mad")
    full = fit_series(t, y, params)
    chunked = fit_series_chunked(t, y, params, chunk_rows=200)
    assert [_seg_key(s) for s in chunked] == [_seg_key(s) for s in full]


def test_giant_group_segments_exactly(spark):
    """A url group larger than max_group_rows produces segments EQUAL to
    the unbounded fit — and never carries a '+downsampled' status."""
    rng = np.random.default_rng(17)
    t, y = _multi_break_series(rng, n_days=6 * 365, cadence=2)
    pdf = pd.DataFrame(
        {"url": "fx://giant", "bucket_ts": BASE + pd.to_timedelta(t, unit="D"), "mean_len": y}
    )
    sdf = spark.createDataFrame(pdf)
    bounded = segment_series(sdf, CCDCParams(), max_group_rows=250).collect()
    unbounded = segment_series(sdf, CCDCParams(), max_group_rows=10**9).collect()
    key = lambda r: (r["seg_id"], r["start_ts"], r["end_ts"], r["break_ts"], r["n_obs"], r["status"], tuple(r["coef"]))
    assert sorted(map(key, bounded)) == sorted(map(key, unbounded))
    assert all("downsampled" not in r["status"] for r in bounded)
