"""Mergeable histogram-sketch percentile tiers (operators/sketch.py)."""

from __future__ import annotations

from datetime import datetime, timedelta


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_hist_percentile_hand_values(spark):
    from yatsm_spark.operators.sketch import hist_percentile, hist_sketch

    t0 = datetime(2024, 1, 1)
    # one key, one 1h bucket; width 10 units at scale 1 -> hb = value // 10
    rows = [(1, t0, float(v)) for v in [3, 7, 12, 18, 25, 25, 31, 44, 44, 97]]
    sk = hist_sketch(_events(spark, rows), "1h", scale=1, width_u=10)
    got = hist_percentile(sk, qs=(50, 95), width_u=10).first()
    # counts: hb0=2, hb1=2, hb2=2, hb3=1, hb4=2, hb9=1 (total 10)
    # p50 target = ceil(5.0) = 5 -> cum 2,4,6 -> hb2 -> 20
    # p95 target = ceil(9.5) = 10 -> hb9 -> 90
    assert got["total"] == 10
    assert got["p50_u"] == 20
    assert got["p95_u"] == 90


def test_hist_cascade_equals_direct_build(spark):
    """The exactness contract: percentiles from 1h sketches MERGED to 1d
    equal percentiles from a 1d sketch built directly from raw."""
    from yatsm_spark.operators.sketch import (
        hist_cascade,
        hist_percentile,
        hist_sketch,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        (uid, t0 + timedelta(minutes=37 * i), float((i * 7919 + uid * 31) % 500))
        for uid in range(3)
        for i in range(200)
    ]
    ev = _events(spark, rows)
    via_cascade = hist_percentile(hist_cascade(hist_sketch(ev, "1h"), "1d"))
    direct = hist_percentile(hist_sketch(ev, "1d"))
    a = sorted(map(tuple, via_cascade.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b and len(a) > 5


def test_hist_sketch_arrays_sorted_and_total(spark):
    from yatsm_spark.operators.sketch import hist_sketch

    t0 = datetime(2024, 1, 1)
    rows = [(1, t0 + timedelta(minutes=i), float(500 - i)) for i in range(50)]
    for r in hist_sketch(_events(spark, rows), "1h", scale=1, width_u=7).collect():
        assert r["hb"] == sorted(r["hb"])
        assert sum(r["cnt"]) == r["total"]
