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


def _kmv_events(spark, rows):
    return spark.createDataFrame(rows, "event_type string, ts timestamp, user_id long")


def test_kmv_exact_below_k(spark):
    """A bucket with fewer than k distinct values reads out EXACTLY."""
    from yatsm_spark.operators.sketch import kmv_estimate, kmv_sketch

    t0 = datetime(2024, 1, 1)
    # 7 distinct users, each seen 3x (duplicates must collapse)
    rows = [("click", t0 + timedelta(seconds=i), i % 7) for i in range(21)]
    got = kmv_estimate(kmv_sketch(_kmv_events(spark, rows), "1h")).first()
    assert got["ndv_est"] == 7
    assert got["sketch_size"] == 7


def test_kmv_cascade_equals_direct_build(spark):
    """The exactness contract: 1h sketches MERGED to 1d equal a 1d
    sketch built directly from raw — so the tier survives raw age-out."""
    from yatsm_spark.operators.sketch import kmv_cascade, kmv_estimate, kmv_sketch

    t0 = datetime(2024, 1, 1)
    rows = [
        (f"t{i % 3}", t0 + timedelta(minutes=11 * i), (i * 7919) % 400)
        for i in range(1200)
    ]
    ev = _kmv_events(spark, rows)
    via_cascade = kmv_estimate(kmv_cascade(kmv_sketch(ev, "1h"), "1d"))
    direct = kmv_estimate(kmv_sketch(ev, "1d"))
    a = sorted(map(tuple, via_cascade.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b and len(a) > 3


def test_kmv_two_phase_matches_one_window(spark):
    """The skew-safe two-phase bottom-k is bit-identical to the plain
    one-window form, at any input partitioning."""
    from yatsm_spark.operators.sketch import kmv_sketch

    t0 = datetime(2024, 1, 1)
    rows = [("hot", t0 + timedelta(seconds=i), i % 500) for i in range(2000)]
    ev = _kmv_events(spark, rows).repartition(16)
    a = sorted(map(tuple, kmv_sketch(ev, "1h", two_phase=True).collect()))
    b = sorted(map(tuple, kmv_sketch(ev, "1h", two_phase=False).collect()))
    assert a == b and len(a) > 0


def test_kmv_estimator_accuracy(spark):
    """At n >> k the estimator lands within the KMV sampling-error band
    (~1/sqrt(k-2) relative) — catches a silently-broken estimator."""
    from yatsm_spark.operators.sketch import kmv_estimate, kmv_sketch

    t0 = datetime(2024, 1, 1)
    n = 5000
    rows = [("e", t0 + timedelta(milliseconds=i), i) for i in range(n)]
    got = kmv_estimate(kmv_sketch(_kmv_events(spark, rows), "1d", k=256), k=256).first()
    assert got["sketch_size"] == 256
    assert abs(got["ndv_est"] - n) / n < 0.25


def _typed_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, user_id long"
    )


def test_cm_cascade_equals_direct_build(spark):
    """Counter matrices add cell-wise: 1h sketches merged to 1d equal a
    1d sketch built directly from raw — the mergeability contract."""
    from yatsm_spark.operators.sketch import cm_cascade, cm_sketch

    t0 = datetime(2024, 1, 1)
    rows = [
        ("click" if i % 3 else "view", t0 + timedelta(minutes=13 * i),
         (i * 7919 + 31) % 40)
        for i in range(600)
    ]
    ev = _typed_events(spark, rows)
    a = sorted(map(tuple, cm_cascade(cm_sketch(ev, "1h"), "1d").collect()))
    b = sorted(map(tuple, cm_sketch(ev, "1d").collect()))
    assert a == b and len(a) >= 2


def test_cm_estimate_upper_bounds_true_count(spark):
    """The CM guarantee: every probe's estimate >= the item's true count
    (collisions only ever ADD) — checked for every candidate at a width
    small enough (8) to force collisions."""
    from yatsm_spark.operators.series import bucket_col
    from yatsm_spark.operators.sketch import cm_candidates, cm_sketch, cm_topk

    t0 = datetime(2024, 1, 1)
    rows = [
        ("view", t0 + timedelta(seconds=97 * i), (i * i + 7 * i) % 30)
        for i in range(500)
    ]
    ev = _typed_events(spark, rows)
    sk = cm_sketch(ev, "1d", depth=4, width=8)
    cand = cm_candidates(ev, "1h", m=8)
    got = cm_topk(sk, cand, "1d", topk=30, depth=4, width=8).collect()
    true = {
        (r["event_type"], r["bucket_ts"], r["item"]): r["c"]
        for r in ev.groupBy(
            "event_type",
            bucket_col("ts", "1d").alias("bucket_ts"),
            ev.user_id.cast("string").alias("item"),
        )
        .count()
        .withColumnRenamed("count", "c")
        .collect()
    }
    assert len(got) > 5
    for r in got:
        key = (r["event_type"], r["bucket_ts"], r["item"])
        assert r["est_cnt"] >= true[key]


def test_cm_topk_exact_when_width_ample(spark):
    """With width >> distinct items there are no collisions, so the CM
    top-k IS the exact top-k (count desc, item asc) — pins estimator
    and ranking determinism in one shot."""
    from yatsm_spark.operators.sketch import cm_candidates, cm_sketch, cm_topk

    t0 = datetime(2024, 1, 1)
    # item i appears (10 - i) times -> exact top-3 is items 0,1,2
    rows = [
        ("view", t0 + timedelta(seconds=60 * i + j), i)
        for i in range(10)
        for j in range(10 - i)
    ]
    ev = _typed_events(spark, rows)
    sk = cm_sketch(ev, "1d", depth=4, width=512)
    top = cm_topk(sk, cm_candidates(ev, "1h", m=10), "1d", topk=3,
                  depth=4, width=512).collect()
    got = [(r["item"], r["est_cnt"], r["rk"]) for r in
           sorted(top, key=lambda r: r["rk"])]
    assert got == [("0", 10, 1), ("1", 9, 2), ("2", 8, 3)]
