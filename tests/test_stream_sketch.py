"""Streaming sketch tiers (streaming/stream_sketch.py): micro-batch
sketches fold into the stored tier and the merged result is bit-equal to
a one-shot batch build — percentiles and NDV stay continuously correct
with zero raw rescans and zero lateness loss."""

from __future__ import annotations

from datetime import datetime, timedelta

EV_SCHEMA = "event_type string, ts timestamp, user_id long, value double"


def _rows():
    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        rows.append(
            (
                f"t{i % 3}",
                t0 + timedelta(minutes=7 * (i % 97), hours=i % 5),
                (i * 7919) % 140,
                float((i * 31) % 500),
            )
        )
    return rows


def _run_stream(spark, src, sink):
    q = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force several micro-batches
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streamed_kmv_tier_equals_batch_build(spark, tmp_path):
    from yatsm_spark.operators.sketch import kmv_cascade, kmv_estimate, kmv_sketch
    from yatsm_spark.streaming.stream_sketch import (
        read_sketch_tier,
        sketch_batch_sink,
    )

    rows = _rows()
    src = str(tmp_path / "src")
    # three files => three micro-batches, deliberately OUT OF TIME ORDER
    # (late data): the sketch tier must lose nothing to lateness
    for chunk in (rows[200:300], rows[:200], rows[300:]):
        spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    tier = str(tmp_path / "kmv_tier")
    _run_stream(spark, src, sketch_batch_sink(tier, lambda df: kmv_sketch(df, "1h")))

    streamed = read_sketch_tier(spark, tier, lambda s: kmv_cascade(s, "1h"))
    direct = kmv_sketch(spark.createDataFrame(rows, EV_SCHEMA), "1h")
    a = sorted((r[0], r[1], tuple(r[2]), r[3]) for r in streamed.collect())
    b = sorted((r[0], r[1], tuple(r[2]), r[3]) for r in direct.collect())
    assert a == b and len(a) > 3
    # and the readout agrees too
    ea = sorted(map(tuple, kmv_estimate(streamed).collect()))
    eb = sorted(map(tuple, kmv_estimate(direct).collect()))
    assert ea == eb


def test_streamed_hist_tier_equals_batch_build(spark, tmp_path):
    from yatsm_spark.operators.sketch import (
        hist_cascade,
        hist_percentile,
        hist_sketch,
    )
    from yatsm_spark.streaming.stream_sketch import (
        read_sketch_tier,
        sketch_batch_sink,
    )

    rows = _rows()
    src = str(tmp_path / "src")
    for chunk in (rows[:150], rows[150:]):
        spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    tier = str(tmp_path / "hist_tier")
    _run_stream(
        spark,
        src,
        sketch_batch_sink(
            tier, lambda df: hist_sketch(df, "1h", key_col="event_type")
        ),
    )

    streamed = read_sketch_tier(
        spark, tier, lambda s: hist_cascade(s, "1h", key_col="event_type")
    )
    direct = hist_sketch(
        spark.createDataFrame(rows, EV_SCHEMA), "1h", key_col="event_type"
    )
    pa = sorted(map(tuple, hist_percentile(streamed, key_col="event_type").collect()))
    pb = sorted(map(tuple, hist_percentile(direct, key_col="event_type").collect()))
    assert pa == pb and len(pa) > 3


def test_sketch_sink_replay_is_exactly_once(spark, tmp_path):
    """A replayed micro-batch overwrites its own directory: merging after
    a replay equals merging without it."""
    from yatsm_spark.operators.sketch import kmv_cascade, kmv_sketch
    from yatsm_spark.streaming.stream_sketch import (
        read_sketch_tier,
        sketch_batch_sink,
    )

    rows = _rows()
    df1 = spark.createDataFrame(rows[:200], EV_SCHEMA)
    df2 = spark.createDataFrame(rows[200:], EV_SCHEMA)
    tier = str(tmp_path / "tier")
    sink = sketch_batch_sink(tier, lambda df: kmv_sketch(df, "1h"))
    sink(df1, 0)
    sink(df2, 1)
    before = sorted(
        (r[0], r[1], tuple(r[2]), r[3])
        for r in read_sketch_tier(spark, tier, lambda s: kmv_cascade(s, "1h")).collect()
    )
    sink(df2, 1)  # replay after a simulated failure
    after = sorted(
        (r[0], r[1], tuple(r[2]), r[3])
        for r in read_sketch_tier(spark, tier, lambda s: kmv_cascade(s, "1h")).collect()
    )
    assert before == after


def test_streamed_cm_tier_equals_batch_build(spark, tmp_path):
    """Completes the streamed sketch families: the count-min counter
    matrices are additive, so the streamed tier (per-batch cm_sketch +
    same-tier cascade merge-on-read) is bit-equal to a one-shot batch
    build on the same rows — and so is the heavy-hitter readout against
    the same candidate stream."""
    from yatsm_spark.operators.sketch import (
        cm_candidates,
        cm_cascade,
        cm_sketch,
        cm_topk,
    )
    from yatsm_spark.streaming.stream_sketch import (
        read_sketch_tier,
        sketch_batch_sink,
    )

    rows = _rows()
    src = str(tmp_path / "src_cm")
    for chunk in (rows[200:300], rows[:200], rows[300:]):
        spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    tier = str(tmp_path / "cm_tier")
    _run_stream(spark, src, sketch_batch_sink(tier, lambda df: cm_sketch(df, "1h")))

    streamed = read_sketch_tier(spark, tier, lambda s: cm_cascade(s, "1h"))
    full = spark.createDataFrame(rows, EV_SCHEMA)
    direct = cm_sketch(full, "1h")
    a = sorted((r[0], r[1], tuple(r[2]), tuple(r[3]), r[4]) for r in streamed.collect())
    b = sorted((r[0], r[1], tuple(r[2]), tuple(r[3]), r[4]) for r in direct.collect())
    assert a == b and len(a) > 3
    # heavy-hitter readout agrees: cascade both to 1d and probe the
    # same exact 1h candidates
    cands = cm_candidates(full, "1h", m=4)
    ta = sorted(map(tuple, cm_topk(cm_cascade(streamed, "1d"), cands, "1d", topk=3).collect()))
    tb = sorted(map(tuple, cm_topk(cm_cascade(direct, "1d"), cands, "1d", topk=3).collect()))
    assert ta == tb and len(ta) > 0
