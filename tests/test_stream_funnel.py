"""Streaming ordered-funnel: transitions match the batch twin, output is
independent of micro-batch slicing for in-order arrival, and cross-batch
event-time regressions are skipped loudly (n_late) instead of silently
reordering the greedy fold."""

from __future__ import annotations

from datetime import datetime

from yatsm_spark.streaming.stream_funnel import funnel_stream

SCHEMA = "user_id long, ts timestamp, event_type string"
STEPS = ["view", "click", "purchase"]


def _t(m):
    return datetime(2024, 1, 1, 0, m)


ROWS = [
    (1, _t(0), "view"), (1, _t(1), "error"), (1, _t(2), "click"),
    (1, _t(3), "view"), (1, _t(4), "purchase"),
    (2, _t(0), "click"), (2, _t(1), "view"), (2, _t(5), "click"),
    (3, _t(0), "view"), (3, _t(1), "purchase"),
    (4, _t(0), "click"), (4, _t(1), "purchase"),
    (5, _t(0), "view"), (5, _t(0), "click"), (5, _t(2), "click"),
]


def _run(spark, path, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        funnel_stream(stream, STEPS)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["user_id"], r["step"]): r["ts"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def _batch_expected(spark):
    from yatsm_spark.operators.series import funnel

    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {}
    for r in funnel(df, STEPS).collect():
        for i in range(1, 4):
            if r[f"t{i}"] is not None:
                out[(r["user_id"], i)] = r[f"t{i}"]
    return out


def test_stream_funnel_matches_batch(spark, tmp_path):
    path = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(path)
    assert _run(spark, path, "f_all") == _batch_expected(spark)


def test_stream_funnel_slicing_invariant(spark, tmp_path):
    """One event per micro-batch (ts order per key) == one big batch."""
    path = str(tmp_path / "src")
    for row in sorted(ROWS, key=lambda r: (r[1], STEPS.index(r[2]) if r[2] in STEPS else 9)):
        spark.createDataFrame([row], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    assert _run(spark, path, "f_sliced") == _batch_expected(spark)


def test_stream_funnel_late_event_skipped(spark, tmp_path):
    """A cross-batch event-time regression cannot retroactively advance
    the fold: user 9's click at t1 arrives AFTER its view at t5 was
    folded, so step 2 must not fire."""
    path = str(tmp_path / "src")
    spark.createDataFrame([(9, _t(5), "view")], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame([(9, _t(1), "click")], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    out = _run(spark, path, "f_late")
    assert out == {(9, 1): _t(5)}
