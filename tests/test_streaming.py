"""Structured Streaming surface (SURVEY.md §2.6): watermarked rollup,
session windows, stateful CCDC monitor — driven through a file source with
Trigger.AvailableNow into a memory sink."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from yatsm_spark.streaming.stream_rollup import (
    monitor_stream,
    stream_rollup,
    stream_sessionize,
)

SCHEMA = "url string, warc_ts timestamp, text_len long"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, src_path, build, name):
    stream = spark.readStream.schema(SCHEMA).parquet(src_path)
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.fixture()
def src(spark, tmp_path):
    path = str(tmp_path / "stream_src")
    t0 = datetime(2024, 1, 1)
    rows = []
    # url A: 3 obs in hour 0, 2 in hour 1; far-future row advances the
    # watermark so earlier windows finalize in append mode
    for m, v in [(5, 100), (20, 110), (40, 120), (65, 200), (80, 210)]:
        rows.append(("A", t0 + timedelta(minutes=m), v))
    rows.append(("A", t0 + timedelta(days=2), 999))
    _write_batch(spark, path, rows)
    return path


def test_stream_rollup_matches_batch_buckets(spark, src):
    out = _run_stream(
        spark, src, lambda s: stream_rollup(s, "1h", "2 hours"), "t_rollup"
    ).collect()
    got = {r["bucket_ts"]: (r["cnt"], r["sum_val"], r["min_val"], r["max_val"]) for r in got_rows(out)}
    assert got[datetime(2024, 1, 1, 0)] == (3, 330, 100, 120)
    assert got[datetime(2024, 1, 1, 1)] == (2, 410, 200, 210)
    # the far-future row's window is NOT finalized (append mode) — that IS
    # the watermark semantics difference vs batch, documented in §2.6
    assert datetime(2024, 1, 3, 0) not in got


def got_rows(rows):
    return [r for r in rows]


def test_stream_sessionize(spark, src):
    out = _run_stream(
        spark,
        src,
        lambda s: stream_sessionize(s, gap="30 minutes", watermark="1 hour"),
        "t_sess",
    ).collect()
    # obs at 5,20,40 chain (gaps < 30m); 65,80 chain; 40->65 gap 25m chains
    # them all into ONE session [00:05, 01:50); far row separate (not final)
    finalized = [r for r in out if r["session_start"] < datetime(2024, 1, 2)]
    assert len(finalized) == 1
    assert finalized[0]["n_obs"] == 5


def test_monitor_stream_detects_break(spark, tmp_path):
    path = str(tmp_path / "mon_src")
    t0 = datetime(2024, 1, 1)
    rows = []
    # 16 training obs on a flat signal, then 8 shifted obs -> break after 5
    for i in range(16):
        rows.append(("B", t0 + timedelta(hours=6 * i), 1000 + (i % 3)))
    for i in range(8):
        rows.append(("B", t0 + timedelta(hours=6 * (16 + i)), 2000))
    _write_batch(spark, path, rows)
    out = _run_stream(
        spark,
        path,
        lambda s: monitor_stream(s, threshold=3.5, consecutive=5, period=7.0),
        "t_mon",
    ).collect()
    scored = sorted(out, key=lambda r: r["warc_ts"])
    # 5 scored obs: 4 exceedances then the break; the post-break obs feed
    # the reset model's retraining buffer and emit nothing
    assert len(scored) == 5
    assert [r["is_break"] for r in scored] == [False] * 4 + [True]
    assert all(r["score"] > 3.5 for r in scored)


def test_monitor_trains_across_many_tiny_batches(spark, tmp_path):
    """Regression: the training buffer must persist in the state store.

    Every observation arrives in its OWN micro-batch (maxFilesPerTrigger=1,
    one row per file), so no single batch ever carries the 16 training rows.
    A monitor that rebuilds its buffer per batch never trains and never
    scores; the persisted-buffer monitor must produce output identical to
    the single-batch run."""
    path = str(tmp_path / "mon_tiny_src")
    sink = str(tmp_path / "mon_tiny_out")
    ckpt = str(tmp_path / "mon_tiny_ckpt")
    t0 = datetime(2024, 1, 1)
    rows = [("D", t0 + timedelta(hours=6 * i), 700 + (i % 3)) for i in range(16)]
    rows += [("D", t0 + timedelta(hours=6 * (16 + i)), 2000) for i in range(8)]
    for r in rows:  # one file per row -> one micro-batch per row
        _write_batch(spark, path, [r])

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        monitor_stream(stream, threshold=3.5, consecutive=5, period=7.0)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    scored = sorted(spark.read.parquet(sink).collect(), key=lambda r: r["warc_ts"])
    # identical to the single-batch case: 4 exceedances then the break
    assert len(scored) == 5
    assert [r["is_break"] for r in scored] == [False] * 4 + [True]
    assert all(r["score"] > 3.5 for r in scored)


def test_monitor_state_carries_across_batches(spark, tmp_path):
    path = str(tmp_path / "mon_src2")
    t0 = datetime(2024, 1, 1)
    sink = str(tmp_path / "mon_out")
    ckpt = str(tmp_path / "ckpt")

    def run_to_sink():
        stream = spark.readStream.schema(SCHEMA).parquet(path)
        q = (
            monitor_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch1 = [("C", t0 + timedelta(hours=6 * i), 500 + (i % 2)) for i in range(16)]
    _write_batch(spark, path, batch1)
    run_to_sink()
    assert spark.read.parquet(sink).count() == 0  # still training

    # batch 2 (same checkpoint): scored against the model whose state was
    # trained in batch 1 and persisted in the state store
    batch2 = [("C", t0 + timedelta(hours=6 * (16 + i)), 500) for i in range(3)]
    _write_batch(spark, path, batch2)
    run_to_sink()
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 3
    assert all(not r["is_break"] and r["score"] < 3.5 for r in rows)


def test_streamed_tier_reconciles_with_batch_backfill(spark, tmp_path):
    """The §2.6 contract at the top of stream_rollup.py: streamed tiers use
    the batch tier algebra (cnt+sum, never means), so a streamed window can
    be UNIONED with a batch backfill and re-aggregated into exactly the
    tier the batch engine computes over all rows — no raw-data re-read.

    One bucket (hour 2) deliberately straddles the backfill/stream split to
    prove partial aggregates merge, not just concatenate."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "recon_src")
    t0 = datetime(2024, 1, 1)
    rows = []
    for u in ("A", "B"):
        for i in range(40):  # every 20 min across ~13 hours
            rows.append((u, t0 + timedelta(minutes=20 * i), 100 * (ord(u) % 7) + i))
    cut = t0 + timedelta(hours=2, minutes=30)  # mid-bucket split
    early = [r for r in rows if r[1] < cut]
    late = [r for r in rows if r[1] >= cut]
    # sentinel advances the watermark so every real window finalizes
    sentinel = ("ZZZ", t0 + timedelta(days=3), 0)

    batch_df = spark.createDataFrame(early, SCHEMA)
    _write_batch(spark, path, late + [sentinel])

    def agg_1h(df):
        return df.groupBy(
            "url", F.window("warc_ts", "1 hour").alias("w")
        ).agg(
            F.count("*").alias("cnt"),
            F.sum("text_len").alias("sum_val"),
            F.min("text_len").alias("min_val"),
            F.max("text_len").alias("max_val"),
        ).select("url", F.col("w.start").alias("bucket_ts"), "cnt", "sum_val", "min_val", "max_val")

    streamed = _run_stream(
        spark, path, lambda s: stream_rollup(s, "1h", "2 hours"), "t_recon"
    ).select("url", "bucket_ts", "cnt", "sum_val", "min_val", "max_val")
    reconciled = (
        streamed.unionByName(agg_1h(batch_df))
        .groupBy("url", "bucket_ts")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
        .filter(F.col("url") != "ZZZ")
    )
    expected = agg_1h(spark.createDataFrame(rows, SCHEMA))
    diff = reconciled.exceptAll(expected).count() + expected.exceptAll(reconciled).count()
    assert diff == 0
    # the straddled bucket really was split across the two sources
    straddle = datetime(2024, 1, 1, 2)
    assert any(r[1].hour == 2 for r in early) and any(
        r[1].hour == 2 and r[1].day == 1 for r in late
    )
    assert reconciled.filter(
        (F.col("bucket_ts") == straddle) & (F.col("cnt") == 3)
    ).count() == 2  # both urls: 3 obs/hour merged 1+2 across sources


def test_stream_exact_dedup(spark, tmp_path):
    """First-seen row per content fingerprint survives; in-horizon
    duplicates are dropped; distinct texts all pass."""
    from yatsm_spark.streaming.stream_rollup import stream_exact_dedup

    schema = "url string, warc_ts timestamp, text string"
    path = str(tmp_path / "dedup_src")
    t0 = datetime(2024, 1, 1)
    rows = [
        ("a", t0 + timedelta(minutes=1), "alpha body"),
        ("b", t0 + timedelta(minutes=2), "alpha body"),   # dup of a
        ("c", t0 + timedelta(minutes=3), "beta body"),
        ("d", t0 + timedelta(minutes=9), "alpha body"),   # dup, still in horizon
        ("e", t0 + timedelta(minutes=10), "gamma body"),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        stream_exact_dedup(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM t_sdedup").collect()
    assert sorted(r["url"] for r in out) == ["a", "c", "e"]


def test_tier_batch_sink_exactly_once(spark, tmp_path):
    """A replayed micro-batch must overwrite its own directory, not append
    duplicates; distinct batches land side by side."""
    from yatsm_spark.streaming.stream_rollup import stream_rollup, tier_batch_sink

    src = str(tmp_path / "sink_src")
    out = str(tmp_path / "sink_out")
    t0 = datetime(2024, 1, 1)
    rows = [("A", t0 + timedelta(minutes=10 * i), 50 + i) for i in range(12)]
    rows.append(("A", t0 + timedelta(days=2), 1))  # watermark advancer
    _write_batch(spark, src, rows)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream_rollup(stream, "1h", "1 hour")
        .writeStream.foreachBatch(tier_batch_sink(out))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sink_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    once = spark.read.parquet(out)
    n1 = once.count()
    assert n1 >= 2  # hours 0 and 1 finalized
    # simulate a failure replay of batch 0: same rows, same batch id
    # (materialized first — a real replay re-derives the batch from the
    # source checkpoint, never from the sink it is about to overwrite)
    replay_rows = once.where("bucket_ts < '2024-01-02'").collect()
    replay_df = spark.createDataFrame(replay_rows, once.schema)
    sink = tier_batch_sink(out)
    sink(replay_df, 7)
    after_first = spark.read.parquet(out).count()
    sink(replay_df, 7)  # the replay: same batch id -> same dir overwritten
    after_second = spark.read.parquet(out).count()
    assert after_first == after_second == n1 + len(replay_rows)
