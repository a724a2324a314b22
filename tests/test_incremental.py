"""Incremental tier maintenance at the JOB level: folding deltas into
stored tiers equals the one-shot build (jobs/rollup.py::process_incremental)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_incremental_job_equals_one_shot(spark, tmp_path):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jobs.rollup import process_incremental

    from yatsm_spark.datagen import generate_crawl
    from yatsm_spark.operators.rollup import gap_fill, rollup, series_clean

    crawl = generate_crawl(spark, n_urls=10, span_days=24)
    cut = "2024-01-13 07:45:00"  # mid-bucket, mid-day split
    part1 = crawl.filter(F.col("warc_ts") < cut)
    part2 = crawl.filter(F.col("warc_ts") >= cut)

    out = str(tmp_path / "incr_out")
    os.makedirs(out, exist_ok=True)
    process_incremental(spark, part1, out, ["1h", "1d"])
    process_incremental(spark, part2, out, ["1h", "1d"])

    for t in ("1h", "1d"):
        got = spark.read.parquet(f"{out}/rollup_{t}")
        exp = gap_fill(rollup(series_clean(crawl), t) if t == "1h"
                       else rollup(series_clean(crawl), t), t)
        cols = ["url", "bucket_ts", "cnt", "sum_len", "min_len", "max_len",
                "sum_ts", "gap_filled"]
        a = got.select(cols)
        b = exp.select(cols)
        assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0


def test_incremental_refuses_leftover_swap_state(spark, tmp_path):
    """A prior run that died mid-swap leaves .bak/.tmp dirs; blindly
    replaying the delta would double-merge, so the job must refuse."""
    import os
    import sys

    import pytest

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jobs.rollup import process_incremental

    from yatsm_spark.datagen import generate_crawl

    out = str(tmp_path / "incr_refuse")
    os.makedirs(f"{out}/rollup_1h.bak", exist_ok=True)
    crawl = generate_crawl(spark, n_urls=3, span_days=3)
    with pytest.raises(SystemExit, match="leftover swap backups"):
        process_incremental(spark, crawl, out, ["1h"])


def test_incremental_kernel_refresh_end_to_end(spark):
    """The full two-step incremental recipe: (1) fold the delta into the
    stored tier with merge_tiers, (2) refresh the blob store by feeding
    the merged rows of TOUCHED buckets to compact_blobs.  The compacted
    blob table must equal a from-scratch encode of the one-shot tier —
    row-for-row including the binary payloads (the codec is a pure
    function of the sorted series, so incremental maintenance leaves NO
    byte-level trace)."""
    from yatsm_spark.datagen import generate_crawl
    from yatsm_spark.operators.rollup import merge_tiers, rollup, series_clean
    from yatsm_spark.plans.blobs import compact_blobs, encode_blobs

    crawl = generate_crawl(spark, n_urls=8, span_days=20)
    cut = "2024-01-11 07:45:00"  # mid-bucket split: some buckets straddle
    part1 = crawl.filter(F.col("warc_ts") < cut)
    part2 = crawl.filter(F.col("warc_ts") >= cut)

    # one-shot ground truth
    tier_full = rollup(series_clean(crawl), "1d")
    blobs_full = encode_blobs(tier_full, "1d")

    # incremental: stored tier + blobs from part1, then the delta lands
    tier_old = rollup(series_clean(part1), "1d")
    blobs_old = encode_blobs(tier_old, "1d")
    delta = rollup(series_clean(part2), "1d")
    merged = merge_tiers(tier_old, delta)

    # touched buckets = those present in the delta; their MERGED stats are
    # the replacement points (the delta's own stats alone would be wrong
    # for straddled buckets)
    touched = merged.join(
        delta.select("url", "bucket_ts").distinct(), ["url", "bucket_ts"], "left_semi"
    ).select("url", "bucket_ts", F.col("mean_len").alias("value"))
    compacted = compact_blobs(blobs_old, touched, "1d")

    cols = ["url", "tier", "start_ts", "end_ts", "n_points", "ts_blob", "val_blob"]
    a = {tuple(r) for r in compacted.select(cols).collect()}
    b = {tuple(r) for r in blobs_full.select(cols).collect()}
    assert a == b and len(a) > 0

    # and the merged tier itself equals the one-shot tier (stat algebra)
    tcols = ["url", "bucket_ts", "cnt", "sum_len", "min_len", "max_len", "sum_ts"]
    ta = merged.select(tcols)
    tb = tier_full.filter(~F.col("gap_filled")).select(tcols)
    assert ta.exceptAll(tb).count() + tb.exceptAll(ta).count() == 0
