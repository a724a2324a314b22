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
