"""Physical-plan audits (.explain-based): the plans we ship are the plans
we designed — pruning, pushdown, broadcast, TakeOrdered, no stray joins.

These guard the 100 TB properties that row-level tests can't see: a scan
that silently starts reading ``html`` (most of the table's bytes), a
broadcast that degrades to sort-merge, or a gap-fill that re-grows a join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from yatsm_spark.operators.rollup import gap_fill, rollup, series_clean
from yatsm_spark.operators.series import top_k_keys


@pytest.fixture(scope="module")
def crawl_on_disk(spark, tmp_path_factory):
    from yatsm_spark.datagen import generate_crawl, write_crawl

    path = str(tmp_path_factory.mktemp("plans") / "crawl")
    write_crawl(generate_crawl(spark, n_urls=20, span_days=20), path)
    return spark.read.parquet(path)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_rollup_scan_never_reads_html(crawl_on_disk):
    plan = _plan(rollup(series_clean(crawl_on_disk, keep_text=False), "1h"))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, "no parquet scan in plan"
    for ln in scan_lines:
        assert "html" not in ln  # column pruning holds


def test_series_clean_filter_pushed_to_scan(crawl_on_disk):
    plan = _plan(series_clean(crawl_on_disk, keep_text=False))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "IsNotNull(text)" in pushed[0]


def test_warc_ts_predicate_pushdown(crawl_on_disk):
    df = crawl_on_disk.filter(F.col("warc_ts") >= "2024-01-05").select("url")
    pushed = [ln for ln in _plan(df).splitlines() if "PushedFilters" in ln]
    assert pushed and "GreaterThanOrEqual(warc_ts" in pushed[0]


def test_small_dim_join_broadcasts(spark, crawl_on_disk):
    dims = spark.createDataFrame([("hot.example", 1)], "domain string, w int")
    joined = crawl_on_disk.withColumn(
        "domain", F.regexp_extract("url", r"https://([^/]+)/", 1)
    ).join(F.broadcast(dims), "domain")
    assert "BroadcastHashJoin" in _plan(joined)


def test_top_k_is_take_ordered(crawl_on_disk):
    plan = _plan(top_k_keys(crawl_on_disk, 5, ("url",)))
    assert "TakeOrderedAndProject" in plan


def test_gap_fill_is_join_free(crawl_on_disk):
    tier = rollup(series_clean(crawl_on_disk, keep_text=False), "1d")
    plan = _optimized(gap_fill(tier, "1d"))
    assert "Join" not in plan  # lead+sequence+explode formulation, no grid join


def test_dedup_is_aggregate_not_window(crawl_on_disk):
    plan = _plan(series_clean(crawl_on_disk, keep_text=False))
    # struct-valued min() falls back to SortAggregate (struct buffers are
    # not hash-aggregable) — still a partial/final aggregate pair with
    # map-side combine, NOT a per-key window over the whole table
    assert "SortAggregate" in plan or "HashAggregate" in plan
    assert "Window" not in plan
