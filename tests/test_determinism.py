"""Cluster-size / partitioning invariance (SURVEY.md §4.3, north_rule):
identical results no matter how the input is partitioned — the sandbox
proxy for N-vs-4N-executor determinism."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from yatsm_spark.operators.rollup import cascade, gap_fill, rollup, series_clean
from yatsm_spark.plans.blobs import encode_blobs


@pytest.fixture(scope="module")
def crawl(spark):
    from yatsm_spark.datagen import generate_crawl

    return generate_crawl(spark, n_urls=40, span_days=45).cache()


def _tier_rows(crawl_df, tier="1d"):
    df = gap_fill(cascade(rollup(series_clean(crawl_df), "1h"), tier), tier)
    return sorted(
        (r["url"], r["bucket_ts"], r["cnt"], r["sum_len"], r["min_len"],
         r["max_len"], r["gap_filled"], tuple(sorted((r["lang_dist"] or {}).items())))
        for r in df.collect()
    )


def test_tiers_invariant_under_repartitioning(crawl):
    a = _tier_rows(crawl.repartition(3))
    b = _tier_rows(crawl.repartition(17, "warc_ts"))
    c = _tier_rows(crawl.coalesce(1))
    assert a == b == c


def test_blobs_byte_identical_under_repartitioning(crawl):
    def blob_bytes(src):
        tier = rollup(series_clean(src), "1d")
        return sorted(
            (r["url"], bytes(r["ts_blob"]), bytes(r["val_blob"]))
            for r in encode_blobs(tier, "1d", value_col="mean_len").collect()
        )

    assert blob_bytes(crawl.repartition(2)) == blob_bytes(crawl.repartition(11, "url"))


def test_chunked_equals_onepass(crawl):
    """Per-bucket chunked processing (jobs/rollup.py --chunked) must union
    to exactly the one-pass result — buckets partition urls, and every
    operator is per-url, so chunking is a pure partitioning choice."""
    whole = _tier_rows(crawl)
    with_bucket = crawl.withColumn("p_bucket", F.pmod(F.hash("url"), F.lit(4)))
    chunks = []
    for b in range(4):
        chunks.extend(_tier_rows(with_bucket.filter(F.col("p_bucket") == b).drop("p_bucket")))
    assert sorted(chunks) == whole


def test_extracted_text_byte_identical_per_url(crawl):
    """North-rule per-row invariant: text == extract_text(html)
    byte-for-byte on every row, independent of partitioning."""
    from pyspark.sql import functions as F

    from yatsm_spark.functions.textops import extract_text

    for df in (crawl, crawl.repartition(7, "url")):
        mismatch = df.filter(
            F.md5(F.encode(extract_text("html"), "UTF-8"))
            != F.md5(F.encode(F.col("text"), "UTF-8"))
        ).count()
        assert mismatch == 0
