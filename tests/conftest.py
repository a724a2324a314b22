"""Shared pytest fixtures — one SparkSession for the whole test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yatsm_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("yatsm_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_crawl(spark):
    """~5k-row deterministic crawl (FIXTURES.md 'tiny'), cached."""
    from yatsm_spark.datagen import generate_crawl

    df = generate_crawl(spark, n_urls=50, span_days=60).cache()
    df.count()
    yield df
    df.unpersist()


SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
