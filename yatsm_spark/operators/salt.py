"""Explicit skew salting for hot-key aggregations (SURVEY.md §4.2).

AQE splits skewed JOIN partitions but does NOT split skewed groupBy keys:
a domain owning 20% of a 100 TB table pins one reducer for hours.  The fix
is the classic two-stage salted aggregation:

  stage 1: groupBy(key, salt) with salt = pmod(xxhash64(key, ts), S) for
           hot keys (0 for cold) — spreads a hot key over S reducers;
  stage 2: re-aggregate stage-1 partials by key alone (tiny input).

Only works for re-aggregable (algebraic) aggregates — which is why the
tier schemas carry cnt+sum, never means (operators/rollup.py).

Hot-key detection = A9 heavy-hitter pre-pass (or a static config list on a
real deployment, refreshed daily).  The hot set is broadcast.

Reference analog: yatsm/utils.py::distribute_jobs(interlaced=True) [U] —
the reference's static skew mitigation deals rows round-robin across
workers; salting is the shuffle-native equivalent.

Determinism: the salt derives from row content (xxhash64), never from
partition ids or rand(), so results are cluster-size-invariant (§4.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame, key_cols: Sequence[str], threshold_rows: int
) -> DataFrame:
    """Keys with more than ``threshold_rows`` rows (one agg shuffle —
    run on a sample or a finer pre-aggregate when the raw table is huge)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("_hot_cnt"))
        .filter(F.col("_hot_cnt") > threshold_rows)
        .select(*key_cols)
    )


def with_salt(
    df: DataFrame,
    hot: DataFrame,
    key_cols: Sequence[str],
    salt_cols: Sequence[str],
    n_salts: int = 16,
    salt_col: str = "_salt",
) -> DataFrame:
    """Add a salt column: pmod(xxhash64(salt_cols), n_salts) for rows whose
    key is in the broadcast ``hot`` set, 0 otherwise."""
    hot_flag = hot.select(*key_cols).withColumn("_is_hot", F.lit(True))
    out = df.join(F.broadcast(hot_flag), list(key_cols), "left")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    return out.withColumn(
        salt_col, F.when(F.col("_is_hot"), salt).otherwise(F.lit(0)).cast("int")
    ).drop("_is_hot")


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    stage1_aggs: Sequence[Column],
    stage2_aggs: Sequence[Column],
    hot: DataFrame | None = None,
    salt_cols: Sequence[str] | None = None,
    n_salts: int = 16,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``stage1_aggs`` aggregate raw rows under (key, salt); ``stage2_aggs``
    re-aggregate the stage-1 partials under key alone and must reference
    the stage-1 aliases.  When ``hot`` is None it is detected with
    :func:`detect_hot_keys` (costs one extra pass — pass an explicit hot
    set in production).
    """
    salt_cols = list(salt_cols or key_cols)
    if hot is None:
        hot = detect_hot_keys(df, key_cols, hot_threshold)
    salted = with_salt(df, hot, key_cols, salt_cols, n_salts)
    stage1 = salted.groupBy(*key_cols, "_salt").agg(*stage1_aggs)
    return stage1.groupBy(*key_cols).agg(*stage2_aggs)
