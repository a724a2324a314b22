"""Mergeable histogram sketches: percentiles across retention tiers
WITHOUT re-reading raw data.

The tier cascade (operators/rollup.py) re-aggregates count/sum/min/max
exactly because those are algebraic; percentiles are NOT — a 1d p95
cannot be derived from 1h p95s.  Every metrics-grade timeseries engine
solves this with a mergeable sketch stored per bucket (TimescaleDB
``percentile_agg``/uddsketch, Druid/Pinot histograms, M3 bucketed
timers).  This module implements the fixed-width integer-bucket variant:

  * :func:`hist_sketch`     — per (key, tier bucket): sorted parallel
    arrays (hb, cnt) where hb = floor(value_u / width_u); an EXACT
    sufficient statistic for any quantile at width_u resolution.
  * :func:`hist_cascade`    — re-aggregate sketches to a coarser tier
    (explode + sum + re-collect).  Merging is exact by construction —
    counts are algebraic — so 1h -> 1d -> 30d loses nothing beyond the
    original width quantization, and raw data can age out (jobs/
    archive.py pattern) while coarse tiers still answer percentiles.
  * :func:`hist_percentile` — lower-edge quantile readout from a sketch:
    the hb whose running count first reaches ceil(q/100 * total),
    evaluated as ONE linear aggregate() fold per row (no explode, no
    window).  All integer arithmetic: engine/partitioning/cluster-size
    exact, so cascaded and directly-built tiers hash-match (pinned by
    test and by the driver oracle, which re-derives the same algebra
    from RAW data in DuckDB — proving the merge exact end to end).

Scale notes (100 TB design):
  * hist_sketch is TWO hash aggregates — (key, bucket, hb) then
    (key, bucket) — both with map-side partial aggregation; the second
    shuffles one slim (int, long) pair per OCCUPIED bucket, not per
    observation.  With width chosen so a series spans ~100-1000 buckets,
    the sketch tier is ~10^2-10^3 smaller than raw.
  * hist_cascade touches only sketch rows (already tiny) — the whole
    point: the 30d percentile never re-reads the 100 TB raw tier.
  * collect_list here is bounded by the OCCUPIED-bucket count per
    (key, bucket) group (<= value range / width), not by row count —
    the same boundedness argument as ohlc/M4, not a payload collect.

Reference analog: none — YATSM has no rollup surface [U]; this is the
north_star "continuous aggregates at 1h/1d/30d retention tiers"
(BASELINE.json:6) extended to the one aggregate family that needs a
sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yatsm_spark.operators.series import bucket_col


def _fld(num, den) -> F.Column:
    """floor(num / den) for nonneg bigint columns, cross-engine exact:
    strip the remainder with pmod (nonnegative in Spark), then the
    division is exactly divisible so the double route cannot round.
    Same discipline as quality._x1e4 (which also handles the >2^53
    decimal case; sketch inputs are value_u <= ~1e12, far below it)."""
    exact = num - F.pmod(num, den)
    return (exact / den).cast("bigint")


def hist_sketch(
    df: DataFrame,
    tier: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 1_000_000,
    width_u: int = 10_000_000,
) -> DataFrame:
    """Build the per-(key, tier-bucket) histogram sketch.

    value_u = floor(value * scale) (integer micro-units, the tier-cascade
    exactness rule); hb = floor(value_u / width_u).  Returns
    (key, bucket_ts, hb: array<bigint>, cnt: array<bigint>, total)
    with hb ascending — the canonical mergeable form.
    """
    vu = F.floor(F.col(value_col) * scale).cast("long")
    hb = _fld(vu, F.lit(width_u).cast("long"))
    per_bucket = (
        df.groupBy(
            F.col(key_col),
            bucket_col(ts_col, tier).alias("bucket_ts"),
            hb.alias("hb"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = F.sort_array(F.collect_list(F.struct("hb", "c")))
    return (
        per_bucket.groupBy(key_col, "bucket_ts")
        .agg(pairs.alias("_p"))
        .select(
            key_col,
            "bucket_ts",
            F.col("_p.hb").alias("hb"),
            F.col("_p.c").alias("cnt"),
            F.aggregate(
                "_p", F.lit(0).cast("long"), lambda acc, x: acc + x["c"]
            ).alias("total"),
        )
    )


def hist_cascade(sketch: DataFrame, tier: str, key_col: str = "user_id") -> DataFrame:
    """Re-aggregate a finer sketch tier to ``tier`` — exact merge.

    Explodes the (hb, cnt) pairs (sketch rows only — never raw data),
    re-buckets bucket_ts, sums counts, re-collects.  Output schema is
    identical to :func:`hist_sketch`, so tiers cascade indefinitely and
    :func:`hist_percentile` reads any tier the same way.
    """
    exploded = sketch.select(
        F.col(key_col),
        bucket_col("bucket_ts", tier).alias("bucket_ts"),
        F.explode(F.arrays_zip("hb", "cnt")).alias("z"),
    ).select(key_col, "bucket_ts", F.col("z.hb").alias("hb"), F.col("z.cnt").alias("c"))
    merged = exploded.groupBy(key_col, "bucket_ts", "hb").agg(F.sum("c").alias("c"))
    pairs = F.sort_array(F.collect_list(F.struct("hb", "c")))
    return (
        merged.groupBy(key_col, "bucket_ts")
        .agg(pairs.alias("_p"))
        .select(
            key_col,
            "bucket_ts",
            F.col("_p.hb").alias("hb"),
            F.col("_p.c").alias("cnt"),
            F.aggregate(
                "_p", F.lit(0).cast("long"), lambda acc, x: acc + x["c"]
            ).alias("total"),
        )
    )


def hist_percentile(
    sketch: DataFrame,
    qs: tuple[int, ...] = (50, 95),
    width_u: int = 10_000_000,
    key_col: str = "user_id",
) -> DataFrame:
    """Lower-edge quantile readout: for each q in ``qs`` (integer
    percent), the smallest bucket lower edge (hb * width_u) whose
    running count reaches ceil(q/100 * total).

    One aggregate() fold per (row, q) over the already-sorted pairs —
    entirely map-side; the only shuffles in a percentile-tier pipeline
    are the sketch builds themselves.  The fold accumulator is
    (remaining, answer): answer latches at the first element whose
    count covers the remainder.
    """
    out = sketch
    zipped = F.arrays_zip("hb", "cnt")
    for q in qs:
        # ceil(total * q / 100) = fld(total*q + 99, 100); total >= 1
        target = _fld(
            F.col("total") * F.lit(int(q)) + F.lit(99), F.lit(100).cast("long")
        )
        acc0 = F.struct(
            target.alias("rem"), F.lit(None).cast("bigint").alias("ans")
        )
        fold = F.aggregate(
            zipped,
            acc0,
            lambda acc, x: F.when(acc["ans"].isNotNull(), acc).otherwise(
                F.when(
                    x["cnt"] >= acc["rem"],
                    F.struct(acc["rem"].alias("rem"), x["hb"].alias("ans")),
                ).otherwise(
                    F.struct(
                        (acc["rem"] - x["cnt"]).alias("rem"),
                        F.lit(None).cast("bigint").alias("ans"),
                    )
                )
            ),
            lambda acc: acc["ans"] * F.lit(width_u),
        )
        out = out.withColumn(f"p{q}_u", fold)
    return out.select(
        key_col, "bucket_ts", "total", *[f"p{q}_u" for q in qs]
    )
