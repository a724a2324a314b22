"""segment_blobs: rolled-up points encoded to Gorilla/delta-of-delta blobs.

The north_star sink (BASELINE.json:6): per (url, tier), the bucket series
is encoded into ``ts_blob`` (delta-of-delta, microsecond epochs) +
``val_blob`` (Gorilla XOR of the measured value) via one
``groupBy(url).applyInPandas`` — one shuffle, numpy kernels inside
(functions/codec.py), binary columns out.  ``decode_blobs`` is the inverse
(posexploded points) for verification and point queries.

Scale notes:
  * Group size is bounded by construction (input is a rollup tier; a
    decade of 1h buckets is ~88k rows — fits one Arrow batch).  For larger
    spans, split by year upstream (plans/segmentation.py does the same).
  * Encoding is append-friendly: blobs are per (url, tier) and can be
    re-encoded per partition on backfill without touching neighbors.

Reference analog: replaces the reference's np.savez record sink
(yatsm/utils.py::get_output_name [U]) with a columnar TSDB codec.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yatsm_spark.functions.codec import CODEC_VERSION, decode_series, encode_series

BLOBS_SCHEMA = (
    "url string, tier string, start_ts timestamp, end_ts timestamp, "
    "n_points int, ts_blob binary, val_blob binary, codec_ver int"
)

POINTS_SCHEMA = "url string, bucket_ts timestamp, value double"


def encode_blobs(
    tier_df: DataFrame,
    tier: str,
    ts_col: str = "bucket_ts",
    value_col: str = "mean_len",
) -> DataFrame:
    """Encode each url's (ts, value) series into one blob row."""

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts_us = pdf[ts_col].astype("int64").to_numpy() // 1000  # ns -> us
        vals = pdf[value_col].to_numpy(dtype="float64")
        ts_blob, val_blob = encode_series(ts_us, vals)
        return pd.DataFrame(
            {
                "url": [pdf["url"].iloc[0]],
                "tier": [tier],
                "start_ts": [pdf[ts_col].iloc[0]],
                "end_ts": [pdf[ts_col].iloc[-1]],
                "n_points": [len(pdf)],
                "ts_blob": [ts_blob],
                "val_blob": [val_blob],
                "codec_ver": [CODEC_VERSION],
            }
        )

    src = tier_df
    if "gap_filled" in tier_df.columns:
        src = src.filter(~F.col("gap_filled"))
    return (
        src.select("url", ts_col, F.col(value_col).cast("double").alias(value_col))
        .groupBy("url")
        .applyInPandas(encode_group, schema=BLOBS_SCHEMA)
    )


def decode_blobs(blobs: DataFrame) -> DataFrame:
    """Inverse of :func:`encode_blobs`: one row per encoded point."""

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, row in pdf.iterrows():
            ts_us, vals = decode_series(bytes(row["ts_blob"]), bytes(row["val_blob"]))
            frames.append(
                pd.DataFrame(
                    {
                        "url": row["url"],
                        "bucket_ts": pd.to_datetime(ts_us, unit="us"),
                        "value": vals,
                    }
                )
            )
        return (
            pd.concat(frames)
            if frames
            else pd.DataFrame(columns=["url", "bucket_ts", "value"])
        )

    return blobs.groupBy("url").applyInPandas(decode_group, schema=POINTS_SCHEMA)
