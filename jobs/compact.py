"""Blob-store backfill compaction job (spark-submit entry point).

Folds a parquet of new/corrected tier points into an existing SINGLE-TIER
``segment_blobs`` table (plans/blobs.py::compact_blobs — new points replace
stored buckets; re-encoded blobs are byte-identical to a from-scratch
encode of the merged series).  Output goes to a NEW directory; swap it over
the live table once verified (same two-phase discipline as
jobs/rollup.py::process_incremental) — an in-place overwrite would destroy
the input mid-read.

Usage:
    spark-submit --py-files engine.zip jobs/compact.py \
        --blobs <segment_blobs dir> --new-points <points parquet> \
        --tier 1d --output <compacted dir>

The points parquet needs columns (url string, bucket_ts timestamp,
value double); untouched urls pass through re-encoded (exclude them
upstream with a semi-join when the delta touches few urls).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from yatsm_spark.plans.blobs import compact_blobs  # noqa: E402
from yatsm_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blobs", required=True)
    ap.add_argument("--new-points", required=True)
    ap.add_argument("--tier", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--only-touched-urls", action="store_true",
                    help="compact only urls present in the delta (left-semi "
                         "prune); untouched blob rows copy through unchanged")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("yatsm_spark_compact", master=args.master)
    blobs = spark.read.parquet(args.blobs)
    pts = spark.read.parquet(args.new_points)

    # guard: compaction is single-tier by contract — a mismatched or
    # multi-tier input would silently relabel rows (and collapse one
    # url's tiers into a single series inside compact_blobs)
    stored_tiers = sorted(r["tier"] for r in blobs.select("tier").distinct().collect())
    if stored_tiers != [args.tier]:
        raise SystemExit(
            f"--tier {args.tier} does not match the blob table's tier set "
            f"{stored_tiers}; compact one tier at a time"
        )

    t0 = time.time()
    if args.only_touched_urls:
        touched = pts.select("url").distinct().cache()  # reused by both joins
        hit = blobs.join(F.broadcast(touched), "url", "left_semi")
        miss = blobs.join(F.broadcast(touched), "url", "left_anti")
        compacted = compact_blobs(hit, pts, args.tier).unionByName(miss)
    else:
        compacted = compact_blobs(blobs, pts, args.tier)
    obs = Observation("compact")
    compacted.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "overwrite"
    ).parquet(args.output)
    print(
        f"compacted {int(obs.get['rows'])} blob rows (tier {args.tier}) "
        f"in {time.time() - t0:.1f}s -> {args.output}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
