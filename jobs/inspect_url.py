"""Single-url debug job (SURVEY.md §3.3) — the ``yatsm pixel`` analog
(yatsm/cli/pixel.py [U]): pull one url's full series with bucket-pruned
point lookup, fit the CCDC kernels driver-side, print segments.

Usage:
    spark-submit --py-files engine.zip jobs/inspect_url.py \
        --input <crawl_path> --url https://... [--period 7.0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yatsm_spark.functions.ccdc import CCDCParams, fit_series  # noqa: E402
from yatsm_spark.session import get_spark  # noqa: E402
from yatsm_spark.sources.storage import prune_url  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--url", required=True)
    ap.add_argument("--period", type=float, default=7.0)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("yatsm_spark_inspect", master=args.master)
    crawl = spark.read.parquet(args.input)
    rows = (
        prune_url(crawl, args.url)
        .selectExpr("warc_ts", "length(text) AS text_len")
        .orderBy("warc_ts")
        .collect()
    )
    if not rows:
        print(f"url not found: {args.url}")
        spark.stop()
        return
    t = np.array([r["warc_ts"].timestamp() / 86400.0 for r in rows])
    y = np.array([float(r["text_len"]) for r in rows])
    params = CCDCParams(period=args.period, min_span=8 * args.period, retrain_time=8 * args.period)
    print(f"{args.url}: {len(rows)} observations {rows[0]['warc_ts']} .. {rows[-1]['warc_ts']}")
    for i, seg in enumerate(fit_series(t, y, params)):
        brk = "" if np.isnan(seg.break_t) else f" BREAK@t={seg.break_t:.1f}d mag={seg.magnitude:+.1f}"
        print(
            f"  seg {i}: [{seg.start_t:.1f}d, {seg.end_t:.1f}d] n={seg.n_obs} "
            f"status={seg.status} rmse={seg.rmse:.1f}{brk}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
