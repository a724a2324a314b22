"""Scaling-efficiency bench: the north_rule hard gate (BASELINE.json:14).

No real cluster exists in this sandbox, so the two-cluster-size criterion
(N vs 4N executors, efficiency >= 0.8) is evidenced by running the SAME
job on the SAME input at local[8] and local[32] (task brief):

    efficiency = (T_8 / T_32) / (32 / 8)

Pipeline measured per parallelism level (fresh SparkSession each):
    scan crawl -> series_clean -> rollup 1h -> write parquet
                 -> cascade 1d -> write    -> cascade 30d -> write
                 -> gorilla/dod blobs (from 1d) -> noop
                 -> CCDC segmentation (from 1d) -> noop
Reports rolled-up points/sec per retention tier at both levels + per-stage
and total efficiency -> printed JSON; paste into BENCH/BASELINE.md.

Input: deterministic synthetic crawl (FIXTURES.md §1) generated once on
disk — identical bytes for both runs (seed-hashed exprs, no rand()).

Usage: python scripts/bench_scaling.py [--urls 20000] [--days 120]
       [--data DIR] [--repeats 1] [--levels 8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from yatsm_spark.datagen import generate_crawl, write_crawl  # noqa: E402
from yatsm_spark.functions.ccdc import CCDCParams  # noqa: E402
from yatsm_spark.operators.rollup import cascade, rollup, series_clean  # noqa: E402
from yatsm_spark.plans.blobs import encode_blobs  # noqa: E402
from yatsm_spark.plans.segmentation import segment_series  # noqa: E402
from yatsm_spark.session import get_spark  # noqa: E402


def ensure_data(data_dir: str, n_urls: int, span_days: int) -> str:
    path = f"{data_dir}/crawl_u{n_urls}_d{span_days}"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    spark = get_spark("bench_datagen", master="local[32]")
    t0 = time.time()
    write_crawl(generate_crawl(spark, n_urls=n_urls, span_days=span_days), path)
    n = spark.read.parquet(path).count()
    print(f"generated {n} rows in {time.time()-t0:.0f}s -> {path}", file=sys.stderr)
    spark.stop()
    return path


def run_once(crawl_path: str, cores: int, scratch: str) -> dict:
    spark = get_spark(f"bench_scaling_{cores}", master=f"local[{cores}]",
                      shuffle_partitions=64)
    crawl = spark.read.parquet(crawl_path)
    res: dict[str, float] = {}
    shutil.rmtree(scratch, ignore_errors=True)

    # Tier cascade with explicit persist: the raw table is scanned ONCE
    # (into the persisted 1h tier); 1d cascades from cached 1h, 30d from
    # cached 1d.  A naive union-and-reuse formulation recomputes the scan
    # per branch (cascade's agg+join shape defeats ReuseExchange — 7 scans
    # in the plan, measured); parquet round-trips per tier pay fixed
    # per-job overheads a 4x cluster can't shrink.  Persist is the
    # production shape (SURVEY.md §4.1 "line cache" analog).
    from pyspark import StorageLevel

    t0 = time.time()
    t1h = rollup(series_clean(crawl, keep_text=False), "1h").persist(StorageLevel.MEMORY_AND_DISK)
    t1h.write.mode("overwrite").parquet(f"{scratch}/t1h")
    t1d = cascade(t1h, "1d").persist(StorageLevel.MEMORY_AND_DISK)
    t1d.write.mode("overwrite").parquet(f"{scratch}/t1d")
    cascade(t1d, "30d").write.mode("overwrite").parquet(f"{scratch}/t30d")
    res["wall_tiers"] = time.time() - t0
    for t in ("1h", "1d", "30d"):
        res[f"points_{t}"] = spark.read.parquet(f"{scratch}/t{t}").count()
    t1h.unpersist()

    t1d_disk = t1d
    t0 = time.time()
    encode_blobs(t1d_disk, "1d", value_col="mean_len").write.mode("overwrite").format("noop").save()
    res["wall_blobs"] = time.time() - t0

    t0 = time.time()
    params = CCDCParams(period=7.0, min_span=56.0, retrain_time=56.0)
    segment_series(t1d_disk, params).write.mode("overwrite").format("noop").save()
    res["wall_segment"] = time.time() - t0

    res["wall_total"] = res["wall_tiers"] + res["wall_blobs"] + res["wall_segment"]
    spark.stop()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=20000)
    ap.add_argument("--days", type=int, default=120)
    ap.add_argument("--data", default="/root/repo/.benchdata")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--levels", default="8,32")
    args = ap.parse_args()

    levels = [int(x) for x in args.levels.split(",")]
    os.makedirs(args.data, exist_ok=True)
    crawl_path = ensure_data(args.data, args.urls, args.days)

    results: dict[int, dict] = {}
    for cores in levels:
        runs = [
            run_once(crawl_path, cores, f"{args.data}/scratch_{cores}")
            for _ in range(args.repeats)
        ]
        med = {k: statistics.median(r[k] for r in runs) for k in runs[0]}
        med["wall_total_min"] = min(r["wall_total"] for r in runs)
        results[cores] = med
        print(f"local[{cores}]: {json.dumps({k: round(v, 2) for k, v in med.items()})}",
              file=sys.stderr)

    lo, hi = levels[0], levels[-1]
    # min-of-N wall per level: the least-interference estimate — medians on
    # a shared box fold unrelated load into whichever level it hit
    speedup = results[lo]["wall_total_min"] / results[hi]["wall_total_min"]
    eff = speedup / (hi / lo)
    out = {
        "input_rows_path": crawl_path,
        "levels": {
            str(c): {
                **{k: round(v, 2) for k, v in results[c].items()},
                **{
                    # tiers are produced in one fused pass: per-tier
                    # points/sec is that tier's rows over the fused wall
                    f"pps_{t}": round(results[c][f"points_{t}"] / results[c]["wall_tiers"], 1)
                    for t in ("1h", "1d", "30d")
                },
            }
            for c in levels
        },
        "speedup": round(speedup, 3),
        "parallelism_ratio": hi / lo,
        "scaling_efficiency": round(eff, 3),
        "gate": "PASS" if eff >= 0.8 else "FAIL",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
