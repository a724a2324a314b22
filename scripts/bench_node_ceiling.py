"""Spark-free node-scaling ceiling for the CCDC kernel stack.

Runs the identical per-series kernel loop (no Spark, no shuffle, no
Arrow) in 8 vs 32 plain OS processes and reports per-process and
aggregate throughput.  Because the processes share NOTHING but the
machine, the 8->32 per-process drop measures the single box's shared
resources (memory bandwidth, L3, clocks) — the hard ceiling under ANY
local[8]-vs-local[32] strong-scaling measurement of these kernels.  A
real 4x-executor cluster multiplies that hardware along with the cores,
which is why BENCH/BASELINE.md reads the N->4N gate against weak
scaling for the memory-lean round-3 kernels.

Usage:  python scripts/bench_node_ceiling.py [--series 60]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(args):
    seed, n_series = args
    import numpy as np

    from yatsm_spark.functions.ccdc import CCDCParams, fit_series

    rng = np.random.default_rng(seed)
    params = CCDCParams(
        period=7.0, min_span=56.0, retrain_time=56.0,
        commission_alpha=0.01, omission_alpha=0.05, lasso_alpha=5.0,
    )
    tot = 0
    t0 = time.perf_counter()
    for s in range(n_series):
        n = 290
        t = np.arange(n, dtype=np.float64)
        y = 1700 + 30 * np.cos(2 * np.pi * t / 7) + rng.normal(0, 8, n)
        if s % 3 == 0:
            y[n // 2 :] += 120
        fit_series(t, y, params)
        tot += n
    return tot, time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--series", type=int, default=60, help="series per process")
    args = ap.parse_args()
    out = {}
    for nproc in (8, 32):
        with mp.Pool(nproc) as pool:
            t0 = time.perf_counter()
            res = pool.map(_worker, [(i, args.series) for i in range(nproc)])
            wall = time.perf_counter() - t0
        pts = sum(r[0] for r in res)
        out[nproc] = {
            "aggregate_pts_per_sec": round(pts / wall, 0),
            "per_proc_pts_per_sec": round(sum(r[0] / r[1] for r in res) / nproc, 0),
        }
    out["ceiling_4x_efficiency"] = round(
        out[32]["aggregate_pts_per_sec"] / out[8]["aggregate_pts_per_sec"] / 4, 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
