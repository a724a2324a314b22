"""Spark-free node-scaling ceiling for the CORPUS (string-hashing) stack.

Companion to bench_node_ceiling.py (CCDC kernels).  The corpus pipeline's
hot work is shingle construction + md5 hashing of short strings — an
allocation- and memory-bandwidth-heavy profile, unlike the numpy-matmul
CCDC kernels.  This control runs that exact profile in N plain OS
processes (no Spark, no JVM, no shared state): each process builds and
md5-hashes the same fixed number of k-shingle byte strings.  The
per-process wall inflation from 8 -> 32 concurrent processes is the
box's OWN ceiling (memory bandwidth, allocator, L3, turbo clocks) —
no engine can weak-scale string work past it on ONE machine, and a real
4x-executor cluster multiplies this hardware along with the cores.

    weak efficiency ceiling = min_wall(8 procs) / min_wall(32 procs)
    (same per-process work at both levels)

Usage: python scripts/bench_corpus_node_ceiling.py [--docs-per-proc 4000]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import time


def _worker(args: tuple[int, int]) -> float:
    seed, n_docs = args
    t0 = time.perf_counter()
    acc = 0
    for d in range(n_docs):
        # ~300 'w12345'-style tokens per doc, same shape as generate_webtext
        base = seed * 1_000_003 + d
        toks = [f"w{(base * 31 + i * 7919) % 50000}" for i in range(300)]
        for i in range(298):  # k=3 shingles
            s = f"{toks[i]} {toks[i+1]} {toks[i+2]}".encode()
            acc ^= hashlib.md5(s).digest()[0]
    return time.perf_counter() - t0


def run_level(n_procs: int, n_docs: int) -> dict:
    with mp.Pool(n_procs) as pool:
        t0 = time.perf_counter()
        walls = pool.map(_worker, [(p, n_docs) for p in range(n_procs)])
        total = time.perf_counter() - t0
    return {
        "procs": n_procs,
        "wall": round(total, 2),
        "per_proc_min": round(min(walls), 2),
        "per_proc_max": round(max(walls), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-per-proc", type=int, default=4000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    res: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(args.repeats):
        for p in (8, 32):
            r = run_level(p, args.docs_per_proc)
            res[p].append(r)
            print(json.dumps(r))
    w8 = min(r["wall"] for r in res[8])
    w32 = min(r["wall"] for r in res[32])
    print(json.dumps({
        "min_wall_8procs": w8,
        "min_wall_32procs": w32,
        "node_weak_ceiling": round(w8 / w32, 3),
        "note": "same per-process work; 32 procs = 4x total work on 4x procs",
    }))


if __name__ == "__main__":
    main()
