"""Multi-JVM executor simulation for the corpus pipeline: the closest
sandbox analog of the north rule's N -> 4N EXECUTORS criterion.

local[8] -> local[32] strong scaling conflates two things a real cluster
does not: (a) the box's shared memory bus and (b) ONE fat JVM whose
allocator/GC serves all 32 mutator threads.  Real executors are separate
JVMs.  This bench therefore measures:

    T_N : one 8-core JVM cleaning ONE quarter (~120k docs)
    T_4N: FOUR concurrent 8-core JVMs, each cleaning its own quarter
          (4x data, 4x executors; wall = max of the four)

    weak efficiency = T_N / T_4N      (1.0 = perfect executor scaling)

Each worker is a separate `python` subprocess running clean_corpus with
the production lsh_max_bucket=256 guard, noop sink (shared-disk
saturation excluded — same isolation rule as bench_pair.py).  Quarters
are disjoint url-hash slices of the 480k diverse-text corpus
(datagen.generate_webtext), written once.

Usage: python scripts/bench_corpus_executors.py [--pairs 1]
       python scripts/bench_corpus_executors.py --summarize
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/repo/.benchdata/webtext_n480000"
QDIR = "/root/repo/.benchdata/webtext_480k_quarters"
DEFAULT_OUT = "/root/repo/.benchdata/corpus_exec_pairs.jsonl"

_WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from jobs.corpus import clean_corpus
from yatsm_spark.session import get_spark
q = sys.argv[1]
spark = get_spark(f"exec_q{q}", master="local[8]", shuffle_partitions=16,
                  extra_confs={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
                               "spark.ui.enabled": "false"})
crawl = spark.read.parquet(f"%s/q={q}")
t0 = time.time()
cleaned, m = clean_corpus(crawl, lsh_max_bucket=256)
cleaned.write.mode("overwrite").format("noop").save()
print(json.dumps({"q": q, "wall": round(time.time() - t0, 2), **m}))
spark.stop()
""" % QDIR


def ensure_quarters() -> None:
    if os.path.exists(f"{QDIR}/_done"):
        return
    from pyspark.sql import functions as F

    from yatsm_spark.session import get_spark

    spark = get_spark("quarters", master="local[32]")
    df = spark.read.parquet(BASE).withColumn(
        "q", F.pmod(F.xxhash64("url", F.lit(99)), F.lit(4))
    )
    # one quarter per partitionBy dir; splittable files within
    df.repartition(16, "url").write.mode("overwrite").partitionBy("q").option(
        "parquet.block.size", 32 * 1024 * 1024
    ).parquet(QDIR)
    for qv in range(4):
        n = spark.read.parquet(f"{QDIR}/q={qv}").count()
        print(f"quarter {qv}: {n} docs", file=sys.stderr)
    spark.stop()
    open(f"{QDIR}/_done", "w").write("ok")


def run_workers(quarters: list[int]) -> dict:
    # 20g heap per worker JVM: four concurrent executors must fit the
    # 128 GiB box (the get_spark default of 48g is sized for ONE fat
    # local[32] JVM); same value for the 1-JVM leg so per-executor
    # resources match between N and 4N, as they would on a real cluster
    env = {**os.environ, "YATSM_SPARK_DRIVER_MEM": "20g"}
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(q)],
            stdout=subprocess.PIPE,
            stderr=open(f"/tmp/exec_worker_q{q}.err", "w"),
            text=True,
            env=env,
        )
        for q in quarters
    ]
    outs = []
    for p, q in zip(procs, quarters):
        stdout = p.communicate()[0].strip()
        if p.returncode != 0 or not stdout:
            raise RuntimeError(
                f"worker q={q} failed (rc={p.returncode}); see /tmp/exec_worker_q{q}.err"
            )
        outs.append(json.loads(stdout.splitlines()[-1]))
    return {
        "wall": round(time.time() - t0, 2),
        "worker_walls": [o["wall"] for o in outs],
        "cleaned": sum(o["cleaned"] for o in outs),
    }


def summarize(out_path: str) -> None:
    rows = [json.loads(ln) for ln in open(out_path)] if os.path.exists(out_path) else []
    if not rows:
        print("no pairs recorded", file=sys.stderr)
        return
    t1 = min(r["wall"] for r in rows if r["mode"] == "1x8")
    t4 = min(r["wall"] for r in rows if r["mode"] == "4x8")
    print(json.dumps({
        "pairs": len(rows) // 2,
        "min_1_jvm_local8_one_quarter_s": t1,
        "min_4_jvms_local8_four_quarters_s": t4,
        "weak_scaling_efficiency": round(t1 / t4, 3),
        "gate": "PASS" if t1 / t4 >= 0.8 else "FAIL",
        "walls_1x8": sorted(r["wall"] for r in rows if r["mode"] == "1x8"),
        "walls_4x8": sorted(r["wall"] for r in rows if r["mode"] == "4x8"),
    }, indent=2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=1)
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--summarize", action="store_true")
    args = ap.parse_args()
    if args.summarize:
        summarize(args.out)
        return

    ensure_quarters()
    for _ in range(args.pairs):
        # N first, then 4N: noise ramping mid-pair penalizes the 4N leg,
        # biasing efficiency DOWN — conservative for a PASS claim
        r1 = {"mode": "1x8", **run_workers([0])}
        print(json.dumps(r1), file=sys.stderr)
        r4 = {"mode": "4x8", **run_workers([0, 1, 2, 3])}
        print(json.dumps(r4), file=sys.stderr)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(r1) + "\n")
            fh.write(json.dumps(r4) + "\n")
    summarize(args.out)


if __name__ == "__main__":
    main()
