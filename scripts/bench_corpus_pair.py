"""Corpus-pipeline scaling pairs: the north_rule N-vs-4N evidence for the
WEBTEXT axis (jobs/corpus.py::clean_corpus), companion to bench_pair.py's
timeseries-tier campaign.

No real cluster exists in this sandbox, so the two-cluster-size criterion
(efficiency >= 0.8 from N to 4N executors) is evidenced by the SAME
corpus-cleaning job on the SAME on-disk crawl at local[8] vs local[32]:

    efficiency = (T_8 / T_32) / (32 / 8)

Methodology (same as bench_pair.py): the host has invisible co-tenant
load, so single-shot numbers are meaningless — run back-to-back PAIRS
(noise hits both levels of a pair similarly), accumulate pairs across
invocations into a JSONL, report min-of-N per level.

Input: datagen.generate_webtext — the DIVERSE-text crawl (seeded-hash
vocabulary, planted dup/near-dup/spam/PII families).  generate_crawl's
boilerplate-padded text is the wrong corpus: every doc near-dups every
other, all LSH buckets go corpus-sized, and the pair join is quadratic
(measured: never finished at 120k docs).  The pipeline runs with the
lsh_max_bucket=256 hot-bucket guard armed — the production config.

Usage: python scripts/bench_corpus_pair.py [--docs 120000]
       python scripts/bench_corpus_pair.py --summarize
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_OUT = "/root/repo/.benchdata/corpus_pairs.jsonl"


def ensure_data(n_docs: int) -> str:
    from yatsm_spark.datagen import generate_webtext, write_crawl
    from yatsm_spark.session import get_spark

    path = f"/root/repo/.benchdata/webtext_n{n_docs}"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    spark = get_spark("webtext_datagen", master="local[32]")
    t0 = time.time()
    write_crawl(generate_webtext(spark, n_docs=n_docs), path)
    n = spark.read.parquet(path).count()
    print(f"generated {n} rows in {time.time()-t0:.0f}s -> {path}", file=sys.stderr)
    spark.stop()
    return path


def io_probe_mbps() -> float:
    """64 MiB buffered-write probe: the host goes through minute-scale
    windows where guest page allocation stalls (measured 5-700 MB/s
    bimodal on identical dd runs) — every Spark shuffle write rides that
    path, so each leg records the regime it ran in.  Min-of-N across
    legs is the noise defense; this annotates WHICH legs were degraded."""
    buf = b"\0" * (1 << 20)
    t0 = time.time()
    with open("/tmp/.io_probe", "wb") as fh:
        for _ in range(64):
            fh.write(buf)
    dt = time.time() - t0
    os.unlink("/tmp/.io_probe")
    return round(64 / dt, 1)


def _scale_heap(cores: int) -> None:
    """Pin driver heap to 2.5 g/core for the level being measured (see
    run_tfidf_once).  No-op if a JVM already exists in this process —
    the launcher runs one level per process precisely so this applies."""
    os.environ["YATSM_SPARK_DRIVER_MEM"] = f"{int(2.5 * cores)}g"


# Executor shape for --cluster mode: every level runs 8-core / 20 GiB
# executors and ONLY the executor count changes — the literal N -> 4N
# form of the north rule.  local[k] puts all k threads in ONE JVM whose
# allocator/GC/heap are shared 4x harder at the 4N level, a sandbox
# artifact no real cluster exhibits (measured: the same tfidf weak pair
# scored 0.26 single-JVM vs the multi-JVM number recorded in
# BENCH/BASELINE.md); local-cluster[n, 8, 20480] launches n REAL
# executor JVMs with standalone-style netty shuffle between them.
_EXEC_CORES = 8
_EXEC_MEM_MB = 20480


def _cluster_master(cores: int) -> str:
    n_exec, rem = divmod(cores, _EXEC_CORES)
    if rem or n_exec < 1:
        raise SystemExit(f"--cluster needs a multiple of {_EXEC_CORES} cores")
    return f"local-cluster[{n_exec},{_EXEC_CORES},{_EXEC_MEM_MB}]"


def run_tfidf_once(crawl_path: str, cores: int, cluster: bool = False) -> dict:
    """One tfidf_cosine_pairs pass (3-gram terms, df-capped posting
    join) with a real warm scan first — N-vs-4N evidence for the
    part-12 similarity operator."""
    from pyspark.sql import functions as F

    from yatsm_spark.operators.terms import tfidf_cosine_pairs
    from yatsm_spark.session import get_spark

    probe = io_probe_mbps()
    # partitions scale WITH cluster size (4x cores) so a weak-scaling
    # pair (4x data on 4x cores) also gets 4x partitions — the
    # cluster-realistic setting.  Under-partitioning is catastrophic
    # for this operator: at 480k docs the (id_a, id_b) pair aggregate
    # holds ~138M groups, and 32 partitions put ~4.3M string-keyed
    # groups in EACH partial map — measured 569.6 s vs 258.8 s at 128
    # partitions on the same input/cores (spill-driven super-linearity,
    # the spill-aware sizing rule from the task brief in action).
    # HEAP scales with cores too (2.5 g/core): a real N -> 4N cluster
    # adds 4x executors each with the SAME heap, so heap-per-core is
    # constant; a fixed driver heap would make the 4N leg run 4x data
    # on a quarter of the per-core memory — a sandbox artifact no
    # cluster exhibits, not the scaling property under test.  Must be
    # set BEFORE the first session of the process (JVM-launch option).
    # the synthetic crawls are SMALL files (120k docs = 325 MB over 63
    # files): the default 128 MB maxPartitionBytes bins that into ~3
    # scan partitions, capping the dominant tokenize+hash map stage at
    # ~4-way parallelism no matter how many executors the level has
    # (measured: 1-exec and 4-exec walls IDENTICAL at 120k docs).  8 MB
    # gives the scan stage >= cores tasks at every level — the brief's
    # "size maxPartitionBytes to the input" rule in action; a real
    # 100 TB input hits neither condition.
    extra = {"spark.sql.files.maxPartitionBytes": "8m"}
    if cluster:
        # the materialized (localCheckpoint) posting/vector blocks pin
        # task locality to the executor that computed them; the default
        # spark.locality.wait=3s then stalls the scheduler whenever that
        # executor's cores are busy instead of running the task next
        # door with a (localhost-cheap) remote fetch.  0 is the right
        # setting wherever fetch cost << 3 s — here and on any
        # same-rack cluster.
        extra["spark.locality.wait"] = "0s"
        # executors carry the heap (20 GiB each: the master string sizes
        # the WORKER's allocatable pool, spark.executor.memory sizes the
        # executor JVM inside it — both needed); the driver only plans/
        # collects — fixed size at BOTH levels
        os.environ["YATSM_SPARK_DRIVER_MEM"] = "8g"
        master = _cluster_master(cores)
        extra["spark.executor.memory"] = f"{_EXEC_MEM_MB - 1024}m"
    else:
        _scale_heap(cores)
        master = f"local[{cores}]"
    spark = get_spark(
        f"tfidf_pair{cores}", master=master,
        shuffle_partitions=max(4 * cores, 32),
        extra_confs=extra,
    )
    docs = spark.read.parquet(crawl_path).select(
        F.xxhash64("url", "warc_ts").alias("doc_id"), "text"
    )
    docs.agg(F.max("doc_id"), F.max(F.length("text"))).collect()
    n = docs.count()
    t0 = time.time()
    pairs = tfidf_cosine_pairs(
        docs, threshold=(1, 2), max_df=1024, ngram=3
    )
    n_pairs = pairs.count()
    wall = time.time() - t0
    spark.stop()
    return {
        "suite": "tfidf",
        "cores": cores,
        "wall": round(wall, 2),
        "snapshot": n,
        "n_pairs": n_pairs,
        "io_probe_mbps": probe,
    }


def run_once(crawl_path: str, cores: int) -> dict:
    """One full clean_corpus pass; returns wall + stage metrics.

    The pipeline's own persist().count() per stage are the actions; the
    final corpus lands in a noop sink so shared-host disk saturation
    (measured 14x swings on identical jobs) doesn't pollute the engine
    scaling signal — same isolation rule as bench_pair.py's noop mode.
    """
    from jobs.corpus import clean_corpus
    from yatsm_spark.session import get_spark

    probe = io_probe_mbps()
    _scale_heap(cores)  # constant heap-per-core, see run_tfidf_once
    spark = get_spark(
        f"corpus_pair{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=64,
        extra_confs={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"},
    )
    crawl = spark.read.parquet(crawl_path)
    t0 = time.time()
    cleaned, metrics = clean_corpus(crawl, lsh_max_bucket=256)
    cleaned.write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    cleaned.unpersist()
    spark.stop()
    return {
        "cores": cores,
        "wall": round(wall, 2),
        "io_probe_mbps": probe,
        **metrics,
    }


def summarize(out_path: str) -> None:
    rows = [json.loads(ln) for ln in open(out_path)] if os.path.exists(out_path) else []
    if not rows:
        print("no pairs recorded", file=sys.stderr)
        return
    by_cores: dict[int, list[float]] = {}
    for r in rows:
        by_cores.setdefault(r["cores"], []).append(r["wall"])
    lo, hi = min(by_cores), max(by_cores)
    t_lo, t_hi = min(by_cores[lo]), min(by_cores[hi])
    docs = rows[0]["snapshot"]
    out = {
        "pairs": len(rows) // 2,
        "walls": {str(c): sorted(v) for c, v in by_cores.items()},
        f"min_local[{lo}]": t_lo,
        f"min_local[{hi}]": t_hi,
        f"docs_per_sec_local[{lo}]": round(docs / t_lo, 1),
        f"docs_per_sec_local[{hi}]": round(docs / t_hi, 1),
        "speedup": round(t_lo / t_hi, 3),
        "parallelism_ratio": hi / lo,
        "scaling_efficiency": round(t_lo / t_hi / (hi / lo), 3),
        "gate": "PASS" if t_lo / t_hi / (hi / lo) >= 0.8 else "FAIL",
    }
    print(json.dumps(out, indent=2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--suite", choices=("corpus", "tfidf"), default="corpus")
    ap.add_argument(
        "--cluster", action="store_true",
        help="run each level as local-cluster[N,8,20g] (N = cores/8) — "
        "separate executor JVMs, the literal N->4N executor form",
    )
    ap.add_argument("--summarize", action="store_true")
    args = ap.parse_args()
    if args.out is None:
        args.out = (DEFAULT_OUT if args.suite == "corpus"
                    else DEFAULT_OUT.replace(".jsonl", "_tfidf.jsonl"))
        if args.cluster:
            args.out = args.out.replace(".jsonl", "_cluster.jsonl")

    if args.summarize:
        summarize(args.out)
        return

    crawl_path = ensure_data(args.docs)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    # low cores first: if co-tenant noise ramps mid-pair it penalizes the
    # HIGH leg, biasing efficiency DOWN — conservative for a PASS claim
    for cores in (int(x) for x in args.levels.split(",")):
        if args.suite == "tfidf":
            r = run_tfidf_once(crawl_path, cores, cluster=args.cluster)
        else:
            r = run_once(crawl_path, cores)
        if args.cluster:
            r["master"] = _cluster_master(cores)
        print(json.dumps(r), file=sys.stderr)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(r) + "\n")
    summarize(args.out)


if __name__ == "__main__":
    main()
