"""Per-stage wall probe for the corpus pipeline at one parallelism level.

Diagnostic companion to bench_corpus_pair.py: times each clean_corpus
stage separately (snapshot / exact dedup / LSH pairs / CC clusters /
quality / pack+redact+split) so an anti-scaling stage can be isolated.
Also dumps executor-summary spill counters from the live UI REST API.

Usage: python scripts/probe_corpus_stages.py --cores 32 [--docs 480000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--docs", type=int, default=480000)
    args = ap.parse_args()

    from jobs.corpus import snapshot
    from yatsm_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from yatsm_spark.operators.graph import neardup_clusters
    from yatsm_spark.operators.quality import repetition_stats
    from yatsm_spark.functions.textops import hash_split, redact_pii
    from yatsm_spark.session import get_spark

    spark = get_spark(
        f"probe{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=64,
        extra_confs={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m"},
    )
    crawl = spark.read.parquet(f"/root/repo/.benchdata/webtext_n{args.docs}")
    t: dict[str, float] = {}

    t0 = time.time()
    snap = snapshot(crawl).persist()
    n = snap.count()
    t["snapshot"] = time.time() - t0

    t0 = time.time()
    keepers = exact_dedup(snap).select(F.col("keeper_id").alias("doc_id"))
    uniq = snap.join(keepers, "doc_id", "left_semi").persist()
    n = uniq.count()
    t["exact_dedup"] = time.time() - t0
    snap.unpersist()

    t0 = time.time()
    pairs = minhash_lsh_pairs(
        uniq, n_hashes=16, bands=4, k=3, max_bucket=256, hash_fn="fast"
    ).filter(
        F.col("sig_sim") >= 0.5
    ).persist()
    np_ = pairs.count()
    t["lsh_pairs"] = time.time() - t0

    t0 = time.time()
    losers = neardup_clusters(pairs).filter(~F.col("is_keeper")).select("doc_id")
    deduped = uniq.join(losers, "doc_id", "left_anti").persist()
    n = deduped.count()
    t["cc_dedup"] = time.time() - t0
    pairs.unpersist()
    uniq.unpersist()

    t0 = time.time()
    rep = repetition_stats(deduped)
    bad = rep.filter(
        (F.col("dup_bigram_frac_x1e4") > 6000) | (F.col("n_tokens") < 5)
    ).select("doc_id")
    good = deduped.join(bad, "doc_id", "left_anti")
    cleaned = hash_split(
        good.select("doc_id", redact_pii("text").alias("text"), "lang"),
        key_col="doc_id",
    )
    cleaned.write.mode("overwrite").format("noop").save()
    t["quality_pii_split"] = time.time() - t0

    t["total"] = sum(t.values())
    # spill counters from the live UI
    try:
        app = json.load(
            urllib.request.urlopen("http://localhost:4040/api/v1/applications")
        )[0]["id"]
        ex = json.load(
            urllib.request.urlopen(
                f"http://localhost:4040/api/v1/applications/{app}/executors"
            )
        )
        t["spill_bytes"] = sum(e.get("totalDiskBytesSpilled", 0) for e in ex)
        t["gc_ms"] = sum(e.get("totalGCTime", 0) for e in ex)
    except Exception as exc:  # UI port may differ when another session is live
        t["ui_err"] = str(exc)
    print(json.dumps({"cores": args.cores, "pairs": np_, "last_n": n,
                      **{k: round(v, 2) if isinstance(v, (int, float)) else v
                         for k, v in t.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
