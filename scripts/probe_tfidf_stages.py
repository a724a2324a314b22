"""Stage-level probe for tfidf_cosine_pairs: where does the wall go at
each (docs, cores) level?  Times each materialization boundary
separately so the weak-scaling loss (0.33 measured on the end-to-end
pair) can be attributed to a stage instead of guessed.

Usage: python scripts/probe_tfidf_stages.py --docs 120000 --cores 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=120000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from yatsm_spark.operators.dedup import shingle_hash_array
    from yatsm_spark.session import get_spark

    path = f"/root/repo/.benchdata/webtext_n{args.docs}"
    assert os.path.exists(f"{path}/_SUCCESS"), f"run bench_corpus_pair first: {path}"

    spark = get_spark(
        f"tfidf_probe{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=max(4 * args.cores, 32),
    )
    docs = spark.read.parquet(path).select(
        F.xxhash64("url", "warc_ts").alias("doc_id"), "text"
    )
    docs.agg(F.max("doc_id"), F.max(F.length("text"))).collect()
    n_docs = docs.count()
    out = {"docs": n_docs, "cores": args.cores}

    t0 = time.time()
    tc = (
        docs.select(
            "doc_id",
            F.explode(shingle_hash_array(F.col("text"), 3, "fast")).alias("t"),
        )
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
    )
    tc.persist()
    out["n_tc"] = tc.count()
    out["t_tc"] = round(time.time() - t0, 2)

    t0 = time.time()
    vocab = tc.groupBy("t").agg(F.count("*").alias("df"))
    vocab.persist()
    out["n_vocab"] = vocab.count()
    out["t_vocab"] = round(time.time() - t0, 2)

    t0 = time.time()
    bitlen = lambda c: F.length(F.conv(c.cast("string"), 10, 2))  # noqa: E731
    idf_q = F.lit(len(bin(max(int(n_docs), 1))) - 2) - bitlen(F.col("df"))
    posts = (
        tc.join(F.broadcast(vocab), "t")
        .filter(F.col("df") <= 1024)
        .select(
            F.col("doc_id").alias("id"),
            "t",
            (F.col("tf") * (F.lit(1) + idf_q)).cast("long").alias("w"),
        )
    )
    posts.persist()
    out["n_posts"] = posts.count()
    out["t_posts"] = round(time.time() - t0, 2)

    dec = "decimal(38,0)"
    t0 = time.time()
    a = posts.select(F.col("id").alias("id_a"), "t", F.col("w").alias("wa"))
    b = posts.select(F.col("id").alias("id_b"), "t", F.col("w").alias("wb"))
    joined = a.join(b, "t").filter(F.col("id_a") < F.col("id_b"))
    out["n_cand"] = joined.count()
    out["t_cand_count"] = round(time.time() - t0, 2)

    t0 = time.time()
    dots = joined.groupBy("id_a", "id_b").agg(
        F.sum(F.col("wa").cast(dec) * F.col("wb").cast(dec)).alias("dot")
    )
    dots.persist()
    out["n_dots"] = dots.count()
    out["t_dots"] = round(time.time() - t0, 2)

    t0 = time.time()
    norms = posts.groupBy("id").agg(
        F.sum(F.col("w").cast(dec) * F.col("w").cast(dec)).alias("n2")
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("n2").alias("n2b"))
    dd = F.col("dot") * F.col("dot")
    keep = F.lit(4).cast(dec) * dd >= F.col("n2a") * F.col("n2b")
    out["n_pairs"] = (
        dots.join(na, "id_a").join(nb, "id_b").filter(keep).count()
    )
    out["t_final"] = round(time.time() - t0, 2)
    out["t_total"] = round(
        sum(v for k, v in out.items() if k.startswith("t_") and k != "t_total"), 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
