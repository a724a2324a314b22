"""Corpus-cleaning job: crawl -> canonical snapshot -> dedup -> quality ->
PII scrub -> splits.  The end-to-end training-data pipeline over a
Common-Crawl-style table, gluing the operator family into one
spark-submit entry point:

    spark-submit --master ... --py-files engine.zip jobs/corpus.py \
        --input /path/to/crawl --output /path/to/corpus \
        [--synthetic N_URLS:SPAN_DAYS] [--neardup-threshold 0.5] \
        [--max-dup-bigram 0.6] [--min-tokens 5]

Stages (each with a row-count lineage metric in <output>/_meta):

  1. canonical snapshot — canonicalize_url, keep the LATEST crawl of each
     canonical url (struct-max, one shuffle on url), extract text.
  2. exact dedup — md5 fingerprint groupBy, keep the min-url doc of each
     fingerprint group (operators/dedup.py::exact_dedup).
  3. near-dup dedup — MinHash+LSH banding pairs -> connected components ->
     drop every non-keeper (operators/graph.py::neardup_clusters).
  4. quality filter — repetition signals (operators/quality.py) + token
     floor; drops keyword-stuffed / degenerate docs.  Optional 4b
     (--domain-cap N): per-host quota via the two-phase skew-safe top-k
     (quality.domain_cap).  Optional 4c (--token-budget B): greedy pack
     to a token budget, best distinct-token fraction first, via the
     histogram-threshold selector (quality.pack_token_budget — no
     global sort).
  5. PII scrub — email/IPv4 redaction (functions/textops.py::redact_pii).
  6. splits — deterministic content-hash train/val/test assignment
     (functions/textops.py::hash_split), written partitioned by split.

Scale notes (100 TB design): stages 1-2 are single-shuffle aggregates on
url/fingerprint; stage 3's pair generation shuffles (band, bkey) buckets
only and the CC loop runs on the (tiny) edge list, never the corpus;
stage 4 is an algebraic two-level aggregate joined back url-keyed;
stages 5-6 are map-side.  The corpus itself is never collected, crossed,
or exploded beyond shingles.

Reference analog: the reference ships per-dataset prep CLIs
(scripts/gen_date_file.sh etc. [U]); this is the webtext-payload
equivalent (task brief: training-data pipeline as first-class surface).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from yatsm_spark.datagen import generate_crawl  # noqa: E402
from yatsm_spark.functions.textops import (  # noqa: E402
    canonicalize_url,
    extract_text,
    hash_split,
    redact_pii,
)
from yatsm_spark.operators.dedup import exact_dedup, minhash_lsh_pairs  # noqa: E402
from yatsm_spark.operators.graph import neardup_clusters  # noqa: E402
from yatsm_spark.operators.quality import repetition_stats  # noqa: E402
from yatsm_spark.session import get_spark  # noqa: E402


def clean_corpus(
    crawl: DataFrame,
    neardup_threshold: float = 0.5,
    max_dup_bigram_x1e4: int = 6000,
    min_tokens: int = 5,
    minhash_bands: int = 4,
    minhash_hashes: int = 16,
    domain_cap_n: int | None = None,
    token_budget: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Run stages 1-6; returns (cleaned corpus df, per-stage row counts).

    The returned df has (doc_id=url, text redacted, lang, split) and is
    deterministic: every keep/drop decision derives from content hashes
    and min-id tie-breaks, never from partitioning or sampling.
    """
    m: dict[str, int] = {}

    # -- 1. canonical latest snapshot per url.  The regex-heavy html
    # extraction runs AFTER the max-aggregation (once per url, not once
    # per crawl observation); null text collapses to '' so degenerate
    # docs still flow through the quality gate (and get dropped there by
    # min_tokens) instead of bypassing repetition_stats entirely.
    snap = (
        crawl.select(
            canonicalize_url("url").alias("doc_id"),
            F.struct("warc_ts", "text", "html", "lang").alias("obs"),
        )
        .groupBy("doc_id")
        .agg(F.max("obs").alias("obs"))
        .select(
            "doc_id",
            F.coalesce(
                F.col("obs.text"), extract_text(F.col("obs.html")), F.lit("")
            ).alias("text"),
            F.col("obs.lang").alias("lang"),
        )
        .persist()
    )
    m["snapshot"] = snap.count()

    # -- 2. exact dedup (keep min doc_id per fingerprint)
    keepers = exact_dedup(snap).select(F.col("keeper_id").alias("doc_id"))
    uniq = snap.join(keepers, "doc_id", "left_semi").persist()
    m["exact_dedup"] = uniq.count()
    snap.unpersist()

    # -- 3. near-dup clusters -> drop non-keepers
    pairs = minhash_lsh_pairs(
        uniq, n_hashes=minhash_hashes, bands=minhash_bands, k=3
    ).filter(F.col("sig_sim") >= neardup_threshold)
    losers = neardup_clusters(pairs).filter(~F.col("is_keeper")).select("doc_id")
    deduped = uniq.join(losers, "doc_id", "left_anti").persist()
    m["neardup_dedup"] = deduped.count()
    uniq.unpersist()

    # -- 4. quality filter
    rep = repetition_stats(deduped)
    bad = rep.filter(
        (F.col("dup_bigram_frac_x1e4") > max_dup_bigram_x1e4)
        | (F.col("n_tokens") < min_tokens)
    ).select("doc_id")
    good = deduped.join(bad, "doc_id", "left_anti")

    # -- 4b/4c. optional selection stages: per-host quota, then greedy
    # token-budget packing by quality.  Both rank on repetition-stat
    # scores already computed for stage 4, joined back doc-keyed; both
    # are deterministic (integer scores, doc_id tie-breaks).
    if domain_cap_n is not None or token_budget is not None:
        from yatsm_spark.functions.textops import url_host
        from yatsm_spark.operators.quality import domain_cap, pack_token_budget

        scored = good.join(
            rep.select("doc_id", "n_tokens", "distinct_frac_x1e4"), "doc_id"
        )
        if domain_cap_n is not None:
            scored = domain_cap(
                scored.withColumn("_host", url_host("doc_id")),
                "n_tokens",
                cap=domain_cap_n,
                domain_col="_host",
            ).drop("_host")
            m["domain_cap"] = scored.count()
        if token_budget is not None:
            scored = pack_token_budget(
                scored, "distinct_frac_x1e4", "n_tokens", token_budget
            )
            m["token_budget"] = scored.count()
        good = scored.drop("n_tokens", "distinct_frac_x1e4")

    # -- 5-6. PII scrub + deterministic splits (map-side)
    cleaned = hash_split(
        good.select("doc_id", redact_pii("text").alias("text"), "lang"),
        key_col="doc_id",
    ).persist()
    m["cleaned"] = cleaned.count()
    deduped.unpersist()
    return cleaned, m


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="crawl parquet dir (url, warc_ts, html, text, lang)")
    ap.add_argument("--synthetic", help="N_URLS:SPAN_DAYS deterministic crawl instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--neardup-threshold", type=float, default=0.5)
    ap.add_argument("--max-dup-bigram", type=float, default=0.6,
                    help="drop docs with a higher duplicate-bigram fraction")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--domain-cap", type=int, default=None,
                    help="keep at most N docs per host (longest first)")
    ap.add_argument("--token-budget", type=int, default=None,
                    help="greedy-pack to this many whitespace tokens, "
                         "best distinct-token fraction first")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("corpus_clean", master=args.master)
    t0 = time.time()
    if args.synthetic:
        n_urls, span = (int(x) for x in args.synthetic.split(":"))
        crawl = generate_crawl(spark, n_urls=n_urls, span_days=span)
    elif args.input:
        crawl = spark.read.parquet(args.input)
    else:
        raise SystemExit("need --input or --synthetic")

    cleaned, metrics = clean_corpus(
        crawl,
        neardup_threshold=args.neardup_threshold,
        max_dup_bigram_x1e4=int(round(args.max_dup_bigram * 10000)),
        min_tokens=args.min_tokens,
        domain_cap_n=args.domain_cap,
        token_budget=args.token_budget,
    )
    # data under <output>/data so mode=overwrite cannot wipe the metrics
    # history accumulating beside it in <output>/_meta
    cleaned.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(args.output, "data")
    )
    metrics["wall_s"] = round(time.time() - t0, 1)

    meta_dir = os.path.join(args.output, "_meta")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, "corpus_metrics.jsonl"), "a") as fh:
        fh.write(json.dumps(metrics) + "\n")
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
