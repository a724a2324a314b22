"""Stage-level probe for tfidf_cosine_pairs: where does the wall go at
each (docs, cores) level?  Times each materialization boundary of the
SHIPPED prefix-filtered plan (operators/terms.py::tfidf_cosine_pairs —
the pre-r5 probe timed the since-replaced a x b self-join shape, which
r4's ADVICE correctly flagged as a plan-shape mismatch).  Intermediates
are persisted before timing the next stage, so each reading isolates
its own stage instead of re-running everything upstream.

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
    ap.add_argument("--max-df", type=int, default=1024)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from yatsm_spark.operators.terms import _term_tf_array
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
    out = {"docs": n_docs, "cores": args.cores, "max_df": args.max_df}
    p, q, max_df = 1, 2, args.max_df

    # ---- stage 1: per-doc term tf (array-local) + vocab df aggregate
    t0 = time.time()
    tc = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(_term_tf_array(F.col("text"), 3, "fast")).alias("s"),
    ).select("id", F.col("s.t").alias("t"), F.col("s.tf").alias("tf"))
    tc = tc.persist()
    out["n_postings"] = tc.count()
    out["t_postings"] = round(time.time() - t0, 1)

    t0 = time.time()
    vocab = tc.groupBy("t").agg(F.count("*").alias("df")).persist()
    out["n_vocab"] = vocab.count()
    out["t_vocab"] = round(time.time() - t0, 1)

    # ---- stage 2: df-guarded weighted posts -> per-doc sorted vector
    # with norm^2 and integer-exact prefix cutoff k
    t0 = time.time()
    bitlen = lambda c: F.length(F.conv(c.cast("string"), 10, 2))  # noqa: E731
    idf_q = F.lit(len(bin(max(int(n_docs), 1))) - 2) - bitlen(F.col("df"))
    # production broadcast rule (tfidf_cosine_pairs): hint only under
    # the 10M-row threshold — at campaign scale vocab is 25M rows and
    # the join SHUFFLES, so the probe must too
    v = F.broadcast(vocab) if out["n_vocab"] <= 10_000_000 else vocab
    posts = (
        tc.join(v, "t")
        .filter(F.col("df") <= max_df)
        .select(
            "id", "t",
            (F.col("tf") * (F.lit(1) + idf_q)).cast("long").alias("w"),
        )
    )
    dec = "decimal(38,0)"
    pp2 = F.lit(p * p).cast(dec)
    qq2 = F.lit(q * q).cast(dec)
    vecs = (
        posts.groupBy("id")
        .agg(F.collect_list(F.struct((-F.col("w")).alias("nw"), "t")).alias("tw0"))
        .select(
            "id",
            F.transform(
                F.array_sort("tw0"),
                lambda x: F.struct(x["t"].alias("t"), (-x["nw"]).alias("w")),
            ).alias("tw"),
        )
        .select(
            "id", "tw",
            F.aggregate(
                F.col("tw"), F.lit(0).cast("long"),
                lambda a, e: a + e["w"] * e["w"],
            ).alias("n2"),
        )
        .select(
            "id", "tw", "n2",
            F.aggregate(
                F.col("tw"),
                F.struct(F.lit(0).cast("long").alias("cum"), F.lit(0).alias("k")),
                lambda a, e: F.struct(
                    (a["cum"] + e["w"] * e["w"]).alias("cum"),
                    F.when(
                        (F.col("n2") - a["cum"]).cast(dec) * qq2
                        >= pp2 * F.col("n2").cast(dec),
                        a["k"] + 1,
                    ).otherwise(a["k"]).alias("k"),
                ),
                lambda a: a["k"],
            ).alias("k"),
        )
    ).persist()
    out["n_vecs"] = vecs.count()
    out["prefix_frac_x1e4"] = vecs.agg(
        (F.lit(10000) * F.sum("k") / F.sum(F.size("tw"))).cast("int")
    ).collect()[0][0]
    out["t_vecs"] = round(time.time() - t0, 1)

    # ---- stage 3: prefix/suffix posting lists + map-side candidates
    t0 = time.time()
    flagged = vecs.select(
        "id", "k", F.posexplode("tw").alias("pos", "s")
    ).select(F.col("s.t").alias("t"), "id", (F.col("pos") < F.col("k")).alias("pf"))
    lists = (
        flagged.groupBy("t")
        .agg(
            F.collect_list(F.when(F.col("pf"), F.col("id"))).alias("pl"),
            F.collect_list(F.when(~F.col("pf"), F.col("id"))).alias("sl"),
        )
        .filter((F.size("pl") >= 1) & (F.size("pl") + F.size("sl") >= 2))
    ).persist()
    out["n_lists"] = lists.count()
    out["n_cand_structs"] = lists.agg(
        F.sum(
            F.size("pl") * (F.size("pl") - 1) / 2 + F.size("pl") * F.size("sl")
        ).cast("long")
    ).collect()[0][0]
    out["t_lists"] = round(time.time() - t0, 1)

    t0 = time.time()

    def cand_array(pl, sl):
        def pair(a, b):
            return F.struct(F.least(a, b).alias("id_a"), F.greatest(a, b).alias("id_b"))
        pp = F.flatten(F.transform(pl, lambda a, i: F.transform(
            F.slice(pl, i + 2, F.size(pl)), lambda b: pair(a, b))))
        ps = F.flatten(F.transform(pl, lambda a: F.transform(sl, lambda b: pair(a, b))))
        return F.concat(pp, ps)

    cand = (
        lists.select(F.explode(cand_array(F.col("pl"), F.col("sl"))).alias("c"))
        .select("c.*")
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    ).persist()
    out["n_cand_distinct"] = cand.count()
    out["t_cand"] = round(time.time() - t0, 1)

    # ---- stage 4: exact verify (map probe dot + threshold)
    t0 = time.time()
    va = vecs.select(F.col("id").alias("id_a"), F.col("tw").alias("twa"),
                     F.col("n2").alias("n2a"))
    vb = vecs.select(F.col("id").alias("id_b"), F.col("tw").alias("twb"),
                     F.col("n2").alias("n2b"))
    dot = F.element_at(
        F.transform(
            F.array(F.map_from_entries(F.col("twb"))),
            lambda mb: F.aggregate(
                F.col("twa"), F.lit(0).cast("long"),
                lambda a, e: a + e["w"] * F.coalesce(
                    F.try_element_at(mb, e["t"]), F.lit(0).cast("long")),
            ),
        ), 1,
    )
    scored = (
        cand.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", "n2a", "n2b", dot.alias("dot"))
    )
    dd = F.col("dot").cast(dec) * F.col("dot").cast(dec)
    keep = qq2 * dd >= pp2 * F.col("n2a").cast(dec) * F.col("n2b").cast(dec)
    out["n_pairs"] = scored.filter(keep).count()
    out["t_verify"] = round(time.time() - t0, 1)

    out["t_total"] = round(
        sum(v for k, v in out.items() if k.startswith("t_") and k != "t_total"), 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
