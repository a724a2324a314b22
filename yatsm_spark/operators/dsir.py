"""DSIR importance scoring — data selection via hashed-n-gram importance
weights, as pure DataFrame aggregations.

DSIR (Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling", re-derived from the paper's §3 bag-of-hashed-ngrams recipe):
fit multinomial bucket distributions p (target/trusted corpus) and q (raw
crawl) over hashed {1,2}-gram features, then weight every raw doc by

    log w(d) = sum over feature instances f in d of (ln p_b(f) - ln q_b(f))

and keep the importance-weighted head.  This is the third leg of the
quality stack: heuristic signals (quality.py), LM perplexity (lm.py),
and target-DISTRIBUTION matching (this file) — the one that selects for
"looks like the domain I want" rather than "is fluent".

Engine-exact: bucket log-ratios are differences of two INTEGER micro-nat
floors lam(b) = ilog(p_num, p_den) - ilog(q_num, q_den) (one ln per
bucket per side, at fit time), so per-doc scores are bigint SUMS —
associative, partitioning-invariant, DuckDB-reproducible.  Both p and q
are add-one smoothed over the same ``n_buckets`` domain, so every bucket
(including never-seen ones) has a finite lam.

Feature hashing reuses the string-free shingle machinery
(dedup.shingle_hash_array): per-token md5-prefix hash + polynomial
2-window fold, mod ``n_buckets`` — the k-gram string is never
materialized (the corpus-scaling campaign's memory-bandwidth lesson).

Scale shape (100 TB design): each fit is one groupBy(bucket) with
map-side partial counts onto at most ``n_buckets`` rows (default 65536 —
kilobytes); scoring probes the broadcast lam table and aggregates once
per doc.  The raw-side q fit is the only full-corpus pass and it reduces
to n_buckets rows immediately.  Docs with zero features still emit a row.

Reference analog: none — YATSM is numeric-only [U]; axis-A webtext op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yatsm_spark.operators.dedup import shingle_hash_array


def _feature_rows(docs: DataFrame, id_col: str, text_col: str, n_buckets: int):
    """One row per hashed {1,2}-gram INSTANCE: (id, bucket).  Map-side."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    feats = F.concat(shingle_hash_array(txt, 1), shingle_hash_array(txt, 2))
    return docs.select(
        F.col(id_col),
        F.explode(F.transform(feats, lambda h: h % n_buckets)).alias("bucket"),
    )


def _bucket_counts(feat_rows: DataFrame) -> DataFrame:
    return feat_rows.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    n_buckets: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """Fit both multinomials; return the per-bucket log-ratio table
    (bucket: bigint, lam: bigint) — only buckets seen on EITHER side are
    materialized (absent buckets have lam = ilog-difference of the two
    smoothing floors, which scorers reconstruct from the broadcast
    1-row totals; here we emit them explicitly via the outer join's
    coalesce-to-0 counts, keeping the scorer a single probe)."""
    tc = _bucket_counts(_feature_rows(target, id_col, text_col, n_buckets))
    rc = _bucket_counts(_feature_rows(raw, id_col, text_col, n_buckets))
    tn = tc.select(F.sum("c").alias("t_total"))
    rn = rc.select(F.sum("c").alias("r_total"))

    def ilog(num, den):
        return F.floor(F.lit(scale) * F.log(num / den)).cast("long")

    return (
        tc.withColumnRenamed("c", "tc")
        .join(rc.withColumnRenamed("c", "rc"), "bucket", "full")
        .crossJoin(F.broadcast(tn))
        .crossJoin(F.broadcast(rn))
        .select(
            "bucket",
            (
                ilog(
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double"),
                    (F.col("t_total") + n_buckets).cast("double"),
                )
                - ilog(
                    (F.coalesce(F.col("rc"), F.lit(0)) + 1).cast("double"),
                    (F.col("r_total") + n_buckets).cast("double"),
                )
            ).alias("lam"),
        )
    )


def dsir_score(
    docs: DataFrame,
    lam: DataFrame,
    n_buckets: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every doc: (doc_id, n_feats: bigint, logratio_sum: bigint).
    Every input doc emits a row (0-feature docs get (0, 0)).  Buckets a
    doc hits that NEITHER fit corpus saw fall back to lam = 0 — exactly
    the ilog(1,T+B) - ilog(1,R+B) smoothing difference only when the two
    totals coincide, but always sign-safe: an unseen feature carries no
    evidence either way.  Selection = importance-weighted head: compose
    with quality.top_quantile_by over logratio_sum (the paper's Gumbel
    resampling is stochastic; the deterministic head is the
    engine-exact variant).

    ``n_buckets`` MUST match the fit.  Scale shape: one broadcast probe
    + one per-doc aggregation; the crawl never shuffles its text."""
    feats = _feature_rows(docs, id_col, text_col, n_buckets)
    agg = (
        feats.join(F.broadcast(lam), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.coalesce(F.col("lam"), F.lit(0))).alias("logratio_sum"),
        )
    )
    return docs.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(F.col("logratio_sum"), F.lit(0)).cast("long").alias("logratio_sum"),
    )
