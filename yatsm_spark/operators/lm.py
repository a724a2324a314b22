"""Bigram language-model perplexity scoring — the CCNet quality gate as
pure DataFrame aggregations.

CCNet (Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") ranks crawled docs by the perplexity of a
small LM trained on a trusted corpus and keeps the low-perplexity head —
the standard pre-training quality gate alongside the Gopher repetition
fractions (operators/quality.py).  KenLM is not in this sandbox and a
5-gram model is overkill for the gate's discrimination task, so this is
an add-one-smoothed BIGRAM model (Jurafsky & Martin ch. 3 textbook form,
re-derived) trained with one groupBy pass — no iterative solver, no
driver state, same shape as the NB classifier (operators/textclass.py):

    w(p, c)    = floor(scale * ln((c2(p, c) + 1) / (c1(p) + V)))
    oov_w(p)   = floor(scale * ln(       1       / (c1(p) + V)))
    unseen_w   = floor(scale * ln(       1       /      V     ))   # p OOV
    sum_w(d)   = sum over bigram positions of w | oov_w | unseen_w

Engine-exact scoring: weights are INTEGER micro-nats (one ln per distinct
(prev, cur) / prev at train time), so per-doc scores are bigint SUMS —
associative, partitioning/cluster-size invariant, and DuckDB-reproducible
(the ln-parity argument is textclass.py's: a floor flip needs the
fractional part within ~1 ulp of an integer).  No averaged float is ever
emitted: callers filter with the exact cross-multiplied comparison in
:func:`lm_quality_filter` (sum_w >= threshold * n_bigrams — all bigint).

Scale shape (100 TB design): training shuffles once on (prev, cur) and
once on prev, both with map-side partial counts; the model is Heaps'-law
small (distinct bigrams of a TRUSTED corpus, not the crawl) and broadcast-
joins at scoring time, so the crawl-side pass is map-side probe + ONE
per-doc aggregation.  Docs with < 2 tokens (0 bigrams) still emit a row —
no doc can silently skip the quality gate.

Reference analog: none — YATSM is numeric-only [U]; axis-A webtext op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yatsm_spark.functions.textops import tokens


def _bigram_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per bigram POSITION (multiset): zip_with of offset slices —
    array-level, zero-shuffle, O(T) per doc (the per-element element_at
    form re-inlines the tokenizer per token: O(T^2), see shingle_array)."""
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n_bi = F.greatest(F.size(toks) - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(toks, 1, n_bi),
        F.slice(toks, 2, n_bi),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    return docs.select(F.col(id_col), F.explode(bi).alias("bi")).select(
        id_col, F.col("bi.prev").alias("prev"), F.col("bi.cur").alias("cur")
    )


def lm_train(
    train: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """One-pass bigram LM training on a trusted corpus.  Returns
    ``(weights, prev_stats)``:

    * weights    = (prev, cur, w: bigint)       — seen-bigram log-probs
    * prev_stats = (prev, oov_w: bigint, vocab_n: bigint) — per-context
      OOV log-prob; vocab_n rides along so scorers can derive the
      unseen-context weight floor(scale*ln(1/V)) without a third frame.

    c1(p) counts ALL instances of p in the trusted corpus (not just
    non-final positions) — the conventional unigram-context estimate.
    """
    toks = train.select(
        F.col(id_col),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("token"),
    )
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    vdf = uni.select(F.count(F.lit(1)).alias("vocab_n"))
    bi = _bigram_rows(train, id_col, text_col)
    counts = bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))

    def ilog(num, den):
        return F.floor(F.lit(scale) * F.log(num / den)).cast("long")

    ctx = (
        uni.withColumnRenamed("token", "prev")
        .crossJoin(F.broadcast(vdf))
        .select(
            "prev",
            (F.col("c1") + F.col("vocab_n")).alias("den"),
            "vocab_n",
        )
    )
    weights = counts.join(ctx, "prev").select(
        "prev",
        "cur",
        ilog((F.col("c2") + 1).cast("double"), F.col("den").cast("double")).alias("w"),
    )
    prev_stats = ctx.select(
        "prev",
        ilog(F.lit(1.0), F.col("den").cast("double")).alias("oov_w"),
        "vocab_n",
    )
    return weights, prev_stats


def lm_score(
    docs: DataFrame,
    weights: DataFrame,
    prev_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """Score every doc: (doc_id, n_bigrams: bigint, sum_w: bigint) with
    sum_w the exact integer micro-nat log-likelihood under the trained
    model.  Every input doc emits a row (0-bigram docs get (0, 0)).

    Scale shape: bigram instances probe the broadcast model (two
    broadcast left joins — no crawl-side shuffle), then ONE per-doc
    aggregation.  unseen_w is derived from the broadcast vocab_n row,
    not recomputed per position.
    """
    vdf = prev_stats.select(F.max("vocab_n").alias("vocab_n"))
    bi = _bigram_rows(docs, id_col, text_col)
    scored = (
        bi.join(F.broadcast(weights), ["prev", "cur"], "left")
        .join(F.broadcast(prev_stats.select("prev", "oov_w")), ["prev"], "left")
        .crossJoin(F.broadcast(vdf))
        .select(
            id_col,
            F.coalesce(
                F.col("w"),
                F.col("oov_w"),
                F.floor(F.lit(scale) * F.log(F.lit(1.0) / F.col("vocab_n"))).cast(
                    "long"
                ),
            ).alias("pw"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("pw").alias("sum_w")
    )
    base = docs.select(id_col)
    return base.join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.col("sum_w"), F.lit(0)).cast("long").alias("sum_w"),
    )


def lm_quality_filter(
    scored: DataFrame, max_micro_nats_per_bigram: int
) -> DataFrame:
    """Keep docs whose mean bigram surprisal is at most the threshold:
    -sum_w <= threshold * n_bigrams — exact bigint cross-multiplication,
    no float division anywhere (the CCNet head/tail cut, expressed as a
    micro-nat ceiling instead of a corpus-relative percentile; for the
    percentile form compose with quality.top_quantile_by).  0-bigram
    docs pass (nothing to judge them on; gate them on length instead)."""
    thr = F.lit(int(max_micro_nats_per_bigram))
    return scored.filter(-F.col("sum_w") <= thr * F.col("n_bigrams"))
