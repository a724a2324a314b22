"""Corpus-level term statistics over `documents` tables.

Training-data-pipeline operators (task brief first-class components):

  * :func:`term_doc_freq` — document frequency per term (the shared
    "vocabulary dimension" both operators below join against).
  * :func:`tfidf_top_terms` — top-k most distinctive terms per document
    by an integer-exact tf-idf weight (keyword extraction / topic
    fingerprinting for corpus exploration and cluster labeling).
  * :func:`commonness_score` — per-doc mean token document-frequency,
    the rank-free twin of a unigram-LM quality score (CCNet / Wenzek et
    al. 2020 filter on LM perplexity; this is the integer-exact proxy):
    LOW values flag rare-token-heavy docs (mojibake, OCR noise, codes),
    HIGH values flag stopword/filler soup.

Exactness: idf is the LINEAR inverse document frequency N/df, not
log(N/df) — tf * N / df is computable in exact integer arithmetic
(the pmod-exact x1e4 route, see quality._x1e4), so ranks and scores are
bit-identical across engines and cluster sizes; float log-idf flips
4th-decimal rounding cross-engine.  Linear idf is rank-equivalent to
log-idf for a FIXED term (monotone in 1/df) and steeper across terms —
fine for "top-k distinctive terms"; swap in log-idf (one line) if
calibrated weights matter more than exact reproducibility.

Scale notes (100 TB design):
  * The vocabulary table (term -> df) is the natural-language vocab of
    the corpus — Heaps' law keeps it ~sqrt-ish of token volume, so at
    100 TB it is millions-to-low-billions of SHORT rows.  Both operators
    broadcast it when under ``broadcast_threshold`` rows; above that
    they fall back to a shuffled join on the term key (AQE handles the
    skewed stopword keys).
  * Everything else is algebraic aggregation: (doc, term) counts get
    map-side partial aggregation; the per-doc top-k window partitions
    by doc_id (doc-sized groups — no hot reducer).
  * N (corpus doc count) is one count() job collected to the driver —
    same bounded-collect class as the tier manifest lookups.

Reference analog: none — YATSM is numeric-only [U]; axis-A webtext ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yatsm_spark.operators.quality import _x1e4


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, t, tf) — per-document term counts (whitespace tokens)."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(text_col, " ")).alias("t"),
        )
        .groupBy("id", "t")
        .agg(F.count("*").alias("tf"))
    )


def term_doc_freq(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(t, df) — number of documents each term occurs in."""
    return (
        _doc_terms(docs, id_col, text_col)
        .groupBy("t")
        .agg(F.count("*").alias("df"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int | None = 10_000_000,
) -> DataFrame:
    """Top-``k`` distinctive terms per doc: (id, term, tf, df,
    tfidf_x1e4) with tfidf_x1e4 = round-half-up(1e4 * tf * N / df),
    ranked per doc by (tfidf_x1e4 DESC, term ASC) — deterministic ties.

    One (id, term) aggregate, one vocab join (broadcast under the
    threshold), one doc-partitioned window.  ``broadcast_threshold``
    None skips the vocab count and lets AQE pick the join side.
    """
    tc = _doc_terms(docs, id_col, text_col)
    vocab = tc.groupBy("t").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    if broadcast_threshold is not None and vocab.count() <= broadcast_threshold:
        vocab = F.broadcast(vocab)
    # tf*N formed in decimal(38,0): in bigint it silently wraps past 2^63
    # in non-ANSI Spark once tf*N > ~9.2e18 — reachable at the documented
    # 100 TB design scale (N ~ 1e12 docs)
    scored = tc.join(vocab, "t").withColumn(
        "tfidf_x1e4",
        _x1e4(
            F.col("tf").cast("decimal(38,0)")
            * F.lit(int(n_docs)).cast("decimal(38,0)"),
            F.col("df"),
        ),
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf_x1e4").desc(), F.col("t"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("t").alias("term"),
            "tf",
            "df",
            "tfidf_x1e4",
        )
    )


def commonness_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int | None = 10_000_000,
) -> DataFrame:
    """(id, n_tokens, mean_df_x1e4): mean over token INSTANCES of the
    token's corpus document-frequency fraction df/N, as round-half-up
    integer x1e4 — i.e. round(1e4 * sum_i df(t_i) / (n_tokens * N)).

    A document of everyday words scores high; a document of tokens the
    rest of the corpus never uses scores near 0.  Used as a quality
    filter band: drop both tails (noise at the bottom, boilerplate
    filler at the top), or feed :func:`quality.keep_top_fraction`.
    """
    tc = _doc_terms(docs, id_col, text_col)
    vocab = tc.groupBy("t").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    if broadcast_threshold is not None and vocab.count() <= broadcast_threshold:
        vocab = F.broadcast(vocab)
    # tf*df and n_tokens*N formed in decimal(38,0) — bigint products wrap
    # silently past 2^63 at design scale (see tfidf_top_terms note)
    return (
        tc.join(vocab, "t")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(
                F.col("tf").cast("decimal(38,0)") * F.col("df").cast("decimal(38,0)")
            ).alias("sum_df"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_tokens"),
            _x1e4(
                F.col("sum_df"),
                F.col("n_tokens").cast("decimal(38,0)")
                * F.lit(int(n_docs)).cast("decimal(38,0)"),
            ).alias("mean_df_x1e4"),
        )
    )
