"""Multinomial Naive Bayes text classification — train AND score as pure
DataFrame aggregations (fastText-niche jobs in a training-data pipeline:
language ID at corpus scale, spam/quality gating, source-domain routing).

Why NB and not MLlib here: training IS a groupBy — per-(label, token)
counts plus per-label totals — so it needs no iterative solver, no driver
state, and no model broadcast step that Catalyst can't see.  Scoring is a
token equi-join + per-(doc, label) sum.  Both halves shuffle on exactly
one key each and keep everything JVM-side; a 100 TB corpus trains in one
pass (the model is vocab x labels — megabytes).

Engine-exact scoring: log-weights are INTEGER micro-nats —
floor(1e6 * ln(p)) computed once per (label, token) — so per-doc scores
are bigint SUMS (associative, partitioning/cluster-size invariant), and
the argmax is deterministic with a (score desc, label asc) tie-break.
The only float op is the single ln per weight; Java's and C's ln agree
to <= 1 ulp, so a floor flip needs the fractional part of p*1e6 within
~1 ulp of an integer (~1e-9 per weight) — vanishingly unlikely and
detectable (the oracle would hash-mismatch loudly, not drift silently).

Model (add-one / Laplace smoothing, Manning et al. IIR ch. 13 textbook
form, re-derived):

    w(l, t)   = floor(scale * ln((count(l, t) + 1) / (total_l + V)))
    oov_w(l)  = floor(scale * ln(        1        / (total_l + V)))
    prior(l)  = floor(scale * ln(n_docs_l / n_docs))
    score(d, l) = prior(l) + sum_{t in d, t seen under l} w(l, t)
                + (n_tokens_d - n_seen_{d, l}) * oov_w(l)

Reference analog: YATSM's RF classification maps segments to classes
(plans/classify.py, K13) [U]; this is the text-side classifier the
webtext axis needs, with the same train-on-labels / score-everything
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yatsm_spark.functions.textops import tokens


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per TOKEN INSTANCE (multinomial NB counts repeats); null
    text coalesced to '' so every doc emits rows (lineage: no doc can
    silently skip scoring)."""
    return docs.select(
        F.col(id_col),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("token"),
    )


def nb_train(
    train: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """One-pass NB training.  Returns ``(weights, labels)``:
    weights = (label, token, w: bigint); labels = (label, prior: bigint,
    oov_w: bigint, total_tokens: bigint).

    Scale shape: ONE shuffle on (label, token) with map-side partial
    counts, one tiny agg per label, one global distinct-token count
    (V) — all algebraic.  The model is Heaps'-law small (vocab x labels)
    and broadcast-joins at scoring time.
    """
    tok = _doc_tokens(train, id_col, text_col)
    lab = train.select(F.col(id_col), F.col(label_col).alias("label"))
    tl = tok.join(lab, id_col)

    counts = tl.groupBy("label", "token").agg(F.count(F.lit(1)).alias("c"))
    # V and N stay 1-row DataFrames (broadcast cross joins), NOT driver
    # .count() scalars — the plan remains one lazy DAG with no eager jobs
    # (at production scale persist `counts` before materializing both
    # outputs; the lineage below otherwise recomputes it per output).
    vdf = counts.select(F.count_distinct("token").alias("vocab_n"))
    ndf = lab.select(F.count(F.lit(1)).alias("n_docs"))
    totals = counts.groupBy("label").agg(F.sum("c").alias("total_tokens"))
    doc_counts = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_docs_l"))

    def ilog(num, den):
        return F.floor(F.lit(scale) * F.log(num / den)).cast("long")

    weights = (
        counts.join(totals, "label")
        .crossJoin(F.broadcast(vdf))
        .select(
            "label",
            "token",
            ilog(
                (F.col("c") + 1).cast("double"),
                (F.col("total_tokens") + F.col("vocab_n")).cast("double"),
            ).alias("w"),
        )
    )
    labels = (
        doc_counts.join(totals, "label")
        .crossJoin(F.broadcast(vdf))
        .crossJoin(F.broadcast(ndf))
        .select(
            "label",
            ilog(
                F.col("n_docs_l").cast("double"), F.col("n_docs").cast("double")
            ).alias("prior"),
            ilog(
                F.lit(1.0), (F.col("total_tokens") + F.col("vocab_n")).cast("double")
            ).alias("oov_w"),
            "total_tokens",
        )
    )
    return weights, labels


def nb_predict(
    docs: DataFrame,
    weights: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every doc against every label; return the argmax row per doc:
    (doc_id, pred_label, score: bigint).  Ties break to the
    lexicographically smallest label — deterministic across engines.

    Scale shape: token instances equi-join the (broadcast-size) weights
    on (token), aggregate per (doc, label), then one cross join against
    the handful of label rows for OOV completion and ONE window per doc
    for the argmax.  The per-doc work never leaves its partition after
    the token join.
    """
    tok = _doc_tokens(docs, id_col, text_col)
    ntok = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    seen = (
        tok.join(F.broadcast(weights), "token")
        .groupBy(id_col, "label")
        .agg(F.sum("w").alias("sum_w"), F.count(F.lit(1)).alias("n_seen"))
    )
    scored = (
        ntok.crossJoin(F.broadcast(labels.select("label", "prior", "oov_w")))
        .join(seen, [id_col, "label"], "left")
        .select(
            F.col(id_col),
            "label",
            (
                F.col("prior")
                + F.coalesce(F.col("sum_w"), F.lit(0))
                + (F.col("n_tokens") - F.coalesce(F.col("n_seen"), F.lit(0)))
                * F.col("oov_w")
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("label").alias("pred_label"), "score")
    )
