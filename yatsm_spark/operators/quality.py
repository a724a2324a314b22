"""Corpus quality + decontamination operators over `documents` tables.

Training-data-pipeline operators (task brief first-class components):

  * :func:`repetition_stats` — Gopher-style repetition signals per doc
    (token counts, distinct-token fraction, top-token fraction, duplicate
    bigram fraction).  Repetitious docs (boilerplate, keyword stuffing,
    generation loops) are the canonical pre-training junk class; these
    four fractions are the standard filter features (cf. Rae et al. 2021,
    "Scaling Language Models" §A1.1; C4's heuristics in Raffel et al.
    2020).
  * :func:`decontaminate` — n-gram-overlap decontamination: flag training
    docs sharing any k-gram with a held-out benchmark corpus (the
    standard eval-leak guard, cf. GPT-3 appendix C methodology).

Scale notes (100 TB design):
  * repetition_stats: entirely map-side — every signal is a per-doc
    function of the token array (array_distinct set sizes, a linear
    aggregate() fold over the sorted array for top-token multiplicity),
    so the corpus never shuffles at all.  Array exprs here are safe
    because each is evaluated once per ROW; the O(n_tokens^2) trap is
    per-ELEMENT lambdas that re-inline the tokenizer (element_at chains
    — measured quadratic in dedup.shingle_array's docstring).
  * decontaminate: the benchmark side aggregates to DISTINCT k-grams
    first — at any realistic benchmark size (≤ millions of k-grams) that
    side broadcasts, so the flagging pass is a map-side broadcast
    left-semi probe of the training corpus: no shuffle of the big side.
    ``broadcast_threshold`` guards the fallback to a shuffled semi-join.

Fraction columns are emitted as integer ``*_x1e4`` (value * 10000,
round-half-up) — integer division is the only cross-engine-exact rounding
(Spark HALF_UP-on-decimal vs DuckDB float rounding diverge on exact .5
halves; see sliding_mean_24h pattern in __spark_entry__.py).

Reference analog: none — YATSM is numeric-only [U]; axis-A webtext ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yatsm_spark.operators.dedup import shingle_array, shingle_rows


def _x1e4(num, den) -> F.Column:
    """round-half-up(10000 * num / den) = (20000*num + den) div (2*den) —
    pure integer arithmetic.  Spark has no bigint-div Column op and BOTH
    plain routes are inexact: bigint ``/`` goes through double (numerator
    can exceed 2^53), and raw decimal(38,0) division rounds HALF_UP at
    scale 6 BEFORE floor (verified: 500/10000001-style inputs come out
    one too high for denominators > ~2e6).  Exact route: strip the
    remainder with pmod first, so the decimal division is exactly
    divisible and its scale-6 result is an exact integer.

    ALL arithmetic here is decimal(38,0): the 20000*num step in bigint
    silently wraps past 2^63 in non-ANSI Spark (num up to ~4.6e14 was
    the ceiling), which matters once callers feed PRODUCTS as num/den
    (terms.py's tf*N and n_tokens*N).  decimal(38,0) holds ~1e38 —
    callers must themselves form such products in decimal (see
    terms.py), after which this is exact up to num,den ~ 5e33."""
    dnum = num.cast("decimal(38,0)")
    dden = den.cast("decimal(38,0)")
    n = F.lit(20000).cast("decimal(38,0)") * dnum + dden
    d = F.lit(2).cast("decimal(38,0)") * dden
    exact = n - F.pmod(n, d)
    return (exact / d).cast("bigint")


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition signals: (id, n_tokens, distinct_frac_x1e4,
    top_token_frac_x1e4, dup_bigram_frac_x1e4).

    dup_bigram_frac = 1 - distinct_bigrams/total_bigrams (0 when a doc
    has < 2 tokens).  Docs with empty OR NULL text still emit a row
    (null coalesces to '', and split('') yields one empty token in both
    engines) — so a quality gate built as an anti-join on the flagged
    set cannot be bypassed by a null-text doc.
    """
    # Entirely MAP-SIDE: every signal is a per-doc function of the token
    # array, so nothing shuffles at all (the former two-level (id, token)
    # / (id, bigram) aggregates shuffled ~2 rows per corpus token — at
    # design scale that is two corpus-sized exchanges for four per-row
    # numbers).  Value-identical: same counts, same _x1e4 algebra —
    # pinned by the hand-value tests and the docs_repetition oracle.
    #   n_distinct     size(array_distinct(toks))    (hash-set, O(T)/row)
    #   top_c          max equal-run length over the SORTED token array,
    #                  one linear aggregate() fold
    #   bigram stats   shingle_array(k=2): n_bi = T-1, distinct via set
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(txt, " ")
    srt = F.array_sort(toks)
    top_c = F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
                    F.lit(1).cast("bigint")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    bigrams = shingle_array(txt, 2)
    # two projections: the raw counts land in named columns FIRST, and the
    # _x1e4 algebra references those columns.  Inlining _x1e4 over the
    # array exprs duplicates each (the fold ~4x) into one giant generated
    # class — measured ~4 s of one-time Janino compilation and repeated
    # per-row fold evaluation; split, the same query compiles and runs in
    # ~0.5 s
    counts = docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("_nd"),
        top_c.alias("_top"),
        F.size(bigrams).cast("bigint").alias("_nbi"),
        F.size(F.array_distinct(bigrams)).cast("bigint").alias("_nbd"),
    )
    return counts.select(
        F.col(id_col),
        F.col("n_tokens"),
        _x1e4(F.col("_nd"), F.col("n_tokens")).alias("distinct_frac_x1e4"),
        _x1e4(F.col("_top"), F.col("n_tokens")).alias("top_token_frac_x1e4"),
        F.when(F.col("_nbi") > 0, _x1e4(F.col("_nbi") - F.col("_nbd"), F.col("_nbi")))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("dup_bigram_frac_x1e4"),
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int | None = 10_000_000,
) -> DataFrame:
    """Training docs sharing >= 1 word k-gram with the benchmark corpus:
    (id, n_hits) with n_hits = count of DISTINCT contaminated k-grams.

    Long k (default 8) keeps topical overlap out and catches verbatim
    leakage — the standard eval-decontamination setting.  The benchmark
    k-gram set is distinct-aggregated, counted (one small aggregate job),
    and broadcast-hinted only when its row count is actually under
    ``broadcast_threshold``; larger sets fall back to a shuffled semi-
    join (None = skip the count and let AQE decide).

    Precondition: ``id_col`` unique per row in ``train`` (see
    shingle_rows — duplicated doc-id rows would double n_hits since
    per-row array_distinct cannot see across rows).
    """
    bench_kg = shingle_rows(benchmark, k, id_col, text_col).select("s").distinct()
    if broadcast_threshold is not None and bench_kg.count() <= broadcast_threshold:
        bench_kg = F.broadcast(bench_kg)
    train_kg = shingle_rows(train, k, id_col, text_col)
    return (
        train_kg.join(bench_kg, "s", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
        .select(F.col("id").alias(id_col), "n_hits")
    )


def domain_cap(
    df: DataFrame,
    score_col: str,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    two_phase: bool = True,
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, ranked by ``score_col`` DESC
    (ties broken by ``id_col`` ASC) — the per-host/per-domain quota every
    crawl pipeline applies so one giant site cannot dominate the corpus.

    Scale path (``two_phase=True``, default): a single window over
    ``domain_col`` sorts each domain on one reducer, so one hot domain
    (millions of pages on a link farm) becomes a straggler.  Phase 1
    instead windows over (domain, spark_partition_id): the hot domain is
    split across reducers and each fragment keeps its local top-``cap``
    — any row in the global top-``cap`` is necessarily in its fragment's
    top-``cap``, so this drops no candidate.  Phase 2 runs the exact
    window on the reduced set (<= cap * fragments rows per domain).
    Result is bit-identical to the one-window form (pinned by test) and
    independent of the physical partitioning.
    """
    order = [F.col(score_col).desc(), F.col(id_col)]
    if two_phase:
        w1 = Window.partitionBy(domain_col, "_pid").orderBy(*order)
        df = (
            df.withColumn("_pid", F.spark_partition_id())
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= cap)
            .drop("_pid", "_rn")
        )
    w = Window.partitionBy(domain_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def pack_token_budget(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    budget: int,
    id_col: str = "doc_id",
    boundary_partitions: int = 64,
    metrics: dict | None = None,
) -> DataFrame:
    """Greedy corpus packing: walk rows in (``score_col`` DESC,
    ``id_col`` ASC) order and keep the maximal prefix whose cumulative
    ``weight_col`` stays <= ``budget`` — "fill a token budget with the
    best documents first", the selection step between quality scoring
    and tokenization in a pre-training data pipeline.

    A row is kept iff its inclusive running total <= budget (the first
    overflowing row and everything after it are dropped).

    Scale path: the naive form is a running sum over a GLOBAL order —
    one reducer sorts the corpus.  Instead: (1) aggregate per-score
    weight totals (``score_col`` must be discretized — the x1e4 integer
    quality fractions have <= 10001 values, so this histogram is tiny);
    (2) walk the histogram on the driver to find the threshold score s*
    = the highest score whose full class no longer fits; (3) keep every
    row with score > s* with NO sort at all, and run the running sum
    only over the s* boundary class (ordered by ``id_col``).

    The boundary running sum is itself DISTRIBUTED (never the former
    single-reducer ``Window.orderBy``): the class is range-partitioned
    on ``id_col`` into ``boundary_partitions`` chunks, per-chunk weight
    totals (one bounded collect — <= boundary_partitions rows) become
    broadcast prefix offsets, and each chunk computes its local running
    sum + offset.  Range partitioning preserves the global id order
    across chunks, so the kept prefix is bit-identical to the global
    window — even in the degenerate where a constant score puts the
    WHOLE corpus in the boundary class, the sort is now
    corpus/boundary_partitions per reducer instead of the corpus on
    one.  ``metrics`` (optional dict) records ``pack_boundary_rows``
    for lineage.  Both weights and the budget are integer-exact, so
    the kept set is engine- and cluster-size-independent.
    """
    hist = (
        df.groupBy(score_col)
        .agg(F.sum(F.col(weight_col).cast("bigint")).alias("w"))
        .collect()  # bounded: one row per distinct (discretized) score
    )
    hist.sort(key=lambda r: r[score_col], reverse=True)
    running = 0
    cut = None  # score of the boundary class
    remaining = budget
    for r in hist:
        if running + r["w"] > budget:
            cut = r[score_col]
            remaining = budget - running
            break
        running += r["w"]
    if cut is None:  # everything fits
        return df
    full = df.filter(F.col(score_col) > cut)

    # distributed exact prefix sum over the boundary class.  _pid must be
    # IDENTICAL in the totals job and the result job, but range
    # boundaries come from sampling that re-runs (with fresh RDD-id
    # seeds) on every plan re-execution — so the chunked frame is
    # localCheckpoint-frozen first (fails loud on block loss rather
    # than silently re-chunking; release via graph.release_components
    # once the packed output is materialized)
    from yatsm_spark.operators.graph import _checkpoint

    b = _checkpoint(
        df.filter(F.col(score_col) == cut)
        .repartitionByRange(boundary_partitions, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    totals = sorted(
        b.groupBy("_pid")
        .agg(
            F.sum(F.col(weight_col).cast("bigint")).alias("w"),
            F.count("*").alias("n"),
        )
        .collect(),  # bounded: <= boundary_partitions rows
        key=lambda r: r["_pid"],
    )
    if metrics is not None:
        metrics["pack_boundary_rows"] = int(sum(r["n"] for r in totals))
    off, offsets = 0, {}
    for r in totals:
        offsets[r["_pid"]] = off
        off += r["w"]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
            "_pid int, _off long",
        )
    )
    wb = (
        Window.partitionBy("_pid")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary = (
        b.join(off_df, "_pid", "left")
        .withColumn(
            "_cum",
            F.sum(F.col(weight_col).cast("bigint")).over(wb)
            + F.coalesce("_off", F.lit(0)),
        )
        .filter(F.col("_cum") <= remaining)
        .drop("_cum", "_off", "_pid")
    )
    out = full.unionByName(boundary)
    # carry the checkpoint handle so graph.release_components(out) frees
    # the frozen boundary chunks once the packed corpus is materialized
    out._yatsm_ckpt_ids = getattr(b, "_yatsm_ckpt_ids", set())  # type: ignore[attr-defined]
    return out


def keep_top_fraction(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    by: list[str] | None = None,
    keep_num: int = 1,
    keep_den: int = 4,
) -> DataFrame:
    """Keep the top ``keep_num/keep_den`` of rows per ``by`` group ranked
    by ``score_col`` DESC (ties broken by ``id_col`` for determinism).

    The grouped-percentile corpus filter ("top quartile by quality per
    language") in pure integer arithmetic: a row survives iff
    ``rank * keep_den <= n * keep_num`` — no float percent_rank, so the
    kept set is bit-identical across engines and cluster sizes.  Groups
    smaller than ``keep_den/keep_num`` keep nothing (exact semantics).

    One window shuffle on ``by``; both window functions share the frame.
    At skew (one giant lang) the sort is the cost — pre-aggregate or
    sample ranks if a single group outgrows a partition.
    """
    by = by or []
    w = Window.partitionBy(*by).orderBy(F.col(score_col).desc(), F.col(id_col))
    wn = Window.partitionBy(*by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .filter(F.col("_rn") * keep_den <= F.col("_n") * keep_num)
        .drop("_rn", "_n")
    )
