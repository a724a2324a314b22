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
  * :func:`tfidf_cosine_pairs` — all-pairs weighted bag-of-words cosine
    via the posting-list (inverted-index) similarity join, df-capped.
  * :func:`collocations` — top-k bigram collocations by integer-exact
    PMI ratio (corpus phrase mining).

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
    """(id, t, tf) — per-document term counts (whitespace tokens),
    computed ARRAY-LOCALLY via :func:`_term_tf_array`: zero shuffle
    (the former explode -> groupBy(id, t) was a corpus-sized exchange
    that map-side combine could not shrink — terms are near-unique)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(_term_tf_array(F.col(text_col), 1, "fast")).alias("s"),
    ).select("id", F.col("s.t").alias("t"), F.col("s.tf").alias("tf"))


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
    if broadcast_threshold is not None and vocab.count() <= broadcast_threshold:
        vocab = F.broadcast(vocab)
    # N rides the plan as a broadcast 1-row frame (BNLJ, 1-row build
    # side) — no separate docs.count() driver action / extra full scan
    nframe = docs.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_nd")
    )
    # tf*N formed in decimal(38,0): in bigint it silently wraps past 2^63
    # in non-ANSI Spark once tf*N > ~9.2e18 — reachable at the documented
    # 100 TB design scale (N ~ 1e12 docs)
    scored = (
        tc.join(vocab, "t")
        .crossJoin(F.broadcast(nframe))
        .withColumn(
            "tfidf_x1e4",
            _x1e4(
                F.col("tf").cast("decimal(38,0)") * F.col("_nd"),
                F.col("df"),
            ),
        )
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
    if broadcast_threshold is not None and vocab.count() <= broadcast_threshold:
        vocab = F.broadcast(vocab)
    # N as a broadcast 1-row frame — no docs.count() driver action
    nframe = docs.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_nd")
    )
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
        .crossJoin(F.broadcast(nframe))
        .select(
            F.col("id").alias(id_col),
            F.col("n_tokens"),
            _x1e4(
                F.col("sum_df"),
                F.col("n_tokens").cast("decimal(38,0)") * F.col("_nd"),
            ).alias("mean_df_x1e4"),
        )
    )


def _term_tf_array(
    text_col: F.Column, ngram: int, hash_fn: str
) -> F.Column:
    """Per-document term counts as ``array<struct<t,tf>>`` — computed
    ARRAY-LOCALLY, zero shuffle.  A document's terms all live in one
    row, so per-doc tf is a doc-local computation: sort the term array,
    run-length encode (run starts via an index filter, run lengths via
    next-start arithmetic).  This replaces the former
    ``groupBy(id, term).count()`` — a corpus-sized exchange that
    map-side combine could not shrink (measured 25.2M distinct terms in
    34.6M postings at 120k docs: terms are near-unique, so the partial
    agg passed ~everything through).

    Every array reference inside a lambda is BOUND as a lambda variable
    first (the transform-of-singleton-array trick, see
    ``shingle_hash_array``): HOFs are interpreted without CSE, so a raw
    expression reference would re-sort the array once per element.

    ``ngram`` = 1 tokenizes on single spaces exactly like
    :func:`_doc_terms` (empty text yields the one empty-string token;
    null text yields null -> explode drops the doc); ``ngram`` > 1 uses
    hashed word n-grams (:func:`shingle_hash_array`, string-free).
    """
    if ngram > 1:
        from yatsm_spark.operators.dedup import shingle_hash_array

        terms = shingle_hash_array(text_col, ngram, hash_fn)
        t_type = "array<struct<t:bigint,tf:long>>"
    else:
        terms = F.split(text_col, " ")
        t_type = "array<struct<t:string,tf:long>>"

    def build(s: F.Column) -> F.Column:
        n = F.size(s)
        starts = F.filter(
            F.sequence(F.lit(1), n),
            lambda pos: F.when(pos == 1, F.lit(True)).otherwise(
                F.element_at(s, pos) != F.element_at(s, pos - 1)
            ),
        )

        def emit(st: F.Column) -> F.Column:
            return F.transform(
                st,
                lambda pos, j: F.struct(
                    F.element_at(s, pos).alias("t"),
                    (F.coalesce(F.try_element_at(st, j + 2), n + 1) - pos)
                    .cast("long")
                    .alias("tf"),
                ),
            )

        pairs = F.element_at(F.transform(F.array(starts), emit), 1)
        return F.when(n <= 0, F.expr("array()").cast(t_type)).otherwise(pairs)

    return F.element_at(F.transform(F.array(F.array_sort(terms)), build), 1)


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: tuple[int, int] = (1, 2),
    max_df: int = 1000,
    broadcast_threshold: int | None = None,
    ngram: int = 1,
    hash_fn: str = "fast",
) -> DataFrame:
    """All-pairs sparse TF-IDF cosine similarity above ``threshold`` —
    the posting-list (inverted-index) similarity join (Bayardo et al.
    WWW 2007 "Scaling up all pairs similarity search"): documents meet
    ONLY through terms they share, never through an O(N^2) cross join.
    Complements the other near-dup families (MinHash = set overlap,
    SimHash = bitwise, embeddings = dense semantic): weighted
    bag-of-words cosine is the classic IR notion of "about the same
    thing in the same words".

    Integer-exact across engines: idf is QUANTIZED log2 rarity —
    idf_q = bitlen(N) - bitlen(df) (how many times df doubles below N),
    computed via base-2 string length (pure string op, no float log) —
    and weight w = tf * (1 + idf_q).  The threshold p/q keeps pairs
    with  q^2 * dot^2 >= p^2 * |a|^2 * |b|^2  (dot >= 0 always — weights
    are nonnegative), cross-multiplied in decimal(38,0); the reported
    similarity is sim_sq_x1e8 = floor(1e8 * dot^2 / (|a|^2 |b|^2)) —
    squared cosine, since an exact integer sqrt is not worth buying.
    Bounds: w <= tf * 64; with ~1e3-term docs dot <= ~4e12 and
    dot^2 * 1e8 <= ~1.6e33, inside decimal(38,0) / DuckDB HUGEINT.

    ``max_df`` is the quadratic-bomb guard (the LSH star-guard's twin):
    a stopword's posting list is corpus-sized and its self-join is
    |corpus|^2 — so terms with df > max_df are dropped from BOTH the
    pairs and the norms (cosine over the informative dimensions only;
    the standard df-cap every inverted-index join applies).  Pairs per
    surviving term are <= max_df^2 by construction.

    Scale notes (100 TB design):
      * Per-doc tf is computed ARRAY-LOCALLY (:func:`_term_tf_array`,
        zero shuffle) — a document's terms live in one row, so its
        term counts never needed a cluster-wide aggregate.
      * One slim vocab aggregate (term -> df; 8-byte hashed keys for
        ngram > 1), broadcast under ``broadcast_threshold`` (Heaps'
        law, see module docstring).  The df <= max_df guard filters
        BEFORE the posting-list collect, so no collected list can
        exceed max_df entries — the stopword memory bomb is pruned a
        stage early, not after materialization.
      * The posting set is exchanged twice: groupBy(id) builds each
        doc's sorted vector + prefix cutoff (full (t, w) payload),
        groupBy(term) builds the posting lists — IDS ONLY, 8 bytes per
        entry, weights never ride the term exchange.
      * Candidate pairs are generated MAP-SIDE from each bounded list,
        prefix-filtered (see below) — the r4 fused form's ~C(df, 2)
        structs per term collapse to |prefix| x (|list| - 1) at most,
        and the former (id_a, id_b) dot AGGREGATE (138M groups at 480k
        docs, the measured weak-scaling killer: 0.31 N->4N) is
        replaced by a distinct over the filtered candidates plus an
        O(output) verify join.

    ``ngram`` > 1 switches the term dimension from unigrams to word
    n-grams — the right setting for small-vocabulary corpora where
    every unigram is effectively a stopword (same reasoning as
    docs_dup_spans/docs_decontam's k=4): n-gram vocabularies grow
    combinatorially, so posting lists stay sparse and the cosine
    measures SHARED PHRASING, not shared alphabet.  N-gram terms are
    HASHED, never materialized as strings (``shingle_hash_array``):
    the weight/cosine algebra needs term IDENTITY only, and an 8-byte
    key cuts both aggregates' and the posting join's shuffle bytes ~4x
    vs ~30-byte gram strings (the same string-free rewrite that fixed
    the MinHash path).  ``hash_fn`` follows the module's two-tier rule:
    "fast" (xxhash64 — production) / "portable" (md5 — DuckDB-oracle
    reproducible); pair-set semantics are hash-agnostic up to ~1/2^31
    collisions and pinned equal across tiers by test.

    PREFIX FILTERING (the Bayardo WWW'07 §3 contribution, L2-norm form
    per Anastasiu & Karypis L2AP 2014): sort each doc's surviving terms
    by weight DESC (term ASC ties), and call the minimal head whose
    leftover-suffix L2 mass falls below the threshold the doc's
    "prefix": k = min k with  tail(k) * q^2 < p^2 * n2  where
    tail(k) = sum of w^2 strictly after position k.  LOSSLESS by
    Cauchy-Schwarz: if x and y share NO term in x's prefix, every
    shared term lies in x's suffix, so
      cos(x,y) <= ||suffix(x)||/||x|| = sqrt(tail(k)/n2) < p/q.
    Hence every qualifying pair co-occurs in some posting list at a
    position where AT LEAST ONE side is prefix — so pair candidates
    are generated only as prefix x prefix and prefix x suffix, never
    suffix x suffix.  All bound arithmetic is INTEGER-EXACT
    (tail*q^2 >= p^2*n2 in decimal(38,0)) — no float rounding can make
    the filter lossy at the boundary.  Because skipped suffix-suffix
    co-occurrences no longer contribute partial dots, the dot product
    moves to a VERIFY stage: distinct candidate pairs join back their
    full (term, w) vectors and the dot is computed array-locally
    (map probe over the shorter side's entries), same decimal algebra,
    so the output is bit-identical to the exhaustive form.  Measured at
    sf0.1 (120k docs): candidate structs 17.46M -> 0.57M (30x) and the
    138M-group pair aggregate disappears entirely.

    Returns (id_a, id_b, dot, sim_sq_x1e8), id_a < id_b.

    Precondition: ``id_col`` must be unique per row (standard for
    doc_id).  Duplicate-id rows would merge into one term vector at the
    groupBy(id) stage and inflate df; the id_a != id_b candidate filter
    additionally guarantees no self-pair can ever be emitted.
    """
    from yatsm_spark.operators.graph import materialize_once

    p, q = threshold
    tc = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_term_tf_array(F.col(text_col), ngram, hash_fn)).alias("s"),
    ).select("id", F.col("s.t").alias("t"), F.col("s.tf").alias("tf"))
    # tc has TWO consumers (the vocab df aggregate and the posts join)
    # and no Exchange of its own to reuse — without materialization the
    # tokenize+hash explode executes twice end to end (measured 221 s of
    # a 439 s wall at 480k docs / 32 cores, i.e. the single most
    # expensive stage in the plan, paid double).  Slim frame: 24 B/row.
    tc = materialize_once(tc)
    vocab = tc.groupBy("t").agg(F.count("*").alias("df"))
    # None (default) = let AQE pick the join side from RUNTIME shuffle
    # stats — no planning-time vocab.count() job, which costs a full
    # explode+agg pass over the posting set (measured 47 s at 480k docs)
    if broadcast_threshold is not None and vocab.count() <= broadcast_threshold:
        vocab = F.broadcast(vocab)
    # N rides the plan as a broadcast 1-row frame (BNLJ, 1-row build
    # side): no separate docs.count() driver action / extra full scan.
    nframe = docs.agg(F.count(F.lit(1)).alias("nd"))
    bitlen = lambda c: F.length(F.conv(c.cast("string"), 10, 2))  # noqa: E731
    idf_q = bitlen(F.greatest(F.col("nd"), F.lit(1))) - bitlen(F.col("df"))
    posts = (
        tc.join(vocab, "t")
        .filter(F.col("df") <= max_df)
        .crossJoin(F.broadcast(nframe))
        .select(
            "id",
            "t",
            (F.col("tf") * (F.lit(1) + idf_q)).cast("long").alias("w"),
        )
    )
    dec = "decimal(38,0)"
    pp2 = F.lit(p * p).cast(dec)
    qq2 = F.lit(q * q).cast(dec)
    # Per-doc vector, weight-DESC sorted, with its norm^2 and integer-
    # exact prefix length k (one O(m) aggregate pass per doc, all
    # array-local — the collect_list exchange is the one shuffle the
    # posting set pays before candidate generation).  The sort rides a
    # STRUCT KEY through default array_sort (codegen binary ordering on
    # (-w, t)) — a comparator lambda would run one interpreted when-
    # chain per comparison, measured ~4x the whole stage.  n2/cum stay
    # in LONG (interpreted decimal adds are ~5x costlier per element);
    # w^2 <= 9.2e18 requires |w| < 3e9 — tf*(1+idf_q) <= 64*doc_len,
    # satisfied by any real document, and ANSI mode faults loudly (not
    # silently wrong) if a pathological row ever exceeds it.
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
            "id",
            "tw",
            F.aggregate(
                F.col("tw"),
                F.lit(0).cast("long"),
                lambda a, e: a + e["w"] * e["w"],
            ).alias("n2"),
        )
        .select(
            "id",
            "tw",
            "n2",
            F.aggregate(
                F.col("tw"),
                F.struct(
                    F.lit(0).cast("long").alias("cum"), F.lit(0).alias("k")
                ),
                lambda a, e: F.struct(
                    (a["cum"] + e["w"] * e["w"]).alias("cum"),
                    # position in prefix iff the mass strictly before it
                    # still leaves tail*q^2 >= p^2*n2 (decimal compare:
                    # n2*q^2 may exceed long)
                    F.when(
                        (F.col("n2") - a["cum"]).cast(dec) * qq2
                        >= pp2 * F.col("n2").cast(dec),
                        a["k"] + 1,
                    )
                    .otherwise(a["k"])
                    .alias("k"),
                ),
                lambda a: a["k"],
            ).alias("k"),
        )
    )
    # vecs has THREE consumers (flag rows, verify a-side, verify b-side)
    # whose differing column pruning defeats ReuseExchange — without an
    # eager materialization the ENTIRE posting lineage (explode + hash +
    # vocab join + collect_list exchange) executes three times (verified
    # in the formatted plan: zero ReusedExchange nodes).  Same pattern
    # and rationale as minhash_lsh_pairs' banded frame.
    vecs = materialize_once(vecs)
    # posting lists carry IDS ONLY (8 bytes/entry — weights stay behind
    # for the verify join), split prefix/suffix per term
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
    )

    def cand_array(pl: F.Column, sl: F.Column) -> F.Column:
        def pair(a: F.Column, b: F.Column) -> F.Column:
            return F.struct(
                F.least(a, b).alias("id_a"), F.greatest(a, b).alias("id_b")
            )

        # prefix x later-prefix (slice clamps past the end -> empty
        # inner arrays, no sequence(1,0) descending-range trap)
        pp = F.flatten(
            F.transform(
                pl,
                lambda a, i: F.transform(
                    F.slice(pl, i + 2, F.size(pl)), lambda b: pair(a, b)
                ),
            )
        )
        # prefix x suffix — suffix x suffix is provably below threshold
        ps = F.flatten(
            F.transform(pl, lambda a: F.transform(sl, lambda b: pair(a, b)))
        )
        return F.concat(pp, ps)

    cand = (
        lists.select(F.explode(cand_array(F.col("pl"), F.col("sl"))).alias("c"))
        .select("c.*")
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    # verify: exact integer dot over the full vectors (map probe on the
    # b side, linear scan of the a side), then the exact threshold
    # test.  The probe map is BOUND as a lambda variable first (the
    # transform-of-singleton-array trick): CollapseProject would
    # otherwise inline map_from_entries into the aggregate lambda and
    # interpreted HOFs rebuild it PER ELEMENT — measured 16.5s -> ~1s
    # on 830k candidate pairs at sf0.1.
    va = vecs.select(
        F.col("id").alias("id_a"),
        F.col("tw").alias("twa"),
        F.col("n2").alias("n2a"),
    )
    vb = vecs.select(
        F.col("id").alias("id_b"),
        F.col("tw").alias("twb"),
        F.col("n2").alias("n2b"),
    )
    dot = F.element_at(
        F.transform(
            F.array(F.map_from_entries(F.col("twb"))),
            lambda mb: F.aggregate(
                F.col("twa"),
                F.lit(0).cast("long"),
                lambda a, e: a
                + e["w"]
                * F.coalesce(
                    F.try_element_at(mb, e["t"]), F.lit(0).cast("long")
                ),
            ),
        ),
        1,
    )
    scored = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", "n2a", "n2b", dot.alias("dot"))
    )
    dd = F.col("dot").cast(dec) * F.col("dot").cast(dec)
    keep = qq2 * dd >= pp2 * F.col("n2a").cast(dec) * F.col("n2b").cast(dec)
    num = F.lit(100_000_000).cast(dec) * dd
    den = F.col("n2a").cast(dec) * F.col("n2b").cast(dec)
    exact = num - F.pmod(num, den)
    out = scored.filter(keep).select(
        "id_a",
        "id_b",
        F.col("dot").alias("dot"),
        (exact / den).cast("bigint").alias("sim_sq_x1e8"),
    )
    # carry the vecs checkpoint handle so release_components() frees the
    # blocks once the pairs are consumed (same contract as minhash)
    out._yatsm_ckpt_ids = getattr(vecs, "_yatsm_ckpt_ids", set())  # type: ignore[attr-defined]
    return out


def collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    topk: int = 100,
    broadcast_threshold: int | None = 10_000_000,
) -> DataFrame:
    """Top-``topk`` bigram collocations by pointwise mutual information —
    the corpus-exploration classic (Church & Hanks 1990 "Word
    association norms"): phrases whose words co-occur far more than
    their unigram frequencies predict ("new york", "click here") rank
    first; frequent-but-independent pairs rank last.

    Integer-exact PMI proxy: exp(PMI) = p(xy) / (p(x) p(y))
    = (c_xy / B) / ((c_x / T)(c_y / T)) = c_xy * T^2 / (B * c_x * c_y)
    with T = corpus token occurrences, B = corpus bigram occurrences
    (multiset counts) — reported as pmi_ratio_x1e4, the pmod-exact
    floor of 1e4 * that ratio in decimal(38,0).  The ratio is a
    MONOTONE transform of PMI (log is monotone), so ranking by it IS
    ranking by PMI, with none of log's cross-engine float rounding.
    Bounds: c_xy * T^2 * 1e4 must stay under ~1e38 — at the 100 TB
    design scale (T ~ 1e13) that caps c_xy at ~1e8, which
    ``min_count``-style collocations satisfy by definition (a bigram
    approaching 1e8 occurrences is a stopword pair, not a collocation;
    it still ranks LOW, it just saturates the x1e4 readout).

    ``min_count`` prunes the hapax tail BEFORE the join (rare-pair PMI
    is famously unstable — one co-occurrence of two hapaxes scores the
    theoretical max) and bounds the topk sort input.

    Scale notes: two map-side-combined aggregates over exploded tokens /
    shingles (the counts), one broadcast-or-shuffled join of bigrams
    against the unigram vocab on each side, one global top-k (ORDER BY
    LIMIT — Spark's TakeOrderedAndProject, a per-partition heap + one
    k-row collect, never a full sort).  T, B ride the plan as one
    broadcast 1-row aggregate (BNLJ, 1-row build side) — no driver
    actions.

    Returns (bigram, c_xy, c_x, c_y, pmi_ratio_x1e4), ranked by
    (pmi_ratio_x1e4 DESC, bigram ASC) — deterministic ties.
    """
    from yatsm_spark.operators.dedup import shingle_array

    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("t")
    )
    uni = toks.groupBy("t").agg(F.count("*").alias("c"))
    big = (
        docs.select(F.explode(shingle_array(F.col(text_col), 2)).alias("xy"))
        .groupBy("xy")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    # T and B ride the plan as ONE broadcast 1-row aggregate — no
    # separate count()/first() driver actions (each was a full scan)
    dec = "decimal(38,0)"
    sz = F.size(F.coalesce(F.split(F.col(text_col), " "), F.array()))
    nframe = docs.agg(
        F.sum(sz).cast(dec).alias("_tt"),
        F.sum(F.greatest(sz - 1, F.lit(0))).cast(dec).alias("_bt"),
    )
    if broadcast_threshold is not None and uni.count() <= broadcast_threshold:
        uni = F.broadcast(uni)
    x = uni.select(F.col("t").alias("_x"), F.col("c").alias("c_x"))
    y = uni.select(F.col("t").alias("_y"), F.col("c").alias("c_y"))
    num = (
        F.col("c_xy").cast(dec)
        * F.col("_tt")
        * F.col("_tt")
        * F.lit(10_000).cast(dec)
    )
    den = (
        F.col("_bt")
        * F.col("c_x").cast(dec)
        * F.col("c_y").cast(dec)
    )
    exact = num - F.pmod(num, den)
    return (
        big.withColumn("_x", F.substring_index("xy", " ", 1))
        .withColumn("_y", F.expr("substring(xy, instr(xy, ' ') + 1)"))
        .join(x, "_x")
        .join(y, "_y")
        .crossJoin(F.broadcast(nframe))
        .select(
            F.col("xy").alias("bigram"),
            "c_xy",
            "c_x",
            "c_y",
            (exact / den).cast("bigint").alias("pmi_ratio_x1e4"),
        )
        .orderBy(F.col("pmi_ratio_x1e4").desc(), F.col("bigram"))
        .limit(topk)
    )
