"""Bigram LM scorer (operators/lm.py): hand-derived weights/scores on a
tiny corpus.  Cross-engine parity is the `docs_lm_score` driver query."""

from __future__ import annotations

import math

from yatsm_spark.operators.lm import lm_quality_filter, lm_score, lm_train

SCALE = 1_000_000


def _ilog(num: float, den: float) -> int:
    return math.floor(SCALE * math.log(num / den))


def test_lm_hand_derived_weights_and_scores(spark):
    """Train on 'x y x z': c1 = {x:2, y:1, z:1}, V=3; bigrams (x,y),(y,x),
    (x,z) each once.  Every weight and score recomputed by hand."""
    train = spark.createDataFrame([(0, "x y x z")], "doc_id long, text string")
    weights, prev_stats = lm_train(train)

    w = {(r["prev"], r["cur"]): r["w"] for r in weights.collect()}
    assert w == {
        ("x", "y"): _ilog(2, 5),  # (1+1)/(2+3)
        ("y", "x"): _ilog(2, 4),  # (1+1)/(1+3)
        ("x", "z"): _ilog(2, 5),
    }
    ps = {r["prev"]: r for r in prev_stats.collect()}
    assert ps["x"]["oov_w"] == _ilog(1, 5)
    assert ps["y"]["oov_w"] == _ilog(1, 4)
    assert all(r["vocab_n"] == 3 for r in ps.values())

    test = spark.createDataFrame(
        [(10, "x y q"), (11, "q q"), (12, "x"), (13, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_score(test, weights, prev_stats).collect()}
    assert len(out) == 4  # every doc emits a row, null text included
    # (x,y) seen; (y,q) unseen bigram, seen context y
    assert out[10]["n_bigrams"] == 2
    assert out[10]["sum_w"] == _ilog(2, 5) + _ilog(1, 4)
    # (q,q): unseen context -> unseen_w = ilog(1, V)
    assert out[11]["n_bigrams"] == 1 and out[11]["sum_w"] == _ilog(1, 3)
    assert out[12]["n_bigrams"] == 0 and out[12]["sum_w"] == 0
    assert out[13]["n_bigrams"] == 0 and out[13]["sum_w"] == 0


def test_lm_quality_filter_exact_cutoff(spark):
    """Cross-multiplied gate: threshold exactly at doc 10's mean keeps it
    (<=), one micro-nat lower drops it; 0-bigram docs always pass."""
    train = spark.createDataFrame([(0, "x y x z")], "doc_id long, text string")
    weights, prev_stats = lm_train(train)
    test = spark.createDataFrame(
        [(10, "x y q"), (12, "x")], "doc_id long, text string"
    )
    scored = lm_score(test, weights, prev_stats)
    sum_w = _ilog(2, 5) + _ilog(1, 4)  # negative; n_bigrams = 2
    at = math.ceil(-sum_w / 2)
    kept = {r["doc_id"] for r in lm_quality_filter(scored, at).collect()}
    assert kept == {10, 12}
    kept_tight = {
        r["doc_id"]
        for r in lm_quality_filter(scored, (-sum_w - 1) // 2).collect()
    }
    assert kept_tight == {12}
