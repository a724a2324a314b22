"""Naive Bayes text classifier (operators/textclass.py): hand-derived
weights/scores on a tiny corpus plus separable-class sanity.  Cross-engine
parity is the `docs_nb_lang` driver query."""

from __future__ import annotations

import math

from yatsm_spark.operators.textclass import nb_predict, nb_train

SCALE = 1_000_000


def _ilog(num: float, den: float) -> int:
    return math.floor(SCALE * math.log(num / den))


def test_nb_hand_derived_weights_and_scores(spark):
    """Textbook add-one NB on a 3-doc corpus, every number recomputed by
    hand: V=3 tokens {x,y,z}; A has 3 token instances, B has 2."""
    train = spark.createDataFrame(
        [(0, "A", "x x y"), (1, "B", "z z")], "doc_id long, label string, text string"
    )
    weights, labels = nb_train(train, label_col="label")
    w = {(r["label"], r["token"]): r["w"] for r in weights.collect()}
    assert w[("A", "x")] == _ilog(3, 6)  # (2+1)/(3+3)
    assert w[("A", "y")] == _ilog(2, 6)
    assert w[("B", "z")] == _ilog(3, 5)  # (2+1)/(2+3)
    lab = {r["label"]: r for r in labels.collect()}
    assert lab["A"]["prior"] == _ilog(1, 2) and lab["B"]["prior"] == _ilog(1, 2)
    assert lab["A"]["oov_w"] == _ilog(1, 6) and lab["B"]["oov_w"] == _ilog(1, 5)

    test = spark.createDataFrame([(10, "x z")], "doc_id long, text string")
    out = nb_predict(test, weights, labels).collect()
    assert len(out) == 1
    # score_A = prior + w(A,x) + 1 OOV ('z' unseen under A)
    score_a = _ilog(1, 2) + _ilog(3, 6) + _ilog(1, 6)
    score_b = _ilog(1, 2) + _ilog(3, 5) + _ilog(1, 5)
    assert score_b > score_a  # ln(3/25) beats ln(3/36)
    assert out[0]["pred_label"] == "B" and out[0]["score"] == score_b


def test_nb_separable_classes_and_null_text(spark):
    train = spark.createDataFrame(
        [
            (0, "pets", "cat dog cat bird"),
            (1, "pets", "dog dog cat"),
            (2, "data", "spark sql shuffle join"),
            (3, "data", "sql spark agg"),
        ],
        "doc_id long, label string, text string",
    )
    weights, labels = nb_train(train, label_col="label")
    test = spark.createDataFrame(
        [(10, "cat dog"), (11, "spark sql sql"), (12, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["pred_label"] for r in nb_predict(test, weights, labels).collect()}
    assert out[10] == "pets" and out[11] == "data"
    assert 12 in out  # null text still scores (all-OOV), never drops
