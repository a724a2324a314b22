"""Term-statistics operators — semantic unit tests.
Cross-engine parity is covered by __spark_entry__ + scripts/check_oracle.py
(docs_tfidf_terms, docs_commonness)."""

from __future__ import annotations

import pytest

from yatsm_spark.operators.terms import (
    commonness_score,
    term_doc_freq,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def tdocs(spark):
    rows = [
        (0, "apple apple banana"),   # apple tf=2 here, df=2; banana df=1
        (1, "apple cherry cherry"),  # cherry tf=2, df=1
        (2, "dog dog dog dog"),      # dog only here
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_doc_freq(tdocs):
    df = {r.t: r["df"] for r in term_doc_freq(tdocs).collect()}
    assert df == {"apple": 2, "banana": 1, "cherry": 1, "dog": 1}


def test_tfidf_hand_values(tdocs):
    out = tfidf_top_terms(tdocs, k=1).collect()
    by_id = {r.doc_id: r for r in out}
    # doc 0: apple w = 1e4*2*3/2 = 30000; banana w = 1e4*1*3/1 = 30000
    #        -> tie broken by term asc: apple wins
    assert by_id[0].term == "apple" and by_id[0].tfidf_x1e4 == 30000
    # doc 1: cherry w = 1e4*2*3/1 = 60000 beats apple 15000
    assert by_id[1].term == "cherry" and by_id[1].tfidf_x1e4 == 60000
    # doc 2: dog w = 1e4*4*3/1 = 120000
    assert by_id[2].term == "dog" and by_id[2].tfidf_x1e4 == 120000


def test_tfidf_k_and_determinism(tdocs):
    out = tfidf_top_terms(tdocs, k=2)
    rows = sorted(
        [(r.doc_id, r.term) for r in out.collect()]
    )
    # doc 0 second term: banana (30000, tied with apple, term-asc order)
    assert rows == sorted(
        [(0, "apple"), (0, "banana"), (1, "cherry"), (1, "apple"), (2, "dog")]
    )
    again = sorted([(r.doc_id, r.term) for r in out.collect()])
    assert rows == again


def test_commonness_hand_values(tdocs):
    out = {r.doc_id: r for r in commonness_score(tdocs).collect()}
    # doc 0: tokens apple(df2) x2 + banana(df1) -> sum_df=5, n=3, N=3
    #        1e4*5/9 = 5555.5 -> half-up 5556
    assert out[0].n_tokens == 3 and out[0].mean_df_x1e4 == 5556
    # doc 1: apple2 + cherry(1)*2 -> sum_df=4, 1e4*4/9 = 4444.4 -> 4444
    assert out[1].mean_df_x1e4 == 4444
    # doc 2: dog df1 x4 -> 1e4*4/12 = 3333.3 -> 3333
    assert out[2].mean_df_x1e4 == 3333


def test_shuffled_join_fallback_matches_broadcast(tdocs):
    bc = sorted(map(tuple, tfidf_top_terms(tdocs, k=2).collect()))
    shuffled = sorted(
        map(tuple, tfidf_top_terms(tdocs, k=2, broadcast_threshold=0).collect())
    )
    assert bc == shuffled
