"""Token-window document chunking (functions/textops.py::chunk_documents).
SQL-oracle parity is covered by the docs_chunk_windows driver query."""

from __future__ import annotations

import pytest

from yatsm_spark.functions.textops import chunk_documents


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, **kw).collect()
    return sorted(
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["chunk_tokens"], r["chunk_text"])
        for r in out
    )


def test_chunk_overlap_and_tail(spark):
    # 7 tokens, size 3, stride 2 -> starts 0,2,4,6; final chunk is short
    text = "t0 t1 t2 t3 t4 t5 t6"
    got = _chunks(spark, [(1, text)], size=3, stride=2)
    assert got == [
        (1, 0, 0, 3, "t0 t1 t2"),
        (1, 1, 2, 3, "t2 t3 t4"),
        (1, 2, 4, 3, "t4 t5 t6"),
        (1, 3, 6, 1, "t6"),
    ]
    # every token covered at least once
    covered = set()
    for _, _, s, n, _ in got:
        covered |= set(range(s, s + n))
    assert covered == set(range(7))


def test_chunk_exact_multiple_disjoint(spark):
    # stride == size -> disjoint packing, no short tail when n % size == 0
    got = _chunks(spark, [(1, "a b c d")], size=2, stride=2)
    assert got == [(1, 0, 0, 2, "a b"), (1, 1, 2, 2, "c d")]


def test_chunk_row_preserving_empty_and_null(spark):
    # '' and NULL text each emit exactly ONE empty chunk — no doc vanishes
    got = _chunks(spark, [(1, ""), (2, None)], size=4, stride=4)
    assert got == [(1, 0, 0, 1, ""), (2, 0, 0, 1, "")]


def test_chunk_short_doc_single_window(spark):
    got = _chunks(spark, [(1, "x y")], size=10, stride=8)
    assert got == [(1, 0, 0, 2, "x y")]


def test_chunk_invalid_params(spark):
    import pyspark.sql.functions as F  # noqa: F401

    with pytest.raises(AssertionError):
        chunk_documents(None, size=0, stride=1)
    with pytest.raises(AssertionError):
        chunk_documents(None, size=4, stride=0)


def test_c4_line_filter_hand_values(spark):
    from yatsm_spark.functions.textops import c4_line_stats

    doc = "\n".join([
        "This line has enough words and ends well.",   # keep
        "Too short.",                                   # < 5 words
        "This line mentions JavaScript so it is dropped.",  # javascript
        "No terminal punctuation on this line here",    # bad ending
        'A quoted ending line with many words indeed."', # keep (quote)
        "Another perfectly fine sentence goes right here!",  # keep
    ])
    rows = [(1, doc), (2, "short page."), (3, "Uses a { brace. " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in df.select("doc_id", *c4_line_stats("text")).collect()}

    r1 = out[1]
    assert r1["n_lines"] == 6 and r1["n_lines_kept"] == 3
    assert r1["c4_keep"] is True
    assert r1["clean_text"].splitlines() == [
        "This line has enough words and ends well.",
        'A quoted ending line with many words indeed."',
        "Another perfectly fine sentence goes right here!",
    ]
    # page 2: single short line -> 0 kept, below min_lines
    assert out[2]["n_lines_kept"] == 0 and out[2]["c4_keep"] is False
    # page 3: lines keepable but curly brace kills the PAGE
    assert out[3]["c4_keep"] is False


def test_c4_lorem_ipsum_page_kill(spark):
    from yatsm_spark.functions.textops import c4_line_stats

    good = "A good line with plenty of words here."
    doc = "\n".join([good, good, good, "but Lorem Ipsum appears in this long line."])
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    [r] = df.select("doc_id", *c4_line_stats("text")).collect()
    assert r["n_lines_kept"] == 4          # lines themselves survive
    assert r["c4_keep"] is False           # page-level lorem-ipsum kill
