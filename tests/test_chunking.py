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
