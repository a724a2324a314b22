"""JSONL ingest (sources/jsonl.py): schema-enforced parse + corrupt-record
quarantine, file path and column path.  Cross-engine parity for the column
path is the `jsonl_ingest` driver query."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401
from pyspark.sql import types as T

from yatsm_spark.sources.jsonl import parse_json_lines, read_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def test_read_jsonl_quarantines_bad_lines(spark, tmp_path):
    p = tmp_path / "crawl.jsonl"
    p.write_text(
        '{"url": "http://a", "n": 1}\n'
        "this is not json at all\n"
        '{"url": "http://b", "n": 2}\n'
        '{"url": "http://c", "n": "NaN-ish"}\n'  # type mismatch -> n null
    )
    rows = sorted(
        read_jsonl(spark, str(p), SCHEMA).collect(),
        key=lambda r: (r["url"] is None, r["url"] or ""),
    )
    assert len(rows) == 4  # every input line survives
    clean = [r for r in rows if r["corrupt"] == 0]
    assert {(r["url"], r["n"]) for r in clean} == {("http://a", 1), ("http://b", 2)}
    assert all(r["raw"] is None for r in clean)
    bad = [r for r in rows if r["corrupt"] == 1]
    assert len(bad) == 2
    assert any(r["raw"] == "this is not json at all" for r in bad)
    # PERMISSIVE type mismatch: parseable fields kept, bad field nulled
    mismatch = [r for r in bad if r["url"] == "http://c"]
    assert mismatch and mismatch[0]["n"] is None


def test_parse_json_lines_contract(spark):
    rows = [
        (1, '{"url": "http://a", "n": 7}'),  # clean
        (2, "garbage {{{"),                   # malformed -> corrupt
        (3, "{}"),                            # all-null shape -> corrupt
        (4, "[1, 2]"),                        # valid JSON, wrong shape -> corrupt
        (5, '{"url": "http://b"}'),           # partial: n null, NOT corrupt
    ]
    df = spark.createDataFrame(rows, "rec_id long, line string")
    out = {
        r["rec_id"]: r
        for r in parse_json_lines(df, "line", SCHEMA, keep_cols=("rec_id",)).collect()
    }
    assert len(out) == 5
    assert out[1]["url"] == "http://a" and out[1]["n"] == 7 and out[1]["corrupt"] == 0
    assert out[2]["corrupt"] == 1 and out[2]["raw"] == "garbage {{{"
    assert out[3]["corrupt"] == 1
    assert out[4]["corrupt"] == 1
    assert out[5]["corrupt"] == 0 and out[5]["url"] == "http://b" and out[5]["n"] is None
