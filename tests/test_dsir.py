"""DSIR importance scoring (operators/dsir.py): exact-value check against
a pure-Python mirror of the hashed-feature + micro-nat pipeline, plus the
discrimination property the op exists for.  Cross-engine parity is the
`docs_dsir_score` driver query."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from yatsm_spark.operators.dsir import dsir_fit, dsir_score

PRIME = 2147483647
BASE = 1000003
SCALE = 1_000_000


def _tok_hash(t: str) -> int:
    return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % PRIME


def _features(text: str, n_buckets: int) -> list[int]:
    toks = text.split(" ")
    hs = [_tok_hash(t) for t in toks]
    uni = hs
    bi = [(hs[i] * BASE + hs[i + 1]) % PRIME for i in range(len(hs) - 1)]
    return [h % n_buckets for h in uni + bi]


def _ilog(num: float, den: float) -> int:
    return math.floor(SCALE * math.log(num / den))


def _mirror(target: list[str], raw: list[str], docs: list[str], b: int):
    tc = Counter(f for t in target for f in _features(t, b))
    rc = Counter(f for t in raw for f in _features(t, b))
    tn, rn = sum(tc.values()), sum(rc.values())
    seen = set(tc) | set(rc)
    lam = {
        f: _ilog(tc.get(f, 0) + 1, tn + b) - _ilog(rc.get(f, 0) + 1, rn + b)
        for f in seen
    }
    out = []
    for d in docs:
        fs = _features(d, b)
        out.append((len(fs), sum(lam.get(f, 0) for f in fs)))
    return out


def test_dsir_matches_python_mirror(spark):
    b = 65536
    target = ["alpha beta alpha", "beta gamma"]
    raw = ["zzz yyy zzz", "alpha yyy", "qqq rrr sss"]
    score_docs = ["alpha beta", "zzz yyy", "unseen tokens here"]

    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(target)], "doc_id long, text string"
    )
    rdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(raw)], "doc_id long, text string"
    )
    sdf = spark.createDataFrame(
        [(200 + i, t) for i, t in enumerate(score_docs)], "doc_id long, text string"
    )
    lam = dsir_fit(tdf, rdf, n_buckets=b)
    got = {
        r["doc_id"]: (r["n_feats"], r["logratio_sum"])
        for r in dsir_score(sdf, lam, n_buckets=b).collect()
    }
    expect = _mirror(target, raw, score_docs, b)
    assert got == {200 + i: e for i, e in enumerate(expect)}
    # discrimination: the target-like doc outranks the raw-like doc
    assert got[200][1] > got[201][1]


def test_dsir_every_doc_emits_a_row(spark):
    tdf = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    rdf = spark.createDataFrame([(1, "c d")], "doc_id long, text string")
    lam = dsir_fit(tdf, rdf, n_buckets=1024)
    sdf = spark.createDataFrame([(5, None)], "doc_id long, text string")
    rows = dsir_score(sdf, lam, n_buckets=1024).collect()
    # null text -> '' -> one unigram feature ('' hashes like any token)
    assert len(rows) == 1 and rows[0]["n_feats"] == 1
