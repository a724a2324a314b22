"""Streaming MinHash-LSH near-dup candidates (streaming/stream_neardup.py)."""

from __future__ import annotations

from yatsm_spark.streaming.stream_neardup import stream_neardup_candidates

SCHEMA = "doc_id string, text string"

D_BASE = "the quick brown fox jumps over the lazy dog again and again today"
D_NEAR = "the quick brown fox jumps over the lazy cat again and again today"
D_OTHER = "spark shuffles partition data across executors with hash exchanges"


def _run(spark, src_path, name, max_files=None):
    stream = spark.readStream.schema(SCHEMA)
    if max_files is not None:
        stream = stream.option("maxFilesPerTrigger", max_files)
    q = (
        # bands=8 (2 rows/band): a 0.6-agreement pair collides in >=1 band
        # w.p. ~0.98 — the 4x4 default is tuned for ~0.8-sim corpus dups
        stream_neardup_candidates(stream.parquet(src_path), bands=8, threshold=0.4)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT DISTINCT id_a, id_b, sig_sim FROM {name}").collect()


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stream_neardup_detects_pair(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(spark, src, [("a", D_BASE), ("b", D_NEAR), ("c", D_OTHER)])
    rows = _run(spark, src, "t_neardup_one")
    pairs = {frozenset((r.id_a, r.id_b)) for r in rows}
    assert frozenset(("a", "b")) in pairs
    assert all("c" not in p for p in pairs)
    # exact sim value: signatures agree on >= 40% of the 16 hash slots
    assert all(r.sig_sim >= 0.4 for r in rows)


def test_stream_neardup_pairs_invariant_to_batch_slicing(spark, tmp_path):
    """Same docs over 1 batch vs 3 one-file batches -> same PAIR SET.
    Orientation is NORMALIZED (id_a < id_b), so the tuples themselves —
    not just the frozensets — must match across slicings."""
    one = str(tmp_path / "one")
    _write(spark, one, [("a", D_BASE), ("b", D_NEAR), ("d", D_BASE + " extra")])
    split = str(tmp_path / "split")
    _write(spark, split, [("a", D_BASE)])
    _write(spark, split, [("b", D_NEAR)])
    _write(spark, split, [("d", D_BASE + " extra")])

    r_one = _run(spark, one, "t_nd_a")
    r_split = _run(spark, split, "t_nd_b", max_files=1)
    assert all(r.id_a < r.id_b for r in r_one + r_split)
    p_one = {(r.id_a, r.id_b) for r in r_one}
    p_split = {(r.id_a, r.id_b) for r in r_split}
    assert p_one == p_split and ("a", "b") in p_one


def test_stream_neardup_recrawl_not_self_paired(spark, tmp_path):
    """A re-crawl of a known doc_id must not pair with itself."""
    src = str(tmp_path / "re")
    _write(spark, src, [("a", D_BASE)])
    _write(spark, src, [("a", D_BASE), ("b", D_NEAR)])
    rows = _run(spark, src, "t_nd_re", max_files=1)
    assert all(r.id_a != r.id_b for r in rows)
    assert {frozenset((r.id_a, r.id_b)) for r in rows} == {frozenset(("a", "b"))}
