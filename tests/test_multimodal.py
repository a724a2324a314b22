"""Multimodal binary-column operators — plumbing-real, decode-stubbed."""

from __future__ import annotations

import hashlib

import pytest

from yatsm_spark.operators.multimodal import (
    decode_image,
    frame_sample,
    media_dedup_keys,
    media_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, b"\x89PNG\r\n\x1a\n" + b"x" * 100),
        (1, b"\xff\xd8\xff\xe0" + b"y" * 50),
        (2, b"<html><body>hi</body></html>"),
        (3, b"\x89PNG\r\n\x1a\n" + b"x" * 100),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, blob binary")


def test_media_metadata_sniffing(media):
    out = {r["doc_id"]: (r["media_kind"], r["media_bytes"]) for r in
           media_metadata(media, "blob").collect()}
    assert out[0] == ("png", 108)
    assert out[1] == ("jpeg", 54)
    assert out[2][0] == "html"


def test_decode_image_stub_requires_fake(media):
    with pytest.raises(Exception, match="NotImplementedError|imaging"):
        decode_image(media, "blob", fake=False).collect()


def test_decode_image_fake_deterministic(media):
    a = sorted(map(tuple, decode_image(media, "blob", fake=True).collect()))
    b = sorted(map(tuple, decode_image(media.repartition(3), "blob", fake=True).collect()))
    assert a == b  # partition-invariant
    by_id = {t[0]: t for t in a}
    # dup content -> identical fake metadata
    assert by_id[0][1:] == by_id[3][1:]
    # matches the hash-derived formula
    h = hashlib.md5(b"\x89PNG\r\n\x1a\n" + b"x" * 100).digest()
    assert by_id[0][1] == 64 + h[0] * 4


def test_frame_sample_shape(media):
    out = frame_sample(media, k=3, bin_col="blob", fake=True).collect()
    assert len(out) == 4 * 3
    for r in out:
        assert 0 <= r["frame_idx"] < 3 and r["offset_ms"] >= 0


def test_media_dedup(media):
    groups = {r["fp"]: (r["keeper_id"], r["n_docs"]) for r in
              media_dedup_keys(media, "blob").collect()}
    assert sorted(v for v in groups.values()) == [(0, 2), (1, 1), (2, 1)]


def test_bmp_decode_is_real(spark):
    """BMP needs no imaging library: the decoder must parse the actual
    header and pixels — dimensions exact, channels 3, mean luma equal to
    the numpy ground truth of the generated pattern (no fake flag)."""
    import numpy as np

    from yatsm_spark.operators.multimodal import decode_image, make_bmp, media_metadata

    w0, h0, seed = 37, 21, 9  # odd width exercises row padding
    data = make_bmp(w0, h0, seed)
    # ground truth straight from the pattern definition
    yy, xx = np.mgrid[0:h0, 0:w0]
    b = (xx * 7 + seed) % 256
    g = (yy * 13 + seed * 3) % 256
    r = (xx + yy + seed * 5) % 256
    luma = round(float((0.114 * b + 0.587 * g + 0.299 * r).mean()) / 255.0, 6)

    df = spark.createDataFrame([(1, bytearray(data))], "doc_id long, html binary")
    row = decode_image(df, fake=False).first()  # fake NOT needed for BMP
    assert (row["width"], row["height"], row["n_channels"]) == (w0, h0, 3)
    assert abs(row["mean_luma"] - luma) < 1e-9
    assert media_metadata(df).first()["media_kind"] == "bmp"


def test_bmp_truncated_falls_back(spark):
    """A truncated/corrupt BMP is not silently half-decoded: it falls
    through to the stub policy (raise without fake, fake values with)."""
    import pytest

    from yatsm_spark.operators.multimodal import decode_image, make_bmp

    bad = make_bmp(16, 16, 1)[:40]
    df = spark.createDataFrame([(1, bytearray(bad))], "doc_id long, html binary")
    with pytest.raises(Exception, match="NotImplementedError|imaging"):
        decode_image(df, fake=False).collect()
    assert decode_image(df, fake=True).first()["width"] >= 64


def test_bmp_8bit_palette_mapped_luma(spark):
    """8-bit BMP pixels are palette indices: luma must come from the
    color table, not from the raw index values."""
    import struct

    import numpy as np

    from yatsm_spark.operators.multimodal import decode_image

    w, h = 6, 4
    stride = ((w + 3) // 4) * 4
    # palette: index i -> BGR (inverted grayscale), so index-mean != luma
    pal = b"".join(struct.pack("<BBBB", 255 - i, 255 - i, 255 - i, 0) for i in range(256))
    idx = (np.arange(h * stride, dtype=np.uint8).reshape(h, stride) % 16)
    px = idx[::-1].tobytes()
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pal) + len(px), 0, 0,
                         14 + 40 + len(pal))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(px), 2835, 2835, 256, 0)
    data = header + info + pal + px

    truth_idx = idx[:, :w]
    truth_luma = round(float((255.0 - truth_idx).mean()) / 255.0, 6)
    df = spark.createDataFrame([(1, bytearray(data))], "doc_id long, html binary")
    row = decode_image(df, fake=False).first()
    assert (row["width"], row["height"], row["n_channels"]) == (w, h, 1)
    assert abs(row["mean_luma"] - truth_luma) < 1e-9
    # index-mean would be ~7.5/255 ≈ 0.03 — assert we did NOT do that
    assert row["mean_luma"] > 0.9
