"""Multimodal binary-column operators (task brief: first-class components).

Images/audio/video ride as opaque ``binary`` columns with typed metadata,
processed via Arrow-batched ``mapInPandas`` — the same physical pattern as
the text kernels, so partitioning/batching behavior is identical at 100 TB.

Decode support is tiered by what the environment allows:
  * **BMP decode is REAL** — uncompressed 8/24/32-bit BMP needs only
    header parsing + a numpy view (8-bit: palette-mapped luma), so
    ``_decode_bmp`` genuinely parses dimensions/channels and computes the
    Rec.601 mean luma; ``make_bmp`` synthesizes deterministic test images.
  * Compressed formats (png/jpeg/...) are STUBBED (no PIL/libvips in this
    environment): ``decode_image`` raises ``NotImplementedError`` unless
    ``fake=True``, in which case a deterministic hash-derived fake
    exercises the full Spark path — schema, shuffle, mapInPandas batch
    shape — with real data movement.  On a real deployment only
    ``_decode_image_bytes``'s fallback changes; every plan stays the same.

Operators:
  * :func:`media_metadata`    — magic-byte sniffing + sizes (pure exprs)
  * :func:`decode_image`      — binary -> (width, height, n_channels,
                                mean_luma) via mapInPandas [STUB]
  * :func:`frame_sample`      — video binary -> k deterministic frame
                                offsets (plumbing for a real demuxer) [STUB]
  * :func:`resize_image`      — binary -> nearest-neighbor luma thumbnail
                                + aHash perceptual near-dup key (REAL for
                                BMP; stub policy otherwise)
  * :func:`media_dedup_keys`  — exact dedup key (md5 of bytes) — real
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, mean_luma double"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, offset_ms long"

# magic-byte prefixes -> media kind (pure column expressions, JVM-side)
_MAGIC = [
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("474946", "gif"),
    ("424d", "bmp"),
    ("52494646", "riff"),  # wav/avi/webp container
    ("3c68746d6c", "html"),
]


def media_metadata(df: DataFrame, bin_col: str = "html") -> DataFrame:
    """Magic-byte kind sniffing + byte size — codegen'd expressions only
    (hex prefix compare on the first bytes; no Python)."""
    prefix = F.lower(F.hex(F.substring(F.col(bin_col), 1, 8)))
    kind = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        kind = F.when(prefix.startswith(magic), name).otherwise(kind)
    return df.withColumn("media_kind", kind).withColumn(
        "media_bytes", F.length(F.col(bin_col)).cast("long")
    )


def _bmp_luma_grid(data: bytes):
    """REAL decode of uncompressed 8/24/32-bit BMP to an (h, w) float64
    Rec.601 luma grid in [0, 255] — header parse + numpy pixel view, no
    imaging library required.  8-bit pixels are palette INDICES: the
    color table (BGRA quads after the info header) is parsed and indices
    map through it, so luma is true luma for arbitrary palettes, not an
    identity-grayscale assumption.  Returns (n_channels, grid), or None
    when the bytes are not a decodable BMP (caller falls through to the
    stub policy)."""
    import struct

    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        return None
    px_off = struct.unpack_from("<I", data, 10)[0]
    hdr_sz = struct.unpack_from("<I", data, 14)[0]
    if hdr_sz < 40:
        return None
    w = struct.unpack_from("<i", data, 18)[0]
    raw_h = struct.unpack_from("<i", data, 22)[0]
    h = abs(raw_h)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0 or bpp not in (8, 24, 32) or w <= 0 or h <= 0:
        return None
    ch = bpp // 8
    stride = ((w * ch + 3) // 4) * 4
    if len(data) < px_off + stride * h:
        return None
    arr = np.frombuffer(data, np.uint8, stride * h, px_off).reshape(h, stride)
    if raw_h > 0:  # positive height = bottom-up storage; flip to top-down
        arr = arr[::-1]
    px = arr[:, : w * ch]
    if ch == 1:
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + hdr_sz
        if len(data) < pal_off + 4 * n_colors:
            return None
        pal = np.frombuffer(data, np.uint8, 4 * n_colors, pal_off).reshape(-1, 4)
        # per-entry Rec.601 luma; indices map through it
        lum_table = 0.114 * pal[:, 0] + 0.587 * pal[:, 1] + 0.299 * pal[:, 2]
        idx = px.reshape(h, w)
        if int(idx.max()) >= n_colors:
            return None
        return ch, lum_table[idx]
    rgb = px.reshape(h, w, ch).astype(np.float64)  # BGR(A) byte order
    return ch, 0.114 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.299 * rgb[..., 2]


def _decode_bmp(data: bytes):
    """Metadata view of :func:`_bmp_luma_grid`: (w, h, n_channels,
    mean_luma in [0, 1]), or None for non-BMP bytes."""
    decoded = _bmp_luma_grid(data)
    if decoded is None:
        return None
    ch, grid = decoded
    h, w = grid.shape
    return w, h, ch, round(float(grid.mean()) / 255.0, 6)


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic uncompressed 24-bit BMP for tests/synthetic corpora —
    pixel pattern derived from (x, y, seed) arithmetic, no RNG state."""
    import struct

    import numpy as np

    ch = 3
    stride = ((width * ch + 3) // 4) * 4
    yy, xx = np.mgrid[0:height, 0:width]
    b = ((xx * 7 + seed) % 256).astype(np.uint8)
    g = ((yy * 13 + seed * 3) % 256).astype(np.uint8)
    r = ((xx + yy + seed * 5) % 256).astype(np.uint8)
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, 0 : width * ch : 3] = b
    rows[:, 1 : width * ch : 3] = g
    rows[:, 2 : width * ch : 3] = r
    px = rows[::-1].tobytes()  # bottom-up row order, per the BMP default
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(px), 2835, 2835, 0, 0
    )
    return header + px


def _decode_image_bytes(data: bytes, fake: bool) -> tuple[int, int, int, float]:
    """Decode one image: REAL for uncompressed BMP; hash-derived stub for
    formats whose decoders need libraries absent from this environment
    (only reachable with ``fake=True`` — the stub is never silent)."""
    bmp = _decode_bmp(data)
    if bmp is not None:
        return bmp
    if not fake:
        raise NotImplementedError(
            "image decode beyond uncompressed BMP requires an imaging "
            "library (PIL/libvips) — not installed in this environment; "
            "pass fake=True for the deterministic stub"
        )
    h = hashlib.md5(data).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    channels = 1 + (h[2] % 4)
    mean_luma = round(h[3] / 255.0, 6)
    return width, height, channels, mean_luma


def decode_image(
    df: DataFrame,
    bin_col: str = "html",
    id_col: str = "doc_id",
    fake: bool = False,
    batch_hint: int = 1024,
) -> DataFrame:
    """binary -> image metadata via Arrow-batched mapInPandas.

    The plan is production-shaped: narrow projection (id + binary only —
    never drag other columns through Python), mapInPandas so one worker
    call handles a whole Arrow batch of images, output schema fixed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, data in zip(pdf[id_col], pdf[bin_col]):
                w, h, c, luma = _decode_image_bytes(bytes(data), fake)
                rows.append(
                    {"doc_id": did, "width": w, "height": h,
                     "n_channels": c, "mean_luma": luma}
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(run, schema=IMAGE_META_SCHEMA)


def frame_sample(
    df: DataFrame,
    k: int = 4,
    bin_col: str = "html",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """video binary -> k deterministic frame sample offsets [STUB].

    A real demuxer reads container timestamps; the stub derives a fake
    duration from a content hash and samples k evenly-spaced offsets.
    Plumbing (explode shape, schema, determinism) is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, data in zip(pdf[id_col], pdf[bin_col]):
                if not fake:
                    raise NotImplementedError(
                        "video demux requires a media library — "
                        "not installed; pass fake=True for the stub"
                    )
                dur_ms = 1000 + int.from_bytes(
                    hashlib.md5(bytes(data)).digest()[:2], "big"
                ) * 10
                for i in range(k):
                    rows.append(
                        {"doc_id": did, "frame_idx": i,
                         "offset_ms": (dur_ms * i) // k}
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(run, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, thumb_w int, thumb_h int, thumb binary, ahash64 long"
)


def _resize_one(data: bytes, out_w: int, out_h: int, fake: bool):
    """One image -> (thumb bytes, ahash64).  REAL for uncompressed BMP:
    integer nearest-neighbor sampling (src_idx = (i*src)//dst — pure
    integer, engine/cluster-exact) of the Rec.601 luma grid, truncated to
    uint8.  The perceptual key is the classic average hash over the 8x8
    resample of the SAME grid: bit set iff pixel > mean, packed row-major
    MSB-first into a signed bigint (bit 63 carries weight -(2^63), the
    simhash64 convention)."""
    import numpy as np

    decoded = _bmp_luma_grid(data)
    if decoded is None:
        if not fake:
            raise NotImplementedError(
                "image resize beyond uncompressed BMP requires an imaging "
                "library (PIL/libvips) — not installed in this "
                "environment; pass fake=True for the deterministic stub"
            )
        h = hashlib.md5(data).digest()
        seed = np.frombuffer(
            hashlib.md5(data + b"px").digest() * 4, np.uint8
        ).astype(np.float64)
        grid = np.resize(seed, (max(out_h, 8), max(out_w, 8)))
    else:
        grid = decoded[1]
    h_src, w_src = grid.shape

    def nn(dst_h: int, dst_w: int):
        rr = (np.arange(dst_h) * h_src) // dst_h
        cc = (np.arange(dst_w) * w_src) // dst_w
        return grid[rr][:, cc]

    thumb = nn(out_h, out_w).astype(np.uint8)  # truncation toward zero
    t8 = nn(8, 8)
    bits = (t8 > t8.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return thumb.tobytes(), v


def resize_image(
    df: DataFrame,
    out_w: int = 32,
    out_h: int = 32,
    bin_col: str = "html",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """binary -> (thumb_w, thumb_h, thumb, ahash64) via Arrow-batched
    mapInPandas — the brief's image-resize stage plus the perceptual
    near-dup key it enables (aHash: re-encoded/re-struck copies of the
    same picture collide; grouping on ahash64 is image-side near-dup
    the way fp-grouping is text-side exact dedup).

    Same production plan shape as :func:`decode_image`: narrow
    projection, whole-Arrow-batch Python calls, fixed output schema.
    Real for uncompressed BMP (integer nearest-neighbor on the real luma
    grid); other formats follow the module's stub policy (loud
    NotImplementedError unless ``fake=True``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, data in zip(pdf[id_col], pdf[bin_col]):
                thumb, ah = _resize_one(bytes(data), out_w, out_h, fake)
                rows.append(
                    {"doc_id": did, "thumb_w": out_w, "thumb_h": out_h,
                     "thumb": thumb, "ahash64": ah}
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(run, schema=RESIZE_SCHEMA)


def media_dedup_keys(df: DataFrame, bin_col: str = "html",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact binary dedup groups: md5 over the raw bytes (JVM-side md5,
    no Python) -> (fp, keeper_id, n_docs).  Identical algebra to
    operators/dedup.py::exact_dedup but over binary content."""
    return (
        df.select(F.col(id_col), F.md5(F.col(bin_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_docs"))
    )
