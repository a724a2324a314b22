"""Multimodal binary-column operators (task brief: first-class components).

Images/audio/video ride as opaque ``binary`` columns with typed metadata,
processed via Arrow-batched ``mapInPandas`` — the same physical pattern as
the text kernels, so partitioning/batching behavior is identical at 100 TB.

The sandbox has no image/audio libraries, so the actual media decode is
STUBBED (north-rule compliant): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic, seed-free fake decoder (bytes -> hash-derived dimensions +
channel stats) exercises the full Spark path — schema, shuffle,
mapInPandas batch shape, metadata struct — with real data movement.  On a
real deployment only ``_decode_image_bytes`` changes (PIL/libvips); every
plan stays the same.

Operators:
  * :func:`media_metadata`    — magic-byte sniffing + sizes (pure exprs)
  * :func:`decode_image`      — binary -> (width, height, n_channels,
                                mean_luma) via mapInPandas [STUB]
  * :func:`frame_sample`      — video binary -> k deterministic frame
                                offsets (plumbing for a real demuxer) [STUB]
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


def _decode_image_bytes(data: bytes, fake: bool) -> tuple[int, int, int, float]:
    """Decode one image.  STUB: no imaging library in this environment.

    The fake path derives deterministic pseudo-metadata from a content
    hash — stable across runs/partitions, so tests can assert exact
    values while exercising the real batch plumbing.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (PIL/libvips) — "
            "not installed in this environment; pass fake=True for the "
            "deterministic stub"
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
