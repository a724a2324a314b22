"""Single-band TIFF writer/reader in pure stdlib — the S6 map-sink codec.

The reference rasterizes per-pixel model outputs into GeoTIFFs through
GDAL (`yatsm/cli/map.py::write_output` [U], `yatsm/cli/changemap.py`
[U]); GDAL is absent here, and — like libjpeg/PIL before it (see
jpegcodec.py) — the dependency turns out to be removable: a baseline
TIFF 6.0 file is a 8-byte header + one IFD + raster strips, and the
GeoTIFF georeferencing is just three more IFD tags (ModelPixelScale,
ModelTiepoint, GeoKeyDirectory — OGC GeoTIFF 1.1).  This module writes
single-band uncompressed little-endian TIFFs (uint8 / int32 / float64
sample formats) and reads them back for round-trip tests.

The crawl data model has NO spatial payload (COVERAGE.md S6), so the
shipped map surface (operators/changemap.py::rasterize +
write_map_tiff) rasterizes GRID-SHAPED query results — url-bucket x
time-bucket matrices — and the geo tags are OPTIONAL pass-through for
deployments whose grid axes do have a spatial meaning.  No fake
georeferencing is invented: tags are written only when the caller
supplies them.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF 6.0 tag ids
_TAGS = {
    "ImageWidth": 256,
    "ImageLength": 257,
    "BitsPerSample": 258,
    "Compression": 259,
    "Photometric": 262,
    "StripOffsets": 273,
    "SamplesPerPixel": 277,
    "RowsPerStrip": 278,
    "StripByteCounts": 279,
    "SampleFormat": 339,
    "ModelPixelScale": 33550,
    "ModelTiepoint": 33922,
    "GeoKeyDirectory": 34735,
}
_TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE = 3, 4, 12

_FORMATS = {
    # numpy dtype -> (bits, sample_format)
    np.dtype(np.uint8): (8, 1),
    np.dtype(np.int32): (32, 2),
    np.dtype(np.float64): (64, 3),
}


def encode_tiff(
    grid: np.ndarray,
    pixel_scale: tuple[float, float] | None = None,
    tiepoint: tuple[float, float, float, float] | None = None,
    epsg: int | None = None,
) -> bytes:
    """(h, w) uint8/int32/float64 array -> single-strip little-endian
    TIFF bytes.  Optional GeoTIFF tags: ``pixel_scale`` = (sx, sy) model
    units per pixel, ``tiepoint`` = (i, j, x, y) raster->model anchor,
    ``epsg`` = projected/geographic CRS code in a minimal
    GeoKeyDirectory.  Callers with no spatial interpretation pass none
    of them and get a plain TIFF."""
    grid = np.asarray(grid)
    if grid.ndim != 2:
        raise ValueError("encode_tiff: need a 2-D single-band grid")
    if grid.dtype not in _FORMATS:
        raise ValueError(f"encode_tiff: unsupported dtype {grid.dtype} "
                         "(uint8/int32/float64)")
    h, w = grid.shape
    bits, sfmt = _FORMATS[grid.dtype]
    px = grid.astype(grid.dtype.newbyteorder("<")).tobytes()

    entries: list[tuple[int, int, int, bytes | int]] = [
        (_TAGS["ImageWidth"], _TYPE_LONG, 1, w),
        (_TAGS["ImageLength"], _TYPE_LONG, 1, h),
        (_TAGS["BitsPerSample"], _TYPE_SHORT, 1, bits),
        (_TAGS["Compression"], _TYPE_SHORT, 1, 1),     # none
        (_TAGS["Photometric"], _TYPE_SHORT, 1, 1),     # BlackIsZero
        (_TAGS["SamplesPerPixel"], _TYPE_SHORT, 1, 1),
        (_TAGS["RowsPerStrip"], _TYPE_LONG, 1, h),     # one strip
        (_TAGS["StripByteCounts"], _TYPE_LONG, 1, len(px)),
        (_TAGS["SampleFormat"], _TYPE_SHORT, 1, sfmt),
    ]
    overflow: list[tuple[int, bytes]] = []  # (entry index, payload)
    if pixel_scale is not None:
        sx, sy = pixel_scale
        entries.append(
            (_TAGS["ModelPixelScale"], _TYPE_DOUBLE, 3,
             struct.pack("<3d", sx, sy, 0.0))
        )
    if tiepoint is not None:
        i, j, x, y = tiepoint
        entries.append(
            (_TAGS["ModelTiepoint"], _TYPE_DOUBLE, 6,
             struct.pack("<6d", i, j, 0.0, x, y, 0.0))
        )
    if epsg is not None:
        # minimal GeoKeyDirectory: version 1.1.0, 2 keys — model type
        # (projected if epsg looks projected else geographic is the
        # caller's concern; 1024=GTModelType, 3072=ProjectedCRS /
        # 2048=GeographicCRS by convention; we store under 3072)
        keys = struct.pack(
            "<16H",
            1, 1, 0, 3,
            1024, 0, 1, 1,      # GTModelTypeGeoKey = projected
            1025, 0, 1, 1,      # GTRasterTypeGeoKey = PixelIsArea
            3072, 0, 1, epsg,   # ProjectedCRSGeoKey
        )
        entries.append((_TAGS["GeoKeyDirectory"], _TYPE_SHORT, len(keys) // 2, keys))

    entries.append((_TAGS["StripOffsets"], _TYPE_LONG, 1, None))  # patched
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd_off = 8
    ifd_size = 2 + 12 * n + 4
    ext_off = ifd_off + ifd_size  # external payload area starts here

    ext = bytearray()
    body = bytearray()
    body += struct.pack("<H", n)
    strip_offset_pos = None
    for tag, typ, count, val in entries:
        body += struct.pack("<HHI", tag, typ, count)
        if val is None:  # StripOffsets, patched after ext is sized
            strip_offset_pos = len(body)
            body += struct.pack("<I", 0)
        elif isinstance(val, bytes):
            if len(val) <= 4:
                body += val.ljust(4, b"\0")
            else:
                body += struct.pack("<I", ext_off + len(ext))
                ext += val
        elif typ == _TYPE_SHORT:
            body += struct.pack("<HH", val, 0)
        else:
            body += struct.pack("<I", val)
    body += struct.pack("<I", 0)  # next-IFD = none
    data_off = ext_off + len(ext)
    body[strip_offset_pos:strip_offset_pos + 4] = struct.pack("<I", data_off)
    return b"II*\x00" + struct.pack("<I", ifd_off) + bytes(body) + bytes(ext) + px


def decode_tiff(data: bytes):
    """Parse a single-band TIFF written by :func:`encode_tiff` (or any
    uncompressed single-strip little-endian equivalent): returns
    (grid, tags) with tags holding any GeoTIFF fields present."""
    if data[:4] != b"II*\x00":
        raise ValueError("tiff: not little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    fields = {}
    for k in range(n):
        tag, typ, count, raw = struct.unpack_from("<HHI4s", data, ifd_off + 2 + 12 * k)
        if typ == _TYPE_SHORT and count <= 2:
            val = struct.unpack("<2H", raw)[0] if count == 1 else struct.unpack("<2H", raw)
        elif typ == _TYPE_LONG and count == 1:
            (val,) = struct.unpack("<I", raw)
        else:
            (off,) = struct.unpack("<I", raw)
            size = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8}[typ] * count
            payload = data[off : off + size]
            fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[typ]
            val = struct.unpack(f"<{count}{fmt}", payload)
        fields[tag] = val
    w, h = fields[256], fields[257]
    bits = fields[258]
    sfmt = fields.get(339, 1)
    if fields.get(259, 1) != 1:
        raise ValueError("tiff: compressed strips unsupported")
    dt = {(8, 1): np.uint8, (32, 2): np.int32, (64, 3): np.float64}.get((bits, sfmt))
    if dt is None:
        raise ValueError(f"tiff: unsupported sample layout bits={bits} fmt={sfmt}")
    off, cnt = fields[273], fields[279]
    grid = np.frombuffer(data, np.dtype(dt).newbyteorder("<"), w * h, off).reshape(h, w)
    tags = {}
    if 33550 in fields:
        tags["pixel_scale"] = fields[33550][:2]
    if 33922 in fields:
        t = fields[33922]
        tags["tiepoint"] = (t[0], t[1], t[3], t[4])
    if 34735 in fields:
        keys = fields[34735]
        for i in range(4, len(keys), 4):
            if keys[i] == 3072:
                tags["epsg"] = keys[i + 3]
    return grid.copy(), tags
