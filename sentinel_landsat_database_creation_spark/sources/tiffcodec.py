"""Minimal pure-Python TIFF codec for single-band rasters.

Implements the subset of TIFF 6.0 the engine needs to make the raster
source/sink (SURVEY.md §2 ops 4/8) executable without native GDAL:

- ``encode_gray`` writes an uncompressed single-strip grayscale GeoTIFF
  (float32 by default) with optional ModelPixelScale / ModelTiepoint
  geo-tags — the same logical output as the reference's
  ``array2raster`` (reference: data_pair/fct_data_extraction.py:14-20,
  GTiff driver, 1 band, GDT_Float32 + geotransform).
- ``decode_gray`` reads band 1 of an uncompressed TIFF (float32/float64/
  uint8/uint16/int16/uint32/int32, II or MM byte order, any strip
  layout) as float32 pixels — the fallback for the reference's
  ``rasterio.open(...).read(1)`` (data_pair/fct_data_extraction.py:21-26)
  when rasterio is absent.

rasterio (when installed) remains the production path for compressed /
tiled / esoteric files; this codec is the always-available baseline and
is what the in-container tests round-trip through. Everything here is
plain driver/executor-side Python over ``struct`` — no Spark imports.
"""

from __future__ import annotations

import struct

# TIFF tag ids (TIFF 6.0 spec) + GeoTIFF geo-tags (OGC GeoTIFF spec).
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTE_COUNTS = 279
_T_SAMPLE_FORMAT = 339
_T_MODEL_PIXEL_SCALE = 33550
_T_MODEL_TIEPOINT = 33922

_TYPE_SHORT = 3  # uint16
_TYPE_LONG = 4  # uint32
_TYPE_DOUBLE = 12

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}

# (sample_format, bits) -> struct char
_FMT = {
    (1, 8): "B",
    (1, 16): "H",
    (1, 32): "I",
    (2, 8): "b",
    (2, 16): "h",
    (2, 32): "i",
    (3, 32): "f",
    (3, 64): "d",
}


def encode_gray(
    height: int,
    width: int,
    pixels,
    origin: tuple[float, float] | None = None,
    pixel_size: tuple[float, float] | None = None,
) -> bytes:
    """Encode ``height*width`` float pixels (row-major) as an
    uncompressed little-endian single-strip float32 TIFF. ``origin``
    (originX, originY) and ``pixel_size`` (pixelWidth, pixelHeight) add
    the GeoTIFF ModelTiepoint/ModelPixelScale tags, mirroring the
    geotransform the reference feeds GDAL
    (data_pair/fct_data_extraction.py:15-17)."""
    if len(pixels) != height * width:
        raise ValueError(f"expected {height * width} pixels, got {len(pixels)}")
    try:  # numpy fast path: ~100x over struct.pack arg-unpacking at 1e5+ px
        import numpy as np

        data = np.asarray(pixels, dtype="<f4").tobytes()
    except ImportError:  # pragma: no cover - numpy is a pyspark dep
        data = struct.pack(f"<{height * width}f", *[float(p) for p in pixels])

    entries: list[tuple[int, int, int, int]] = []  # (tag, type, count, value)
    extra: list[bytes] = []  # out-of-line values, appended after the IFD

    def entry(tag: int, typ: int, count: int, value: int) -> None:
        entries.append((tag, typ, count, value))

    entries_geo = []
    if origin is not None and pixel_size is not None:
        # ModelPixelScale = (pw, ph, 0); ModelTiepoint = raster (0,0,0)
        # -> model (originX, originY, 0). GDAL's geotransform uses a
        # negative row step for north-up; the scale tag carries |ph|.
        entries_geo.append(
            (_T_MODEL_PIXEL_SCALE, (pixel_size[0], abs(pixel_size[1]), 0.0))
        )
        entries_geo.append(
            (_T_MODEL_TIEPOINT, (0.0, 0.0, 0.0, origin[0], origin[1], 0.0))
        )

    n_entries = 10 + len(entries_geo)
    ifd_offset = 8
    ifd_size = 2 + n_entries * 12 + 4
    extra_offset = ifd_offset + ifd_size

    entry(_T_WIDTH, _TYPE_LONG, 1, width)
    entry(_T_HEIGHT, _TYPE_LONG, 1, height)
    entry(_T_BITS, _TYPE_SHORT, 1, 32)
    entry(_T_COMPRESSION, _TYPE_SHORT, 1, 1)
    entry(_T_PHOTOMETRIC, _TYPE_SHORT, 1, 1)  # BlackIsZero
    entry(_T_SAMPLES_PER_PIXEL, _TYPE_SHORT, 1, 1)
    entry(_T_ROWS_PER_STRIP, _TYPE_LONG, 1, height)
    entry(_T_STRIP_BYTE_COUNTS, _TYPE_LONG, 1, len(data))
    entry(_T_SAMPLE_FORMAT, _TYPE_SHORT, 1, 3)  # IEEE float
    for tag, values in entries_geo:
        blob = struct.pack(f"<{len(values)}d", *values)
        entry(tag, _TYPE_DOUBLE, len(values), extra_offset + sum(map(len, extra)))
        extra.append(blob)
    strip_offset = extra_offset + sum(map(len, extra))
    entry(_T_STRIP_OFFSETS, _TYPE_LONG, 1, strip_offset)

    entries.sort(key=lambda e: e[0])  # spec: ascending tag order
    out = [struct.pack("<2sHI", b"II", 42, ifd_offset), struct.pack("<H", n_entries)]
    for tag, typ, count, value in entries:
        out.append(struct.pack("<HHII", tag, typ, count, value))
    out.append(struct.pack("<I", 0))  # no next IFD
    out.extend(extra)
    out.append(data)
    return b"".join(out)


def decode_gray_np(buf: bytes):
    """decode_gray returning (height, width, float32 ndarray-or-list):
    the Arrow-friendly form the Spark decode boundary uses directly —
    pandas columns of ndarray cells serialize to Arrow list<float>
    ~2-3x faster than columns of Python-list cells. Falls back to the
    list form when numpy is absent."""
    return _decode_gray_impl(buf, as_list=False)


def decode_gray(buf: bytes) -> tuple[int, int, list[float]]:
    """Decode band 1 of an uncompressed TIFF to
    (height, width, float pixels row-major)."""
    return _decode_gray_impl(buf, as_list=True)


def _decode_gray_impl(buf: bytes, as_list: bool):
    if len(buf) < 8:
        raise ValueError("not a TIFF: truncated header")
    bom = buf[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_offset = struct.unpack(f"{e}HI", buf[2:8])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")

    (n_entries,) = struct.unpack(f"{e}H", buf[ifd_offset : ifd_offset + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_offset + 2 + i * 12
        tag, typ, count = struct.unpack(f"{e}HHI", buf[off : off + 8])
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            raw = buf[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(f"{e}I", buf[off + 8 : off + 12])
            raw = buf[voff : voff + size]
        if typ == _TYPE_SHORT:
            vals = list(struct.unpack(f"{e}{count}H", raw))
        elif typ == _TYPE_LONG:
            vals = list(struct.unpack(f"{e}{count}I", raw))
        elif typ == _TYPE_DOUBLE:
            vals = list(struct.unpack(f"{e}{count}d", raw))
        else:
            continue  # types the gray decoder never needs
        tags[tag] = vals

    def one(tag: int, default: int | None = None) -> int:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return tags[tag][0]

    if one(_T_COMPRESSION, 1) != 1:
        raise ValueError("only uncompressed TIFF supported; install rasterio")
    width, height = one(_T_WIDTH), one(_T_HEIGHT)
    bits = one(_T_BITS, 8)
    sample_format = one(_T_SAMPLE_FORMAT, 1)
    samples = one(_T_SAMPLES_PER_PIXEL, 1)
    fmt = _FMT.get((sample_format, bits))
    if fmt is None:
        raise ValueError(f"unsupported sample format {sample_format}/{bits}-bit")

    offsets = tags[_T_STRIP_OFFSETS]
    counts = tags[_T_STRIP_BYTE_COUNTS]
    raw = b"".join(buf[o : o + c] for o, c in zip(offsets, counts))
    n = height * width * samples
    try:  # numpy fast path (~10x): C-speed buffer view
        import numpy as np

        dt = np.dtype(fmt).newbyteorder(e)
        values = np.frombuffer(raw, dtype=dt, count=n)
        if samples > 1:  # band 1 of pixel-interleaved data, like .read(1)
            values = values[::samples]
        arr = values.astype("float32")
        return height, width, (arr.tolist() if as_list else arr)
    except ImportError:  # pragma: no cover - numpy is a pyspark dep
        values = struct.unpack(f"{e}{n}{fmt}", raw[: n * struct.calcsize(fmt)])
        if samples > 1:
            values = values[::samples]
        return height, width, [float(v) for v in values]
