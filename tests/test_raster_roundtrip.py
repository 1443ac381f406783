"""Ops 4/8 executable round-trip: pure-Python GeoTIFF encode -> real
binaryFile scan -> real mapInPandas decode, plus the rasterio branch of
decode_tiff_bytes executed against an in-memory fake reader (VERDICT r1
item 4: untested code is unverified code)."""

from __future__ import annotations

import io
import struct

import pytest

from sentinel_landsat_database_creation_spark.sources import raster, tiffcodec


def test_codec_roundtrip_float32_with_geotags():
    px = [i * 0.5 - 3.0 for i in range(20)]
    buf = tiffcodec.encode_gray(
        4, 5, px, origin=(500010.0, 4600020.0), pixel_size=(30.0, 30.0)
    )
    assert buf[:4] == b"II\x2a\x00"
    h, w, out = tiffcodec.decode_gray(buf)
    assert (h, w) == (4, 5)
    assert out == px  # float32-exact values stay exact


def test_codec_rejects_unsupported_codec_and_garbage():
    with pytest.raises(ValueError, match="byte-order"):
        tiffcodec.decode_gray(b"PK\x03\x04junkjunk")
    buf = bytearray(tiffcodec.encode_gray(1, 2, [1.0, 2.0]))
    # flip the Compression tag (259) value to 7 (JPEG — a codec the
    # fallback will never carry; Deflate/LZW decode natively since r6)
    n = struct.unpack_from("<H", buf, 8)[0]
    for i in range(n):
        off = 10 + i * 12
        if struct.unpack_from("<H", buf, off)[0] == 259:
            struct.pack_into("<I", buf, off + 8, 7)
    with pytest.raises(ValueError, match="unsupported TIFF compression"):
        tiffcodec.decode_gray(bytes(buf))


def test_codec_reads_foreign_layout_bigendian_uint16():
    """A TIFF this codec didn't write: MM byte order, uint16, two
    strips — the Landsat-native DN layout."""
    h, w, vals = 2, 3, [100, 200, 300, 400, 500, 600]
    strips = [struct.pack(">3H", *vals[:3]), struct.pack(">3H", *vals[3:])]
    entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 16 << 16),
        (259, 3, 1, 1 << 16),
        (262, 3, 1, 1 << 16),
        (277, 3, 1, 1 << 16),
        (278, 4, 1, 1),  # one row per strip
    ]
    n = len(entries) + 3  # + offsets, bytecounts, and their arrays fit inline? no:
    # strip offsets/counts are 2-element LONG arrays -> out of line
    ifd_size = 2 + (len(entries) + 2) * 12 + 4
    arr_off = 8 + ifd_size
    data_off = arr_off + 16
    entries.append((273, 4, 2, arr_off))
    entries.append((279, 4, 2, arr_off + 8))
    entries.sort()
    out = [struct.pack(">2sHI", b"MM", 42, 8), struct.pack(">H", len(entries))]
    for t, ty, c, v in entries:
        out.append(struct.pack(">HHII", t, ty, c, v))
    out.append(struct.pack(">I", 0))
    out.append(struct.pack(">2I", data_off, data_off + 6))  # strip offsets
    out.append(struct.pack(">2I", 6, 6))  # strip byte counts
    out.extend(strips)
    got = tiffcodec.decode_gray(b"".join(out))
    assert got == (h, w, [float(v) for v in vals])


def test_encode_decode_through_spark_plumbing(spark, tmp_path):
    """The real op-8 sink then the real op-4 source, end-to-end on the
    actual mapInPandas/binaryFile plumbing — no rasterio, no fakes."""
    import pandas as pd

    rows = [
        ("sceneA", "B2", 3, 4, [float(i) for i in range(12)]),
        ("sceneA", "B3", 3, 4, [float(i) * 2 for i in range(12)]),
        ("sceneB", "B2", 2, 2, [9.0, 8.0, 7.0, 6.0]),
    ]
    rasters = spark.createDataFrame(
        rows, "scene string, band string, height int, width int, pixels array<float>"
    )
    out_dir = str(tmp_path / "tifs")
    written = raster.encode_rasters(
        rasters, out_dir, origin=(0.0, 0.0), pixel_size=(10.0, 10.0)
    ).collect()
    assert len(written) == 3 and all(r["n_bytes"] > 0 for r in written)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tif")
        .load(out_dir)
        .select(
            raster.F.regexp_extract("path", r"([^/]+)_[^_]+\.tif$", 1).alias("scene"),
            raster.F.regexp_extract("path", r"_([^_]+)\.tif$", 1).alias("band"),
            "content",
        )
    )
    decoded = raster.decode_rasters(files)
    got = {
        (r["scene"], r["band"]): (r["height"], r["width"], list(r["pixels"]))
        for r in decoded.collect()
    }
    want = {(s, b): (h, w, px) for s, b, h, w, px in rows}
    assert got == want


def test_decode_tiff_bytes_rasterio_branch(monkeypatch):
    """Execute the REAL rasterio code path (open(BytesIO) -> read(1) ->
    float32 -> ravel) against an in-memory fake module — verifies the
    branch this container can never hit natively."""
    import numpy as np

    class _Src:
        def __init__(self, fileobj):
            assert isinstance(fileobj, io.BytesIO)
            self._payload = fileobj.read()

        def read(self, band):
            assert band == 1
            n = len(self._payload)
            return np.arange(2 * n, dtype="float64").reshape(2, n)

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class _FakeRasterio:
        @staticmethod
        def open(fileobj):
            return _Src(fileobj)

    monkeypatch.setattr(raster, "rasterio", _FakeRasterio)
    monkeypatch.setattr(raster, "HAVE_RASTERIO", True)
    h, w, px = raster.decode_tiff_bytes(b"abc")
    assert (h, w) == (2, 3)
    # Arrow-friendly ndarray form (see decode_tiff_bytes docstring)
    assert list(px) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    assert px.dtype == np.float32
