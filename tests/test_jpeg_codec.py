"""decode_image against the format media corpora actually ship
(r11 VERDICT missing #3): baseline JPEG through
multimodal/jpegcodec.py — real JFIF marker structure, Huffman entropy
coding, dequant + IDCT, 4:2:0/4:4:4 sampling, restart markers.

Independence discipline (the test_png_codec fixtures-by-hand rule,
adapted): the encoder half shares spec CONSTANT tables with the
decoder, so two checks pin the decoder against the SPEC rather than
the shared code — a bitstream assembled BY HAND here (custom Huffman
tables, known DC coefficient, closed-form expected pixels) and an
IDCT cross-check against an independent NumPy matrix implementation.
The round-trip tests then cover the full marker/entropy/sampling
machinery end to end."""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sentinel_landsat_database_creation_spark.multimodal.jpegcodec import (
    _idct_block,
    decode_jpeg,
    encode_jpeg_color,
    encode_jpeg_gray,
    jpeg_decode_resize,
)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _hand_built_dc_only(dc_value: int = 5) -> bytes:
    """A spec-level 8x8 grayscale JPEG assembled by hand: all-ones
    quant table, custom one-entry Huffman tables (DC: the 1-bit code 0
    means category 3; AC: the 1-bit code 0 means EOB), entropy data
    '0 101 0' + fill bits = 0x57 for dc_value=5. DC-only IDCT is the
    closed form pixel = round(F0 / 8) + 128, flat across the block."""
    assert dc_value == 5, "entropy bytes below encode exactly 5"
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id0, all ones
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dc_bits = [1] + [0] * 15  # one code of length 1 -> category 3
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes([3]))
    ac_bits = [1] + [0] * 15  # one code of length 1 -> EOB
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x00]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes([0x57])  # 0=DC huff, 101=+5, 0=EOB, 111=fill
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_dc_only_block():
    h, w, rows = decode_jpeg(_hand_built_dc_only())
    assert (h, w) == (8, 8)
    want = round(5 / 8) + 128  # 129
    assert all(all(p == want for p in row) for row in rows)


def test_idct_matches_numpy_reference():
    """_idct_block vs an independent NumPy matrix IDCT (the textbook
    orthonormal DCT-III), random coefficient blocks."""
    n = np.arange(8)
    basis = np.cos((2 * n[:, None] + 1) * n[None, :] * np.pi / 16)
    c = np.full(8, 1.0)
    c[0] = 1 / np.sqrt(2)
    rng = np.random.default_rng(3)
    for _ in range(5):
        coefs = rng.integers(-200, 200, 64).astype(float)
        f = coefs.reshape(8, 8)
        spatial = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                spatial[y, x] = 0.25 * np.sum(
                    c[:, None] * c[None, :] * f
                    * basis[x][None, :] * basis[y][:, None]
                )
        want = np.clip(np.round(spatial) + 128, 0, 255).astype(int)
        got = np.array(_idct_block([int(v) for v in coefs])).reshape(8, 8)
        assert np.array_equal(got, want)


def test_gray_roundtrip_smooth_gradient():
    h, w = 24, 40
    rows = [
        bytearray(min(255, x * 3 + y * 2) for x in range(w))
        for y in range(h)
    ]
    hh, ww, dec = decode_jpeg(encode_jpeg_gray(rows, quality=90))
    assert (hh, ww) == (h, w)
    err = max(
        abs(dec[y][x] - rows[y][x]) for y in range(h) for x in range(w)
    )
    assert err <= 2  # smooth content at q90: quantization error only


def test_restart_markers_and_odd_dimensions():
    """DRI/RSTn path: byte alignment + DC predictor reset must decode
    pixel-identically to the no-restart stream, on non-multiple-of-8
    dimensions (edge-block replication both sides)."""
    h, w = 25, 41
    rows = [
        bytearray((x * 6 + y * 4) % 256 for x in range(w)) for y in range(h)
    ]
    _, _, plain = decode_jpeg(encode_jpeg_gray(rows, quality=90))
    hh, ww, rst = decode_jpeg(
        encode_jpeg_gray(rows, quality=90, restart_interval=3)
    )
    assert (hh, ww) == (h, w)
    assert [bytes(r) for r in rst] == [bytes(r) for r in plain]


@pytest.mark.parametrize("subsample", [True, False])
def test_color_luma_fidelity(subsample):
    """YCbCr 4:2:0 and 4:4:4: decoded grayscale is the Y channel, so
    it must track BT.601 luma of the source RGB within quantization
    error. A mis-decoded CHROMA block desyncs the bitstream and
    garbles later Y blocks, so this bound covers the chroma entropy
    path too."""
    h, w = 24, 40
    rgb = [
        [(min(255, x * 5), min(255, y * 7), 128) for x in range(w)]
        for y in range(h)
    ]
    hh, ww, dec = decode_jpeg(
        encode_jpeg_color(rgb, quality=90, subsample=subsample)
    )
    assert (hh, ww) == (h, w)
    for y in range(h):
        for x in range(w):
            r, g, b = rgb[y][x]
            luma = 0.299 * r + 0.587 * g + 0.114 * b
            assert abs(dec[y][x] - luma) <= 3


def test_resize_contract():
    h, w = 16, 12
    rows = [
        bytearray(min(255, x * 9 + y * 5) for x in range(w))
        for y in range(h)
    ]
    payload = encode_jpeg_gray(rows, quality=95)
    _, _, dec = decode_jpeg(payload)
    out = jpeg_decode_resize(payload, 6, 4)
    want = [
        dec[i * h // 4][j * w // 6] / 255.0 for i in range(4) for j in range(6)
    ]
    assert out == want


def test_rejections():
    rows = [bytearray(range(16)) for _ in range(16)]
    good = encode_jpeg_gray(rows, quality=80)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"NOTAJPEG" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[:40])
    # progressive: flip SOF0 -> SOF2
    prog = bytearray(good)
    prog[good.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(prog))
    # 16-bit quant table: set DQT precision nibble
    deep = bytearray(good)
    deep[good.index(b"\xff\xdb") + 4] |= 0x10
    with pytest.raises(ValueError, match="quant"):
        decode_jpeg(bytes(deep))
    # EOI with no scan
    with pytest.raises(ValueError, match="scan|SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_decode_image_end_to_end_with_real_jpegs(spark):
    """The decode_image seam over REAL JPEG payloads through
    mapInPandas: gray, 4:2:0 and 4:4:4 color decode to the
    independently-computed thumbnails; corrupt payloads (truncated
    entropy data, progressive marker, not-a-jpeg) are skipped
    row-wise, exactly like the PNG end-to-end pin."""
    from sentinel_landsat_database_creation_spark.multimodal.media import (
        decode_image,
    )

    h, w = 20, 28
    gray = encode_jpeg_gray(
        [bytearray(min(255, x * 4 + y * 6) for x in range(w)) for y in range(h)],
        quality=85,
    )
    rgb = [
        [(min(255, x * 8), 90, min(255, y * 9)) for x in range(w)]
        for y in range(h)
    ]
    c420 = encode_jpeg_color(rgb, quality=85, subsample=True)
    c444 = encode_jpeg_color(rgb, quality=85, subsample=False)
    prog = bytearray(gray)
    prog[gray.index(b"\xff\xc0") + 1] = 0xC2
    payloads = {
        1: gray,
        2: c420,
        3: c444,
        4: gray[: len(gray) // 2],  # truncated entropy data
        5: bytes(prog),  # progressive
        6: b"not a jpeg at all",
    }
    media = spark.createDataFrame(
        [(k, "image", bytearray(v)) for k, v in payloads.items()],
        "media_id long, kind string, payload binary",
    )
    out = decode_image(media, width=4, height=4, decoder=jpeg_decode_resize)
    rows = {r["media_id"]: r for r in out.collect()}
    assert sorted(rows) == [1, 2, 3]
    for k in (1, 2, 3):
        want = jpeg_decode_resize(payloads[k], 4, 4)
        assert rows[k]["pixels"] == want
        assert all(0.0 <= p <= 1.0 for p in rows[k]["pixels"])


def test_fill_bytes_before_marker():
    """T.81 B.1.1.2 optional fill bytes: any number of 0xFF bytes may
    pad before a marker byte. A padded stream must decode identically
    to the unpadded one (r12 ADVICE: the marker loop used to read the
    segment length from the wrong offset)."""
    clean = _hand_built_dc_only()
    h0, w0, rows0 = decode_jpeg(clean)
    # pad before the DQT marker (right after SOI) and before SOS
    padded = bytearray(clean)
    sos = bytes(padded).index(b"\xff\xda")
    padded[sos:sos] = b"\xff\xff\xff"
    padded[2:2] = b"\xff"
    h1, w1, rows1 = decode_jpeg(bytes(padded))
    assert (h0, w0) == (h1, w1)
    assert [bytes(r) for r in rows0] == [bytes(r) for r in rows1]
