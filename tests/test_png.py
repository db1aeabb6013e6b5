"""Pure-Python PNG codec (dataops/png.py): exact round-trips over every
filter type and color mode, loud failures on corrupt inputs, and the
real-pixel feature path it unlocks (multimodal decoder='pixel' without
pillow)."""

from __future__ import annotations

import struct
import sys
import zlib
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.png import PngError, decode_png, encode_png


def _gradient(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return ((seed * 31 + y * 7 + x * 13) % 256).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_grayscale_roundtrip_every_filter(filter_type):
    px = _gradient(23, 37, seed=filter_type + 1)
    blob = encode_png(px, filter_type=filter_type)
    out = decode_png(blob)
    assert out.dtype == np.uint8 and out.shape == (23, 37)
    assert np.array_equal(out, px)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_rgb_roundtrip_every_filter(filter_type):
    rng = np.random.default_rng(42 + filter_type)
    px = rng.integers(0, 256, size=(17, 11, 3), dtype=np.uint8)
    out = decode_png(encode_png(px, filter_type=filter_type))
    assert out.shape == (17, 11, 3)
    assert np.array_equal(out, px)


def test_extreme_shapes():
    for shape in ((1, 1), (1, 64), (64, 1)):
        px = _gradient(*shape, seed=9)
        assert np.array_equal(decode_png(encode_png(px, filter_type=4)), px)


def test_multi_idat_streams_concatenate():
    # the spec allows IDAT split at arbitrary byte boundaries; rebuild
    # a single-IDAT encode into two chunks and decode must not care
    px = _gradient(9, 9, seed=3)
    blob = encode_png(px)
    sig, rest = blob[:8], blob[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (length,) = struct.unpack_from(">I", rest, pos)
        chunks.append((rest[pos + 4 : pos + 8], rest[pos + 8 : pos + 8 + length]))
        pos += 12 + length

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    rebuilt = sig
    for ctype, data in chunks:
        if ctype == b"IDAT":
            mid = len(data) // 2
            rebuilt += chunk(b"IDAT", data[:mid]) + chunk(b"IDAT", data[mid:])
        else:
            rebuilt += chunk(ctype, data)
    assert np.array_equal(decode_png(rebuilt), px)


def test_palette_decode():
    # hand-build a 2x3 palette image: indices 0..5 into a 6-color PLTE
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [1, 2, 3], [9, 9, 9], [200, 100, 50]], np.uint8)
    idx = np.array([[0, 1, 2], [3, 4, 5]], np.uint8)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, pal[idx])


def test_corruption_is_loud():
    px = _gradient(8, 8)
    blob = bytearray(encode_png(px))
    # flip a byte inside IDAT -> CRC mismatch, never a silent mis-decode
    idat_pos = bytes(blob).index(b"IDAT") + 10
    blob[idat_pos] ^= 0xFF
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(blob))
    with pytest.raises(PngError, match="signature"):
        decode_png(b"not a png at all")
    with pytest.raises(PngError):
        decode_png(encode_png(px)[:30])  # truncated
    # declared dims larger than the pixel data -> length check fires
    good = encode_png(px)
    hacked = bytearray(good)
    struct.pack_into(">I", hacked, 16, 999)  # IHDR width field
    # fix the IHDR CRC so the LENGTH check is what fires
    ihdr = bytes(hacked[12:29])
    struct.pack_into(">I", hacked, 29, zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(PngError, match="length|inflate"):
        decode_png(bytes(hacked))


def test_unsupported_features_rejected():
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    for depth, ctype_, interlace, msg in (
        (16, 0, 0, "bit depth"),
        (8, 7, 0, "color type"),
        (8, 0, 1, "interlaced"),
    ):
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth, ctype_, 0, 0, interlace))
        )
        with pytest.raises(PngError, match=msg):
            decode_png(blob)


def test_real_image_decode_uses_pure_codec_without_pillow():
    # the r10 gate change: PNG pixel decode works EVERYWHERE; only
    # non-PNG formats still need pillow
    from outboxx_spark.dataops.multimodal import real_image_decode, _pil_available

    px = _gradient(12, 20, seed=5)
    out = real_image_decode(encode_png(px, filter_type=2))
    assert np.array_equal(out, px)
    # RGB collapses through the ITU-R 601 luma (pillow's L formula)
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 0] = 255  # pure red -> L = 255*299/1000 = 76.245 -> 76
    lum = real_image_decode(encode_png(rgb))
    assert np.array_equal(lum, np.full((2, 2), 76, np.uint8))
    if not _pil_available():
        # r10 tail: baseline JPEG decodes through dataops/jpeg.py now,
        # so a malformed JPEG is LOUD (ValueError from the codec); the
        # pillow gate covers only formats with no pure codec (e.g. WebP)
        with pytest.raises(ValueError):
            real_image_decode(b"\xff\xd8\xff\xe0 fake jpeg")
        with pytest.raises(NotImplementedError, match="pillow"):
            real_image_decode(b"RIFF\x00\x00\x00\x00WEBP no pure codec here")


def test_pixel_band_stats_match_generating_formula(spark):
    # the mm_pixel_stats oracle's Spark half on a tiny frame: real PNGs
    # (every filter type via doc_id % 5) -> pure decode -> band means ==
    # arithmetic means of the generating formula
    from outboxx_spark.dataops.multimodal import (
        FEATURE_DIM,
        PNG_DIM_MOD,
        pixel_band_stats,
    )

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    got = {
        (r["doc_id"], r["dim"]): r["value"]
        for r in pixel_band_stats(docs).collect()
    }
    for d in range(10):
        w = 16 + d % PNG_DIM_MOD
        h = 16 + d * 3 % PNG_DIM_MOD
        y, x = np.mgrid[0:h, 0:w]
        flat = ((d * 31 + y * 7 + x * 13) % 256).astype(np.float64).reshape(-1)
        for dim, band in enumerate(np.array_split(flat, FEATURE_DIM)):
            assert got[(d, dim)] == band.mean(), (d, dim)
