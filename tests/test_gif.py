"""GIF LZW codec + BMP decode (dataops/gif.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from outboxx_spark.dataops.gif import (
    _lzw_compress,
    _lzw_decompress,
    decode_bmp,
    decode_gif,
    encode_bmp_gray,
    encode_gif_gray,
)


def _grad(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return ((seed * 31 + y * 7 + x * 13) % 256).astype(np.uint8)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (33, 47), (64, 64)])
def test_gif_roundtrip(shape, interlace):
    px = _grad(*shape, seed=shape[0])
    out = decode_gif(encode_gif_gray(px, interlace=interlace))
    assert out.shape == shape + (3,)
    assert (out[..., 0] == px).all() and (out[..., 2] == px).all()


def test_lzw_table_reset_path():
    # enough distinct runs to overflow the 12-bit code space and force
    # the encoder's clear-code reset; decode must resync
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(80, 80)).astype(np.uint8)
    out = decode_gif(encode_gif_gray(px))
    assert (out[..., 0] == px).all()


def test_lzw_kwkwk_case():
    # the classic LZW corner: code == next_code (entry being defined)
    idx = np.array([1, 1, 1, 1, 1, 1], dtype=np.uint8)
    data = _lzw_compress(idx, 2)
    assert (_lzw_decompress(data, 2, 6) == idx).all()


def test_lzw_truncation_and_overflow_are_loud():
    idx = np.arange(64, dtype=np.uint8) % 4
    data = _lzw_compress(idx, 2)
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decompress(data[:2], 2, 64)
    with pytest.raises(ValueError, match="pixel count|more pixels"):
        _lzw_decompress(data, 2, 63)


# the encoder's image descriptor sits at a FIXED offset: 13-byte
# header + 768-byte global color table (searching for the 0x2C byte
# would false-match palette entry 44)
_IMG_AT = 13 + 768


def test_extension_blocks_are_skipped():
    px = _grad(9, 9)
    blob = encode_gif_gray(px)
    assert blob[_IMG_AT] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = blob[:_IMG_AT] + gce + blob[_IMG_AT:]
    assert (decode_gif(patched)[..., 0] == px).all()


def test_gif_failures_are_loud():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG?")
    px = _grad(4, 4)
    blob = encode_gif_gray(px)
    assert blob[_IMG_AT] == 0x2C
    with pytest.raises(ValueError, match="unknown GIF block"):
        decode_gif(blob[:_IMG_AT] + b"\x7f")
    # trailer with no image
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(blob[:_IMG_AT] + b"\x3b")


@pytest.mark.parametrize("shape", [(1, 1), (5, 7), (13, 9)])
def test_bmp_roundtrip(shape):
    px = _grad(*shape, seed=3)
    out = decode_bmp(encode_bmp_gray(px))
    assert out.shape == shape + (3,)
    assert (out[..., 1] == px).all()


def test_bmp_24bit_and_topdown():
    # hand-build a 24-bit top-down 2x2: rows NOT flipped
    pxs = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]
    stride = (3 * 2 + 3) & ~3
    body = bytearray()
    for y in range(2):
        row = b""
        for x in range(2):
            r, g, b = pxs[y * 2 + x]
            row += bytes([b, g, r])  # BGR on disk
        body += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    head = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(body), 0, 0, 0, 0)
    out = decode_bmp(head + info + bytes(body))
    assert out.shape == (2, 2, 3)
    assert tuple(out[0, 0]) == (10, 20, 30)
    assert tuple(out[1, 1]) == (200, 210, 220)


def test_bmp_failures_are_loud():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"nope")
    blob = bytearray(encode_bmp_gray(_grad(4, 4)))
    struct.pack_into("<I", blob, 30, 1)  # compression = RLE8
    with pytest.raises(ValueError, match="compressed"):
        decode_bmp(bytes(blob))
    blob = bytearray(encode_bmp_gray(_grad(4, 4)))
    struct.pack_into("<H", blob, 28, 4)  # bpp = 4
    with pytest.raises(ValueError, match="4-bit"):
        decode_bmp(bytes(blob))


def test_real_image_decode_routes_gif_and_bmp():
    from outboxx_spark.dataops.multimodal import real_image_decode

    px = _grad(12, 10, seed=8)
    # identity grayscale palette -> luma == index == pixel
    assert (real_image_decode(encode_gif_gray(px)) == px).all()
    assert (real_image_decode(encode_bmp_gray(px)) == px).all()


# ---------------------------------------------------------------------------
# animated GIF (the video container)
# ---------------------------------------------------------------------------


def test_animated_gif_roundtrips_every_frame():
    from outboxx_spark.dataops.gif import decode_gif_frames, encode_gif_frames

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, size=(13, 17)).astype(np.uint8) for _ in range(5)]
    out = decode_gif_frames(encode_gif_frames(frames))
    assert len(out) == 5
    assert all((o[..., 0] == f).all() for o, f in zip(out, frames))


def test_first_frame_decode_skips_netscape_extension():
    from outboxx_spark.dataops.gif import decode_gif, encode_gif_frames

    frames = [_grad(6, 6, seed=i) for i in range(3)]
    blob = encode_gif_frames(frames)
    assert (decode_gif(blob)[..., 0] == frames[0]).all()


def test_subregion_frames_fail_stop():
    import struct as _s

    from outboxx_spark.dataops.gif import decode_gif_frames, encode_gif_frames

    frames = [_grad(8, 8, seed=2)] * 2
    blob = bytearray(encode_gif_frames(frames))
    # locate the SECOND image descriptor via its preceding GCE (a bare
    # 0x2C search could false-match LZW data bytes)
    import re

    gces = [m.start() for m in re.finditer(b"\x21\xf9", bytes(blob))]
    assert len(gces) == 2
    desc = gces[1] + 8  # GCE is 8 bytes: 21 F9 04 .. .. .. .. 00
    assert blob[desc] == 0x2C
    blob[desc + 1 : desc + 3] = _s.pack("<H", 1)
    with pytest.raises(ValueError, match="sub-region"):
        decode_gif_frames(bytes(blob))
