"""Baseline TIFF decode + PackBits codec (dataops/tiff.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from outboxx_spark.dataops.tiff import (
    decode_tiff,
    encode_tiff_gray,
    packbits_decode,
    packbits_encode,
    parse_tiff_meta,
)


def _grad(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return ((seed * 31 + y * 7 + x * 13) % 256).astype(np.uint8)


@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (33, 47)])
def test_tiff_roundtrip(shape, packbits):
    px = _grad(*shape, seed=shape[1])
    out = decode_tiff(encode_tiff_gray(px, packbits=packbits))
    assert (out == px).all()


def test_packbits_spec_cases():
    # literals, repeats >= 3, the 128 noop byte, run caps
    assert packbits_decode(packbits_encode(b"abc"), 3) == b"abc"
    assert packbits_decode(packbits_encode(b"a" * 300), 300) == b"a" * 300
    assert packbits_decode(b"\x80" + packbits_encode(b"xy"), 2) == b"xy"
    worst = bytes(range(256)) * 2
    assert packbits_decode(packbits_encode(worst), len(worst)) == worst
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\x05ab", 6)
    with pytest.raises(ValueError, match="expected"):
        packbits_decode(packbits_encode(b"abcd"), 5)


def test_big_endian_and_multi_strip():
    # hand-build a big-endian 2-strip grayscale 4x4
    px = _grad(4, 4, seed=9)
    strips = [px[:2].tobytes(), px[2:].tobytes()]

    def be(fmt, *v):
        return struct.pack(">" + fmt, *v)

    entries = []
    ifd_off = 8
    n_e = 9
    data_off = ifd_off + 2 + 12 * n_e + 4
    off_extra = data_off + 16  # strip offset/count arrays live here
    entries = [
        (256, 3, 1, 4 << 16),
        (257, 3, 1, 4 << 16),
        (258, 3, 1, 8 << 16),
        (259, 3, 1, 1 << 16),
        (262, 3, 1, 1 << 16),
        (273, 4, 2, off_extra),
        (277, 3, 1, 1 << 16),
        (278, 3, 1, 2 << 16),
        (279, 4, 2, off_extra + 8),
    ]
    out = bytearray(b"MM\x00*" + be("I", ifd_off) + be("H", n_e))
    for tag, typ, count, val in entries:
        out += be("HHII", tag, typ, count, val)
    out += be("I", 0)
    out += strips[0] + strips[1]
    out += be("II", data_off, data_off + 8)  # strip offsets
    out += be("II", 8, 8)  # strip byte counts
    got = decode_tiff(bytes(out))
    assert (got == px).all()
    assert parse_tiff_meta(bytes(out)) == (4, 4)


def test_white_is_zero_inverts():
    px = _grad(3, 3, seed=1)
    blob = bytearray(encode_tiff_gray(px))
    # photometric tag value word: entry 5 of the IFD (0-indexed 4)
    # layout: 8 header + 2 count + 4*12 + 8 (tag,typ,count) = value at
    # offset 8+2+4*12+8 = 66
    assert struct.unpack("<H", blob[66:68])[0] == 1
    blob[66:68] = struct.pack("<H", 0)
    out = decode_tiff(bytes(blob))
    assert (out == 255 - px).all()


def test_unsupported_structures_fail_stop():
    px = _grad(4, 4)
    blob = bytearray(encode_tiff_gray(px))
    comp_val_at = 8 + 2 + 3 * 12 + 8
    assert struct.unpack("<H", blob[comp_val_at : comp_val_at + 2])[0] == 1
    blob[comp_val_at : comp_val_at + 2] = struct.pack("<H", 5)  # LZW
    with pytest.raises(ValueError, match="compression 5"):
        decode_tiff(bytes(blob))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"nope")
    with pytest.raises(ValueError, match="malformed"):
        decode_tiff(b"II*\x00 then garbage")


def test_sniffer_and_real_decode_route_tiff():
    from outboxx_spark.dataops.multimodal import (
        parse_image_dims,
        real_image_decode,
    )

    px = _grad(6, 8, seed=3)
    blob = encode_tiff_gray(px, packbits=True)
    assert parse_image_dims(blob) == ("image/tiff", 8, 6)
    assert (real_image_decode(blob) == px).all()
