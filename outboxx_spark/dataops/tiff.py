"""Pure-Python baseline TIFF decode — the remaining sniffable-format
gap after PNG/JPEG/GIF/BMP/WAV.

Scope: classic TIFF 6.0 baseline, uncompressed (Compression=1) or
PackBits (Compression=32773), 8-bit grayscale / RGB / palette-color,
strip-organized, either byte order, first IFD only. That covers what
scanners and scientific pipelines emit as "plain TIFF"; LZW/JPEG-in-
TIFF, tiles, and planar configuration 2 fail-stop with distinct
messages (the pgoutput skip-vs-fail discipline — unknown TAGS are
skipped, unsupported STRUCTURE is loud).

PackBits is the one algorithm here: the byte-oriented RLE from the
TIFF spec (n >= 0: copy n+1 literals; n in [-127, -1]: repeat next
byte 1-n times; -128: noop) — exact, so formula corpora certify the
full path like the GIF/PNG lossless mirrors.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_PLANAR = 284
_TAG_COLORMAP = 320
_TAG_TILE_OFFSETS = 324

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while len(out) < expected and pos < n:
        ctl = data[pos]
        pos += 1
        if ctl < 128:  # copy ctl+1 literal bytes
            if pos + ctl + 1 > n:
                raise ValueError("PackBits literal run truncated")
            out += data[pos : pos + ctl + 1]
            pos += ctl + 1
        elif ctl == 128:  # noop
            continue
        else:  # repeat next byte 257-ctl times
            if pos >= n:
                raise ValueError("PackBits repeat run truncated")
            out += bytes([data[pos]]) * (257 - ctl)
            pos += 1
    if len(out) != expected:
        raise ValueError(
            f"PackBits output {len(out)} bytes != expected {expected}"
        )
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Spec-shaped PackBits: greedy runs of >= 3 repeats, literals
    otherwise, both capped at 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def _read_ifd(blob: bytes, le: bool):
    u16 = "<H" if le else ">H"
    u32 = "<I" if le else ">I"
    ifd_off = struct.unpack(u32, blob[4:8])[0]
    n_entries = struct.unpack(u16, blob[ifd_off : ifd_off + 2])[0]
    tags = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ = struct.unpack(("<" if le else ">") + "HH", blob[e : e + 4])
        count = struct.unpack(u32, blob[e + 4 : e + 8])[0]
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            raw = blob[e + 8 : e + 8 + size]
        else:
            off = struct.unpack(u32, blob[e + 8 : e + 12])[0]
            raw = blob[off : off + size]
        if typ == 3:
            vals = list(struct.unpack(("<" if le else ">") + "H" * count, raw))
        elif typ == 4:
            vals = list(struct.unpack(("<" if le else ">") + "I" * count, raw))
        elif typ == 1:
            vals = list(raw)
        else:
            vals = [raw]
        tags[tag] = vals
    return tags


def parse_tiff_meta(blob: bytes) -> tuple[int, int] | None:
    """(width, height) from the first IFD, None for non-TIFF blobs."""
    if blob[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    try:
        tags = _read_ifd(blob, blob[:2] == b"II")
        return int(tags[_TAG_WIDTH][0]), int(tags[_TAG_HEIGHT][0])
    except Exception:
        return None


def decode_tiff(blob: bytes) -> np.ndarray:
    """Decode a baseline TIFF: (H, W) uint8 grayscale or (H, W, 3)
    RGB. Palette-color resolves through its 16-bit colormap (top byte,
    per the universal writer convention of v << 8 | v)."""
    if blob[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF")
    le = blob[:2] == b"II"
    try:
        tags = _read_ifd(blob, le)
        tags[_TAG_WIDTH], tags[_TAG_HEIGHT], tags[_TAG_STRIP_OFFSETS]
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed TIFF IFD: {type(e).__name__}") from e
    if _TAG_TILE_OFFSETS in tags:
        raise ValueError("tiled TIFF unsupported (strips only)")
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp not in (1, 32773):
        raise ValueError(
            f"TIFF compression {comp} unsupported (uncompressed/PackBits only)"
        )
    if tags.get(_TAG_PLANAR, [1])[0] != 1:
        raise ValueError("planar configuration 2 unsupported")
    spp = tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    if any(b != 8 for b in bits[:spp]):
        raise ValueError("only 8 bits/sample supported")
    w = int(tags[_TAG_WIDTH][0])
    h = int(tags[_TAG_HEIGHT][0])
    if not w or not h:
        raise ValueError("bad TIFF dimensions")
    rows_per_strip = int(tags.get(_TAG_ROWS_PER_STRIP, [h])[0])
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags.get(_TAG_STRIP_BYTE_COUNTS)
    if counts is None or len(counts) != len(offsets):
        raise ValueError("strip byte counts missing or inconsistent")
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        seg = blob[off : off + cnt]
        if len(seg) != cnt:
            raise ValueError("strip data truncated")
        rows = min(rows_per_strip, h - si * rows_per_strip)
        if rows <= 0:
            raise ValueError("more strips than rows")
        expected = rows * w * spp
        raw += packbits_decode(seg, expected) if comp == 32773 else seg
        if comp == 1 and len(seg) != expected:
            raise ValueError("uncompressed strip length mismatch")
    arr = np.frombuffer(bytes(raw), np.uint8)
    if arr.size != h * w * spp:
        raise ValueError("pixel data size mismatch")
    photometric = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    if spp == 1 and photometric == 3:  # palette-color
        cmap = tags.get(_TAG_COLORMAP)
        if not cmap:
            raise ValueError("palette TIFF without a colormap")
        cm = np.array(cmap, dtype=np.uint32)
        if cm.size % 3:
            raise ValueError("colormap length not divisible by 3")
        n = cm.size // 3
        pal = (cm.reshape(3, n).T >> 8).astype(np.uint8)
        idx = arr.reshape(h, w)
        if idx.max() >= n:
            raise ValueError("pixel index outside the colormap")
        return pal[idx]
    if spp == 1:
        px = arr.reshape(h, w)
        if photometric == 0:  # WhiteIsZero: invert to the universal sense
            px = (255 - px.astype(np.int16)).astype(np.uint8)
        return px
    if spp == 3:
        return arr.reshape(h, w, 3)
    raise ValueError(f"{spp} samples/pixel unsupported (1 or 3)")


def encode_tiff_gray(px: np.ndarray, packbits: bool = False) -> bytes:
    """Minimal single-strip little-endian writer for the decoder's
    round-trip tests and the certification corpus."""
    if px.ndim != 2:
        raise ValueError("grayscale 2-D array required")
    h, w = px.shape
    if not h or not w:
        raise ValueError("empty image")
    data = px.tobytes()
    if packbits:
        data = packbits_encode(data)
    entries = [
        (_TAG_WIDTH, 3, 1, w),
        (_TAG_HEIGHT, 3, 1, h),
        (_TAG_BITS, 3, 1, 8),
        (_TAG_COMPRESSION, 3, 1, 32773 if packbits else 1),
        (_TAG_PHOTOMETRIC, 3, 1, 1),
        (_TAG_STRIP_OFFSETS, 4, 1, 0),  # patched below
        (_TAG_SAMPLES_PER_PIXEL, 3, 1, 1),
        (_TAG_ROWS_PER_STRIP, 3, 1, h),
        (_TAG_STRIP_BYTE_COUNTS, 4, 1, len(data)),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        if tag == _TAG_STRIP_OFFSETS:
            val = data_off
        out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)  # no next IFD
    out += data
    return bytes(out)
