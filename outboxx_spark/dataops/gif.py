"""Pure-Python GIF codec (LZW) + uncompressed BMP decode — the last
two sniffable image formats without a real decode path.

With these, every format ``parse_image_dims`` recognizes (PNG, JPEG,
GIF, BMP) decodes through a from-scratch codec; the pillow gate in
``real_image_decode`` shrinks to progressive/chroma-subsampled JPEG
only. GIF and BMP are LOSSLESS, so certification needs no DC-only
trick: formula pixels round-trip bit-exactly.

GIF scope: 87a/89a, global or local color table, interlaced or
sequential rows, extension blocks skipped by their sub-block chain
(the pgoutput skip-vs-fail rule); animation (multiple image
descriptors) decodes its FIRST frame, matching what a thumbnailer
wants. The LZW implementation is the real variable-width algorithm
(9->12 bit codes, clear/EOI, deferred-clear tolerated on decode,
table reset emitted by the encoder at 4096).

BMP scope: BITMAPINFOHEADER, uncompressed, 8-bit palette or 24-bit
BGR, bottom-up or top-down, 4-byte row padding.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable width 3..12)
# ---------------------------------------------------------------------------


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    run = b""
    for v in indices.tolist():
        nxt = run + bytes([v])
        if nxt in table:
            run = nxt
            continue
        emit(table[run], width)
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
        run = bytes([v])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first LZW code not in initial table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        # GIF width growth: the code AFTER the one that fills the table
        # uses the next width (deferred growth); cap at 12 bits
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) > n_expected:
            raise ValueError("LZW produced more pixels than the descriptor")
    if len(out) != n_expected:
        raise ValueError(
            f"LZW pixel count {len(out)} != descriptor {n_expected}"
        )
    return np.frombuffer(bytes(out), np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


# ---------------------------------------------------------------------------
# GIF encode / decode
# ---------------------------------------------------------------------------


def encode_gif_gray(px: np.ndarray, interlace: bool = False) -> bytes:
    """Encode a uint8 grayscale array as GIF89a with the identity
    256-entry grayscale palette (palette[i] = (i, i, i)), so decoded
    indices ARE intensities — lossless."""
    if px.ndim != 2:
        raise ValueError("grayscale 2-D array required")
    h, w = px.shape
    if not h or not w:
        raise ValueError("empty image")
    out = bytearray(b"GIF89a")
    # logical screen: GCT present, 8 bits/channel, GCT size 256
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):
        out += bytes([i, i, i])
    flags = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
    rows = px[_interlace_order(h)] if interlace else px
    data = _lzw_compress(rows.reshape(-1), 8)
    out.append(8)  # LZW minimum code size
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(blob: bytes) -> np.ndarray:
    """Decode the first frame of a GIF to (H, W, 3) RGB uint8."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(blob):
        b = blob[pos]
        if b == 0x3B:  # trailer
            raise ValueError("GIF has no image data")
        if b == 0x21:  # extension: label + sub-block chain
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", blob[pos + 1 : pos + 10])
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(blob[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without any color table")
        min_code = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos] != 0:
            ln = blob[pos]
            data += blob[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decompress(bytes(data), min_code, w * h).reshape(h, w)
        if iflags & 0x40:
            de = np.empty_like(idx)
            de[_interlace_order(h)] = idx
            idx = de
        if idx.max() >= len(ct):
            raise ValueError("pixel index outside the color table")
        return ct[idx]
    raise ValueError("GIF truncated before trailer")


# ---------------------------------------------------------------------------
# BMP decode (+ a test-side encoder)
# ---------------------------------------------------------------------------


def encode_bmp_gray(px: np.ndarray) -> bytes:
    """8-bit palette BMP (grayscale identity palette), bottom-up."""
    if px.ndim != 2:
        raise ValueError("grayscale 2-D array required")
    h, w = px.shape
    stride = (w + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y].tobytes()
        body += row + b"\x00" * (stride - w)
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
    off = 14 + 40 + len(palette)
    head = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 256, 0)
    return head + info + palette + bytes(body)


def decode_bmp(blob: bytes) -> np.ndarray:
    """Decode an uncompressed BITMAPINFOHEADER BMP: 8-bit palette ->
    (H, W, 3) via its palette, 24-bit BGR -> (H, W, 3) RGB. Bottom-up
    (positive height) and top-down rows both handled."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", blob[10:14])[0]
    hsize = struct.unpack("<I", blob[14:18])[0]
    if hsize < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    w, h = struct.unpack("<ii", blob[18:26])
    planes, bpp = struct.unpack("<HH", blob[26:30])
    comp = struct.unpack("<I", blob[30:34])[0]
    if comp != 0:
        raise ValueError("compressed BMP unsupported")
    if bpp not in (8, 24):
        raise ValueError(f"{bpp}-bit BMP unsupported (8/24 only)")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    if bpp == 8:
        n_colors = struct.unpack("<I", blob[46:50])[0] or 256
        pal_off = 14 + hsize
        pal = np.frombuffer(
            blob[pal_off : pal_off + 4 * n_colors], np.uint8
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        stride = (w + 3) & ~3
        rows = []
        for y in range(h):
            start = data_off + y * stride
            rows.append(np.frombuffer(blob[start : start + w], np.uint8))
        idx = np.stack(rows)
        if idx.max() >= len(pal):
            raise ValueError("pixel index outside the palette")
        out = pal[idx]
    else:
        stride = (3 * w + 3) & ~3
        rows = []
        for y in range(h):
            start = data_off + y * stride
            row = np.frombuffer(blob[start : start + 3 * w], np.uint8)
            rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
        out = np.stack(rows)
    return out if top_down else out[::-1]


# ---------------------------------------------------------------------------
# Animated GIF: the testbed's real VIDEO container (r10 tail)
# ---------------------------------------------------------------------------
#
# A multi-frame GIF is the one video-ish container expressible with
# the codecs already here: per-frame LZW streams behind one global
# palette. frame extraction + temporal sampling — the operations a
# training pipeline runs on video — get a REAL container instead of
# the byte-stride stand-in.


def encode_gif_frames(frames: list[np.ndarray], delay_cs: int = 4) -> bytes:
    """Encode same-sized grayscale frames as an animated GIF89a
    (identity palette, per-frame graphic-control extensions)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):
        out += bytes([i, i, i])
    # NETSCAPE2.0 looping application extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        out += b"\x21\xf9\x04\x04" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        data = _lzw_compress(f.reshape(-1), 8)
        out.append(8)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(blob: bytes) -> list[np.ndarray]:
    """Decode EVERY frame of a GIF to (H, W, 3) RGB arrays. Frames
    are decoded independently against their color table — no disposal
    compositing (our encoder emits full frames; partial-frame
    animations would need the previous canvas, documented out of
    scope with a fail-stop on sub-region descriptors)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    while pos < len(blob):
        b = blob[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", blob[pos + 1 : pos + 10])
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            raise ValueError(
                "sub-region animation frames (disposal compositing) unsupported"
            )
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(blob[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without any color table")
        min_code = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos] != 0:
            ln = blob[pos]
            data += blob[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # block terminator
        idx = _lzw_decompress(bytes(data), min_code, w * h).reshape(h, w)
        if iflags & 0x40:
            de = np.empty_like(idx)
            de[_interlace_order(h)] = idx
            idx = de
        if idx.max() >= len(ct):
            raise ValueError("pixel index outside the color table")
        frames.append(ct[idx])
    if not frames:
        raise ValueError("GIF has no image data")
    return frames
