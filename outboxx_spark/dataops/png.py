"""Pure-Python PNG codec (stdlib zlib + numpy): the real-pixel decode
path for multimodal feature extraction in environments without pillow
(this sandbox: pip has no network route to any index, re-verified every
round since r6).

Spec coverage (PNG is a public W3C standard; this implements the
subset the pipeline produces and consumes):

- decode: 8-bit depth, color types 0 (grayscale), 2 (RGB), 3
  (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters
  (None/Sub/Up/Average/Paeth); multi-IDAT streams; non-interlaced.
  CRC mismatches and truncated/overflowing pixel data are ERRORS —
  the decoder's correctness is certified by exact round-trips, so it
  must never silently mis-decode.
- encode: 8-bit grayscale or RGB, selectable per-image filter (0-4,
  default 0) so tests can drive every unfilter branch with bytes this
  module did not itself unfilter.

Scale note: decode cost is O(pixels) numpy work per blob inside an
Arrow batch (multimodal.decode_features) — the per-row filter loop is
unavoidable (each scanline depends on the previous) but all arithmetic
inside a row is vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _chunks(blob: bytes):
    if blob[:8] != _SIG:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    n = len(blob)
    while pos + 8 <= n:
        length, ctype = struct.unpack_from(">I4s", blob, pos)
        end = pos + 8 + length
        if end + 4 > n:
            raise PngError(f"truncated chunk {ctype!r}")
        data = blob[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", blob, end)
        if zlib.crc32(blob[pos + 4 : end]) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in chunk {ctype!r}")
        yield ctype, data
        pos = end + 4
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering. ``raw`` is the decompressed stream:
    height rows of (1 filter byte + stride data bytes)."""
    rows = raw.reshape(height, 1 + stride)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(rows[y, 0])
        cur = rows[y, 1:]
        if f == 0:  # None
            out[y] = cur
        elif f == 1:  # Sub — recursive add over each byte lane is a
            # per-lane cumulative sum; mod 256 commutes with addition,
            # so one cumsum + mask replaces the per-byte loop
            # (measured 4x on the bench's pixel certification pass).
            line = cur.astype(np.int64)
            for lane in range(bpp):
                line[lane::bpp] = np.cumsum(line[lane::bpp])
            out[y] = (line & 0xFF).astype(np.uint8)
        elif f == 2:  # Up
            out[y] = (cur.astype(np.int32) + out[y - 1].astype(np.int32) & 0xFF
                      if y else cur)
        elif f == 3:  # Average — sequential dependence through
            # line[x-bpp] (the >> 1 defeats prefix-sum tricks), so the
            # loop stays — over plain Python ints, not numpy scalars
            # (element indexing on arrays is ~8x slower than lists).
            prev_l = out[y - 1].tolist() if y else [0] * stride
            line_l = cur.tolist()
            for x in range(stride):
                a = line_l[x - bpp] if x >= bpp else 0
                line_l[x] = (line_l[x] + ((a + prev_l[x]) >> 1)) & 0xFF
            out[y] = line_l
        elif f == 4:  # Paeth — same sequential dependence, same
            # plain-int loop rationale as Average.
            prev_l = out[y - 1].tolist() if y else [0] * stride
            line_l = cur.tolist()
            for x in range(stride):
                a = line_l[x - bpp] if x >= bpp else 0
                b = prev_l[x]
                c = prev_l[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                line_l[x] = (line_l[x] + pred) & 0xFF
            out[y] = line_l
        else:
            raise PngError(f"unknown filter {f} on row {y}")
    return out


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: (H, W) for grayscale, (H, W, C)
    otherwise (palette expands to RGB). Raises PngError on anything
    malformed — corrupt inputs must be loud, not approximate."""
    width = height = None
    color_type = None
    palette: np.ndarray | None = None
    idat = bytearray()
    for ctype, data in _chunks(bytes(blob)):
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth} (8 only)")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if comp or filt:
                raise PngError("nonstandard compression/filter method")
            if interlace:
                raise PngError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            if len(data) % 3:
                raise PngError("bad PLTE length")
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise PngError("missing IHDR")
    if not idat:
        raise PngError("missing IDAT")
    channels = _CHANNELS[color_type]
    stride = width * channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e
    if len(raw) != height * (1 + stride):
        raise PngError(
            f"pixel data length {len(raw)} != expected {height * (1 + stride)}"
        )
    px = _unfilter(np.frombuffer(raw, np.uint8), height, stride, channels)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        idx = px.reshape(height, width)
        if int(idx.max(initial=0)) >= len(palette):
            raise PngError("palette index out of range")
        return palette[idx]
    if channels == 1:
        return px.reshape(height, width)
    return px.reshape(height, width, channels)


def _filter_line(
    f: int, cur: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    c = cur.astype(np.int32)
    p = prev.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), c[:-bpp]]) if len(c) >= bpp else np.zeros_like(c)
    ul = np.concatenate([np.zeros(bpp, np.int32), p[:-bpp]]) if len(p) >= bpp else np.zeros_like(p)
    if f == 0:
        return cur
    if f == 1:
        return ((c - left) & 0xFF).astype(np.uint8)
    if f == 2:
        return ((c - p) & 0xFF).astype(np.uint8)
    if f == 3:
        return ((c - ((left + p) >> 1)) & 0xFF).astype(np.uint8)
    if f == 4:
        pr = left + p - ul
        pa, pb, pc = np.abs(pr - left), np.abs(pr - p), np.abs(pr - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, ul))
        return ((c - pred) & 0xFF).astype(np.uint8)
    raise PngError(f"unknown filter {f}")


def encode_png(pixels: np.ndarray, *, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> PNG bytes. One filter
    type for the whole image (0-4) so tests can exercise each unfilter
    branch against independently produced bytes."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = arr.shape[:2]
    else:
        raise PngError(f"unsupported array shape {arr.shape}")
    flat = arr.reshape(h, w * channels)
    lines = bytearray()
    prev = np.zeros(w * channels, np.uint8)
    for y in range(h):
        lines.append(filter_type)
        lines += _filter_line(filter_type, flat[y], prev, channels).tobytes()
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + chunk(b"IEND", b"")
    )
