"""Pure-Python baseline JPEG codec (grayscale) — closing the last
pillow-gated decode path.

r10 gave images a real PNG codec (dataops/png.py) and audio a real
PCM codec (dataops/wav.py); JPEG pixel decode remained the one
import-gated stub. This module implements the baseline sequential
DCT process end-to-end for single-component (grayscale) images with
no dependencies beyond numpy: marker segments (SOI/APPn/DQT/SOF0/
DHT/SOS/EOI), canonical Huffman entropy coding with 0xFF byte
stuffing, zigzag ordering, uniform or custom quantization, and the
8x8 type-II DCT pair in float64.

Scope (r10 final): grayscale, YCbCr color at any integral sampling
ratio (4:4:4 / 4:2:0 / 4:2:2 / 4:1:1 / 4:4:0), and PROGRESSIVE
(SOF2) streams — spectral selection and successive approximation
with libjpeg's EOB-run/correction-bit semantics — all decode for
real, and the encoder can emit each of them for round-trip pinning.
The remaining fail-stops are arithmetic-coded streams (0xC9-0xCB, a
separate entropy coder), restart intervals, and non-integral
sampling ratios — each with a distinct message.

Color conversions are INTEGER-defined (scaled coefficients + floor
division + clip to [0, 255]) so the DuckDB oracle mirrors them
exactly. Floor-vs-truncate divergence on negative numerators cannot
leak: encoder numerators are provably non-negative at every RGB
input, and decoder numerators go negative only when the clip floors
the result to 0 on both engines anyway.

Exactness contract the certification oracle builds on: an image whose
8x8 blocks are each CONSTANT survives encode->decode bit-exactly at
quantization 1 — the FDCT of a constant block is DC-only (the AC
cosine sums cancel to ~1e-13 and round to zero), the DC quantizes to
an exact integer, and the IDCT returns the constant. General content
round-trips within +-1 per pixel at quant 1 (double-rounding bound,
pinned in tests).

Huffman tables: the encoder emits its own canonical tables (all DC
categories at 4 bits, all (run,size) AC symbols at 8 bits) rather
than the Annex K defaults — a degenerate-but-valid choice the DHT
segment fully describes, so any compliant reader decodes our files
and our reader decodes any table a compliant writer declares.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ = []
for s in range(15):
    rng = range(max(0, s - 7), min(s, 7) + 1)
    for i in rng if s % 2 else reversed(rng):
        _ZZ.append((i, s - i))
ZIGZAG = tuple(_ZZ)

# flat (row*8+col) position of the k-th zigzag coefficient: one fancy
# assignment de-zigzags a whole (..., 64) coefficient array at C speed
_ZZ_FLAT = np.array([r * 8 + c for r, c in ZIGZAG], dtype=np.intp)


def _dct_mat() -> np.ndarray:
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    m[0] /= np.sqrt(2)
    return m


_M = _dct_mat()


def _fdct(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _M.T @ coef @ _M


# ---------------------------------------------------------------------------
# canonical Huffman tables (encoder side)
# ---------------------------------------------------------------------------

# DC: categories 0..11, all 4-bit codes. AC: EOB/EOBn (run 0..14,
# size 0 — the n>0 runs are progressive EOB-run lengths), ZRL, and
# (run 0..15, size 1..11), all 8-bit codes (192 symbols <= 255).
# Canonical assignment starts at 0, so the all-1-bits codeword
# (forbidden by the spec) is never reached.
_DC_SYMS = tuple(range(12))
_AC_SYMS = (
    tuple(r << 4 for r in range(15))
    + (0xF0,)
    + tuple((r << 4) | s for r in range(16) for s in range(1, 12))
)


def _canonical(symbols: tuple, length: int) -> dict[int, tuple[int, int]]:
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for code length")
    return {sym: (i, length) for i, sym in enumerate(symbols)}


_DC_ENC = _canonical(_DC_SYMS, 4)
_AC_ENC = _canonical(_AC_SYMS, 8)


def _dht_segment(table_class: int, table_id: int, enc: dict, length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(enc)
    # canonical order = ascending code value = insertion order here
    vals = bytes(enc.keys())
    payload = bytes([table_class << 4 | table_id]) + bytes(counts) + vals
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


class _BitWriter:
    """Entropy bit writer: whole bytes drain from the accumulator in
    one ``int.to_bytes`` per call, and 0xFF byte stuffing happens once
    at ``flush`` with a C-speed ``bytes.replace`` (inserting 0x00
    after every 0xFF is exactly the per-byte stuffing rule, and each
    scan uses a fresh writer flushed once)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        n = self.nbits + nbits
        rem = n & 7
        if n >= 8:
            self.out += (self.acc >> rem).to_bytes(n >> 3, "big")
            self.acc &= (1 << rem) - 1
        self.nbits = rem

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out).replace(b"\xff", b"\xff\x00")


def rgb_to_ycbcr_int(rgb: np.ndarray) -> np.ndarray:
    """JFIF YCbCr in exact integer arithmetic (micro-unit scaling,
    +half, floor divide, clip). Every numerator is non-negative for
    any RGB in [0, 255], so floor == truncate on both engines."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    y = (299_000 * r + 587_000 * g + 114_000 * b + 500_000) // 1_000_000
    cb = (128_000_000 - 168_736 * r - 331_264 * g + 500_000 * b + 500_000) // 1_000_000
    cr = (128_000_000 + 500_000 * r - 418_688 * g - 81_312 * b + 500_000) // 1_000_000
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def ycbcr_to_rgb_int(ycc: np.ndarray) -> np.ndarray:
    """Inverse JFIF transform, same integer discipline. Negative
    numerators only occur where the clip lands on 0 either way."""
    y = ycc[..., 0].astype(np.int64)
    cb = ycc[..., 1].astype(np.int64) - 128
    cr = ycc[..., 2].astype(np.int64) - 128
    r = (1_000_000 * y + 1_402_000 * cr + 500_000) // 1_000_000
    g = (1_000_000 * y - 344_136 * cb - 714_136 * cr + 500_000) // 1_000_000
    b = (1_000_000 * y + 1_772_000 * cb + 500_000) // 1_000_000
    out = np.stack([r, g, b], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _check_quant(quant: int | np.ndarray) -> np.ndarray:
    q = np.full((8, 8), quant, dtype=np.float64) if np.isscalar(quant) else (
        np.asarray(quant, dtype=np.float64)
    )
    if q.shape != (8, 8) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant table must be 8x8 with entries in [1, 255]")
    return q


def _plane_zz(plane: np.ndarray, q: np.ndarray) -> list[list[int]]:
    """Quantized zigzag lists for every 8x8 block of a level-shifted
    plane, raster order — the whole plane's FDCT/quant/round/zigzag
    batched (per-slice matmul and elementwise ops are bit-identical
    to the old per-block path)."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    coef = np.rint((_M @ blocks @ _M.T) / q).astype(np.int64)
    return coef.reshape(nby * nbx, 64)[:, _ZZ_FLAT].tolist()


def _encode_block(bw: _BitWriter, zz: list[int], prev_dc: int) -> int:
    """Entropy-code one precomputed zigzag list. Huffman code and
    amplitude emit as one fused write per symbol (same bits)."""
    diff = zz[0] - prev_dc
    s = _category(diff)
    code, n = _DC_ENC[s]
    if s:
        bw.write((code << s) | _amplitude(diff, s), n + s)
    else:
        bw.write(code, n)
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    run = 0
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, n = _AC_ENC[0xF0]  # ZRL
            bw.write(code, n)
            run -= 16
        s = _category(v)
        if s > 11:
            raise ValueError("AC coefficient out of representable range")
        code, n = _AC_ENC[(run << 4) | s]
        bw.write((code << s) | _amplitude(v, s), n + s)
        run = 0
    if last_nz < 63:
        code, n = _AC_ENC[0x00]  # EOB
        bw.write(code, n)
    return zz[0]


def _encode(
    comps: list[tuple[np.ndarray, int, int, int]],
    qs: list[np.ndarray],
    h: int,
    w: int,
) -> bytes:
    """Shared writer. ``comps`` = (plane, hi, vi, qsel) per component:
    level-shifted float64 planes already padded so each holds exactly
    hi x vi blocks per MCU; MCUs interleave in component order with
    hi*vi raster-ordered blocks each (the baseline interleave rule)."""
    head = bytearray(b"\xff\xd8")  # SOI
    for tid, q in enumerate(qs):
        zz_q = bytes(int(q[r, c]) for r, c in ZIGZAG)
        head += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz_q
    ncomp = len(comps)
    head += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (_, hi, vi, qsel) in enumerate(comps):
        head += bytes([ci + 1, (hi << 4) | vi, qsel])
    head += _dht_segment(0, 0, _DC_ENC, 4)
    head += _dht_segment(1, 0, _AC_ENC, 8)
    head += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        head += bytes([ci + 1, 0x00])
    head += bytes([0, 63, 0])

    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    plane0 = comps[0][0]
    mcuy = plane0.shape[0] // (8 * comps[0][2]) if comps[0][2] else 0
    mcux = plane0.shape[1] // (8 * comps[0][1]) if comps[0][1] else 0
    bw = _BitWriter()
    prev = [0] * ncomp
    zzs = [_plane_zz(plane, qs[qsel]) for plane, _, _, qsel in comps]
    nbx = [plane.shape[1] // 8 for plane, _, _, _ in comps]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (plane, hi, vi, qsel) in enumerate(comps):
                for byy in range(vi):
                    for bxx in range(hi):
                        zz = zzs[ci][
                            (my * vi + byy) * nbx[ci] + mx * hi + bxx
                        ]
                        prev[ci] = _encode_block(bw, zz, prev[ci])
    return bytes(head) + bw.flush() + b"\xff\xd9"


def _padded_plane(px: np.ndarray) -> np.ndarray:
    h, w = px.shape
    return np.pad(
        px.astype(np.float64), ((0, -h % 8), (0, -w % 8)), mode="edge"
    ) - 128.0


def encode_jpeg_gray(px: np.ndarray, quant: int | np.ndarray = 1) -> bytes:
    """Encode a uint8 grayscale array as baseline JPEG. ``quant`` is a
    uniform step or a full 8x8 table; edge blocks pad by edge
    replication (the convention that keeps gradients flat, minimizing
    ringing into the crop region)."""
    if px.ndim != 2:
        raise ValueError("grayscale 2-D array required")
    h, w = px.shape
    if not h or not w:
        raise ValueError("empty image")
    q = _check_quant(quant)
    return _encode([(_padded_plane(px), 1, 1, 0)], [q], h, w)


def encode_jpeg_color(
    rgb: np.ndarray,
    quant_y: int | np.ndarray = 1,
    quant_c: int | np.ndarray = 1,
    subsample: bool | tuple[int, int] = False,
) -> bytes:
    """Encode a uint8 (H, W, 3) RGB array as baseline JPEG: integer
    JFIF YCbCr, luma quant table 0, chroma table 1. ``subsample``
    picks the chroma layout: False = 4:4:4, True = 4:2:0, or an
    explicit (sh, sv) factor pair — (2, 1) = 4:2:2, (4, 1) = 4:1:1.
    Chroma reduces by an exact sh x sv integer mean
    ``(sum + n//2) // n`` over an MCU-aligned edge-padded frame, the
    deterministic counterpart of the decoder's nearest-neighbor
    upsample (constant MCUs round-trip bit-exactly)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("RGB (H, W, 3) array required")
    h, w = rgb.shape[:2]
    if not h or not w:
        raise ValueError("empty image")
    qy, qc = _check_quant(quant_y), _check_quant(quant_c)
    ycc = rgb_to_ycbcr_int(rgb)
    if subsample is False:
        comps = [(_padded_plane(ycc[..., i]), 1, 1, 0 if i == 0 else 1) for i in range(3)]
        return _encode(comps, [qy, qc], h, w)
    sh, sv = (2, 2) if subsample is True else subsample
    if sh not in (1, 2, 4) or sv not in (1, 2, 4) or (sh, sv) == (1, 1):
        raise ValueError("subsample factors must be in {1,2,4}, not both 1")
    mcu_h, mcu_w = 8 * sv, 8 * sh
    pad = [(0, -h % mcu_h), (0, -w % mcu_w)]
    planes = [
        np.pad(ycc[..., i].astype(np.int64), pad, mode="edge") for i in range(3)
    ]
    comps = [(planes[0].astype(np.float64) - 128.0, sh, sv, 0)]
    n = sh * sv
    for p in planes[1:]:
        acc = np.zeros((p.shape[0] // sv, p.shape[1] // sh), dtype=np.int64)
        for dy in range(sv):
            for dx in range(sh):
                acc += p[dy::sv, dx::sh]
        sub = (acc + n // 2) // n
        comps.append((sub.astype(np.float64) - 128.0, 1, 1, 1))
    return _encode(comps, [qy, qc], h, w)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-scan bit reader over an eagerly UNSTUFFED prefix.

    The constructor finds the scan's terminator (the first 0xFF not
    followed by a stuffed 0x00) with C-speed ``bytes.find`` and strips
    the 0xFF00 stuffing once with ``bytes.replace``; ``read`` then
    refills the accumulator 8 bytes at a time instead of per byte.
    Error behaviour is bit-identical to the old per-byte reader: the
    terminator's kind is remembered and the matching ValueError (plain
    truncation / truncated at 0xFF / truncated before EOI / unexpected
    marker) is raised only at the moment a read actually needs bits
    past the unstuffed prefix — exactly when the old reader would have
    reached that byte."""

    __slots__ = ("data", "valid", "nvalid", "bytepos", "acc", "nbits", "_term")

    def __init__(self, data: bytes) -> None:
        self.data = data
        i = 0
        n = len(data)
        while True:
            j = data.find(b"\xff", i)
            if j == -1:
                vend, term = n, -1  # clean end of data
                break
            if j + 1 >= n:
                vend, term = j, -2  # 0xFF then end of data
                break
            nxt = data[j + 1]
            if nxt == 0x00:
                i = j + 2  # stuffed byte, keep scanning
                continue
            vend, term = j, nxt  # real marker terminates the scan
            break
        self.valid = data[:vend].replace(b"\xff\x00", b"\xff")
        self.nvalid = len(self.valid)
        self._term = term
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0

    @property
    def pos(self) -> int:
        """Stuffed-coordinate index of the next unread byte (every
        0xFF inside the unstuffed prefix consumed a stuffed pair)."""
        return self.bytepos + self.valid.count(0xFF, 0, self.bytepos)

    def _raise_exhausted(self) -> None:
        t = self._term
        if t == -1:
            raise ValueError("entropy stream truncated")
        if t == -2:
            raise ValueError("entropy stream truncated at 0xFF")
        if t == 0xD9:  # EOI reached while bits were needed
            raise ValueError("entropy stream truncated before EOI")
        raise ValueError(f"unexpected marker 0xFF{t:02X} in scan")

    def read(self, n: int) -> int:
        while self.nbits < n:
            take = self.nvalid - self.bytepos
            if take <= 0:
                self._raise_exhausted()
            if take > 8:
                take = 8
            self.acc = (self.acc << (8 * take)) | int.from_bytes(
                self.valid[self.bytepos : self.bytepos + take], "big"
            )
            self.nbits += 8 * take
            self.bytepos += take
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out


class _HuffDec(dict):
    """(length, code) -> symbol decode table plus a prefix LUT:
    ``lut[next maxlen bits] = (symbol, code length) | None``."""

    __slots__ = ("lut", "maxlen")


def _dec_key(counts: bytes, vals: bytes):
    return (counts, vals)


_DEC_CACHE: dict = {}


def _build_dec(counts: list[int], vals: bytes) -> _HuffDec:
    """(length, code) -> symbol from a DHT's canonical description,
    with a prefix LUT for O(1) decode. Tables are immutable after
    construction and memoized on the DHT payload, so repeated decodes
    of same-table streams (one blob per row in the mm certification
    corpora) skip the LUT build."""
    key = (bytes(counts), bytes(vals))
    hit = _DEC_CACHE.get(key)
    if hit is not None:
        return hit
    table = _HuffDec()
    code = 0
    vi = 0
    maxlen = 1
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = vals[vi]
            maxlen = ln
            code += 1
            vi += 1
        code <<= 1
    lut: list = [None] * (1 << maxlen)
    for (ln, code), sym in table.items():
        start = code << (maxlen - ln)
        lut[start : start + (1 << (maxlen - ln))] = [(sym, ln)] * (
            1 << (maxlen - ln)
        )
    table.lut = lut
    table.maxlen = maxlen
    if len(_DEC_CACHE) >= 256:
        _DEC_CACHE.clear()
    _DEC_CACHE[key] = table
    return table


def _huff_read(br: _BitReader, table: dict) -> int:
    lut = getattr(table, "lut", None)
    if lut is not None:
        L = table.maxlen
        nbits = br.nbits
        if nbits < L:
            take = br.nvalid - br.bytepos
            if take > 0:
                if take > 8:
                    take = 8
                br.acc = (br.acc << (8 * take)) | int.from_bytes(
                    br.valid[br.bytepos : br.bytepos + take], "big"
                )
                nbits = br.nbits = br.nbits + 8 * take
                br.bytepos += take
        if nbits >= L:
            hit = lut[(br.acc >> (nbits - L)) & ((1 << L) - 1)]
            if hit is not None:
                sym, ln = hit
                br.nbits = nbits - ln
                br.acc &= (1 << br.nbits) - 1
                return sym
        # fewer than maxlen bits left, or no code within maxlen bits:
        # replay bit-by-bit below so stream-end / invalid-code errors
        # fire exactly as the per-bit reader's did.
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline JPEG: (H, W) uint8 for grayscale, (H, W, 3)
    RGB uint8 for 4:4:4 YCbCr color. Fail-stops with distinct messages
    on progressive (SOF2), arithmetic coding, chroma subsampling,
    restart intervals, and malformed segments — the pgoutput
    skip-vs-fail discipline: APPn/COM skip, structure errors raise."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    dims = None
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = blob[pos + 1]
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        seg_len = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        seg = blob[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT, possibly several tables per segment
            sp = 0
            while sp < len(seg):
                prec, tid = seg[sp] >> 4, seg[sp] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8))
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = seg[sp + 1 + k]
                qtables[tid] = tbl
                sp += 65
        elif marker == 0xC0 or marker == 0xC1:  # baseline / extended SOF
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, qid, samp >> 4, samp & 0xF))
            hmax = max(hi for _, _, hi, _ in comps)
            vmax = max(vi for _, _, _, vi in comps)
            ok = (
                1 <= hmax <= 4
                and 1 <= vmax <= 4
                and all(
                    hi >= 1 and vi >= 1 and hmax % hi == 0 and vmax % vi == 0
                    for _, _, hi, vi in comps
                )
            )
            if not ok:
                # nearest-neighbor upsampling needs integral ratios;
                # non-dividing factors (legal but pathological) bail out
                raise ValueError(
                    "unsupported chroma subsampling (non-integral ratio)"
                )
            dims = (h, w)
        elif marker == 0xC2:
            return _decode_progressive(blob, pos)
        elif marker in (0xC9, 0xCA, 0xCB):
            raise ValueError("arithmetic-coded JPEG unsupported")
        elif marker == 0xC4:  # DHT, possibly several tables
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 0xF
                counts = list(seg[sp + 1 : sp + 17])
                n = sum(counts)
                vals = seg[sp + 17 : sp + 17 + n]
                htables[(cls, tid)] = _build_dec(counts, vals)
                sp += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:  # SOS
            if dims is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("scan does not cover all frame components")
            plan = []
            by_id = {cid: (qid, hi, vi) for cid, qid, hi, vi in comps}
            for si in range(ns):
                cid, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                if cid not in by_id:
                    raise ValueError("scan references unknown component")
                qid, hi, vi = by_id[cid]
                plan.append(
                    (
                        qtables[qid],
                        htables[(0, tabs >> 4)],
                        htables[(1, tabs & 0xF)],
                        hi,
                        vi,
                    )
                )
            scan = blob[pos + 2 + seg_len :]
            planes = _decode_scan(scan, dims, plan)
            if len(planes) == 1:
                return planes[0]
            return ycbcr_to_rgb_int(np.stack(planes, axis=-1))
        # APPn / COM / anything else with a length field: skip
        pos += 2 + seg_len
    raise ValueError("no SOS marker found")


def decode_jpeg_gray(blob: bytes) -> np.ndarray:
    """Grayscale view of any decodable JPEG: 1-component streams pass
    through; color collapses via the ITU-R 601 integer luma — the same
    L formula the PNG path and pillow's convert('L') apply."""
    px = decode_jpeg(blob)
    if px.ndim == 2:
        return px
    rgb = px.astype(np.int64)
    return (
        (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
    ).astype(np.uint8)


def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict, prev_dc: int):
    """One block's zigzag coefficient list (length 64) and its DC.
    De-zigzag + IDCT happen batched in the caller (one fancy-index
    assignment and one stacked matmul per plane instead of two numpy
    round trips per block)."""
    zz = [0] * 64
    s = _huff_read(br, dc_tab)
    diff = _extend(br.read(s), s) if s else 0
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym = _huff_read(br, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.read(size), size)
        k += 1
    return zz, dc


def _blocks_to_plane(zzs: list, bh: int, bw: int, q: np.ndarray) -> np.ndarray:
    """Batched dequant + de-zigzag + IDCT: ``zzs`` is the row-major
    list of per-block zigzag lists for a (bh, bw) block grid. The
    matmul broadcasts over the block axis, running the same float64
    8x8 sandwich per slice the per-block path ran, so results are
    bit-identical."""
    coef = np.empty((bh * bw, 64))
    coef[:, _ZZ_FLAT] = np.asarray(zzs, dtype=np.float64)
    coef = coef.reshape(bh, bw, 8, 8) * q
    blocks = (_M.T @ coef @ _M) + 128.0
    return blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)


def _decode_scan(
    scan: bytes,
    dims: tuple[int, int],
    plan: list[tuple[np.ndarray, dict, dict, int, int]],
) -> list[np.ndarray]:
    h, w = dims
    hmax = max(p[3] for p in plan)
    vmax = max(p[4] for p in plan)
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    mcuy, mcux = (h + mcu_h - 1) // mcu_h, (w + mcu_w - 1) // mcu_w
    # per-component zigzag grids at ITS resolution (hi/hmax of full);
    # entropy decode fills them in MCU order, then one batched
    # dequant+IDCT per plane replaces the per-block numpy round trips
    grids: list[list] = [
        [None] * (mcuy * vi * mcux * hi) for (_, _, _, hi, vi) in plan
    ]
    br = _BitReader(scan)
    prev = [0] * len(plan)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (q, dc_tab, ac_tab, hi, vi) in enumerate(plan):
                for byy in range(vi):
                    for bxx in range(hi):
                        zz, prev[ci] = _decode_block(
                            br, dc_tab, ac_tab, prev[ci]
                        )
                        grids[ci][
                            (my * vi + byy) * mcux * hi + mx * hi + bxx
                        ] = zz
    planes = [
        _blocks_to_plane(grids[ci], mcuy * vi, mcux * hi, q)
        for ci, (q, _, _, hi, vi) in enumerate(plan)
    ]
    out = []
    for p, (_, _, _, hi, vi) in zip(planes, plan):
        if hi != hmax or vi != vmax:
            # nearest-neighbor chroma upsample: deterministic, integer-
            # preserving (the property the 4:2:0 certification uses)
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(np.clip(np.rint(p[:h, :w]), 0, 255).astype(np.uint8))
    return out


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------
#
# Coefficients accumulate across scans into per-block zigzag arrays;
# the IDCT runs once at the end. The refinement semantics follow
# libjpeg's jdphuff/jcphuff flow (EOB runs shared across blocks,
# correction bits buffered behind the next emitted symbol) — both the
# decoder here and the encoder below implement them, so round-trip
# tests pin the bit-level contract without an external library.
# Arithmetic-shift point transforms on two's-complement ints behave
# identically in Python and C for this use: (v >> a) << a clears low
# bits, and the refinement OR sets them back, signs included.


def _next_marker(blob: bytes, p: int) -> int:
    """First non-stuffing marker position at or after ``p``."""
    n = len(blob)
    while p + 1 < n:
        if blob[p] == 0xFF and blob[p + 1] not in (0x00, 0xFF):
            return p
        p += 1
    raise ValueError("ran off the stream looking for a marker")


def _decode_progressive(blob: bytes, _sof_pos: int | None = None) -> np.ndarray:
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(cid, qid, hi, vi)])
    coefs: list[list[list[list[int]]]] = []  # [comp][by][bx] -> 64 zigzag ints
    grids: list[tuple[int, int]] = []  # interleaved (bh, bw) per comp
    pos = 2
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        seg = blob[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            sp = 0
            while sp < len(seg):
                prec, tid = seg[sp] >> 4, seg[sp] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8))
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = seg[sp + 1 + k]
                qtables[tid] = tbl
                sp += 65
        elif marker == 0xC4:
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 0xF
                counts = list(seg[sp + 1 : sp + 17])
                nv = sum(counts)
                htables[(cls, tid)] = _build_dec(counts, seg[sp + 17 : sp + 17 + nv])
                sp += 17 + nv
        elif marker == 0xC2:
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, qid, samp >> 4, samp & 0xF))
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            if any(hmax % c[2] or vmax % c[3] for c in comps):
                raise ValueError("unsupported chroma subsampling (non-integral ratio)")
            frame = (h, w, comps, hmax, vmax)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for _, _, hi, vi in comps:
                bh_i, bw_i = mcuy * vi, mcux * hi
                grids.append((bh_i, bw_i))
                coefs.append(
                    [[[0] * 64 for _ in range(bw_i)] for _ in range(bh_i)]
                )
        elif marker in (0xC0, 0xC1):
            raise ValueError("mixed baseline SOF inside a progressive stream")
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            consumed = _progressive_scan(blob, pos, seg, frame, coefs, grids, htables)
            pos = consumed
            continue
        pos += 2 + seg_len
    if frame is None:
        raise ValueError("no SOF2 frame found")
    h, w, comps, hmax, vmax = frame
    planes = []
    for ci, (_, qid, hi, vi) in enumerate(comps):
        q = qtables[qid]
        bh_i, bw_i = grids[ci]
        plane = _blocks_to_plane(
            [zz for row in coefs[ci] for zz in row], bh_i, bw_i, q
        )
        if hi != hmax or vi != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        planes.append(np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8))
    if len(planes) == 1:
        return planes[0]
    return ycbcr_to_rgb_int(np.stack(planes, axis=-1))


def _progressive_scan(blob, pos, seg, frame, coefs, grids, htables) -> int:
    """Decode one SOS's entropy data into the coefficient arrays;
    returns the stream position of the next marker."""
    h, w, comps, hmax, vmax = frame
    ns = seg[0]
    sel = []
    for si in range(ns):
        cid, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
        idx = next(
            (i for i, c in enumerate(comps) if c[0] == cid), None
        )
        if idx is None:
            raise ValueError("scan references unknown component")
        sel.append((idx, tabs >> 4, tabs & 0xF))
    ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0xF
    seg_len = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
    scan = blob[pos + 2 + seg_len :]
    br = _BitReader(scan)

    if ss == 0:  # DC scan (Se must be 0)
        if se != 0:
            raise ValueError("DC scan with nonzero Se")
        if ah == 0:
            preds = [0] * ns
        if ns == 1:
            ci, dsel, _ = sel[0]
            _, _, hi, vi = comps[ci]
            bh_n = ((h * vi + vmax - 1) // vmax + 7) // 8
            bw_n = ((w * hi + hmax - 1) // hmax + 7) // 8
            blocks = [
                coefs[ci][by][bx]
                for by in range(bh_n)
                for bx in range(bw_n)
            ]
            if ah == 0:
                dc_tab = htables[(0, dsel)]
                pred = 0
                for zz in blocks:
                    s = _huff_read(br, dc_tab)
                    pred += _extend(br.read(s), s) if s else 0
                    zz[0] = pred << al
            else:
                for zz in blocks:
                    if br.read(1):
                        zz[0] |= 1 << al
        else:  # interleaved DC over all scan components, MCU order
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for my in range(mcuy):
                for mx in range(mcux):
                    for si, (ci, dsel, _) in enumerate(sel):
                        _, _, hi, vi = comps[ci]
                        for byy in range(vi):
                            for bxx in range(hi):
                                zz = coefs[ci][my * vi + byy][mx * hi + bxx]
                                if ah == 0:
                                    s = _huff_read(br, htables[(0, dsel)])
                                    preds[si] += (
                                        _extend(br.read(s), s) if s else 0
                                    )
                                    zz[0] = preds[si] << al
                                else:
                                    if br.read(1):
                                        zz[0] |= 1 << al
    else:  # AC scan: non-interleaved single component
        if ns != 1:
            raise ValueError("interleaved AC scan is malformed")
        ci, _, asel = sel[0]
        ac_tab = htables[(1, asel)]
        _, _, hi, vi = comps[ci]
        bh_n = ((h * vi + vmax - 1) // vmax + 7) // 8
        bw_n = ((w * hi + hmax - 1) // hmax + 7) // 8
        eobrun = 0
        for by in range(bh_n):
            for bx in range(bw_n):
                zz = coefs[ci][by][bx]
                if ah == 0:
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = _huff_read(br, ac_tab)
                        r, s = sym >> 4, sym & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.read(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC run past band end")
                        zz[k] = _extend(br.read(s), s) << al
                        k += 1
                else:
                    eobrun = _refine_ac_block(br, zz, ss, se, al, eobrun, ac_tab)
    return _next_marker(blob, pos + 2 + seg_len + br.pos)


def _refine_ac_block(br, zz, ss, se, al, eobrun, ac_tab) -> int:
    """AC successive-approximation refinement for one block
    (jdphuff.c decode_mcu_AC_refine semantics)."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _huff_read(br, ac_tab)
            r, s = sym >> 4, sym & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                # ZRL: run over 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid AC refinement magnitude")
                val = p1 if br.read(1) else m1
            while k <= se:
                if zz[k] != 0:
                    if br.read(1) and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if br.read(1) and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------------------
# Progressive encoder (spectral selection + successive approximation)
# ---------------------------------------------------------------------------


def _blocks_zigzag(plane: np.ndarray, q: np.ndarray) -> list[list[int]]:
    """Quantized zigzag coefficient lists for every 8x8 block of a
    level-shifted plane, raster order."""
    return _plane_zz(plane, q)


class _ProgACEmitter:
    """EOB-run + buffered-correction-bit state shared across the
    blocks of one AC scan (jcphuff.c semantics)."""

    def __init__(self, bw: _BitWriter) -> None:
        self.bw = bw
        self.eobrun = 0
        self.bebuf: list[int] = []

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, n = _AC_ENC[r << 4]
            self.bw.write(code, n)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            self.flush_bits()

    def flush_bits(self) -> None:
        for b in self.bebuf:
            self.bw.write(b, 1)
        self.bebuf = []


def _emit_ac_first(em: _ProgACEmitter, zz: list[int], ss: int, se: int, al: int):
    vals = []
    for k in range(ss, se + 1):
        v = zz[k]
        mag = (abs(v)) >> al
        vals.append(mag if v >= 0 else -mag)
    last = max((i for i, v in enumerate(vals) if v), default=-1)
    if last < 0:
        em.eobrun += 1
        if em.eobrun == 0x7FFF:
            em.emit_eobrun()
        return
    em.emit_eobrun()
    r = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, n = _AC_ENC[0xF0]
            em.bw.write(code, n)
            r -= 16
        s = _category(v)
        if s > 11:
            raise ValueError("AC coefficient out of representable range")
        code, n = _AC_ENC[(r << 4) | s]
        em.bw.write(code, n)
        em.bw.write(_amplitude(v, s), s)
        r = 0
    if last < se - ss:
        em.eobrun += 1
        if em.eobrun == 0x7FFF:
            em.emit_eobrun()


def _emit_ac_refine(em: _ProgACEmitter, zz: list[int], ss: int, se: int, al: int):
    absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
    eobpos = max((i for i, v in enumerate(absv) if v == 1), default=-1)
    r = 0
    pending: list[int] = []  # correction bits since the last emitted symbol
    for i, k in enumerate(range(ss, se + 1)):
        t = absv[i]
        if t == 0:
            r += 1
            continue
        # Drain ZRLs for EVERY nonzero coefficient — including the
        # history-nonzero (t > 1) correction-bit case below.  ITU-T
        # T.81 G.1.2.3 (and libjpeg's jcphuff.c) test r > 15 before
        # the previously-nonzero shortcut; deferring the drain past a
        # >=16 zero-history span shifts the buffered correction bits
        # to the wrong coefficient position and the stream decodes to
        # an illegal magnitude-!=1 refinement symbol.
        while r > 15 and i <= eobpos:
            em.emit_eobrun()
            code, n = _AC_ENC[0xF0]
            em.bw.write(code, n)
            r -= 16
            for b in pending:
                em.bw.write(b, 1)
            pending = []
        if t > 1:
            pending.append(t & 1)
            continue
        # newly-nonzero coefficient
        em.emit_eobrun()
        code, n = _AC_ENC[(r << 4) | 1]
        em.bw.write(code, n)
        em.bw.write(1 if zz[k] > 0 else 0, 1)
        for b in pending:
            em.bw.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        em.eobrun += 1
        em.bebuf.extend(pending)
        if em.eobrun == 0x7FFF:
            em.emit_eobrun()


def encode_jpeg_progressive(
    px: np.ndarray,
    quant: int | np.ndarray = 1,
    dc_al: int = 1,
    ac_al: int = 1,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
) -> bytes:
    """Encode grayscale (H, W) or RGB (H, W, 3) as PROGRESSIVE JPEG
    (SOF2): one DC-first scan per component at point transform
    ``dc_al`` followed by DC refinement scans down to 0, then per-band
    AC-first scans at ``ac_al`` and AC refinement scans down to 0 —
    the full successive-approximation scan script, so a decoder must
    implement EOB runs and correction-bit refinement to read these
    files (libjpeg's default progressive script has the same shape).
    Color is 4:4:4 with non-interleaved DC scans."""
    if px.ndim == 2:
        planes_u8 = [px]
    elif px.ndim == 3 and px.shape[2] == 3:
        ycc = rgb_to_ycbcr_int(px)
        planes_u8 = [ycc[..., i] for i in range(3)]
    else:
        raise ValueError("grayscale 2-D or RGB (H, W, 3) array required")
    h, w = planes_u8[0].shape
    if not h or not w:
        raise ValueError("empty image")
    q = _check_quant(quant)
    ncomp = len(planes_u8)
    blocks = [_blocks_zigzag(_padded_plane(p), q) for p in planes_u8]

    head = bytearray(b"\xff\xd8")
    zz_q = bytes(int(q[r, c]) for r, c in ZIGZAG)
    head += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    head += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        head += bytes([ci + 1, 0x11, 0])
    head += _dht_segment(0, 0, _DC_ENC, 4)
    head += _dht_segment(1, 0, _AC_ENC, 8)

    def sos(comp_id: int, ss: int, se: int, ah: int, al: int) -> bytes:
        return (
            b"\xff\xda"
            + struct.pack(">HB", 8, 1)
            + bytes([comp_id, 0x00, ss, se, (ah << 4) | al])
        )

    body = bytearray()
    for ci in range(ncomp):
        # DC first
        body += sos(ci + 1, 0, 0, 0, dc_al)
        bw = _BitWriter()
        pred = 0
        for zz in blocks[ci]:
            tdc = zz[0] >> dc_al
            diff = tdc - pred
            pred = tdc
            s = _category(diff)
            code, n = _DC_ENC[s]
            bw.write(code, n)
            if s:
                bw.write(_amplitude(diff, s), s)
        body += bw.flush()
        # DC refinements
        for level in range(dc_al - 1, -1, -1):
            body += sos(ci + 1, 0, 0, level + 1, level)
            bw = _BitWriter()
            for zz in blocks[ci]:
                bw.write((zz[0] >> level) & 1, 1)
            body += bw.flush()
    for ci in range(ncomp):
        for ss, se in bands:
            body += sos(ci + 1, ss, se, 0, ac_al)
            bw = _BitWriter()
            em = _ProgACEmitter(bw)
            for zz in blocks[ci]:
                _emit_ac_first(em, zz, ss, se, ac_al)
            em.emit_eobrun()
            body += bw.flush()
        for level in range(ac_al - 1, -1, -1):
            for ss, se in bands:
                body += sos(ci + 1, ss, se, level + 1, level)
                bw = _BitWriter()
                em = _ProgACEmitter(bw)
                for zz in blocks[ci]:
                    _emit_ac_refine(em, zz, ss, se, level)
                em.emit_eobrun()
                body += bw.flush()
    return bytes(head) + body + b"\xff\xd9"
