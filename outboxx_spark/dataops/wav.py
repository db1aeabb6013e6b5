"""Pure-Python WAV (RIFF/PCM) codec — the audio analog of
:mod:`outboxx_spark.dataops.png`.

The container has no audio library (librosa/soundfile absent, pip
installs are no-ops), so — like PNG pixel decode in r10 — the audio
modality gets a dependency-free codec for the one container format
whose spec is small enough to implement exactly: RIFF WAVE with
integer PCM (8-bit unsigned / 16-bit signed little-endian), the
format every capture pipeline can emit. Compressed codecs (MP3/AAC/
FLAC) stay out of scope the way JPEG entropy decode does for images:
metadata parses everywhere, sample decode is exact for PCM.

Decode is strict where the data matters (unknown audio format tag,
truncated data chunk, bad magic → ValueError fail-stop, the repo's
pgoutput discipline) and lenient where the container allows junk
(unknown chunks — LIST/INFO/fact — are skipped by their declared
size, as every reader must).

Scale: everything here is per-blob bytes→numpy work inside an Arrow
batch; no Spark objects. The operators in dataops/audio.py own the
distribution story.
"""

from __future__ import annotations

import struct

import numpy as np

# WAVE format tags we decode: integer PCM only. 0xFFFE (EXTENSIBLE)
# wraps another tag in its extension; rejected fail-stop with a
# distinct message so the gap is explicit, not sniffed-as-garbage.
_FMT_PCM = 0x0001
_FMT_EXTENSIBLE = 0xFFFE


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """Encode integer samples to a canonical RIFF/WAVE blob.

    ``samples``: shape (n_frames,) or (n_frames, n_channels); values
    must already fit the target width — int16 range for ``bits=16``,
    [0, 255] for ``bits=8`` (the WAV convention stores 8-bit audio
    UNSIGNED) — violations fail-stop rather than wrap silently.
    Frames interleave channel-major per the spec."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got {samples.ndim}-D")
    n_frames, n_ch = samples.shape
    if bits == 16:
        lo, hi, dt = -32768, 32767, "<i2"
    elif bits == 8:
        lo, hi, dt = 0, 255, "u1"
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if samples.size and (samples.min() < lo or samples.max() > hi):
        raise ValueError(f"sample out of {bits}-bit range [{lo}, {hi}]")
    data = np.ascontiguousarray(samples.astype(dt)).tobytes()
    block_align = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        _FMT_PCM,
        n_ch,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks pad to even
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(blob: bytes):
    """Yield (chunk_id, payload_offset, payload_size) for every chunk
    in the RIFF body, honoring the even-byte padding rule."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, n = 12, min(len(blob), 8 + struct.unpack("<I", blob[4:8])[0])
    while pos + 8 <= n:
        cid = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size % 2)


def parse_wav_meta(blob: bytes) -> dict | None:
    """Header-only metadata: {sample_rate, n_channels, bits, n_frames}
    — the audio counterpart of ``parse_image_dims``. Returns None for
    non-WAV blobs (sniffing never raises, matching the image sniffer);
    raises ValueError for a WAV whose fmt chunk is malformed."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    fmt = data_size = None
    for cid, off, size in _walk_chunks(blob):
        if cid == b"fmt " and fmt is None:
            if size < 16 or off + 16 > len(blob):
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", blob[off : off + 16])
        elif cid == b"data" and data_size is None:
            data_size = min(size, len(blob) - off)
    if fmt is None or data_size is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, n_ch, rate, _, block_align, bits = fmt
    if block_align == 0:
        raise ValueError("zero block alignment")
    return {
        "sample_rate": int(rate),
        "n_channels": int(n_ch),
        "bits": int(bits),
        "n_frames": int(data_size // block_align),
    }


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV to (sample_rate, int32 array of shape
    (n_frames, n_channels)). 8-bit unsigned samples are re-centered to
    signed (x - 128) so downstream stats treat both widths uniformly.
    Fail-stops on non-PCM format tags, truncated data, or zero-sized
    frames — silent garbage is worse than a dead task (converter.zig's
    fail-stop rule, /root/reference/src/source/postgres/converter.zig)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    fmt = None
    data = None
    for cid, off, size in _walk_chunks(blob):
        if cid == b"fmt " and fmt is None:
            if size < 16 or off + 16 > len(blob):
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", blob[off : off + 16])
        elif cid == b"data" and data is None:
            if off + size > len(blob):
                raise ValueError("data chunk declares more bytes than present")
            data = blob[off : off + size]
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, n_ch, rate, _, block_align, bits = fmt
    if tag == _FMT_EXTENSIBLE:
        raise ValueError("WAVE_FORMAT_EXTENSIBLE without PCM subformat support")
    if n_ch < 1:
        raise ValueError("zero channels")
    if tag in (_FMT_ULAW, _FMT_ALAW):  # G.711 companded, 8 bits/sample
        if bits != 8:
            raise ValueError("G.711 WAV must be 8 bits/sample")
        lut = _g711_lut(tag)
        raw = np.frombuffer(data[: len(data) - len(data) % n_ch], "u1")
        arr = lut[raw]
    elif tag != _FMT_PCM:
        raise ValueError(
            f"unsupported WAV format tag 0x{tag:04X} (PCM/G.711 only)"
        )
    elif bits == 16:
        raw = np.frombuffer(data[: len(data) - len(data) % (2 * n_ch)], "<i2")
        arr = raw.astype(np.int32)
    elif bits == 8:
        raw = np.frombuffer(data[: len(data) - len(data) % n_ch], "u1")
        arr = raw.astype(np.int32) - 128
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if arr.size % n_ch:
        raise ValueError("sample count not divisible by channel count")
    return int(rate), arr.reshape(-1, n_ch)


def _g711_lut(tag: int) -> np.ndarray:
    exp = ulaw_expand if tag == _FMT_ULAW else alaw_expand
    return np.array([exp(b) for b in range(256)], dtype=np.int32)


# ---------------------------------------------------------------------------
# G.711 companding (format tags 6 = A-law, 7 = mu-law)
# ---------------------------------------------------------------------------
#
# Telephony WAVs store 8-bit companded samples; both laws are pure
# integer maps, so expansion is exactly mirrorable in SQL (the
# mm_audio certification pattern extends to them unchanged).

_FMT_ALAW = 0x0006
_FMT_ULAW = 0x0007


def ulaw_expand(u: int) -> int:
    """ITU-T G.711 mu-law byte -> linear PCM (int, 16-bit range)."""
    u = ~u & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 3) + 0x84) << exp) - 0x84
    return -x if sign else x


def ulaw_compress(x: int) -> int:
    """Linear PCM -> mu-law byte (the 0x84-bias, clamp-at-32635
    variant every G.711 implementation ships)."""
    sign = 0x80 if x < 0 else 0
    x = min(abs(x), 32635) + 0x84
    exp = x.bit_length() - 8  # x in [0x84, 32767+0x84] -> exp in 0..7
    mant = (x >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def alaw_expand(a: int) -> int:
    """ITU-T G.711 A-law byte -> linear PCM. A-law's sign bit is the
    INVERSE of mu-law's: set (after the 0x55 toggle) means positive."""
    a ^= 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    if exp == 0:
        x = (mant << 4) + 8
    else:
        x = ((mant << 4) + 0x108) << (exp - 1)
    return x if sign else -x


def alaw_compress(x: int) -> int:
    """Linear PCM -> A-law byte."""
    sign = 0x80 if x >= 0 else 0
    x = min(abs(x), 32767)
    if x < 256:
        out = x >> 4
    else:
        exp = x.bit_length() - 8  # x in [256, 32767] -> exp in 1..7
        out = (exp << 4) | ((x >> (exp + 3)) & 0x0F)
    return (out | sign) ^ 0x55


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int = 8000, law: str = "ulaw"
) -> bytes:
    """Encode int16-range samples as a G.711 WAV (8 bits/sample,
    format tag 6/7). Mono or multi-channel like encode_wav."""
    if samples.ndim == 1:
        samples = samples[:, None]
    comp = ulaw_compress if law == "ulaw" else alaw_compress
    tag = _FMT_ULAW if law == "ulaw" else _FMT_ALAW
    flat = samples.reshape(-1).tolist()
    data = bytes(comp(int(v)) for v in flat)
    n_ch = samples.shape[1]
    fmt = struct.pack("<HHIIHH", tag, n_ch, sample_rate, sample_rate * n_ch, n_ch, 8)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
