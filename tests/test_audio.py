"""WAV codec (dataops/wav.py) + audio operators (dataops/audio.py).

The oracle gate certifies the end-to-end formula inverse; these tests
pin the codec's spec corners (chunk walk, padding, bit depths,
fail-stop paths) and the operators' algebra against a from-scratch
recomputation."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from outboxx_spark.dataops import audio as A
from outboxx_spark.dataops.wav import decode_wav, encode_wav, parse_wav_meta


# ---------------------------------------------------------------------------
# codec round-trips
# ---------------------------------------------------------------------------


def test_roundtrip_16bit_stereo():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=(777, 2), dtype=np.int64)
    rate, out = decode_wav(encode_wav(s, 22050, 16))
    assert rate == 22050
    assert out.shape == (777, 2)
    assert (out == s).all()


def test_roundtrip_16bit_mono_1d_input():
    s = np.array([0, 1, -1, 32767, -32768])
    rate, out = decode_wav(encode_wav(s, 8000, 16))
    assert out.shape == (5, 1)
    assert (out[:, 0] == s).all()


def test_roundtrip_8bit_recenters():
    s = np.array([[0], [128], [255]])
    _, out = decode_wav(encode_wav(s, 8000, 8))
    assert out[:, 0].tolist() == [-128, 0, 127]


def test_meta_matches_encode_params():
    s = np.zeros((321, 2), dtype=np.int64)
    m = parse_wav_meta(encode_wav(s, 16000, 16))
    assert m == {
        "sample_rate": 16000,
        "n_channels": 2,
        "bits": 16,
        "n_frames": 321,
    }


def test_odd_sized_data_chunk_pads_to_even():
    # 8-bit mono with an odd frame count: data chunk is odd-sized, the
    # encoder must pad so a trailing chunk stays aligned — verify by
    # appending one and re-walking
    blob = encode_wav(np.array([[1], [2], [3]]), 8000, 8)
    assert len(blob) % 2 == 0
    extra = b"cue " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    patched = bytearray(blob + extra)
    patched[4:8] = struct.pack("<I", len(patched) - 8)
    m = parse_wav_meta(bytes(patched))
    assert m["n_frames"] == 3


def test_unknown_chunks_are_skipped():
    # inject a LIST chunk between fmt and data, as real recorders do
    blob = encode_wav(np.array([[5], [6]]), 8000, 16)
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 6) + b"INFOxy"
    patched = bytearray(blob[:fmt_end] + junk + blob[fmt_end:])
    patched[4:8] = struct.pack("<I", len(patched) - 8)
    rate, out = decode_wav(bytes(patched))
    assert out[:, 0].tolist() == [5, 6]
    assert parse_wav_meta(bytes(patched))["n_frames"] == 2


# ---------------------------------------------------------------------------
# fail-stop paths
# ---------------------------------------------------------------------------


def test_non_wav_meta_is_none_but_decode_raises():
    assert parse_wav_meta(b"not audio at all") is None
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")


def test_non_pcm_format_tag_fail_stops():
    blob = bytearray(encode_wav(np.array([[1]]), 8000, 16))
    blob[20:22] = struct.pack("<H", 0x0055)  # MP3 tag in fmt
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(blob))


def test_extensible_tag_fail_stops_with_distinct_message():
    blob = bytearray(encode_wav(np.array([[1]]), 8000, 16))
    blob[20:22] = struct.pack("<H", 0xFFFE)
    with pytest.raises(ValueError, match="EXTENSIBLE"):
        decode_wav(bytes(blob))


def test_truncated_data_chunk_fail_stops():
    blob = encode_wav(np.array([[1], [2], [3], [4]]), 8000, 16)
    with pytest.raises(ValueError, match="declares more bytes"):
        decode_wav(blob[:-3])


def test_out_of_range_samples_fail_encode():
    with pytest.raises(ValueError, match="range"):
        encode_wav(np.array([[40000]]), 8000, 16)
    with pytest.raises(ValueError, match="range"):
        encode_wav(np.array([[-1]]), 8000, 8)


def test_unsupported_bit_depth_fail_stops_both_ways():
    with pytest.raises(ValueError, match="bit depth"):
        encode_wav(np.array([[1]]), 8000, 24)
    blob = bytearray(encode_wav(np.array([[1]]), 8000, 16))
    blob[34:36] = struct.pack("<H", 24)
    with pytest.raises(ValueError, match="bit depth"):
        decode_wav(bytes(blob))


# ---------------------------------------------------------------------------
# operators vs from-scratch recomputation
# ---------------------------------------------------------------------------


def _model_features(d: int):
    n_frames, rate, n_ch, bits = A._gen_params(d)
    s = A._gen_samples(d, n_frames, n_ch, bits).astype(np.int64)
    if bits == 8:
        s = s - 128
    ch0 = s[:, 0]
    sg = np.sign(ch0)
    return (
        n_frames,
        rate,
        n_ch,
        int((s * s).sum()),
        int(((sg[1:] * sg[:-1]) < 0).sum()),
        int(np.abs(s).max()),
    )


def test_audio_features_match_python_model(spark, sf_dir):
    from outboxx_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents").limit(24)
    rows = A.audio_features(A.synth_real_wavs(docs)).collect()
    assert len(rows) == 24
    layouts = set()
    for r in rows:
        want = _model_features(r["doc_id"])
        got = (
            r["n_frames"],
            r["sample_rate"],
            r["n_channels"],
            r["sumsq"],
            r["zero_cross"],
            r["peak"],
        )
        assert got == want, r["doc_id"]
        layouts.add((r["n_channels"], r["sample_rate"]))
    assert len(layouts) >= 3, "layout variety not exercised"


def test_decimate_keeps_every_kth_frame(spark, sf_dir):
    from outboxx_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents").limit(12)
    k = 4
    rows = A.decimate_audio(A.synth_real_wavs(docs), k).collect()
    for r in rows:
        n_frames, rate, n_ch, bits = A._gen_params(r["doc_id"])
        s = A._gen_samples(r["doc_id"], n_frames, n_ch, bits).astype(np.int64)
        if bits == 8:
            s = s - 128
        kept = s[::k]
        assert r["out_frames"] == len(kept)
        assert r["out_rate"] == rate // k
        assert r["out_sumsq"] == int((kept * kept).sum())


def test_feature_pass_never_moves_blobs_through_a_shuffle(spark, sf_dir):
    import contextlib
    import io

    from outboxx_spark.sources.tables import read_table

    df = A.audio_features(
        A.synth_real_wavs(read_table(spark, sf_dir, "documents"))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # one exchange total — the 8-byte-id scatter BEFORE synthesis; the
    # synth -> decode chain runs within the same stage, so blobs never
    # serialize across a shuffle boundary
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:1500]


# ---------------------------------------------------------------------------
# G.711 companding (mu-law / A-law)
# ---------------------------------------------------------------------------


def test_g711_value_idempotence_and_error_bound():
    from outboxx_spark.dataops.wav import (
        alaw_compress,
        alaw_expand,
        ulaw_compress,
        ulaw_expand,
    )

    for x in list(range(-33000, 33001, 97)) + [0, 1, -1, 32767, -32768]:
        for comp, exp in (
            (ulaw_compress, ulaw_expand),
            (alaw_compress, alaw_expand),
        ):
            v = exp(comp(x))
            # the canonical value is a fixed point of the codec
            assert exp(comp(v)) == v, (comp.__name__, x)
            clamp = max(min(x, 32767), -32767)
            # logarithmic quantization: error <= ~1/16 of magnitude
            assert abs(v - clamp) <= max(abs(clamp) >> 4, 64), (comp.__name__, x)


def test_g711_every_byte_decodes_to_a_fixed_point():
    from outboxx_spark.dataops.wav import (
        alaw_compress,
        alaw_expand,
        ulaw_compress,
        ulaw_expand,
    )

    for b in range(256):
        assert ulaw_expand(ulaw_compress(ulaw_expand(b))) == ulaw_expand(b)
        assert alaw_expand(alaw_compress(alaw_expand(b))) == alaw_expand(b)


def test_g711_wav_container_roundtrip():
    from outboxx_spark.dataops.wav import (
        decode_wav,
        encode_wav_g711,
        parse_wav_meta,
        ulaw_expand,
    )

    # canonical-valued samples survive the container bit-exactly
    vals = np.array([ulaw_expand(b) for b in range(0, 256, 3)])
    blob = encode_wav_g711(vals, 8000, "ulaw")
    rate, arr = decode_wav(blob)
    assert rate == 8000 and (arr[:, 0] == vals).all()
    meta = parse_wav_meta(blob)
    assert meta["bits"] == 8 and meta["n_frames"] == len(vals)


def test_g711_alaw_sign_convention():
    from outboxx_spark.dataops.wav import alaw_compress, alaw_expand

    # A-law's sign bit is the inverse of mu-law's; a regression here
    # silently negates the whole stream
    assert alaw_expand(alaw_compress(1000)) > 0
    assert alaw_expand(alaw_compress(-1000)) < 0
