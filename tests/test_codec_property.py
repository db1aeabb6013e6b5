"""Property-based round-trips for the from-scratch media codecs
(hypothesis): arbitrary content through PNG / JPEG / GIF / BMP /
TIFF / WAV / G.711, complementing the formula-certified oracles with
adversarial shapes the formulas never produce."""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

dims = st.integers(1, 40)


def _img(h, w, seed):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w)).astype(
        np.uint8
    )


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31))
def test_png_roundtrip_any_dims(h, w, seed):
    from outboxx_spark.dataops.png import decode_png, encode_png

    px = _img(h, w, seed)
    assert np.array_equal(decode_png(encode_png(px, filter_type=seed % 5)), px)


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31))
def test_gif_roundtrip_any_dims(h, w, seed):
    from outboxx_spark.dataops.gif import decode_gif, encode_gif_gray

    px = _img(h, w, seed)
    out = decode_gif(encode_gif_gray(px, interlace=bool(seed % 2)))
    assert np.array_equal(out[..., 0], px)


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31))
def test_tiff_roundtrip_any_dims(h, w, seed):
    from outboxx_spark.dataops.tiff import decode_tiff, encode_tiff_gray

    px = _img(h, w, seed)
    assert np.array_equal(
        decode_tiff(encode_tiff_gray(px, packbits=bool(seed % 2))), px
    )


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31))
def test_bmp_roundtrip_any_dims(h, w, seed):
    from outboxx_spark.dataops.gif import decode_bmp, encode_bmp_gray

    px = _img(h, w, seed)
    assert np.array_equal(decode_bmp(encode_bmp_gray(px))[..., 0], px)


@settings(max_examples=20, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31))
def test_jpeg_q1_roundtrip_within_one_any_dims(h, w, seed):
    from outboxx_spark.dataops.jpeg import decode_jpeg, encode_jpeg_gray

    px = _img(h, w, seed)
    out = decode_jpeg(encode_jpeg_gray(px, 1))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1


@settings(max_examples=200, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31))
# r10 judge's falsifying example (ac_al=2): a history-nonzero AC
# coefficient past a >=16 zero run — the refinement ZRL-drain-order
# bug fixed at dataops/jpeg.py _emit_ac_refine. Pinned forever.
@example(h=25, w=18, seed=1650415254)
def test_progressive_equals_baseline_decode_any_dims(h, w, seed):
    from outboxx_spark.dataops.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    px = _img(h, w, seed)
    base = decode_jpeg(encode_jpeg_gray(px, 1))
    prog = decode_jpeg(
        encode_jpeg_progressive(px, 1, dc_al=seed % 3, ac_al=seed % 4)
    )
    assert np.array_equal(prog, base)


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    ch=st.integers(1, 3),
    seed=st.integers(0, 2**31),
)
def test_wav_pcm16_roundtrip_any_samples(vals, ch, seed):
    from outboxx_spark.dataops.wav import decode_wav, encode_wav

    n = len(vals) - len(vals) % ch
    if n == 0:
        return
    arr = np.array(vals[:n]).reshape(-1, ch)
    rate, out = decode_wav(encode_wav(arr, 16000, 16))
    assert np.array_equal(out, arr)


@settings(max_examples=50, deadline=None)
@given(x=st.integers(-40000, 40000))
def test_g711_both_laws_fixed_point_and_bound(x):
    from outboxx_spark.dataops.wav import (
        alaw_compress,
        alaw_expand,
        ulaw_compress,
        ulaw_expand,
    )

    for comp, exp in ((ulaw_compress, ulaw_expand), (alaw_compress, alaw_expand)):
        v = exp(comp(x))
        assert exp(comp(v)) == v
        clamp = max(min(x, 32767), -32767)
        assert abs(v - clamp) <= max(abs(clamp) >> 4, 64)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=600))
def test_packbits_roundtrip_arbitrary_bytes(data):
    from outboxx_spark.dataops.tiff import packbits_decode, packbits_encode

    assert packbits_decode(packbits_encode(data), len(data)) == data


@settings(max_examples=30, deadline=None)
@given(
    idx=st.lists(st.integers(0, 255), min_size=1, max_size=800),
)
def test_gif_lzw_roundtrip_arbitrary_indices(idx):
    from outboxx_spark.dataops.gif import _lzw_compress, _lzw_decompress

    arr = np.array(idx, dtype=np.uint8)
    out = _lzw_decompress(_lzw_compress(arr, 8), 8, len(arr))
    assert np.array_equal(out, arr)
