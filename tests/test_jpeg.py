"""Baseline JPEG codec (dataops/jpeg.py): round-trips, spec corners,
fail-stop paths, and the decode integration in real_image_decode.

The oracle gate (mm_jpeg_stats) certifies the DC-exact path
end-to-end against DuckDB; these tests pin the entropy-coding
internals and the lossy/general-content behavior the oracle's
constant blocks cannot reach."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from outboxx_spark.dataops.jpeg import (
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _category,
    _extend,
    decode_jpeg,
    decode_jpeg_gray,
    encode_jpeg_color,
    encode_jpeg_gray,
    rgb_to_ycbcr_int,
    ycbcr_to_rgb_int,
)


def _const_block_image(blocks: np.ndarray) -> np.ndarray:
    return np.kron(blocks, np.ones((8, 8), dtype=np.uint8)).astype(np.uint8)


def test_zigzag_is_a_full_permutation():
    assert sorted(ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]
    # spec prefix: the first six entries of the scan
    assert ZIGZAG[:6] == ((0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2))


def test_constant_blocks_roundtrip_bit_exact_at_quant_1():
    rng = np.random.default_rng(3)
    px = _const_block_image(rng.integers(0, 256, size=(5, 3)))
    out = decode_jpeg_gray(encode_jpeg_gray(px, 1))
    assert (out == px).all()


def test_extreme_dc_contrast_exercises_large_diff_categories():
    # alternating 0/255 blocks: DC differences near the +-2040 extreme
    blocks = np.indices((6, 6)).sum(axis=0) % 2 * 255
    px = _const_block_image(blocks)
    out = decode_jpeg_gray(encode_jpeg_gray(px, 1))
    assert (out == px).all()


def test_random_content_roundtrips_within_one_at_quant_1():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(37, 41)).astype(np.uint8)  # non-mult-of-8
    out = decode_jpeg_gray(encode_jpeg_gray(px, 1))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1


def test_custom_quant_table_is_honored_and_bounded():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    q = np.full((8, 8), 2)
    q[0, 0] = 1  # keep DC near-exact, quantize AC coarser
    out = decode_jpeg_gray(encode_jpeg_gray(px, q))
    # worst-case reconstruction error is bounded by the quant energy:
    # sum of per-coefficient errors <= sum(q)/2 spread over the block
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 1 + q.max()


def test_smooth_content_compresses_below_raw():
    y, x = np.mgrid[0:64, 0:64]
    px = ((np.sin(x / 9) + np.sin(y / 7)) * 60 + 128).astype(np.uint8)
    blob = encode_jpeg_gray(px, 16)
    assert len(blob) < px.size // 2
    err = np.abs(
        decode_jpeg_gray(blob).astype(int) - px.astype(int)
    ).mean()
    assert err < 4.0


def test_app_and_com_segments_are_skipped():
    px = _const_block_image(np.array([[9, 200], [63, 17]]))
    blob = encode_jpeg_gray(px, 1)
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    patched = blob[:2] + app1 + com + blob[2:]
    assert (decode_jpeg_gray(patched) == px).all()


def test_header_sniffer_reads_our_dims():
    from outboxx_spark.dataops.multimodal import parse_image_dims

    px = _const_block_image(np.array([[1, 2, 3], [4, 5, 6]]))
    assert parse_image_dims(encode_jpeg_gray(px, 1)) == ("image/jpeg", 24, 16)


def test_real_image_decode_routes_jpeg_through_the_codec():
    from outboxx_spark.dataops.multimodal import real_image_decode

    px = _const_block_image(np.array([[200, 30], [90, 255]]))
    assert (real_image_decode(encode_jpeg_gray(px, 1)) == px).all()


# ---------------------------------------------------------------------------
# fail-stop paths
# ---------------------------------------------------------------------------


def _patch_marker(blob: bytes, find: bytes, repl: bytes) -> bytes:
    i = blob.index(find)
    return blob[:i] + repl + blob[i + len(find) :]


def test_arithmetic_fail_stops_and_mislabeled_progressive_is_loud():
    blob = encode_jpeg_gray(_const_block_image(np.array([[7]])), 1)
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg_gray(_patch_marker(blob, b"\xff\xc0", b"\xff\xc9"))
    # a baseline stream whose SOF is patched to SOF2 routes to the
    # progressive decoder, whose scan-header rules reject the baseline
    # full-band SOS loudly (never a silent mis-decode)
    with pytest.raises(ValueError, match="DC scan with nonzero Se"):
        decode_jpeg_gray(_patch_marker(blob, b"\xff\xc0", b"\xff\xc2"))


def test_unsupported_component_count_fail_stops():
    blob = bytearray(encode_jpeg_gray(_const_block_image(np.array([[7]])), 1))
    i = blob.index(b"\xff\xc0")
    blob[i + 9] = 2  # ncomp byte of SOF0: only 1 and 3 are supported
    with pytest.raises(ValueError, match="2-component"):
        decode_jpeg_gray(bytes(blob))


def test_non_integral_sampling_ratio_fail_stops():
    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    blob = bytearray(encode_jpeg_color(rgb))
    i = blob.index(b"\xff\xc0")
    blob[i + 11] = 0x31  # Y -> (3, 1)
    blob[i + 14] = 0x21  # Cb -> (2, 1): 3 % 2 != 0, no integral upsample
    with pytest.raises(ValueError, match="non-integral"):
        decode_jpeg(bytes(blob))


@pytest.mark.parametrize("factors", [(2, 1), (4, 1), (1, 2)])
def test_general_subsampling_constant_mcus_roundtrip(factors):
    sh, sv = factors
    rng = np.random.default_rng(40 + sh * 4 + sv)
    mb = rng.integers(0, 256, size=(2, 3, 3))
    rgb = np.repeat(np.repeat(mb, 8 * sv, axis=0), 8 * sh, axis=1).astype(
        np.uint8
    )
    out = decode_jpeg(encode_jpeg_color(rgb, 1, 1, subsample=(sh, sv)))
    want = ycbcr_to_rgb_int(rgb_to_ycbcr_int(rgb))
    assert (out == want).all()
    # odd dims keep their crop
    rgb2 = rng.integers(0, 256, size=(21, 19, 3)).astype(np.uint8)
    assert decode_jpeg(
        encode_jpeg_color(rgb2, 1, 1, subsample=(sh, sv))
    ).shape == rgb2.shape


def test_420_constant_macroblocks_roundtrip_exactly():
    rng = np.random.default_rng(31)
    mb = rng.integers(0, 256, size=(3, 2, 3))
    rgb = np.repeat(np.repeat(mb, 16, axis=0), 16, axis=1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_color(rgb, 1, 1, subsample=True))
    want = ycbcr_to_rgb_int(rgb_to_ycbcr_int(rgb))
    assert (out == want).all()


def test_420_smooth_content_and_odd_dims():
    y, x = np.mgrid[0:35, 0:29]  # not multiples of 16
    rgb = np.stack(
        [(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_color(rgb, 1, 1, subsample=True))
    assert out.shape == rgb.shape
    want = ycbcr_to_rgb_int(rgb_to_ycbcr_int(rgb))
    err = np.abs(out.astype(int) - want.astype(int))
    # chroma halving on a smooth gradient: small bounded error
    assert err.mean() < 3.0, err.mean()


def test_420_is_smaller_than_444_on_real_content():
    rng = np.random.default_rng(33)
    rgb = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
    assert len(encode_jpeg_color(rgb, 8, 8, subsample=True)) < len(
        encode_jpeg_color(rgb, 8, 8)
    )


# ---------------------------------------------------------------------------
# color path
# ---------------------------------------------------------------------------


def _const_color_image(blocks: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(np.uint8)


def test_color_constant_blocks_equal_the_pure_colorspace_roundtrip():
    rng = np.random.default_rng(21)
    rgb = _const_color_image(rng.integers(0, 256, size=(4, 3, 3)))
    out = decode_jpeg(encode_jpeg_color(rgb, 1, 1))
    want = ycbcr_to_rgb_int(rgb_to_ycbcr_int(rgb))
    assert (out == want).all()
    # and the color-space round trip itself is within the JFIF bound
    assert np.abs(want.astype(int) - rgb.astype(int)).max() <= 2


def test_color_random_content_stays_near_the_colorspace_roundtrip():
    rng = np.random.default_rng(22)
    rgb = rng.integers(0, 256, size=(21, 17, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_color(rgb, 1, 1))
    want = ycbcr_to_rgb_int(rgb_to_ycbcr_int(rgb))
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 4


def test_color_uses_separate_chroma_quant_table():
    y, x = np.mgrid[0:32, 0:32]
    rgb = np.stack([(x * 8) % 256, (y * 8) % 256, ((x + y) * 4) % 256], axis=-1)
    rgb = rgb.astype(np.uint8)
    fine = len(encode_jpeg_color(rgb, 1, 1))
    coarse = len(encode_jpeg_color(rgb, 1, 32))
    assert coarse < fine  # chroma table actually quantizes the chroma


def test_gray_view_of_color_is_itu601_luma():
    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[..., 0] = 255  # pure red
    g = decode_jpeg_gray(encode_jpeg_color(rgb, 1, 1))
    want = ycbcr_to_rgb_int(rgb_to_ycbcr_int(rgb)).astype(np.int64)
    luma = (want[..., 0] * 299 + want[..., 1] * 587 + want[..., 2] * 114) // 1000
    assert (g == luma.astype(np.uint8)).all()


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_constant_blocks_roundtrip_exactly():
    from outboxx_spark.dataops.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(51)
    px = _const_block_image(rng.integers(0, 256, size=(4, 3)))
    assert (decode_jpeg(encode_jpeg_progressive(px, 1)) == px).all()


def test_progressive_decodes_identically_to_baseline_at_every_script():
    # the strongest check available: the scan script transmits the SAME
    # quantized coefficients, so the decoded image must be bit-equal to
    # the baseline decode — across spectral-selection-only, default,
    # and deep successive-approximation scripts, for gray and color
    from outboxx_spark.dataops.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(52)
    px = rng.integers(0, 256, size=(37, 41)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg_gray(px, 1))
    for kw in (
        dict(dc_al=0, ac_al=0),
        dict(dc_al=1, ac_al=1),
        dict(dc_al=3, ac_al=3, bands=((1, 2), (3, 9), (10, 63))),
    ):
        got = decode_jpeg(encode_jpeg_progressive(px, 1, **kw))
        assert (got == base).all(), kw
    rgb = rng.integers(0, 256, size=(19, 23, 3)).astype(np.uint8)
    cbase = decode_jpeg(encode_jpeg_color(rgb, 1, 1))
    cprog = decode_jpeg(encode_jpeg_progressive(rgb, 1, dc_al=2, ac_al=2))
    assert (cprog == cbase).all()


def test_progressive_lossy_matches_lossy_baseline():
    from outboxx_spark.dataops.jpeg import encode_jpeg_progressive

    y, x = np.mgrid[0:64, 0:64]
    px = ((np.sin(x / 9) + np.sin(y / 7)) * 60 + 128).astype(np.uint8)
    assert (
        decode_jpeg(encode_jpeg_progressive(px, 16))
        == decode_jpeg(encode_jpeg_gray(px, 16))
    ).all()


def test_progressive_eob_runs_span_blocks():
    # an image with long runs of all-zero AC bands forces multi-block
    # EOB runs (the (r<<4) symbols with extra bits) in both directions
    from outboxx_spark.dataops.jpeg import encode_jpeg_progressive

    px = _const_block_image(np.full((8, 8), 77, dtype=np.uint8))
    blob = encode_jpeg_progressive(px, 1, dc_al=1, ac_al=1)
    assert (decode_jpeg(blob) == px).all()


def test_encoder_numerators_nonnegative_over_rgb_extremes():
    # the floor-vs-truncate safety argument rests on this invariant
    corners = np.array(
        [[r, g, b] for r in (0, 255) for g in (0, 255) for b in (0, 255)],
        dtype=np.int64,
    )
    r, g, b = corners[:, 0], corners[:, 1], corners[:, 2]
    assert (299_000 * r + 587_000 * g + 114_000 * b + 500_000).min() >= 0
    assert (
        128_000_000 - 168_736 * r - 331_264 * g + 500_000 * b + 500_000
    ).min() >= 0
    assert (
        128_000_000 + 500_000 * r - 418_688 * g - 81_312 * b + 500_000
    ).min() >= 0


def test_truncated_entropy_stream_fail_stops():
    blob = encode_jpeg_gray(
        _const_block_image(np.arange(16, dtype=np.uint8).reshape(4, 4) * 16), 1
    )
    with pytest.raises(ValueError, match="truncated|Huffman"):
        decode_jpeg_gray(blob[: len(blob) - 12])


def test_not_a_jpeg_fail_stops():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x89PNG\r\n\x1a\nxxxx")


def test_dri_fail_stops():
    blob = encode_jpeg_gray(_const_block_image(np.array([[7]])), 1)
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    with pytest.raises(ValueError, match="DRI"):
        decode_jpeg_gray(blob[:2] + dri + blob[2:])


def test_encode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="2-D"):
        encode_jpeg_gray(np.zeros((4, 4, 3), dtype=np.uint8), 1)
    with pytest.raises(ValueError, match="quant"):
        encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8), 0)
    with pytest.raises(ValueError, match="empty"):
        encode_jpeg_gray(np.zeros((0, 8), dtype=np.uint8), 1)


# ---------------------------------------------------------------------------
# entropy-coding internals
# ---------------------------------------------------------------------------


def test_bit_writer_reader_roundtrip_with_ff_stuffing():
    bw = _BitWriter()
    vals = [(0xFF, 8), (0x3, 2), (0xFFFF, 16), (0x0, 1), (0x1FF, 9)]
    for v, n in vals:
        bw.write(v, n)
    data = bw.flush()
    assert b"\xff\x00" in data  # stuffing actually happened
    br = _BitReader(data)
    assert [(br.read(n)) for _, n in vals] == [v for v, _ in vals]


def test_category_amplitude_extend_are_inverses():
    from outboxx_spark.dataops.jpeg import _amplitude

    for v in list(range(-2047, 2048, 97)) + [-2040, -1, 1, 2040]:
        s = _category(v)
        if v == 0:
            assert s == 0
            continue
        assert _extend(_amplitude(v, s), s) == v
