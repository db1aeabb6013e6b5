"""Audio-modality operators over REAL PCM decode (dataops/wav.py) —
the audio row of the multimodal table, certified the same way as the
image row (multimodal.py's mm_pixel_stats): a corpus of real WAV
blobs whose samples derive arithmetically from doc_id, so the DuckDB
oracle recomputes every feature WITHOUT any audio code — a green hash
proves encode -> chunk walk -> PCM decode -> feature math is a true
inverse of the generating formula at both bit depths and channel
layouts.

Features are deliberately INTEGER-exact (sum of squares, zero
crossings, peak amplitude, frame counts) rather than float RMS/dB:
the repo's money-exactness history (COVERAGE.md) showed cross-engine
float aggregation is where silent hash drift lives, and every one of
these integers carries the same information the float form would.

Scale: blobs are synthesized AND decoded executor-side in one Arrow
pass each (mapInPandas); nothing but (doc_id, 5 integers) crosses a
shuffle. The id frame repartitions before the encode pass so the
single-file testdata scan doesn't serialize the pipeline (the
synth_real_pngs scatter rationale).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from outboxx_spark.dataops.wav import decode_wav, encode_wav

# Generation parameters: bounded, doc_id-derived variety across frame
# counts, sample rates, channel counts, and bit depths so the decode
# path is exercised on every layout combination the codec supports.
FRAME_BASE = 256
FRAME_MOD = 7
FRAME_STEP = 64
RATES = (8000, 16000, 22050)


def _gen_params(d: int) -> tuple[int, int, int, int]:
    """(n_frames, sample_rate, n_channels, bits) for doc_id d —
    Python and SQL compute this identically with nonneg modulo."""
    n_frames = FRAME_BASE + (d % FRAME_MOD) * FRAME_STEP
    rate = RATES[d % len(RATES)]
    n_ch = 1 + d % 2
    bits = 16 if d % 3 else 8
    return n_frames, rate, n_ch, bits


def _gen_samples(d: int, n_frames: int, n_ch: int, bits: int) -> np.ndarray:
    """sample[t, c] = ((d*131 + t*7919 + c*104729) mod M) - off, with
    (M, off) = (65536, 32768) for 16-bit and (256, 0) for 8-bit (the
    8-bit WAV convention stores unsigned). Pure integer arithmetic —
    DuckDB mirrors it with the same nonneg-mod expression."""
    t, c = np.mgrid[0:n_frames, 0:n_ch]
    raw = d * 131 + t * 7919 + c * 104729
    if bits == 16:
        return (raw % 65536) - 32768
    return raw % 256


def synth_real_wavs(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): real deterministic PCM WAVs, encoded
    executor-side; layout (frames/rate/channels/bits) cycles by doc_id
    so decode sees every combination, not a hand-picked one."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                n_frames, rate, n_ch, bits = _gen_params(d)
                blobs.append(
                    encode_wav(_gen_samples(d, n_frames, n_ch, bits), rate, bits)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(gen, "doc_id long, blob binary")
    )


def audio_features(wavs: DataFrame) -> DataFrame:
    """REAL decode -> integer feature row per blob:

    - ``n_frames`` / ``sample_rate`` / ``n_channels`` from the decoded
      stream (not the generator — that's the point),
    - ``sumsq``: sum of squared samples over all channels (the energy
      integral; exact BIGINT),
    - ``zero_cross``: strict sign alternations on channel 0 (zeros
      break a run, the unambiguous convention),
    - ``peak``: max |sample| over all channels.

    One Arrow pass; 8-bit streams are compared in their re-centered
    (x - 128) form, exactly what decode_wav hands every consumer."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["blob"]):
                rate, arr = decode_wav(bytes(b))
                a64 = arr.astype(np.int64)
                ch0 = a64[:, 0]
                sign = np.sign(ch0)
                rows.append(
                    (
                        int(d),
                        arr.shape[0],
                        rate,
                        arr.shape[1],
                        int((a64 * a64).sum()),
                        int(((sign[1:] * sign[:-1]) < 0).sum()),
                        int(np.abs(a64).max()) if a64.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "sample_rate",
                    "n_channels",
                    "sumsq",
                    "zero_cross",
                    "peak",
                ],
            )

    return wavs.mapInPandas(
        feats,
        "doc_id long, n_frames long, sample_rate long, n_channels long, "
        "sumsq long, zero_cross long, peak long",
    )


def planted_audio_features(spark, sf_dir: str) -> DataFrame:
    """Driver query body: synth real WAVs over documents -> real
    decode -> integer features."""
    from outboxx_spark.sources.tables import read_table

    return audio_features(synth_real_wavs(read_table(spark, sf_dir, "documents")))


def decimate_audio(wavs: DataFrame, k: int = 4) -> DataFrame:
    """Integer decimation (the audio 'resize'): decode, keep every
    k-th frame, RE-ENCODE at rate/k, then re-decode the new blob for
    its stats — certifying the full decode -> transform -> encode ->
    decode chain, not just one direction. Output: (doc_id, out_frames,
    out_rate, out_sumsq), all integers.

    No anti-alias filter by design: decimation here is a frame
    SUBSETTING contract (like image frame_sample), so the oracle can
    mirror it with ``t mod k = 0`` — a filter kernel would put floats
    between the engines. The docstring is the API contract: callers
    wanting band-limited resampling plug a filter into the same
    mapInPandas slot."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["blob"]):
                rate, arr = decode_wav(bytes(b))
                kept = arr[::k]
                # 16-bit re-encode is lossless for both input widths
                # (8-bit recentered values fit int16)
                blob2 = encode_wav(kept.astype(np.int16), max(rate // k, 1), 16)
                rate2, arr2 = decode_wav(blob2)
                a64 = arr2.astype(np.int64)
                rows.append(
                    (int(d), arr2.shape[0], rate2, int((a64 * a64).sum()))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_frames", "out_rate", "out_sumsq"]
            )

    return wavs.mapInPandas(
        dec, "doc_id long, out_frames long, out_rate long, out_sumsq long"
    )


def planted_audio_decimate(spark, sf_dir: str, k: int = 4) -> DataFrame:
    from outboxx_spark.sources.tables import read_table

    return decimate_audio(synth_real_wavs(read_table(spark, sf_dir, "documents")), k)


# ---------------------------------------------------------------------------
# DuckDB mirrors: every feature recomputed from the generating formula
# over unnest(range(...)) — no WAV bytes, no audio code on the oracle
# side. Samples: ((d*131 + t*7919 + c*104729) % M + M) % M - off.
# ---------------------------------------------------------------------------

_PARAMS_CTE = f"""
params AS (
  SELECT doc_id,
         {FRAME_BASE}
           + (((doc_id % {FRAME_MOD}) + {FRAME_MOD}) % {FRAME_MOD})
             * {FRAME_STEP} AS n_frames,
         CASE ((doc_id % 3) + 3) % 3
           WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 22050 END AS sample_rate,
         1 + ((doc_id % 2) + 2) % 2 AS n_channels,
         CASE WHEN ((doc_id % 3) + 3) % 3 = 0 THEN 8 ELSE 16 END AS bits
  FROM documents
)
"""


def _sample_expr(d: str, t: str, c: str) -> str:
    """Signed sample value for 16-bit docs, recentered (x-128) for
    8-bit docs — matching decode_wav's uniform contract."""
    raw = f"(({d} * 131 + {t} * 7919 + {c} * 104729))"
    return (
        f"CASE WHEN bits = 16 THEN (({raw} % 65536) + 65536) % 65536 - 32768 "
        f"ELSE (({raw} % 256) + 256) % 256 - 128 END"
    )


AUDIO_FEATURES_SQL = f"""
WITH {_PARAMS_CTE},
samples AS (
  -- one unnest over the interleaved index; frames are channel-major
  -- like the PCM stream itself: t = i // n_channels, c = i % n_channels
  SELECT doc_id, n_frames, sample_rate, n_channels,
         i // n_channels AS t, i % n_channels AS c,
         {_sample_expr("doc_id", "(i // n_channels)", "(i % n_channels)")} AS s
  FROM (
    SELECT p.*, unnest(range(n_frames * n_channels)) AS i FROM params p
  )
),
per_doc AS (
  SELECT doc_id,
         any_value(n_frames) AS n_frames,
         any_value(sample_rate) AS sample_rate,
         any_value(n_channels) AS n_channels,
         sum(s * s) AS sumsq,
         max(abs(s)) AS peak
  FROM samples GROUP BY doc_id
),
ch0 AS (
  SELECT doc_id, t, sign(s) AS g
  FROM samples WHERE c = 0
),
zc AS (
  SELECT a.doc_id, sum(CASE WHEN a.g * b.g < 0 THEN 1 ELSE 0 END) AS zero_cross
  FROM ch0 a JOIN ch0 b ON a.doc_id = b.doc_id AND b.t = a.t + 1
  GROUP BY a.doc_id
)
SELECT p.doc_id,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(sample_rate AS BIGINT) AS sample_rate,
       CAST(n_channels AS BIGINT) AS n_channels,
       CAST(sumsq AS BIGINT) AS sumsq,
       CAST(coalesce(z.zero_cross, 0) AS BIGINT) AS zero_cross,
       CAST(peak AS BIGINT) AS peak
FROM per_doc p LEFT JOIN zc z ON p.doc_id = z.doc_id
"""


def AUDIO_DECIMATE_SQL(k: int = 4) -> str:
    # decimation keeps t ≡ 0 (mod k); 8-bit docs decimate their
    # RECENTERED samples (decode before transform), and the 16-bit
    # re-encode round-trips those values losslessly
    return f"""
WITH {_PARAMS_CTE},
samples AS (
  SELECT doc_id, n_frames, sample_rate, n_channels,
         i // n_channels AS t,
         {_sample_expr("doc_id", "(i // n_channels)", "(i % n_channels)")} AS s
  FROM (
    SELECT p.*, unnest(range(n_frames * n_channels)) AS i FROM params p
  )
  WHERE (i // n_channels) % {k} = 0
)
SELECT doc_id,
       CAST(count(*) // any_value(n_channels) AS BIGINT) AS out_frames,
       CAST(any_value(sample_rate) // {k} AS BIGINT) AS out_rate,
       CAST(sum(s * s) AS BIGINT) AS out_sumsq
FROM samples
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# G.711 telephony audio (r10 tail): mu-law / A-law WAVs decode for
# real (dataops/wav.py format tags 7/6). Certification trick: the
# synthesized samples are already G.711-CANONICAL — sample value =
# expand(formula_byte) — so compress->container->decode returns
# exactly those values (value-level idempotence is pinned for all 256
# bytes in tests), and the DuckDB mirror only needs the EXPAND
# formula, a direct integer expression of the byte's bit fields.
# ---------------------------------------------------------------------------


def synth_real_g711(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): real G.711 WAVs — mu-law for even doc_id,
    A-law for odd — of canonical-valued mono samples derived from
    byte[t] = (doc_id*131 + t*7919) mod 256."""
    from outboxx_spark.dataops.wav import (
        alaw_expand,
        encode_wav_g711,
        ulaw_expand,
    )

    ulut = np.array([ulaw_expand(b) for b in range(256)], dtype=np.int64)
    alut = np.array([alaw_expand(b) for b in range(256)], dtype=np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                n_frames = FRAME_BASE + (d % FRAME_MOD) * FRAME_STEP
                t = np.arange(n_frames)
                bytes_ = (d * 131 + t * 7919) % 256
                law = "ulaw" if d % 2 == 0 else "alaw"
                lut = ulut if d % 2 == 0 else alut
                blobs.append(encode_wav_g711(lut[bytes_], 8000, law))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(gen, "doc_id long, blob binary")
    )


def g711_stats(docs: DataFrame) -> DataFrame:
    """G.711 certification body: real companded WAVs -> expand decode
    -> integer stats (frames, energy, peak)."""
    from outboxx_spark.dataops.wav import decode_wav

    wavs = synth_real_g711(docs)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["blob"]):
                rate, arr = decode_wav(bytes(b))
                a64 = arr.astype(np.int64)
                rows.append(
                    (
                        int(d),
                        arr.shape[0],
                        int((a64 * a64).sum()),
                        int(np.abs(a64).max()) if a64.size else 0,
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "sumsq", "peak"])

    return wavs.mapInPandas(
        stats, "doc_id long, n_frames long, sumsq long, peak long"
    )


def planted_g711_stats(spark, sf_dir: str) -> DataFrame:
    from outboxx_spark.sources.tables import read_table

    return g711_stats(read_table(spark, sf_dir, "documents"))


# DuckDB mirror: expand() as direct integer bit arithmetic on the
# formula byte. mu-law: u = 255 - b; sign = u >= 128; mag =
# ((u%16)*8 + 132) * 2^((u//16)%8) - 132. A-law: a = b XOR 0x55
# (xor(b, 85)); exp = (a//16)%8; mant = a%16; mag = mant*16 + 8 for
# exp 0, else (mant*16 + 264) * 2^(exp-1); sign bit SET means
# positive (the inverse of mu-law, pinned in tests).
G711_STATS_SQL = f"""
WITH params AS (
  SELECT doc_id,
         {FRAME_BASE} + (((doc_id % {FRAME_MOD}) + {FRAME_MOD}) % {FRAME_MOD})
           * {FRAME_STEP} AS n_frames
  FROM documents
),
bytes AS (
  SELECT doc_id, n_frames,
         (((doc_id * 131 + t * 7919) % 256) + 256) % 256 AS b,
         doc_id % 2 = 0 AS is_ulaw
  FROM (SELECT p.*, unnest(range(n_frames)) AS t FROM params p)
),
expanded AS (
  SELECT doc_id, n_frames,
    CASE WHEN is_ulaw THEN
      CASE WHEN (255 - b) >= 128 THEN -1 ELSE 1 END
      * ((((255 - b) % 16) * 8 + 132) * (1 << (((255 - b) // 16) % 8)) - 132)
    ELSE
      CASE WHEN (xor(b, 85) // 128) = 1 THEN 1 ELSE -1 END
      * (CASE WHEN ((xor(b, 85) // 16) % 8) = 0
              THEN (xor(b, 85) % 16) * 16 + 8
              ELSE ((xor(b, 85) % 16) * 16 + 264)
                   * (1 << (((xor(b, 85) // 16) % 8) - 1)) END)
    END AS s
  FROM bytes
)
SELECT doc_id,
       CAST(any_value(n_frames) AS BIGINT) AS n_frames,
       CAST(sum(s * s) AS BIGINT) AS sumsq,
       CAST(max(abs(s)) AS BIGINT) AS peak
FROM expanded
GROUP BY doc_id
"""
