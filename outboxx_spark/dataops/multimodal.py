"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the *decode* step is
stubbed (deterministic fake features, clearly marked; real decoders are
gated behind import-try and raise NotImplementedError). The Spark-side
plumbing — schema, batch shape, partitioning, UDF signatures — is real
and tested: swap ``_fake_decode`` for a PIL/librosa call and nothing
else changes.

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
    ]
)


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


def _fake_decode(blob: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode: derives FEATURE_DIM floats from byte
    statistics. Stands in for image-decode + model-embed; replace with a
    real decoder when PIL/torchvision are available."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), FEATURE_DIM)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks])


def decode_features(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """mapInPandas decode: Arrow batches in, (doc_id, features) out.
    Batch shape preserved; memory bounded by the Arrow batch size."""
    out_schema = "doc_id long, features array<double>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": [_fake_decode(b) for b in pdf[blob_col]],
                }
            )

    return df.select("doc_id", blob_col).mapInPandas(decode, out_schema)


def decode_features_long(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Exploded (doc_id, dim, value) view of :func:`decode_features` —
    hashable scalars only, so external comparators (and the driver's
    canonicalizer) can sort/hash the result. Same information, long form."""
    feats = decode_features(df, blob_col)
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


def real_image_decode(blob: bytes):  # pragma: no cover - stub
    """Real decoder slot. Raises until an image library is installed."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/pillow, not present in this container"
        ) from e
    raise NotImplementedError("wire Image.open(io.BytesIO(blob)) here")


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
