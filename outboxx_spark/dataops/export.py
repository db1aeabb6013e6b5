"""Training-shard EXPORT: the write path that turns assign_shards'
ids into real on-disk shards a trainer can consume.

Reference parity: the reference stops at delivering events to Kafka
(src/sink/kafka.zig); a pretraining pipeline additionally needs the
corpus ON DISK as N size-balanced, reproducible shard files plus a
verifiable manifest. This module is that step, Spark-first:

- **One file per shard, no driver loop.** ``repartition(n, "shard")``
  hash-partitions rows so every shard lands WHOLLY inside exactly one
  task, and the ``partitionBy("shard")`` writer then emits exactly one
  parquet file under each ``shard=K/`` directory — K shards written by
  ``min(n_partitions, K)`` parallel tasks, zero coordination. (A
  driver-side per-shard write loop — the obvious first cut — would
  serialize the job and hold the corpus in driver memory; rejected.)
- **Deterministic row order inside a shard.** ``sortWithinPartitions``
  on the same (knuth key, doc_id) order that defined shard membership,
  so a re-export of the same corpus produces the same rows in the same
  order — resumable, auditable training.
- **Manifest as the commit marker.** Per-shard (n_docs, n_tokens,
  fingerprint) where fingerprint = BIT_XOR of xxhash64(doc_id, text):
  order-independent (XOR commutes — the agg needs no sort) and
  overflow-free under ANSI mode, unlike a SUM of hashes. The manifest
  is written AFTER the data job commits; its absence marks a torn
  export (the same write-then-publish protocol as the incremental
  dedup store's prepare/commit, incremental.py).
- **Verification is a distributed re-read,** not a trust-the-writer
  checksum: recompute the per-shard aggregate from the published
  files and anti-compare against the manifest. O(corpus) scan, O(K)
  result.

At 100 TB: two full-corpus shuffles total — the within-bucket window
in assign_shards (skinny columns only) and the repartition-for-write
(payload). The manifest/verify aggregates are partial-aggregable.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.dataops.sharding import _shuffle_key, assign_shards
from outboxx_spark.fsutil import fs_read_text, fs_write_text

# underscore prefix: Spark's file index skips _-prefixed names (the
# _SUCCESS convention), so the manifest never shadows the data files
MANIFEST_NAME = "_manifest.json"


def _fingerprint() -> Column:
    # xxhash64 over (doc_id, text) folded with BIT_XOR: commutative, so
    # the aggregate is order-independent and needs no shuffle-side sort
    return F.expr("bit_xor(xxhash64(doc_id, text))")


def shard_manifest(shards: DataFrame) -> DataFrame:
    """Per-shard (n_docs, n_tokens, fingerprint) over a frame carrying
    (shard, doc_id, n_tokens, text)."""
    return shards.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        _fingerprint().alias("fingerprint"),
    )


def export_shards(
    df: DataFrame,
    out_dir: str,
    *,
    target: int,
    doc_id: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> dict[str, Any]:
    """Write ``df`` as size-balanced training shards under ``out_dir``.

    Layout: ``out_dir/shard=K/part-*.parquet`` (exactly one file per
    shard) + ``out_dir/_manifest.json`` written last as the commit
    marker. Returns the manifest dict. All manifest I/O goes through
    fsutil (Hadoop FileSystem), so the commit protocol works on any
    scheme the data path does (hdfs://, s3a://, file://) — the same
    marker convention as the ivf store and the incragg ledger.
    """
    assigned = assign_shards(
        df, F.size(F.split(F.col(text_col), " ")).cast("long"), target,
        doc_id=doc_id, n_buckets=n_buckets,
    )
    payload = df.select(
        F.col(doc_id).alias("doc_id"), F.col(text_col).alias("text")
    )
    shards = (
        payload.join(assigned, "doc_id")
        .withColumn("_key", _shuffle_key("doc_id"))
        .select("shard", "doc_id", "n_tokens", "text", "_key")
    )
    n_shards = shards.agg(F.max("shard")).first()[0]
    if n_shards is None:
        raise ValueError("export_shards: empty corpus")
    n_shards = int(n_shards) + 1

    (
        shards.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_key", "doc_id")
        .drop("_key")
        .write.mode("errorifexists")
        .partitionBy("shard")
        .parquet(out_dir)
    )

    rows = sorted(
        shard_manifest(shards).collect(), key=lambda r: r["shard"]
    )  # bounded: n_shards rows
    manifest = {
        "n_shards": n_shards,
        "target_tokens": target,
        "shards": [
            {
                "shard": int(r["shard"]),
                "n_docs": int(r["n_docs"]),
                "n_tokens": int(r["n_tokens"]),
                "fingerprint": int(r["fingerprint"]),
            }
            for r in rows
        ],
    }
    # fs_write_text = write-temp-then-rename through Hadoop's FileSystem:
    # atomic publish on any scheme (mode errorifexists above guarantees
    # the destination is fresh, so the write-once contract holds)
    fs_write_text(
        df.sparkSession, f"{out_dir}/{MANIFEST_NAME}", json.dumps(manifest, indent=1)
    )
    return manifest


def is_committed(spark: SparkSession, out_dir: str) -> bool:
    """True iff the export's manifest was published (torn exports —
    data files without a manifest — must be discarded and re-run)."""
    return fs_read_text(spark, f"{out_dir}/{MANIFEST_NAME}") is not None


def verify_export(spark: SparkSession, out_dir: str) -> list[dict[str, Any]]:
    """Re-read the published shards and diff the recomputed per-shard
    aggregate against the manifest. Returns a list of mismatch dicts
    (empty == export verified). Distributed scan, O(n_shards) result."""
    text = fs_read_text(spark, f"{out_dir}/{MANIFEST_NAME}")
    if text is None:
        raise FileNotFoundError(f"no {MANIFEST_NAME} under {out_dir}: torn export")
    manifest = json.loads(text)
    read = spark.read.parquet(out_dir).withColumn(
        "shard", F.col("shard").cast("long")
    )
    actual = {
        int(r["shard"]): r
        for r in shard_manifest(read).collect()  # bounded: n_shards rows
    }
    problems: list[dict[str, Any]] = []
    for want in manifest["shards"]:
        got = actual.pop(want["shard"], None)
        if got is None:
            problems.append({"shard": want["shard"], "err": "missing on disk"})
            continue
        for k in ("n_docs", "n_tokens", "fingerprint"):
            if int(got[k]) != want[k]:
                problems.append(
                    {"shard": want["shard"], "err": k,
                     "want": want[k], "got": int(got[k])}
                )
    for extra in sorted(actual):
        problems.append({"shard": extra, "err": "not in manifest"})
    return problems
