"""Incremental MinHash/LSH dedup: new document batches deduped against
the survivors of everything already ingested, via a persistent on-disk
LSH bucket store.

Production LLM-corpus dedup is incremental — crawls arrive continuously
and each delivery must be checked against the full accepted corpus
without re-running a global all-pairs job (reference counterpart: the
feed's continuously-arriving changelog semantics; batch analog:
``dedup.minhash_dedup_pairs`` / ``dedup.dedup_survivors``). This module
keeps a STORE under ``store_dir``:

- ``buckets/batch_id=N/bkt=M/``  (band, sig, doc_id) — the LSH bucket
  keys of every SURVIVOR, hash-partitioned by
  ``bkt = pmod(xxhash64(band, sig), n_store_buckets)``.
- ``docs/batch_id=N/dbk=M/``     (doc_id, sh) — each survivor's distinct
  shingle set for exact-Jaccard verification, hash-partitioned by
  ``dbk = pmod(xxhash64(doc_id), n_store_buckets)``.
- ``pairs/batch_id=N/``          the verified duplicate pairs each batch
  produced (the operator's audit output).

Per batch the work is:

1. MinHash signatures + band buckets for the NEW docs only.
2. Candidates new-vs-new: the standard banded self-join on the batch.
3. Candidates new-vs-old: the batch's bucket keys joined against the
   store — the store scan is PARTITION-PRUNED to the batch's touched
   ``bkt`` values (collected driver-side, bounded by n_store_buckets)
   and the batch side of the join is broadcast, so the store is never
   shuffled.
4. Exact-Jaccard verification of all candidates (same integer-only
   contract as ``ngram_jaccard_pairs``); old shingle sets come from the
   ``docs`` store, partition-pruned the same way.
5. Survivors (docs that are not the ``doc_b`` of any verified pair)
   append their bucket keys and shingle sets to the store; pairs land
   in ``pairs/``. Every write goes to the batch's own
   ``batch_id=N`` directory in overwrite mode, so REPLAYING a batch
   (Structured Streaming's recovery contract) is idempotent.

Semantics: within a batch, identical to ``dedup_survivors`` (greedy
min-id: any doc appearing as the higher id of a verified pair is
dropped). Across batches, first-seen-wins: a new doc is dropped iff it
duplicates a stored SURVIVOR — docs that were themselves dropped do not
block future docs (the store holds survivors only, so it grows with the
deduped corpus, not the raw feed).

100 TB shape: per-batch cost is O(batch) for signatures + a broadcast
probe of O(touched buckets) store rows — a batch touching B of the
n_store_buckets partitions reads ~B/n_store_buckets of the store.
Shuffles only ever carry batch-sized keyed rows. The store is
append-only (no rewrite, no compaction debt); n_store_buckets sizes the
pruning granularity exactly like the table sink's bucket count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.dataops.dedup import (
    lsh_band_buckets,
    lsh_bucket_pairs,
    minhash_signatures_from_sets,
    verify_jaccard_pairs,
)
from outboxx_spark.dataops.text import shingles
from outboxx_spark.dataops.util import parallelized as _parallelized
from outboxx_spark.fsutil import fs_exists, fs_read_text, fs_write_text

DEFAULT_STORE_BUCKETS = 64

_META = "_dedup_store_meta.json"


def _check_store_meta(
    spark: SparkSession, store_dir: str, k: int, threshold: float, n_store_buckets: int
) -> None:
    """The store's layout parameters are baked into its data: ``bkt``/
    ``dbk`` partitions are hashes mod ``n_store_buckets``, shingle sets
    and signatures depend on ``k``, survivor membership on
    ``threshold``. A later call with different values would prune the
    WRONG store partitions and silently pass duplicates through, so the
    parameters are persisted on first write and every call must match
    them exactly (fail-stop, same rule as the pgoutput decoder)."""
    import json as _json

    meta_path = f"{store_dir}/{_META}"
    want = {"k": k, "threshold": threshold, "n_store_buckets": n_store_buckets}
    raw = fs_read_text(spark, meta_path)
    if raw is None:
        if fs_exists(spark, f"{store_dir}/buckets"):
            # A store with data but no meta (pre-meta layout, or a lost
            # file) must FAIL CLOSED: adopting the caller's parameters
            # as truth is exactly the silent corruption this guard
            # exists to prevent. An operator who knows the original
            # parameters can hand-write the meta file to adopt it.
            raise ValueError(
                f"dedup store {store_dir} has data but no {_META}; "
                "refusing to assume its parameters — create the meta "
                "file with the store's original (k, threshold, "
                "n_store_buckets) to adopt it"
            )
        fs_write_text(spark, meta_path, _json.dumps(want))
        return
    have = _json.loads(raw)
    if have != want:
        raise ValueError(
            f"dedup store {store_dir} was created with {have}; refusing to "
            f"run with {want} — mismatched parameters silently corrupt "
            "dedup (wrong partitions pruned, incomparable shingle sets)"
        )


def _bkt(*cols, n: int):
    return F.pmod(F.xxhash64(*cols), F.lit(n)).cast("int")


def incremental_minhash_dedup_batch(
    batch: DataFrame,
    store_dir: str,
    batch_id: int,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    n_store_buckets: int = DEFAULT_STORE_BUCKETS,
) -> None:
    """Dedup one batch against the store (and itself), then append its
    survivors. Idempotent per (batch contents, batch_id): a replay
    overwrites the same batch_id directories with identical content —
    the store joins exclude the batch's own batch_id partition, so a
    half-committed first attempt can't make docs match themselves."""
    spark = batch.sparkSession
    batch = _parallelized(batch).select(F.col("doc_id"), F.col(text_col).alias("text"))
    if batch.isEmpty():
        # an empty batch must write NOTHING: a data-less partition tree
        # under batch_id=N would make later store reads schema-less
        return
    _check_store_meta(spark, store_dir, k, threshold, n_store_buckets)

    # one shingle pass per batch: signatures derive from the
    # materialized shingle sets (same pattern as minhash_dedup_pairs)
    new_sets = batch.select("doc_id", shingles(F.col("text"), k).alias("sh")).localCheckpoint(
        eager=True
    )
    sigs = minhash_signatures_from_sets(new_sets)
    new_buckets = lsh_band_buckets(sigs).localCheckpoint(eager=True)

    # new-vs-new (standard banded self-join, batch-sized)
    pairs = verify_jaccard_pairs(
        lsh_bucket_pairs(new_buckets), new_sets, new_sets, threshold
    )

    buckets_root = f"{store_dir}/buckets"
    docs_root = f"{store_dir}/docs"
    if fs_exists(spark, buckets_root):
        # new-vs-old: partition-pruned store scan + broadcast batch probe
        touched = [
            r["bkt"]
            for r in new_buckets.select(
                _bkt(F.col("band"), F.col("sig"), n=n_store_buckets).alias("bkt")
            )
            .distinct()
            .collect()
        ]
        # exclude this batch's OWN partition: on a replay the first
        # attempt's rows are already in the store, and matching a doc
        # against its own previous write would drop every survivor
        old_buckets = (
            spark.read.parquet(buckets_root)
            .filter(F.col("batch_id") != batch_id)
            .filter(F.col("bkt").isin(touched))
        )
        cand_on = (
            old_buckets.join(
                F.broadcast(
                    new_buckets.select(
                        "band", "sig", F.col("doc_id").alias("doc_b")
                    )
                ),
                ["band", "sig"],
            )
            .select(F.col("doc_id").alias("doc_a"), "doc_b")
            .distinct()
        )
        # old shingle sets, pruned to the candidate docs' hash partitions
        cand_on = cand_on.localCheckpoint(eager=True)
        doc_bkts = [
            r["dbk"]
            for r in cand_on.select(
                _bkt(F.col("doc_a"), n=n_store_buckets).alias("dbk")
            )
            .distinct()
            .collect()
        ]
        if doc_bkts:
            old_sets = (
                spark.read.parquet(docs_root)
                .filter(F.col("batch_id") != batch_id)
                .filter(F.col("dbk").isin(doc_bkts))
                .select("doc_id", "sh")
            )
            pairs = pairs.unionByName(
                verify_jaccard_pairs(cand_on, old_sets, new_sets, threshold)
            )

    pairs = pairs.localCheckpoint(eager=True)
    pairs.write.mode("overwrite").parquet(f"{store_dir}/pairs/batch_id={batch_id}")

    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivor_ids = batch.select("doc_id").join(dropped, "doc_id", "left_anti")
    (
        new_buckets.join(survivor_ids, "doc_id")
        .withColumn("bkt", _bkt(F.col("band"), F.col("sig"), n=n_store_buckets))
        .repartition("bkt")
        .write.mode("overwrite")
        .partitionBy("bkt")
        .parquet(f"{buckets_root}/batch_id={batch_id}")
    )
    (
        new_sets.join(survivor_ids, "doc_id")
        .withColumn("dbk", _bkt(F.col("doc_id"), n=n_store_buckets))
        .repartition("dbk")
        .write.mode("overwrite")
        .partitionBy("dbk")
        .parquet(f"{docs_root}/batch_id={batch_id}")
    )


def read_survivors(spark: SparkSession, store_dir: str) -> DataFrame:
    """All surviving doc_ids ingested so far."""
    return spark.read.parquet(f"{store_dir}/docs").select("doc_id")


def read_dedup_pairs(spark: SparkSession, store_dir: str) -> DataFrame:
    """Every verified duplicate pair emitted so far (doc_a kept,
    doc_b dropped), with the batch that dropped it."""
    return spark.read.parquet(f"{store_dir}/pairs").select(
        "batch_id", "doc_a", "doc_b", "inter", "n_a", "n_b"
    )


def start_incremental_dedup_stream(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    n_store_buckets: int = DEFAULT_STORE_BUCKETS,
    available_now: bool = True,
):
    """Run incremental dedup over a streaming document feed. Offsets
    commit after the batch's store writes land (foreachBatch contract);
    a crash replays the batch into its own batch_id directories —
    idempotent, so the store is exactly-once under the same conditions
    as the table sink (atomic-rename filesystems, single writer)."""

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        incremental_minhash_dedup_batch(
            batch,
            store_dir,
            batch_id=epoch_id,
            k=k,
            threshold=threshold,
            text_col=text_col,
            n_store_buckets=n_store_buckets,
        )

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
