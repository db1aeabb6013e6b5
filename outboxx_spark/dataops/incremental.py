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
    lsh_band_buckets_from_sets,
    lsh_bucket_pairs,
    ngram_jaccard_pairs_sql,
    verify_jaccard_pairs,
)
from outboxx_spark.dataops.text import shingles
from outboxx_spark.dataops.util import parallelized as _parallelized
from outboxx_spark.fsutil import fs_exists, fs_read_text, fs_write_text, hadoop_fs

DEFAULT_STORE_BUCKETS = 64

_META = "_dedup_store_meta.json"
# Store compaction (see compact_dedup_store): staged generation +
# parked old generations + the roll-forward decision marker. The
# compacted generation lands as batch_id=-1 — a real batch_id is a
# non-negative epoch, so the replay-exclusion filter can never exclude
# the compacted generation by accident.
_COMPACT_STAGE = ".compact_stage"
_COMPACT_UNDO = ".compact_undo"
_COMMIT_READY = "_COMMIT_READY"
COMPACTED_BATCH_ID = -1


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
    if batch_id < 0:
        # negative ids are reserved for compacted generations
        # (COMPACTED_BATCH_ID): a caller-supplied -1 would both skip
        # the whole compacted generation in the replay-exclusion filter
        # and OVERWRITE it on the survivor append
        raise ValueError(f"batch_id must be >= 0, got {batch_id}")
    spark = batch.sparkSession
    batch = _parallelized(batch).select(F.col("doc_id"), F.col(text_col).alias("text"))
    if batch.isEmpty():
        # an empty batch must write NOTHING: a data-less partition tree
        # under batch_id=N would make later store reads schema-less
        return
    _check_store_meta(spark, store_dir, k, threshold, n_store_buckets)
    # finish (or discard) any interrupted out-of-band compaction before
    # reading the store — a half-committed swap must never be probed
    _recover_compaction(spark, store_dir)

    # one shingle pass per batch: signatures derive from the
    # materialized shingle sets (same pattern as minhash_dedup_pairs)
    new_sets = batch.select("doc_id", shingles(F.col("text"), k).alias("sh")).localCheckpoint(
        eager=True
    )
    new_buckets = lsh_band_buckets_from_sets(new_sets).localCheckpoint(eager=True)

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

    # ONE materialization: the parquet write is the pairs pipeline's
    # only execution; the survivor computation reads the written files
    # back (a checkpoint-then-write would run the same pipeline into
    # executor storage first and pay a second job for the copy)
    pairs.write.mode("overwrite").parquet(f"{store_dir}/pairs/batch_id={batch_id}")
    pairs = spark.read.parquet(f"{store_dir}/pairs/batch_id={batch_id}")

    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivor_ids = batch.select("doc_id").join(dropped, "doc_id", "left_anti")
    # one shuffle task per store bucket -> exactly ONE file per bkt dir
    # (the table sink's layout): a 32-task repartition would scatter
    # every bucket dir with up to 32 small files per batch
    (
        new_buckets.join(survivor_ids, "doc_id")
        .withColumn("bkt", _bkt(F.col("band"), F.col("sig"), n=n_store_buckets))
        .repartition(n_store_buckets, "bkt")
        .write.mode("overwrite")
        .partitionBy("bkt")
        .parquet(f"{buckets_root}/batch_id={batch_id}")
    )
    (
        new_sets.join(survivor_ids, "doc_id")
        .withColumn("dbk", _bkt(F.col("doc_id"), n=n_store_buckets))
        .repartition(n_store_buckets, "dbk")
        .write.mode("overwrite")
        .partitionBy("dbk")
        .parquet(f"{docs_root}/batch_id={batch_id}")
    )


def _batch_dirs(fs, tree_path) -> list[str]:
    """Names of batch_id=* children of ``tree_path`` (empty if absent)."""
    if not fs.exists(tree_path):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(tree_path)
        if st.isDirectory() and st.getPath().getName().startswith("batch_id=")
    ]


def _commit_compaction(spark: SparkSession, store_dir: str) -> None:
    """Swap the staged compacted generation into place. Idempotent and
    resumable from any crash point once ``_COMMIT_READY`` exists: per
    tree, if the staged dir is still present, park every live
    generation (including any previous compacted one) in the undo area
    and rename the staged dir in as ``batch_id=-1``; a tree whose
    staged dir is gone already committed and is skipped. Parking MOVES
    directories, so no instant holds the same rows in two live dirs."""
    fs, _, jvm = hadoop_fs(spark, store_dir)
    path = jvm.org.apache.hadoop.fs.Path
    for tree in ("buckets", "docs"):
        staged = path(f"{store_dir}/{_COMPACT_STAGE}/{tree}")
        if not fs.exists(staged):
            continue  # this tree already committed
        live_root = path(f"{store_dir}/{tree}")
        undo_root = path(f"{store_dir}/{_COMPACT_UNDO}/{tree}")
        if not fs.mkdirs(undo_root):
            raise IOError(f"mkdirs failed: {undo_root}")
        for name in _batch_dirs(fs, live_root):
            if not fs.rename(path(live_root, name), path(undo_root, name)):
                raise IOError(f"rename failed: {live_root}/{name} -> undo")
        dest = path(live_root, f"batch_id={COMPACTED_BATCH_ID}")
        if not fs.rename(staged, dest):
            raise IOError(f"rename failed: {staged} -> {dest}")
    fs.delete(path(f"{store_dir}/{_COMPACT_UNDO}"), True)
    fs.delete(path(f"{store_dir}/{_COMPACT_STAGE}"), True)


def _recover_compaction(spark: SparkSession, store_dir: str) -> None:
    """Repair an interrupted compaction before any read or ingest.
    ``_COMMIT_READY`` is the decision point: present -> the staged
    generation is complete, roll FORWARD (re-run the idempotent
    commit); absent -> the stage is garbage, roll BACK (restore any
    parked generation whose live dir is missing, then drop stage+undo).
    No-op (two existence probes) when no compaction was in flight."""
    stage_exists = fs_exists(spark, f"{store_dir}/{_COMPACT_STAGE}")
    undo_exists = fs_exists(spark, f"{store_dir}/{_COMPACT_UNDO}")
    if not stage_exists and not undo_exists:
        return
    if fs_exists(spark, f"{store_dir}/{_COMPACT_STAGE}/{_COMMIT_READY}"):
        _commit_compaction(spark, store_dir)
        return
    fs, _, jvm = hadoop_fs(spark, store_dir)
    path = jvm.org.apache.hadoop.fs.Path
    for tree in ("buckets", "docs"):
        undo_root = path(f"{store_dir}/{_COMPACT_UNDO}/{tree}")
        live_root = path(f"{store_dir}/{tree}")
        for name in _batch_dirs(fs, undo_root):
            live = path(live_root, name)
            if not fs.exists(live):
                if not fs.rename(path(undo_root, name), live):
                    raise IOError(f"rename failed: undo/{name} -> {live}")
    fs.delete(path(f"{store_dir}/{_COMPACT_UNDO}"), True)
    fs.delete(path(f"{store_dir}/{_COMPACT_STAGE}"), True)


def compact_dedup_store(spark: SparkSession, store_dir: str) -> None:
    """Bin-pack every committed batch generation into ONE compacted
    generation per tree (``batch_id=-1``), preserving the ``bkt``/
    ``dbk`` hash partitioning so probe-side pruning is untouched. The
    append-only store otherwise grows O(batches x n_store_buckets)
    small files — a year of crawl deliveries becomes a listing/open
    bottleneck; after compaction the file count is O(n_store_buckets)
    again regardless of history. ``pairs/`` (the audit log) is left
    alone: nothing joins against it per batch.

    Operational contract (same class as the table sink's): single
    writer, run OUT-OF-BAND — never concurrently with ingestion, and
    only when no ingested batch can still replay (i.e. after the
    stream's checkpoint has committed past it). A replay of a batch
    whose rows were folded into the compacted generation would re-add
    those rows under the original batch_id, duplicating them in the
    store. Crash-safe via stage + marker + park-and-rename: recovery
    (run automatically at the next compaction or ingest) rolls forward
    iff the stage completed, else rolls back."""
    _recover_compaction(spark, store_dir)
    if not fs_exists(spark, f"{store_dir}/buckets"):
        return
    import json as _json

    meta_raw = fs_read_text(spark, f"{store_dir}/{_META}")
    if meta_raw is None:
        # same fail-closed rule as _check_store_meta: guessing the
        # bucket count would quietly break the one-file-per-bucket
        # bin-pack this maintenance op exists to produce
        raise ValueError(
            f"dedup store {store_dir} has data but no {_META}; refusing "
            "to compact with assumed parameters — restore the meta file "
            "first"
        )
    n_buckets = _json.loads(meta_raw)["n_store_buckets"]
    for tree, part_col in (("buckets", "bkt"), ("docs", "dbk")):
        (
            spark.read.parquet(f"{store_dir}/{tree}")
            .drop("batch_id")
            # one task per bucket -> one file per dir (the bin-pack)
            .repartition(n_buckets, part_col)
            .write.mode("overwrite")
            .partitionBy(part_col)
            .parquet(f"{store_dir}/{_COMPACT_STAGE}/{tree}")
        )
    fs_write_text(spark, f"{store_dir}/{_COMPACT_STAGE}/{_COMMIT_READY}", "ready")
    _commit_compaction(spark, store_dir)


def incremental_dedup_pairs_sql(k: int = 3, threshold: float = 0.5) -> str:
    """DuckDB mirror of the two-halves incremental ingest the driver
    query runs (``documents`` split at count//2 on doc_id, batch 0 then
    batch 1): batch-0 pairs are the exact Jaccard pairs within the
    first half; batch-1 pairs are pairs whose doc_b is in the second
    half and whose doc_a is either also new (new-vs-new) or a batch-0
    SURVIVOR (first-seen-wins: docs dropped in batch 0 never enter the
    store, so they can't drop later docs). Relies on the test-pinned
    equality of the LSH+verify pair set with the exact pair set, and on
    doc_a < doc_b making "doc_b < h" equivalent to "both < h"."""
    pairs = ngram_jaccard_pairs_sql(k, threshold, max_df=None)
    return f"""
    WITH all_pairs AS ({pairs}),
    half AS (SELECT CAST(count(*) // 2 AS BIGINT) AS h FROM documents),
    p1 AS (SELECT p.* FROM all_pairs p, half WHERE p.doc_b < half.h),
    p2 AS (
      SELECT p.* FROM all_pairs p, half
      WHERE p.doc_b >= half.h
        AND (p.doc_a >= half.h OR p.doc_a NOT IN (SELECT doc_b FROM p1))
    )
    SELECT 0 AS batch_id, doc_a, doc_b, inter, n_a, n_b FROM p1
    UNION ALL
    SELECT 1 AS batch_id, doc_a, doc_b, inter, n_a, n_b FROM p2
    """


def read_survivors(spark: SparkSession, store_dir: str) -> DataFrame:
    """All surviving doc_ids ingested so far. Repairs any interrupted
    compaction first — reading a half-committed swap would silently
    return a partial survivor set."""
    _recover_compaction(spark, store_dir)
    return spark.read.parquet(f"{store_dir}/docs").select("doc_id")


def read_dedup_pairs(spark: SparkSession, store_dir: str) -> DataFrame:
    """Every verified duplicate pair emitted so far (doc_a kept,
    doc_b dropped), with the batch that dropped it. Repairs any
    interrupted compaction first (pairs/ itself is never compacted, but
    a caller reading pairs right after a compaction crash should leave
    the store whole)."""
    _recover_compaction(spark, store_dir)
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
