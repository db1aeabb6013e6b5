"""Continuously-materialized table sink: keyed UPSERT of a change
stream into a bucketed parquet table.

The missing last mile of the CDC story (reference counterpart: the
consumer applying the envelope contract to its own store,
`docs/design/STREAMING_REPLICATION_DESIGN.md` dedup guidance + O4):
``materialize()`` compacts a finite changelog, this sink keeps a TABLE
current while the stream runs — MERGE INTO semantics on engines with no
Delta/Iceberg, from plain parquet + dynamic partition overwrite.

Mechanics per micro-batch:

1. winners   = latest event per (resource, key) within the batch
               (same LSN/op-precedence order as ``materialize``).
2. touched   = the hash buckets those keys land in
               (``bucket = pmod(xxhash64(resource, key), n_buckets)``).
3. merged    = current rows of ONLY the touched buckets (partition-
               pruned read) unioned with the winners, re-materialized —
               table rows carry their lsn, so replays and out-of-order
               batches resolve by the same last-writer-wins rule.
4. write     = ``partitionBy(bucket)`` + ``partitionOverwriteMode=
               dynamic``: only touched bucket directories are replaced.

Exactly-once: the sink is IDEMPOTENT (re-merging an already-applied
batch reproduces the same bucket contents bit-for-bit — equal lsn ties
resolve deterministically), so Structured Streaming's replay-uncommitted-
batch recovery yields exactly-once table state with no transaction log.

100 TB shape: work per batch is proportional to touched buckets, not
table size — reads are partition-pruned to those buckets, the merge
window shuffles only (touched rows + batch rows), and the rewrite
touches only those directories. ``n_buckets`` sizes the rewrite unit:
more buckets = smaller rewrites, more files; at 100 TB pick bucket
count so a bucket ≈ one comfortable task (e.g. 1-4 GB).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.operators.materialize import materialize

DEFAULT_N_BUCKETS = 16


def _bucket(resource_col, key_col, n_buckets: int):
    return F.pmod(F.xxhash64(resource_col, key_col), F.lit(n_buckets)).cast("int")


def upsert_batch(
    batch: DataFrame,
    table_dir: str,
    key: str = "user_id",
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> None:
    """Merge one micro-batch of change events into the table. Safe to
    call with the same batch twice (idempotent)."""
    spark = batch.sparkSession
    winners = materialize(batch, key=key, drop_deleted=False).withColumn(
        "bucket", _bucket(F.col("resource"), F.col(key), n_buckets)
    )
    # winners feeds the touched-bucket collect AND the merge/write;
    # materialize once instead of re-running the batch window per use
    winners = winners.localCheckpoint(eager=True)
    touched = [r["bucket"] for r in winners.select("bucket").distinct().collect()]
    if not touched:
        return

    data_cols = [c for c in winners.columns if c != "bucket"]
    if os.path.isdir(table_dir) and any(
        e.startswith("bucket=") for e in os.listdir(table_dir)
    ):
        current = (
            spark.read.parquet(table_dir)
            .filter(F.col("bucket").isin(touched))  # partition-pruned scan
            .select(*data_cols, "bucket")
        )
        # Tombstones are RETAINED in the table (Kafka-compaction style):
        # physically dropping a deleted key would let any late/replayed
        # lower-LSN event resurrect it, since nothing would remain to
        # outrank the stale row in the merge. read_table_state filters
        # them; a periodic compaction can GC tombstones older than the
        # source's maximum replay horizon.
        merged = materialize(
            current.unionByName(winners), key=key, drop_deleted=False
        )
        # The merge reads the directory the write below replaces; cut the
        # file lineage by computing the merged rows eagerly first
        # (executor-local blocks — bounded by bucket sizing). A
        # production-hardened variant writes to a staging dir and swaps.
        merged = merged.localCheckpoint(eager=True)
    else:
        merged = winners

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            merged.select(*data_cols, "bucket")
            .repartition(max(len(touched), 1), "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(table_dir)
        )
        # No emptied-bucket cleanup is needed here: the merge retains
        # tombstones (drop_deleted=False), so every touched bucket
        # writes at least its winner rows and dynamic overwrite always
        # replaces it. Only compact_table can empty a bucket — it pins
        # static overwrite for exactly that reason.
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_table_state(spark: SparkSession, table_dir: str) -> DataFrame:
    """Current table state (all buckets); DELETE tombstones excluded."""
    return (
        spark.read.parquet(table_dir)
        .filter(F.col("op") != "DELETE")
        .drop("bucket")
    )


def start_table_upsert_stream(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    n_buckets: int = DEFAULT_N_BUCKETS,
    available_now: bool = True,
):
    """Run the upsert sink over a streaming feed. Offsets commit only
    after the merge lands (foreachBatch contract), so a crash replays
    the last batch into the idempotent merge — exactly-once state."""

    def _apply(batch: DataFrame, _epoch: int) -> None:
        upsert_batch(batch, table_dir, key=key, n_buckets=n_buckets)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_table(
    spark: SparkSession,
    table_dir: str,
    tombstone_horizon_lsn: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> None:
    """GC tombstones the source can no longer contradict: a DELETE row
    with ``lsn <= tombstone_horizon_lsn`` (the source's maximum replay
    horizon — e.g. the committed checkpoint LSN minus retention) can
    never be outranked by a late arrival, so it is safe to drop.

    Full-table rewrite by design — run it as the periodic maintenance
    job, not per batch; each bucket compacts independently
    (partition-parallel)."""
    kept = spark.read.parquet(table_dir).filter(
        (F.col("op") != "DELETE") | (F.col("lsn") > tombstone_horizon_lsn)
    )
    kept = kept.localCheckpoint(eager=True)  # cut lineage before overwrite
    data_cols = [c for c in kept.columns if c != "bucket"]
    # Pin STATIC overwrite: compaction can empty a bucket entirely (all
    # its rows were expired tombstones), and under dynamic mode an
    # empty bucket's directory — and its expired tombstones — would
    # survive the rewrite.
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        (
            kept.select(*data_cols, "bucket")
            .repartition(n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(table_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
