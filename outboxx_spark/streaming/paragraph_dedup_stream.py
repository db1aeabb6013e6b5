"""Streaming paragraph dedup: first-occurrence-wins across
micro-batches.

The batch operator (dataops/linededup.py) resolves ownership by
global (doc_id, position) order; a STREAMING corpus resolves it by
ARRIVAL order — a segment seen in any earlier committed epoch drops
every later occurrence, and within one epoch the batch rule applies.
When the feed arrives in doc_id order (this testbed's feed, and any
CDC-ordered ingest), the two orders coincide and the stream converges
to the batch answer exactly — pinned in tests.

State is a persistent SEEN-SEGMENT store of xxhash64 fingerprints,
maintained with the repo's marker-last epoch protocol
(export_stream's crash-window discipline):

    root/out/batch=<E>/   deduped docs of epoch E   (parquet, marker _OUT_OK)
    root/seen/gen=<E>/    fingerprints NEW in E     (parquet, marker _GEN_OK)

Write order inside one epoch: out parquet -> _OUT_OK -> gen parquet
-> _GEN_OK. The GEN marker is the epoch's commit point — the reader
unions only gen-committed epochs, so every crash window replays
safely:

- crash before _OUT_OK: torn out dir deleted, epoch redone;
- crash between _OUT_OK and _GEN_OK: the seen store does NOT yet
  contain this epoch, so the replay recomputes the identical output
  (determinism) and overwrites it before committing the gen;
- replay after _GEN_OK: no-op (idempotent).

Scale: the epoch side of the seen join carries 8-byte fingerprints;
at 100 TB the store buckets by hash (dataops/incremental.py's layout)
so the join prunes to touched buckets — documented swap, same
protocol. No driver-side state: the store IS the state, so the
operator survives restarts without transformWithState machinery.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.dataops.linededup import (
    SEG_TOKENS,
    mark_owners,
    reassemble,
    segment_occurrences,
)
from outboxx_spark.fsutil import fs_exists, fs_write_text, hadoop_fs

_OUT_MARK = "_OUT_OK"
_GEN_MARK = "_GEN_OK"


def _out_dir(root: str, epoch: int) -> str:
    return f"{root}/out/batch={epoch}"


def _gen_dir(root: str, epoch: int) -> str:
    return f"{root}/seen/gen={epoch}"


def committed_epochs(spark: SparkSession, root: str) -> list[int]:
    fs, seen_root, _ = hadoop_fs(spark, f"{root}/seen")
    if not fs.exists(seen_root):
        return []
    out = []
    for st in fs.listStatus(seen_root):
        name = st.getPath().getName()
        if name.startswith("gen=") and fs_exists(
            spark, f"{root}/seen/{name}/{_GEN_MARK}"
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _read_seen(spark: SparkSession, root: str) -> DataFrame | None:
    epochs = committed_epochs(spark, root)
    if not epochs:
        return None
    paths = [_gen_dir(root, e) for e in epochs]
    return spark.read.option("basePath", f"{root}/seen").parquet(*paths).select("h")


def make_paragraph_dedup_processor(
    root: str, seg_len: int = SEG_TOKENS
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body, exposed for direct crash-window testing."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        if fs_exists(spark, f"{_gen_dir(root, epoch_id)}/{_GEN_MARK}"):
            return  # epoch fully committed: replay is a no-op
        if batch.isEmpty():
            return
        for d in (_out_dir(root, epoch_id), _gen_dir(root, epoch_id)):
            fs, p, _ = hadoop_fs(spark, d)
            if fs.exists(p):
                fs.delete(p, True)  # torn write from a mid-epoch crash
        segs = segment_occurrences(batch, seg_len)
        marked = mark_owners(segs).withColumn("h", F.xxhash64("seg"))
        seen = _read_seen(spark, root)
        if seen is not None:
            # AQE sizes the join at runtime (broadcast below the
            # threshold, shuffled hash above); the store side is pure
            # 8-byte fingerprints either way
            marked = (
                marked.join(
                    seen.withColumn("_seen", F.lit(True)),
                    "h",
                    "left",
                )
                .withColumn(
                    "keep", F.col("keep") & F.col("_seen").isNull()
                )
                .drop("_seen")
            )
        out = reassemble(marked.select("doc_id", "chunk_id", "seg", "keep"))
        out.write.mode("overwrite").parquet(_out_dir(root, epoch_id))
        fs_write_text(spark, f"{_out_dir(root, epoch_id)}/{_OUT_MARK}", "ok")
        fresh = marked.select("h").distinct()
        if seen is not None:
            fresh = fresh.join(seen, "h", "left_anti")
        fresh.write.mode("overwrite").parquet(_gen_dir(root, epoch_id))
        fs_write_text(spark, f"{_gen_dir(root, epoch_id)}/{_GEN_MARK}", "ok")

    return process


def start_paragraph_dedup_stream(
    docs_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    *,
    seg_len: int = SEG_TOKENS,
    available_now: bool = True,
):
    writer = docs_stream.writeStream.foreachBatch(
        make_paragraph_dedup_processor(root, seg_len)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_deduped(spark: SparkSession, root: str) -> DataFrame:
    """The consumer's view: union of gen-committed epochs only (a
    torn epoch's output is invisible even if its parquet exists)."""
    epochs = committed_epochs(spark, root)
    if not epochs:
        raise FileNotFoundError(f"no committed epochs under {root}")
    paths = [_out_dir(root, e) for e in epochs]
    return spark.read.option("basePath", f"{root}/out").parquet(*paths)
