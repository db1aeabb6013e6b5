"""Streaming paragraph dedup (streaming/paragraph_dedup_stream.py):
convergence with the batch operator on an ordered feed, and every
crash window of the out->gen marker chain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from outboxx_spark.dataops.linededup import dedup_paragraphs
from outboxx_spark.sources.tables import read_table
from outboxx_spark.streaming.paragraph_dedup_stream import (
    _GEN_MARK,
    _gen_dir,
    _out_dir,
    committed_epochs,
    make_paragraph_dedup_processor,
    read_deduped,
    start_paragraph_dedup_stream,
)


def _rows(df):
    return sorted(
        (r["doc_id"], r["kept"], r["dropped"], r["new_text"]) for r in df.collect()
    )


def _halves(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    return (
        docs,
        docs.filter(F.col("doc_id") < n // 2),
        docs.filter(F.col("doc_id") >= n // 2),
    )


def test_stream_converges_to_batch_on_ordered_feed(spark, sf_dir, tmp_path):
    docs, h1, h2 = _halves(spark, sf_dir)
    root = str(tmp_path / "pd")
    proc = make_paragraph_dedup_processor(root)
    proc(h1, 0)
    proc(h2, 1)
    assert committed_epochs(spark, root) == [0, 1]
    assert _rows(read_deduped(spark, root)) == _rows(dedup_paragraphs(docs))


def test_cross_epoch_ownership_drops_later_arrivals(spark, tmp_path):
    root = str(tmp_path / "pd")
    proc = make_paragraph_dedup_processor(root)
    seg = "x y z"
    b0 = spark.createDataFrame([(1, seg)], "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(2, f"{seg} a b c"), (3, seg)], "doc_id long, text string"
    )
    proc(b0, 0)
    proc(b1, 1)
    got = {r["doc_id"]: r for r in read_deduped(spark, root).collect()}
    assert got[1]["new_text"] == seg  # first arrival keeps it
    assert got[2]["new_text"] == "a b c"  # seen in epoch 0 -> dropped
    assert got[3]["new_text"] == ""


def test_replay_of_committed_epoch_is_a_noop(spark, sf_dir, tmp_path):
    import os

    _, h1, _ = _halves(spark, sf_dir)
    root = str(tmp_path / "pd")
    proc = make_paragraph_dedup_processor(root)
    proc(h1, 0)
    marker = os.path.join(_gen_dir(root, 0), _GEN_MARK)
    mtime = os.path.getmtime(marker)
    before = _rows(read_deduped(spark, root))
    proc(h1, 0)  # checkpoint replay after a post-commit crash
    assert os.path.getmtime(marker) == mtime
    assert _rows(read_deduped(spark, root)) == before


def test_crash_between_out_and_gen_markers_replays_identically(
    spark, sf_dir, tmp_path
):
    import shutil

    docs, h1, h2 = _halves(spark, sf_dir)
    root = str(tmp_path / "pd")
    proc = make_paragraph_dedup_processor(root)
    proc(h1, 0)
    proc(h2, 1)
    want = _rows(read_deduped(spark, root))
    # simulate the crash window: epoch 1's output committed but its
    # gen did not publish -> the epoch is uncommitted as a whole
    shutil.rmtree(_gen_dir(root, 1))
    assert committed_epochs(spark, root) == [0]
    proc(h2, 1)  # replay recomputes the identical output and commits
    assert committed_epochs(spark, root) == [0, 1]
    assert _rows(read_deduped(spark, root)) == want


def test_torn_out_dir_is_invisible_then_rewritten(spark, sf_dir, tmp_path):
    import os

    _, h1, h2 = _halves(spark, sf_dir)
    root = str(tmp_path / "pd")
    proc = make_paragraph_dedup_processor(root)
    proc(h1, 0)
    # a mid-epoch crash left garbage with NO markers
    torn = _out_dir(root, 1)
    os.makedirs(torn)
    with open(os.path.join(torn, "part-garbage.parquet"), "w") as f:
        f.write("not parquet")
    assert committed_epochs(spark, root) == [0]
    read_deduped(spark, root)  # torn dir never touched by the reader
    proc(h2, 1)
    assert committed_epochs(spark, root) == [0, 1]
    assert not os.path.exists(os.path.join(torn, "part-garbage.parquet"))


def test_real_stream_run_end_to_end(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    n = docs.count()
    # two source files -> two micro-batches with maxFilesPerTrigger=1
    docs.filter(F.col("doc_id") < n // 2).coalesce(1).write.parquet(f"{src}/a")
    docs.filter(F.col("doc_id") >= n // 2).coalesce(1).write.parquet(f"{src}/b")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    root = str(tmp_path / "pd")
    q = start_paragraph_dedup_stream(
        stream, root, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    got = read_deduped(spark, root)
    assert got.count() == n
    totals = got.agg(F.sum("dropped").alias("d")).collect()[0]
    assert totals["d"] > 0


def test_reader_refuses_empty_store(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_deduped(spark, str(tmp_path / "nope"))
