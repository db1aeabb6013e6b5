"""Salted aggregation equivalence + streaming watermark dedup."""

from __future__ import annotations

import pytest

from outboxx_spark.operators.dedup import dedup_events_streaming
from outboxx_spark.operators.skew import salted_agg, salted_count
from outboxx_spark.sources.feed import read_feed, read_feed_stream


def test_salted_count_equals_direct(spark, sf_dir):
    feed = read_feed(spark, sf_dir)
    direct = {
        (r["resource"], r["op"]): r["n"]
        for r in feed.groupBy("resource", "op").count().withColumnRenamed("count", "n").collect()
    }
    salted = {
        (r["resource"], r["op"]): r["n"]
        for r in salted_count(feed, ["resource", "op"]).collect()
    }
    assert salted == direct


def test_salted_agg_minmax_count(spark, sf_dir):
    feed = read_feed(spark, sf_dir)
    out = {r["resource"]: r for r in salted_agg(feed, ["resource"], "lsn").collect()}
    direct = feed.groupBy("resource").agg(
        {"lsn": "min"}
    ).collect()
    for r in direct:
        assert out[r["resource"]]["min"] == r["min(lsn)"]
    total = sum(r["n"] for r in out.values())
    assert total == feed.count()


@pytest.mark.slow
def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate the feed (two copies of the same file) -> streaming
    dedup must emit each (resource, lsn) exactly once."""
    import shutil

    sf = "/root/testdata/sf0.001"
    feed_dir = tmp_path / "dup"
    (feed_dir / "events.parquet").mkdir(parents=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(str(feed_dir / "events.parquet"))
    # duplicate the part file -> every event arrives twice
    parts = [p for p in (feed_dir / "events.parquet").iterdir() if p.name.endswith(".parquet")]
    shutil.copy(parts[0], parts[0].parent / ("copy_" + parts[0].name))

    stream = read_feed_stream(spark, str(feed_dir), max_files_per_trigger=2)
    deduped = dedup_events_streaming(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT resource, lsn FROM dedup_out").collect()
    assert len(got) == ev.count()  # each event exactly once
    assert len({(r["resource"], r["lsn"]) for r in got}) == len(got)
