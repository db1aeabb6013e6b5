"""Custom Python DataSource (outboxx_cdc): batch parity with read_feed,
streaming replay in LSN-ordered micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from outboxx_spark.sources.datasource import register
from outboxx_spark.sources.feed import read_feed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def test_batch_read_matches_read_feed(spark):
    ds = spark.read.format("outboxx_cdc").option("path", SF).load()
    feed = read_feed(spark, SF)
    assert ds.schema.simpleString() == feed.schema.simpleString()
    a = {tuple(r) for r in ds.collect()}
    b = {tuple(r) for r in feed.collect()}
    assert a == b


def test_batch_requires_path(spark):
    with pytest.raises(Exception, match="path"):
        spark.read.format("outboxx_cdc").load().collect()


def test_stream_replays_all_events_in_batches(spark, tmp_path):
    st = (
        spark.readStream.format("outboxx_cdc")
        .option("path", SF)
        .option("batch_size", 300)
        .load()
    )
    q = (
        st.writeStream.format("memory")
        .queryName("cdc_ds_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM cdc_ds_out")
    feed = read_feed(spark, SF)
    assert got.count() == feed.count()
    assert {r["lsn"] for r in got.select("lsn").collect()} == {
        r["lsn"] for r in feed.select("lsn").collect()
    }
    # multiple micro-batches actually happened (1000 events / 300 per batch)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 3
