"""Streaming event-time windowed aggregation with watermark: streaming
results must equal the batch tumbling tally."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from outboxx_spark.operators.windows import windowed_tally
from outboxx_spark.sources.feed import read_feed, read_feed_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def multi_file_feed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("feed_win")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.repartition(3).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_streaming_window_equals_batch(spark, multi_file_feed, tmp_path):
    stream = read_feed_stream(spark, multi_file_feed, max_files_per_trigger=1)
    agg = (
        stream.withColumn("event_time", F.timestamp_seconds(F.col("commit_ts")))
        .withWatermark("event_time", "1 hour")
        .groupBy(F.window("event_time", "1 hour"), "resource", "op")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "resource",
            "op",
            "n",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["window_start"], r["resource"], r["op"]): r["n"]
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    want = {
        (r["window_start"], r["resource"], r["op"]): r["n"]
        for r in windowed_tally(read_feed(spark, multi_file_feed), 3600).collect()
    }
    assert got == want
