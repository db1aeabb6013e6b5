"""Source-format coverage: the feed contract is format-agnostic — the
same projection semantics must hold whether the events table arrives as
parquet (native layout), ORC, or CSV. Mirrors the reference's position
that the source wire format is swappable below the converter (S8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from outboxx_spark.sources.feed import OP_CASE_SQL, read_feed
from outboxx_spark.sources.tables import read_table


def _as_feed(ev):
    return ev.select(
        F.expr(OP_CASE_SQL).alias("op"),
        F.concat(F.lit("public.t"), (F.col("user_id") % 4).cast("string")).alias("resource"),
        F.col("event_id").alias("lsn"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )


def test_orc_feed_equals_parquet_feed(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events")
    orc_path = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(orc_path)
    orc_feed = _as_feed(spark.read.orc(orc_path))
    pq_feed = _as_feed(ev)
    assert orc_feed.exceptAll(pq_feed).count() == 0
    assert pq_feed.exceptAll(orc_feed).count() == 0


def test_csv_feed_equals_parquet_feed(spark, sf_dir, tmp_path):
    """CSV round-trip with explicit schema (inference is banned on the
    hot path: a schema-inference pass is a full extra scan at 100 TB)."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    csv_path = str(tmp_path / "events_csv")
    ev.write.mode("overwrite").option("header", "true").csv(csv_path)
    schema = "event_id long, user_id long, event_type string, value double, props string"
    back = spark.read.schema(schema).option("header", "true").csv(csv_path)
    a, b = _as_feed(back), _as_feed(ev)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
