"""JSON envelope ingestion: parse-back fidelity incl. LSN text inverse
and the schema-on-read map payload."""

from __future__ import annotations

from pyspark.sql import functions as F

from outboxx_spark.functions.envelope import serialize_feed
from outboxx_spark.sources.feed import read_feed
from outboxx_spark.sources.json_feed import parse_envelopes, typed_projection


def test_lsn_text_inverse(spark):
    df = spark.createDataFrame(
        [('{"op":"INSERT","data":{"id":"1"},"meta":{"source":"postgres",'
          '"resource":"public.t","timestamp":5,"lsn":"1234567/89ABCDEF"}}',)],
        "value string",
    )
    row = parse_envelopes(df).collect()[0]
    assert row["lsn_text"] == "1234567/89ABCDEF"
    assert row["lsn"] == 0x1234567_89ABCDEF
    assert row["data"] == {"id": "1"}


def test_envelope_parse_back_matches_feed(spark, sf_dir):
    feed = read_feed(spark, sf_dir)
    env = serialize_feed(feed, ["user_id", "event_type", "value", "props"]).select("value")
    typed = typed_projection(
        parse_envelopes(env),
        {"user_id": "long", "value": "double"},
    )
    got = {r["lsn"]: (r["user_id"], r["value"]) for r in typed.collect()}
    for r in feed.collect():
        assert got[r["lsn"]] == (r["user_id"], r["value"])


def test_malformed_envelope_yields_nulls_not_crash(spark):
    df = spark.createDataFrame([("not json at all",), ("{}",)], "value string")
    rows = parse_envelopes(df).collect()
    assert len(rows) == 2
    assert all(r["op"] is None for r in rows)
