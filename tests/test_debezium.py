"""Debezium change-event decoding (sources/debezium.py): fixture JSON
through the real from_json path, pinning the op mapping, both envelope
variants (schemas.enable true/false), delete before-images, tombstone
and truncate/message handling, the LSN text rendering round-trip, and
the fail-stop on unknown ops — the same decode discipline the pgoutput
suite pins for S6."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.sources.debezium import is_tombstone, parse_debezium
from outboxx_spark.sources.json_feed import typed_projection


def _payload(op, before=None, after=None, lsn=24023128, ts=1700000000123,
              table="users", snapshot="false"):
    return {
        "before": before,
        "after": after,
        "op": op,
        "ts_ms": ts + 5,
        "source": {
            "version": "2.5.0.Final",
            "connector": "postgresql",
            "name": "pg-bench",
            "ts_ms": ts,
            "snapshot": snapshot,
            "db": "bench",
            "schema": "public",
            "table": table,
            "txId": 771,
            "lsn": lsn,
        },
    }


def _frame(spark, values):
    return spark.createDataFrame([(v,) for v in values], "value string")


def test_row_ops_and_images(spark):
    rows = [
        json.dumps(_payload("c", after={"id": "1", "name": "ada"})),
        json.dumps(_payload("u", before={"id": "1", "name": "ada"},
                            after={"id": "1", "name": "grace"})),
        json.dumps(_payload("d", before={"id": "1", "name": "grace"})),
        json.dumps(_payload("r", after={"id": "2", "name": "linus"},
                            snapshot="true")),
    ]
    out = parse_debezium(_frame(spark, rows)).collect()
    assert [r["op"] for r in out] == ["INSERT", "UPDATE", "DELETE", "READ"]
    # after-image for c/u/r, BEFORE-image for d
    assert out[1]["data"]["name"] == "grace"
    assert out[2]["data"]["name"] == "grace"
    assert out[3]["data"]["name"] == "linus"
    assert all(r["resource"] == "public.users" for r in out)
    assert all(r["source"] == "pg-bench" for r in out)
    assert out[3]["snapshot"] == "true"


def test_schema_wrapped_envelope_decodes_identically(spark):
    bare = json.dumps(_payload("c", after={"id": "9"}))
    wrapped = json.dumps(
        {"schema": {"type": "struct", "fields": []},
         "payload": _payload("c", after={"id": "9"})}
    )
    a, b = parse_debezium(_frame(spark, [bare, wrapped])).collect()
    assert a == b


def test_numeric_values_arrive_as_strings(spark):
    # Debezium emits typed JSON; the dynamic map coerces scalars to
    # their text forms so the downstream typed_projection (S7/S9 role)
    # owns the typing, same as the pgoutput path
    row = json.dumps(_payload("c", after={"id": 7, "price": 1.5, "ok": True}))
    parsed = parse_debezium(_frame(spark, [row]))
    data = parsed.collect()[0]["data"]
    assert data == {"id": "7", "price": "1.5", "ok": "true"}
    typed = typed_projection(parsed, {"id": "long", "price": "double"}).collect()[0]
    assert typed["id"] == 7 and typed["price"] == 1.5


def test_lsn_text_matches_postgres_rendering(spark):
    # 0x16E9058 -> "0/16E9058"; a >32-bit LSN splits X/X
    rows = [
        json.dumps(_payload("c", after={"id": "1"}, lsn=0x16E9058)),
        json.dumps(_payload("c", after={"id": "2"}, lsn=(0xAB << 32) | 0x16E9058)),
    ]
    out = parse_debezium(_frame(spark, rows)).collect()
    assert out[0]["lsn_text"] == "0/16E9058"
    assert out[1]["lsn_text"] == "AB/16E9058"
    assert out[0]["lsn"] == 0x16E9058


def test_tombstones_truncates_and_messages_are_skipped(spark):
    rows = _frame(
        spark,
        [
            json.dumps(_payload("c", after={"id": "1"})),
            None,  # delete tombstone
            json.dumps(_payload("t")),  # truncate: no row image
            json.dumps(_payload("m")),  # logical message
        ],
    )
    out = parse_debezium(rows).collect()
    assert len(out) == 1 and out[0]["op"] == "INSERT"


def test_unknown_op_fail_stops(spark):
    # pyspark 4 surfaces raise_error as SparkRuntimeException; match on
    # the message to stay version-robust
    rows = _frame(spark, [json.dumps(_payload("x", after={"id": "1"}))])
    with pytest.raises(Exception, match="unknown op x"):
        parse_debezium(rows).collect()


def test_corrupt_payload_fail_stops_not_drops(spark):
    # non-Debezium JSON nulls out under from_json; silently dropping it
    # would under-count events downstream — the decoder must raise
    rows = _frame(spark, ['{"not": "debezium"}'])
    with pytest.raises(Exception, match="unparseable payload"):
        parse_debezium(rows).collect()


def test_decode_total_on_adversarial_payloads(spark):
    # Deployment surface: a Kafka topic can carry ANY bytes. The decode
    # must be total — every payload either parses, is a designed skip
    # (tombstone / t / m), or hits the DESIGNED fail-stop; no other
    # exception class, no silent drop of row-op events. 400 seeded
    # adversarial payloads in one job per outcome class.
    import random

    rng = random.Random(20260815)

    def junk_value(depth=0):
        kind = rng.randrange(7 if depth < 2 else 5)
        if kind == 0:
            return rng.randint(-(2**40), 2**40)
        if kind == 1:
            return rng.random() * 10**rng.randint(-3, 3)
        if kind == 2:
            return bool(rng.getrandbits(1))
        if kind == 3:
            return None
        if kind == 4:
            return "".join(chr(rng.randint(32, 0x2FA0)) for _ in range(rng.randint(0, 12)))
        if kind == 5:
            return [junk_value(depth + 1) for _ in range(rng.randint(0, 4))]
        return {f"k{i}": junk_value(depth + 1) for i in range(rng.randint(0, 4))}

    def payload_with_op(op):
        base = {
            "op": op,
            "before": junk_value(1) if rng.getrandbits(1) else None,
            "after": junk_value(1) if rng.getrandbits(1) else None,
            "ts_ms": junk_value(),
            "source": junk_value(),
        }
        for i in range(rng.randint(0, 3)):
            base[f"extra{i}"] = junk_value()
        return json.dumps(base)

    # class 1: row/skip ops with arbitrary garbage in every other field
    # -> must complete without raising (fields null out or coerce)
    ok_rows = [payload_with_op(rng.choice("cudrtm")) for _ in range(200)]
    out = parse_debezium(_frame(spark, ok_rows))
    n = out.count()
    assert 0 < n <= 200  # t/m dropped, the rest decoded
    for r in out.collect():
        assert r["op"] in ("INSERT", "UPDATE", "DELETE", "READ")

    # class 2: non-JSON text, JSON without an op, wrong-typed op ->
    # each must hit the designed fail-stop, not another exception
    bad = (
        ["".join(chr(rng.randint(32, 0x2FA0)) for _ in range(rng.randint(0, 30))) for _ in range(60)]
        + [json.dumps({"not_op": junk_value()}) for _ in range(60)]
        + [json.dumps({"op": x}) for x in (7, True, ["c"], {"v": "c"}, "z", "")]
    )
    # drop accidental valid-op strings the generator might produce
    bad = [b for b in bad if not any(f'"op": "{o}"' in b for o in "cudrtm")]
    for chunk in (bad[:60], bad[60:]):
        if not chunk:
            continue
        with pytest.raises(Exception, match="unknown op|unparseable payload"):
            parse_debezium(_frame(spark, chunk)).collect()


def test_malformed_payload_container_fail_stops_even_with_skip_op(spark):
    # r9 designed divergence (documented in parse_debezium): a message
    # whose `payload` key exists but is NOT a JSON object cannot hold
    # an envelope — it is corrupt, and corrupt must be loud. Before the
    # string-level skip rewrite, {"payload": 7, "op": "t"} was silently
    # skipped (the struct parse nulled the payload, the skip filter
    # fell through to the top-level op); now it reaches the decode and
    # hits the designed fail-stop. Clean t/m skips (no payload key, or
    # a well-formed nested payload) still skip.
    ok_skips = [
        '{"op": "t"}',
        '{"op": "m"}',
        '{"schema": {}, "payload": {"op": "t"}}',
    ]
    assert parse_debezium(_frame(spark, ok_skips)).count() == 0
    with pytest.raises(Exception, match="unknown op"):
        parse_debezium(
            _frame(spark, ['{"payload": 7, "op": "t"}'])
        ).collect()


def test_debezium_and_pgoutput_paths_agree_on_the_feed(spark):
    # Cross-source invariant: the SAME feed pushed through the pgoutput
    # binary path (encode_feed_as_pgoutput -> decode_stream) and the
    # Debezium JSON path (encode_feed_as_debezium -> parse_debezium)
    # must yield the same change events. Differences by design: the
    # WAL path excludes READ rows (snapshots never ride the WAL) and
    # stamps PG-epoch-derived seconds while Debezium carries the
    # connector's ms clock (exactly x1000 in the testbed encoders).
    from outboxx_spark.sources.debezium import (
        encode_feed_as_debezium,
        parse_debezium,
    )
    from outboxx_spark.sources.feed import read_feed
    from outboxx_spark.sources.pgoutput import (
        decode_stream,
        encode_feed_as_pgoutput,
    )

    feed = read_feed(spark, "/root/testdata/sf0.001")
    pg = {
        (r["op"], r["resource"], r["lsn"]): (
            r["commit_ts"],
            dict(r["data"]),
        )
        for r in decode_stream(encode_feed_as_pgoutput(feed)).collect()
    }
    dbz = {
        (r["op"], r["resource"], r["lsn"]): (
            r["commit_ts"],
            dict(r["data"]),
        )
        for r in parse_debezium(encode_feed_as_debezium(feed))
        .filter(F.col("op") != "READ")
        .collect()
    }
    assert pg.keys() == dbz.keys()
    n_checked = 0
    for k, (ts_s, data_pg) in pg.items():
        ts_ms, data_dbz = dbz[k]
        assert ts_ms == ts_s * 1000, k
        # both row images stringify the same columns; pgoutput's NULL
        # rendering and debezium's JSON null both surface as None
        assert data_pg == data_dbz, k
        n_checked += 1
    assert n_checked > 0


def test_is_tombstone_predicate(spark):
    df = _frame(spark, ["{}", None]).select(
        is_tombstone(F.col("value")).alias("t")
    )
    assert [r["t"] for r in df.collect()] == [False, True]
