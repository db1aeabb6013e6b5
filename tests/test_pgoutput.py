"""pgoutput decoder unit layer — mirrors the reference's decoder test
coverage (`pg_output_decoder.zig:481-857`): I/U/D round trips, TOAST,
truncation, unknown types, relation re-registration, column-count
mismatch, skip-don't-crash for T/Y/O."""

from __future__ import annotations

import pytest

from outboxx_spark.config import TOAST_PLACEHOLDER
from outboxx_spark.sources.pgoutput import (
    OID_INT8,
    OID_TEXT,
    PG_EPOCH_UNIX,
    PgOutputDecoder,
    PgOutputError,
    decode_stream,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_feed_as_pgoutput,
    encode_insert,
    encode_relation,
    encode_truncate,
    encode_update,
)

COLS = [("id", OID_INT8), ("name", OID_TEXT)]


def _dec_with_rel() -> PgOutputDecoder:
    d = PgOutputDecoder()
    assert d.decode(1, encode_relation(42, "public", "users", COLS)) is None
    return d


def test_insert_roundtrip():
    d = _dec_with_rel()
    assert d.decode(2, encode_begin(2, 86_400_000_000, 7)) is None
    ev = d.decode(3, encode_insert(42, ["1", "Alice"]))
    assert ev == {
        "op": "INSERT",
        "resource": "public.users",
        "lsn": 3,
        "commit_ts": PG_EPOCH_UNIX + 86_400,  # commit time stamped from BEGIN
        "data": {"id": "1", "name": "Alice"},
        "old": None,
    }
    assert d.decode(4, encode_commit(3, 3, 86_400_000_000)) is None


def test_update_carries_old_and_new():
    d = _dec_with_rel()
    d.decode(2, encode_begin(2, 0, 7))
    ev = d.decode(3, encode_update(42, ["1", "Bob"], old=["1", "Alice"]))
    assert ev["op"] == "UPDATE"
    assert ev["data"] == {"id": "1", "name": "Bob"}
    assert ev["old"] == {"id": "1", "name": "Alice"}


def test_update_without_old_tuple():
    d = _dec_with_rel()
    d.decode(2, encode_begin(2, 0, 7))
    ev = d.decode(3, encode_update(42, ["1", "Bob"]))
    assert ev["old"] is None  # empty old row, converter.zig UPDATE-no-old


def test_delete_data_is_old_image():
    d = _dec_with_rel()
    d.decode(2, encode_begin(2, 0, 7))
    ev = d.decode(3, encode_delete(42, ["1", "Alice"]))
    assert ev["op"] == "DELETE"
    assert ev["data"] == {"id": "1", "name": "Alice"}


def test_null_and_toast_columns():
    d = _dec_with_rel()
    d.decode(2, encode_begin(2, 0, 7))
    ev = d.decode(3, encode_insert(42, [None, ...]))
    assert ev["data"] == {"id": None, "name": TOAST_PLACEHOLDER}


def test_skip_types_dont_crash():
    d = _dec_with_rel()
    assert d.decode(5, encode_truncate()) is None
    assert d.decode(6, b"Y" + b"\x00" * 8) is None
    assert d.decode(7, b"O" + b"\x00" * 8) is None


def test_unknown_type_fails():
    d = PgOutputDecoder()
    with pytest.raises(PgOutputError, match="unknown message type"):
        d.decode(1, b"Z\x00\x00")


def test_truncated_message_fails():
    d = _dec_with_rel()
    d.decode(2, encode_begin(2, 0, 7))
    full = encode_insert(42, ["1", "Alice"])
    with pytest.raises(PgOutputError, match="truncated"):
        d.decode(3, full[: len(full) - 3])


def test_unknown_relation_fails():
    d = PgOutputDecoder()
    with pytest.raises(PgOutputError, match="RelationNotFound"):
        d.decode(1, encode_insert(99, ["1", "x"]))


def test_error_order_rid_lookup_before_tag_truncation():
    # Found by differential fuzz (r6): a 5-byte I message carries a
    # complete rid but no tuple tag. The rid is parsed and looked up
    # FIRST — an unregistered relation must report RelationNotFound,
    # not truncation; only a registered relation reaches the tag read
    # and reports the truncation. Pins the fail-stop error order of
    # the flattened hot path to the original _Reader semantics.
    five = b"I" + (99).to_bytes(4, "big")
    d = PgOutputDecoder()
    with pytest.raises(PgOutputError, match="RelationNotFound"):
        d.decode(1, five)
    d2 = _dec_with_rel()
    with pytest.raises(PgOutputError, match="truncated"):
        d2.decode(1, b"I" + (42).to_bytes(4, "big"))


def test_column_count_mismatch_fails():
    d = _dec_with_rel()
    with pytest.raises(PgOutputError, match="ColumnCountMismatch"):
        d.decode(2, encode_insert(42, ["1", "x", "extra"]))


def test_relation_reregistration_replaces_schema():
    d = _dec_with_rel()
    # ALTER TABLE: resend RELATION with an extra column
    d.decode(2, encode_relation(42, "public", "users", COLS + [("age", OID_INT8)]))
    d.decode(3, encode_begin(3, 0, 8))
    ev = d.decode(4, encode_insert(42, ["1", "Alice", "33"]))
    assert ev["data"] == {"id": "1", "name": "Alice", "age": "33"}


def test_spark_encode_decode_matches_feed(spark):
    from outboxx_spark.sources.feed import read_feed

    feed = read_feed(spark, "/root/testdata/sf0.001")
    decoded = decode_stream(encode_feed_as_pgoutput(feed))
    got = {
        (r["op"], r["resource"], r["lsn"]): r["data"]["value"]
        for r in decoded.collect()
    }
    want_rows = feed.filter("op != 'READ'").collect()
    assert len(got) == len(want_rows)
    for r in want_rows:
        v = got[(r["op"], r["resource"], r["lsn"])]
        assert float(v) == r["value"]

def test_data_message_without_begin_fails():
    # Fail-stop like RelationNotFound: an I/U/D with no preceding BEGIN
    # means the frame stream was split or reordered between encode and
    # decode — emitting commit_ts=None would break the stamp-every-event
    # contract (converter.zig S8).
    d = _dec_with_rel()
    with pytest.raises(PgOutputError, match="no preceding BEGIN"):
        d.decode(2, encode_insert(42, ["1", "Alice"]))
