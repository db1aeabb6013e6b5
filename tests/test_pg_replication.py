"""Real-WAL integration: wire client + pgoutput decoder against a live
PostgreSQL (S2/S6/S7 evidence on genuine bytes, not the testbed
encoder). The module starts its own throwaway logical-WAL cluster via
tools/pg_stand.py helpers and skips — with the exact reason — where the
server binaries or the non-root account are unavailable.

Reference parity: the reference's replication_protocol.zig owns the
slot in-process and its pg_output_decoder.zig parses the same stream;
here the wire client (sources/pg_replication.py) owns the slot and the
repo's PgOutputDecoder (sources/pgoutput.py) — already oracle-checked
on the testbed path — parses the REAL frames.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import pg_stand
from outboxx_spark.sources.pg_replication import (
    PgWireClient,
    format_lsn,
    parse_lsn,
    pull_slot_changes,
)
from outboxx_spark.sources.pgoutput import PgOutputDecoder

_SKIP = pg_stand.pg_available()
pytestmark = pytest.mark.skipif(
    _SKIP is not None, reason=f"local postgres unavailable: {_SKIP}"
)


@pytest.fixture(scope="module")
def cluster():
    root = Path("/tmp/oxs_pg_test")
    shutil.rmtree(root, ignore_errors=True)
    conn = pg_stand.start_cluster(root)
    yield conn
    pg_stand.stop_cluster(root)
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture()
def sql(cluster):
    c = PgWireClient(**cluster)
    yield c
    c.close()


def _capture(cluster, sql, table_ddl, pub_tables, workload, slot, marker):
    """create tables + publication, slot, run workload, pull frames.
    ``marker`` must be a statement that writes a row to a PUBLISHED
    table — its frame at wal_start >= target terminates the stream
    (stream_pgoutput's calling convention) and is not yielded."""
    for ddl in table_ddl:
        sql.query(ddl)
    sql.query(f"CREATE PUBLICATION pub_{slot} FOR TABLE {pub_tables}")
    repl = PgWireClient(**cluster, replication="database")
    try:
        repl.create_logical_slot(slot)
        workload(sql)
        target = parse_lsn(
            sql.query("SELECT pg_current_wal_insert_lsn()")[0][0]
        )
        sql.query(marker)
        frames = list(
            repl.stream_pgoutput(slot, f"pub_{slot}", target, timeout=60.0)
        )
    finally:
        repl.close()
    return frames


def _decode_all(frames):
    dec = PgOutputDecoder()
    out = []
    for lsn, payload in frames:
        ev = dec.decode(lsn, payload)
        if ev is not None:
            out.append(ev)
    return out


def test_real_wal_roundtrip_through_the_engine_decoder(cluster, sql, spark):
    def workload(c):
        c.query(
            "INSERT INTO public.users VALUES "
            "(1, 'alice', 1.5, '{\"a\": [1, null]}'), "
            "(2, 'боб-ユーザー', NULL, NULL), "
            "(3, 'carol', -0.25, '\"txt\"')"
        )
        c.query("UPDATE public.users SET name = 'bob2', score = 2 WHERE id = 2")
        c.query("DELETE FROM public.users WHERE id = 3")

    frames = _capture(
        cluster,
        sql,
        [
            "CREATE TABLE public.users (id bigint PRIMARY KEY, name text, "
            "score float8, props jsonb)",
            "ALTER TABLE public.users REPLICA IDENTITY FULL",
        ],
        "public.users",
        workload,
        "slot_rt",
        "INSERT INTO public.users VALUES (999, 'marker', 0, NULL)",
    )
    # the full Spark path: real frames -> decode_stream
    rows = pull_slot_changes(spark, frames).collect()
    assert [r["op"] for r in rows] == ["INSERT"] * 3 + ["UPDATE", "DELETE"]
    assert {r["resource"] for r in rows} == {"public.users"}
    ins = {r["data"]["id"]: dict(r["data"]) for r in rows[:3]}
    assert ins["1"] == {
        "id": "1",
        "name": "alice",
        "score": "1.5",
        "props": '{"a": [1, null]}',
    }
    assert ins["2"]["name"] == "боб-ユーザー"
    assert ins["2"]["score"] is None and ins["2"]["props"] is None
    upd = rows[3]
    assert upd["data"]["name"] == "bob2" and upd["data"]["score"] == "2"
    # REPLICA IDENTITY FULL: real old image on UPDATE, full row on DELETE
    assert dict(upd["old"])["name"] == "боб-ユーザー"
    assert rows[4]["data"] == {
        "id": "3",
        "name": "carol",
        "score": "-0.25",
        "props": '"txt"',
    }
    # lsn strictly increasing real record LSNs, commit_ts a real clock
    lsns = [r["lsn"] for r in rows]
    assert lsns == sorted(lsns) and len(set(lsns)) == len(lsns) and lsns[0] > 0
    assert all(r["commit_ts"] > 1_700_000_000 for r in rows)


def test_alter_table_reregisters_relation_mid_stream(cluster, sql):
    # S7 on real bytes: the server re-sends RELATION after ALTER TABLE,
    # and the decoder's registry upsert must pick up the new column
    def workload(c):
        c.query("INSERT INTO public.evolving VALUES (1, 'v1')")
        c.query("ALTER TABLE public.evolving ADD COLUMN extra int")
        c.query("INSERT INTO public.evolving VALUES (2, 'v2', 7)")

    frames = _capture(
        cluster,
        sql,
        ["CREATE TABLE public.evolving (id bigint PRIMARY KEY, name text)"],
        "public.evolving",
        workload,
        "slot_ddl",
        "INSERT INTO public.evolving VALUES (999, 'marker', NULL)",
    )
    events = _decode_all(frames)
    assert [e["op"] for e in events] == ["INSERT", "INSERT"]
    assert set(events[0]["data"]) == {"id", "name"}
    assert set(events[1]["data"]) == {"id", "name", "extra"}
    assert events[1]["data"]["extra"] == "7"
    # two RELATION frames made it onto the wire
    assert sum(1 for _, p in frames if p[:1] == b"R") == 2


def test_unpublished_table_and_truncate_are_invisible_or_skipped(cluster, sql):
    def workload(c):
        c.query("INSERT INTO public.pub_t VALUES (1)")
        c.query("INSERT INTO public.unpub_t VALUES (99)")
        c.query("TRUNCATE public.pub_t")
        c.query("INSERT INTO public.pub_t VALUES (2)")

    frames = _capture(
        cluster,
        sql,
        [
            "CREATE TABLE public.pub_t (id bigint PRIMARY KEY)",
            "CREATE TABLE public.unpub_t (id bigint PRIMARY KEY)",
        ],
        "public.pub_t",
        workload,
        "slot_pub",
        "INSERT INTO public.pub_t VALUES (999)",
    )
    # the real stream carries a T(runcate) frame; decode skips it
    assert any(p[:1] == b"T" for _, p in frames)
    events = _decode_all(frames)
    assert [(e["op"], e["data"]["id"]) for e in events] == [
        ("INSERT", "1"),
        ("INSERT", "2"),
    ]


def test_resume_after_disconnect_is_exactly_once_after_dedup(cluster, sql, spark):
    # The reference's delivery contract on REAL infrastructure: logical
    # decoding restarts at COMMIT granularity, so confirming receipt
    # mid-transaction and dropping the connection makes the server
    # resend the whole interrupted txn — at-least-once on the wire —
    # and the engine's O4 dedup boundary (resource, lsn) collapses the
    # redelivery to exactly-once (reference source.zig:219-223).
    sql.query("CREATE TABLE public.resume_t (id bigint PRIMARY KEY, v text)")
    sql.query("CREATE PUBLICATION pub_res FOR TABLE public.resume_t")
    repl = PgWireClient(**cluster, replication="database")
    repl.create_logical_slot("slot_res")
    sql.query(
        "INSERT INTO public.resume_t SELECT i, 'a' FROM generate_series(1,10) g(i)"
    )
    sql.query(
        "INSERT INTO public.resume_t SELECT i, 'b' FROM generate_series(11,20) g(i)"
    )
    target = parse_lsn(sql.query("SELECT pg_current_wal_insert_lsn()")[0][0])
    sql.query("INSERT INTO public.resume_t VALUES (999, 'marker')")

    # pass 1: consume txn A fully + 3 rows of txn B, then drop the link
    first: list = []
    n_inserts = 0
    for lsn, payload in repl.stream_pgoutput(
        "slot_res", "pub_res", target, timeout=60.0
    ):
        first.append((lsn, payload))
        n_inserts += payload[:1] == b"I"
        if n_inserts == 13:
            break
    repl.close()

    # pass 2: a fresh session resumes from the slot's confirmed point
    repl2 = PgWireClient(**cluster, replication="database")
    second = list(
        repl2.stream_pgoutput("slot_res", "pub_res", target, timeout=60.0)
    )
    repl2.close()

    frames = first + second
    # txn A (confirmed behind us) is NOT resent; txn B is resent whole,
    # so its first rows arrive twice — real at-least-once redelivery
    i_frames = sum(1 for _, p in frames if p[:1] == b"I")
    assert i_frames == 23, i_frames
    # the engine's dedup boundary restores exactly-once
    from outboxx_spark.operators.dedup import dedup_events

    deduped = dedup_events(pull_slot_changes(spark, frames)).collect()
    assert len(deduped) == 20
    assert sorted(int(r["data"]["id"]) for r in deduped) == list(range(1, 21))
    by_id = {r["data"]["id"]: r["data"]["v"] for r in deduped}
    assert by_id["5"] == "a" and by_id["15"] == "b"


def test_wire_client_simple_query_errors_fail_stop(cluster):
    c = PgWireClient(**cluster)
    try:
        with pytest.raises(Exception, match="does_not_exist"):
            c.query("SELECT * FROM does_not_exist")
        # the connection stays usable after a failed statement
        assert c.query("SELECT 41 + 1")[0][0] == "42"
    finally:
        c.close()


def test_lsn_text_roundtrip():
    for lsn in (0, 1, 0x2000058, (7 << 32) | 0xFFFFFFFF):
        assert parse_lsn(format_lsn(lsn)) == lsn
