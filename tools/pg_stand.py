"""Local PostgreSQL replication stand: DB → WAL → pgoutput → engine.

The docker-compose stand (`deploy/load-stand/`) needs a docker daemon,
which this sandbox does not have (client only, no dockerd — SCALING.md
r9 note). This tool executes the legs that need no container at all,
against a REAL PostgreSQL server (`initdb`/`pg_ctl`/`postgres` are on
PATH here): it initializes a throwaway logical-WAL cluster, drives a
write workload, owns a real replication slot through the repo's wire
client (`sources/pg_replication.py`), decodes the real pgoutput stream
with the engine's decoder, runs the reference-style gap check over the
BIGSERIAL sequence (reference `tests/load/check-gaps.sh` semantics),
and prints one JSON line of measured numbers. The Kafka/Debezium legs
remain compose-only.

Usage:
    python tools/pg_stand.py [--rows 20000] [--keep]

Cluster helpers are importable (tests/test_pg_replication.py builds
its fixture on them). PostgreSQL refuses to run as root; when invoked
as root every server command is run through ``runuser -u postgres``
(the account exists in this image) with the data directory chowned
accordingly.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PG_PORT = 5799  # only names the socket file; nothing listens on TCP


def pg_available() -> str | None:
    """None if a local cluster can run here, else the skip reason."""
    for binname in ("initdb", "pg_ctl", "postgres"):
        if not shutil.which(binname):
            return f"{binname} not on PATH"
    if os.geteuid() == 0:
        import pwd

        try:
            pwd.getpwnam("postgres")
        except KeyError:
            return "running as root and no 'postgres' account to drop to"
        if not shutil.which("runuser"):
            return "running as root and no runuser"
    return None


def _as_pg_user(cmd: list[str]) -> list[str]:
    if os.geteuid() == 0:
        return ["runuser", "-u", "postgres", "--", *cmd]
    return cmd


def start_cluster(root: Path) -> dict:
    """initdb + start a logical-WAL cluster under ``root``; returns
    connection params for PgWireClient. Caller owns cleanup via
    :func:`stop_cluster`."""
    root.mkdir(parents=True, exist_ok=True)
    data = root / "data"
    if os.geteuid() == 0:
        shutil.chown(root, "postgres", None)
    subprocess.run(
        _as_pg_user(["initdb", "-D", str(data), "-E", "UTF8", "-A", "trust", "--no-sync"]),
        check=True,
        capture_output=True,
    )
    with open(data / "postgresql.conf", "a") as f:
        f.write(
            "\nwal_level=logical\nlisten_addresses=''\n"
            f"unix_socket_directories='{root}'\nport={PG_PORT}\n"
            "max_wal_senders=4\nmax_replication_slots=4\nfsync=off\n"
            "synchronous_commit=off\n"
        )
    subprocess.run(
        _as_pg_user(
            ["pg_ctl", "-D", str(data), "-l", str(root / "server.log"), "-w", "start"]
        ),
        check=True,
        capture_output=True,
    )
    return {"sockdir": str(root), "port": PG_PORT, "user": "postgres", "database": "postgres"}


def stop_cluster(root: Path) -> None:
    subprocess.run(
        _as_pg_user(["pg_ctl", "-D", str(root / "data"), "-m", "immediate", "stop"]),
        check=False,
        capture_output=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    reason = pg_available()
    if reason:
        print(f"# pg stand unavailable: {reason}", file=sys.stderr)
        sys.exit(2)

    from outboxx_spark.sources.pg_replication import (
        PgWireClient,
        parse_lsn,
        pull_slot_changes,
    )

    root = Path("/tmp/oxs_pg_stand")
    shutil.rmtree(root, ignore_errors=True)
    conn = start_cluster(root)
    try:
        sql = PgWireClient(**conn)
        sql.query(
            "CREATE TABLE public.events (id BIGSERIAL PRIMARY KEY, "
            "user_id bigint, event_type text, value float8, props jsonb)"
        )
        sql.query("ALTER TABLE public.events REPLICA IDENTITY FULL")
        sql.query("CREATE PUBLICATION pub FOR TABLE public.events")
        repl = PgWireClient(**conn, replication="database")
        repl.create_logical_slot("stand_slot")

        # workload: batch inserts + a 10% update + 5% delete wave, the
        # deploy/load-stand/sql/workload.sql shape without psql
        n = args.rows
        t0 = time.perf_counter()
        batch = 1000
        for lo in range(0, n, batch):
            hi = min(lo + batch, n)
            sql.query(
                "INSERT INTO public.events (user_id, event_type, value, props) "
                f"SELECT i % 97, 'type_' || (i % 7), i * 0.5, "
                "jsonb_build_object('seq', i) "
                f"FROM generate_series({lo}, {hi - 1}) AS g(i)"
            )
        sql.query("UPDATE public.events SET value = value + 1 WHERE id % 10 = 0")
        sql.query("DELETE FROM public.events WHERE id % 20 = 7")
        write_sec = time.perf_counter() - t0
        # INSERT lsn, not write lsn: with asynchronous commit the write
        # pointer lags the insert pointer (observed: a committed DELETE
        # wave's records sat beyond pg_current_wal_lsn, truncating the
        # pull) — pg_current_wal_insert_lsn covers everything committed
        target = parse_lsn(sql.query("SELECT pg_current_wal_insert_lsn()")[0][0])
        # marker txn: its first frame lands at wal_start >= target and
        # terminates the stream exactly (see stream_pgoutput docstring)
        sql.query(
            "INSERT INTO public.events (user_id, event_type) VALUES (-1, 'marker')"
        )

        # pull the real pgoutput stream through the wire client
        t0 = time.perf_counter()
        frames = list(
            repl.stream_pgoutput("stand_slot", "pub", target, timeout=300.0)
        )
        pull_sec = time.perf_counter() - t0

        # decode with the engine (one partition: serial slot stream)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "8")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        from pyspark.sql import functions as F

        t0 = time.perf_counter()
        events = pull_slot_changes(spark, frames).cache()
        by_op = {
            r["op"]: r["n"]
            for r in events.groupBy("op").agg(F.count("*").alias("n")).collect()
        }
        decode_sec = time.perf_counter() - t0

        # reference-style gap check over the BIGSERIAL sequence as seen
        # by the INSERT stream (check-gaps.sh: every id exactly once)

        ids = events.filter(F.col("op") == "INSERT").select(
            F.col("data")["id"].cast("long").alias("id")
        )
        n_ids = ids.count()
        distinct_ids = ids.distinct().count()
        id_min, id_max = ids.agg(F.min("id"), F.max("id")).first()
        gaps = (id_max - id_min + 1) - distinct_ids

        out = {
            "rows": n,
            "frames": len(frames),
            "events": {k: by_op.get(k, 0) for k in ("INSERT", "UPDATE", "DELETE")},
            "write_sec": round(write_sec, 2),
            "pull_sec": round(pull_sec, 2),
            "pull_events_per_sec": round(len(frames) / pull_sec) if pull_sec else None,
            "decode_sec": round(decode_sec, 2),
            "insert_ids": {"n": n_ids, "distinct": distinct_ids, "gaps": gaps},
            "gap_check": "PASS" if (gaps == 0 and n_ids == distinct_ids == n) else "FAIL",
        }
        print(json.dumps(out))
        repl.close()
        sql.close()
    finally:
        if not args.keep:
            stop_cluster(root)
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
