"""Keyed-upsert table sink: continuous MERGE INTO semantics from plain
parquet + staged per-bucket rename commit (streaming/table_sink.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from outboxx_spark.operators.materialize import materialize
from outboxx_spark.sources.feed import read_feed, read_feed_stream
from outboxx_spark.streaming.table_sink import (
    read_table_state,
    recover_table,
    start_table_upsert_stream,
    upsert_batch,
)


@pytest.fixture(scope="module")
def multi_file_feed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("feed_sink")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def _state_set(df):
    return {
        (r["resource"], r["user_id"], r["lsn"], r["op"]) for r in df.collect()
    }


def test_streamed_upserts_converge_to_batch_materialize(spark, multi_file_feed, tmp_path):
    """Feeding the table micro-batch by micro-batch must land on exactly
    the state of materializing the whole feed in one shot."""
    table = str(tmp_path / "tbl")
    q = start_table_upsert_stream(
        read_feed_stream(spark, multi_file_feed, max_files_per_trigger=2),
        table,
        str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(180), "upsert stream did not finish in 180s"
    want = _state_set(materialize(read_feed(spark, multi_file_feed)))
    got = _state_set(read_table_state(spark, table))
    assert got == want


def test_upsert_batch_is_idempotent(spark, multi_file_feed, tmp_path):
    """Re-applying an already-applied batch (the crash-replay path) must
    leave the table bit-identical."""
    table = str(tmp_path / "tbl")
    feed = read_feed(spark, multi_file_feed)
    first = feed.filter(F.col("lsn") % 2 == 0)
    second = feed.filter(F.col("lsn") % 2 == 1)
    upsert_batch(first, table)
    upsert_batch(second, table)
    after_once = _state_set(spark.read.parquet(table))
    upsert_batch(second, table)  # replay
    after_twice = _state_set(spark.read.parquet(table))
    assert after_once == after_twice


def test_upsert_applies_delete_tombstones(spark, tmp_path):
    table = str(tmp_path / "tbl")
    cols = "op string, resource string, lsn long, commit_ts long, user_id long"
    b1 = spark.createDataFrame(
        [("INSERT", "public.t0", 1, 10, 7), ("INSERT", "public.t0", 2, 10, 8)], cols
    )
    b2 = spark.createDataFrame([("DELETE", "public.t0", 3, 11, 7)], cols)
    upsert_batch(b1, table)
    upsert_batch(b2, table)
    rows = {r["user_id"] for r in read_table_state(spark, table).collect()}
    assert rows == {8}
    # late (lower-lsn) replay of the dead key must NOT resurrect it:
    # the retained tombstone (lsn 3) outranks the stale UPDATE (lsn 2)
    upsert_batch(
        spark.createDataFrame([("UPDATE", "public.t0", 2, 10, 7)], cols), table
    )
    rows = {r["user_id"] for r in read_table_state(spark, table).collect()}
    assert rows == {8}


@pytest.mark.slow
def test_upsert_crash_at_every_commit_step_replays_to_convergence(
    spark, tmp_path, monkeypatch
):
    """Exhaustive crash-point enumeration of the per-bucket rename
    commit (r6): replay _commit_staged's exact filesystem sequence —
    park live bucket, swap staged bucket in, per sorted bucket, then
    drop undo, drop stage — crashing after EVERY prefix. The claimed
    contract is crash -> recover -> replay the same batch ==
    clean-run final state; a mid-commit table may legitimately hold a
    partial batch (swapped buckets), so convergence-after-replay is
    the invariant, not state equality at the crash point."""
    import shutil

    import outboxx_spark.streaming.table_sink as ts

    cols = "op string, resource string, lsn long, commit_ts long, user_id long"
    b1 = spark.createDataFrame(
        [("INSERT", "public.t0", i, 10, i) for i in range(1, 20)], cols
    )
    b2 = spark.createDataFrame(
        [("UPDATE", "public.t0", 100 + i, 11, i) for i in range(1, 20)]
        + [("DELETE", "public.t0", 200, 11, 3)],
        cols,
    )
    # reference: the clean two-batch run
    ref = str(tmp_path / "ref")
    upsert_batch(b1, ref)
    upsert_batch(b2, ref)
    want = _state_set(read_table_state(spark, ref))

    # base: batch 1 committed, batch 2 staged but NOT committed
    base = str(tmp_path / "base")
    upsert_batch(b1, base)
    monkeypatch.setattr(ts, "_commit_staged", lambda *a, **k: None)
    upsert_batch(b2, base)
    monkeypatch.undo()
    staged = sorted(
        d for d in os.listdir(f"{base}/.stage") if d.startswith("bucket=")
    )
    assert staged, "expected staged buckets"

    def commit_ops(root):
        seq = [lambda: os.makedirs(f"{root}/.undo", exist_ok=True)]
        for name in staged:
            def park(n=name):
                if os.path.exists(f"{root}/{n}"):
                    shutil.move(f"{root}/{n}", f"{root}/.undo/{n}")
            seq.append(park)
            seq.append(lambda n=name: shutil.move(f"{root}/.stage/{n}", f"{root}/{n}"))
        seq.append(lambda: shutil.rmtree(f"{root}/.undo"))
        seq.append(lambda: shutil.rmtree(f"{root}/.stage"))
        return seq

    n_ops = len(commit_ops(base))
    for k in range(n_ops + 1):
        root = str(tmp_path / f"crash{k}")
        shutil.copytree(base, root)
        for op in commit_ops(root)[:k]:
            op()
        recover_table(spark, root)
        assert not os.path.exists(f"{root}/.stage"), f"crash after op {k}"
        assert not os.path.exists(f"{root}/.undo"), f"crash after op {k}"
        upsert_batch(b2, root)  # the checkpoint replay
        got = _state_set(read_table_state(spark, root))
        assert got == want, f"crash after op {k}"


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """Dynamic partition overwrite must leave untouched bucket
    directories' files byte-identical (same names, same mtimes)."""
    table = str(tmp_path / "tbl")
    cols = "op string, resource string, lsn long, commit_ts long, user_id long"
    base = spark.createDataFrame(
        [("INSERT", "public.t0", i, 10, i) for i in range(1, 50)], cols
    )
    upsert_batch(base, table)
    before = {}
    for d in os.listdir(table):
        if d.startswith("bucket="):
            p = os.path.join(table, d)
            before[d] = {f: os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)}
    # touch exactly one key
    upsert_batch(
        spark.createDataFrame([("UPDATE", "public.t0", 100, 11, 1)], cols), table
    )
    changed = unchanged = 0
    for d, files in before.items():
        p = os.path.join(table, d)
        now = {f: os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)}
        if now == files:
            unchanged += 1
        else:
            changed += 1
    assert changed == 1  # exactly the key's bucket
    assert unchanged >= 1  # everything else untouched


def test_compaction_drops_only_expired_tombstones(spark, tmp_path):
    from outboxx_spark.streaming.table_sink import compact_table

    table = str(tmp_path / "tbl")
    cols = "op string, resource string, lsn long, commit_ts long, user_id long"
    upsert_batch(
        spark.createDataFrame(
            [
                ("INSERT", "public.t0", 1, 10, 1),
                ("DELETE", "public.t0", 2, 10, 2),   # expired tombstone
                ("DELETE", "public.t0", 100, 10, 3),  # still in replay horizon
            ],
            cols,
        ),
        table,
    )
    compact_table(spark, table, tombstone_horizon_lsn=50)
    raw = {(r["user_id"], r["op"]) for r in spark.read.parquet(table).collect()}
    assert raw == {(1, "INSERT"), (3, "DELETE")}


def test_snapshot_diff_roundtrip(spark, multi_file_feed):
    """snapshot_diff(old, new) must emit exactly the key-level changes:
    applying it to old's key-set reproduces new's key-set, and UPDATE
    keys differ in at least one compared column."""
    from outboxx_spark.operators.materialize import snapshot_diff

    feed = read_feed(spark, multi_file_feed)
    half = feed.agg(F.max("lsn")).first()[0] // 2
    old = materialize(feed.filter(F.col("lsn") <= half))
    new = materialize(feed)
    diff = snapshot_diff(old, new, compare_cols=("event_type", "value")).collect()
    ops = {(r["resource"], r["user_id"]): r["change_op"] for r in diff}
    o = {(r["resource"], r["user_id"]): (r["event_type"], r["value"]) for r in old.collect()}
    n = {(r["resource"], r["user_id"]): (r["event_type"], r["value"]) for r in new.collect()}
    assert {k for k, v in ops.items() if v == "INSERT"} == set(n) - set(o)
    assert {k for k, v in ops.items() if v == "DELETE"} == set(o) - set(n)
    assert {k for k, v in ops.items() if v == "UPDATE"} == {
        k for k in set(o) & set(n) if o[k] != n[k]
    }


def test_snapshot_diff_null_key_rows_classify_correctly(spark):
    """A row whose FIRST key column is legitimately NULL and which is
    present unchanged in both snapshots must produce NO diff row (the
    old key-nullability presence test misread it as INSERT); changed /
    removed NULL-keyed rows must still classify as UPDATE / DELETE."""
    from outboxx_spark.operators.materialize import snapshot_diff

    cols = "resource string, user_id long, event_type string, value double"
    old = spark.createDataFrame(
        [
            (None, 1, "a", 1.0),   # unchanged -> no row
            (None, 2, "b", 2.0),   # value changes -> UPDATE
            (None, 3, "c", 3.0),   # disappears -> DELETE
            ("r", 4, "d", 4.0),    # unchanged non-null control
        ],
        cols,
    )
    new = spark.createDataFrame(
        [
            (None, 1, "a", 1.0),
            (None, 2, "b", 9.0),
            (None, 5, "e", 5.0),   # appears -> INSERT
            ("r", 4, "d", 4.0),
        ],
        cols,
    )
    diff = {
        (r["resource"], r["user_id"]): r["change_op"]
        for r in snapshot_diff(old, new, compare_cols=("event_type", "value")).collect()
    }
    assert diff == {
        (None, 2): "UPDATE",
        (None, 3): "DELETE",
        (None, 5): "INSERT",
    }


def test_upsert_recovers_bucket_parked_mid_swap(spark, tmp_path):
    """Crash between 'rename old away' and 'rename staged in': the
    bucket sits in .undo with no live directory. The next upsert call
    must restore it before merging, so no pre-existing row is lost."""
    import shutil

    table = str(tmp_path / "tbl")
    cols = "op string, resource string, lsn long, commit_ts long, user_id long"
    base = spark.createDataFrame(
        [("INSERT", "public.t0", i, 10, i) for i in range(1, 30)], cols
    )
    upsert_batch(base, table)
    want = _state_set(spark.read.parquet(table))
    buckets = [d for d in os.listdir(table) if d.startswith("bucket=")]
    victim = buckets[0]
    # simulate the torn commit: live dir renamed to .undo, staged dir
    # lost with the crash (plus a stale half-written .stage left behind)
    os.makedirs(os.path.join(table, ".undo"), exist_ok=True)
    shutil.move(os.path.join(table, victim), os.path.join(table, ".undo", victim))
    os.makedirs(os.path.join(table, ".stage", victim), exist_ok=True)
    # replaying ANY batch (here: one key) must first restore the victim
    upsert_batch(
        spark.createDataFrame([("INSERT", "public.t0", 100, 11, 1)], cols), table
    )
    got = _state_set(spark.read.parquet(table))
    assert got == (want - {("public.t0", 1, 1, "INSERT")}) | {
        ("public.t0", 1, 100, "INSERT")
    }
    assert not os.path.exists(os.path.join(table, ".undo"))
    assert not os.path.exists(os.path.join(table, ".stage"))


def test_read_refuses_torn_commit_until_recovered(spark, tmp_path):
    """A reader must never silently observe a table missing a bucket
    parked in .undo by a crashed swap (parquet readers skip dot-dirs,
    so every key in that bucket would just vanish). read_table_state
    raises; after recover_table() it returns the full pre-crash state."""
    import shutil

    table = str(tmp_path / "tbl")
    cols = "op string, resource string, lsn long, commit_ts long, user_id long"
    upsert_batch(
        spark.createDataFrame(
            [("INSERT", "public.t0", i, 10, i) for i in range(1, 30)], cols
        ),
        table,
    )
    want = _state_set(read_table_state(spark, table))
    victim = next(d for d in os.listdir(table) if d.startswith("bucket="))
    os.makedirs(os.path.join(table, ".undo"), exist_ok=True)
    shutil.move(os.path.join(table, victim), os.path.join(table, ".undo", victim))
    with pytest.raises(RuntimeError, match="recover_table"):
        read_table_state(spark, table)
    recover_table(spark, table)
    assert _state_set(read_table_state(spark, table)) == want


def test_upsert_recovers_completed_swap_with_stale_undo(spark, tmp_path):
    """Crash after 'rename staged in' but before .undo cleanup: live dir
    holds the NEW state, .undo the old. Recovery must keep the new state
    and drop the stale parked copy (not resurrect old rows)."""
    import shutil

    table = str(tmp_path / "tbl")
    cols = "op string, resource string, lsn long, commit_ts long, user_id long"
    upsert_batch(
        spark.createDataFrame([("INSERT", "public.t0", 1, 10, 7)], cols), table
    )
    old_bucket = next(d for d in os.listdir(table) if d.startswith("bucket="))
    parked = os.path.join(table, ".undo", old_bucket)
    shutil.copytree(os.path.join(table, old_bucket), parked)
    upsert_batch(
        spark.createDataFrame([("UPDATE", "public.t0", 2, 11, 7)], cols), table
    )
    rows = {(r["user_id"], r["lsn"]) for r in spark.read.parquet(table).collect()}
    assert rows == {(7, 2)}
    assert not os.path.exists(os.path.join(table, ".undo"))


def test_compaction_clears_emptied_bucket(spark, tmp_path):
    """A bucket whose rows were all expired tombstones writes no staged
    partition; the prune_unstaged commit must remove its live directory
    (and tombstones) rather than let them survive the rewrite."""
    from outboxx_spark.streaming.table_sink import compact_table

    table = str(tmp_path / "tbl")
    cols = "op string, resource string, lsn long, commit_ts long, user_id long"
    # two keys in different buckets; one bucket will empty entirely
    upsert_batch(
        spark.createDataFrame(
            [("INSERT", "public.t0", 1, 10, 1), ("DELETE", "public.t0", 2, 10, 2)],
            cols,
        ),
        table,
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        compact_table(spark, table, tombstone_horizon_lsn=50)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    rows = {(r["user_id"], r["op"]) for r in spark.read.parquet(table).collect()}
    assert rows == {(1, "INSERT")}


def test_upsert_works_on_scheme_qualified_uri(spark, tmp_path):
    """The sink's existence probe and rename commit must work on a
    scheme-qualified table URI (file://...), not just bare local paths —
    the driver-local os.path probe this replaced always returned False
    for any URI, silently skipping the merge with existing state."""
    table = f"file://{tmp_path}/tbl"
    cols = "op string, resource string, lsn long, commit_ts long, user_id long"
    upsert_batch(
        spark.createDataFrame([("INSERT", "public.t0", 1, 10, 7)], cols), table
    )
    # second batch MUST merge with (not replace) the existing state
    upsert_batch(
        spark.createDataFrame([("INSERT", "public.t0", 2, 11, 8)], cols), table
    )
    rows = {r["user_id"] for r in read_table_state(spark, table).collect()}
    assert rows == {7, 8}


def test_compaction_recovers_from_crashed_swap(spark, tmp_path):
    """A crash during compact_table's swap (bucket parked in .undo, live
    dir missing) must be repaired by the next compact: the parked bucket
    is restored first, then compacted normally — no rows lost, expired
    tombstones still dropped."""
    import shutil

    from outboxx_spark.streaming.table_sink import compact_table

    table = str(tmp_path / "tbl")
    cols = "op string, resource string, lsn long, commit_ts long, user_id long"
    upsert_batch(
        spark.createDataFrame(
            [
                ("INSERT", "public.t0", 1, 10, 1),
                ("DELETE", "public.t0", 2, 10, 2),   # expired tombstone
                ("INSERT", "public.t0", 3, 10, 3),
            ],
            cols,
        ),
        table,
    )
    victim = next(d for d in os.listdir(table) if d.startswith("bucket="))
    os.makedirs(os.path.join(table, ".undo"), exist_ok=True)
    shutil.move(os.path.join(table, victim), os.path.join(table, ".undo", victim))
    compact_table(spark, table, tombstone_horizon_lsn=50)
    rows = {(r["user_id"], r["op"]) for r in spark.read.parquet(table).collect()}
    assert rows == {(1, "INSERT"), (3, "INSERT")}
    assert not os.path.exists(os.path.join(table, ".undo"))
