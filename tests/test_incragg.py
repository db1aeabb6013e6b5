"""Incremental aggregate maintenance (operators/incragg.py): the delta
algebra against a single-node state model, on exactly the sequences
that break naive delta schemes."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.operators.incragg import incremental_group_totals


def _feed(spark, rows):
    # (op, resource, lsn, user_id, value)
    return spark.createDataFrame(
        [(op, r, lsn, u, v) for op, r, lsn, u, v in rows],
        "op string, resource string, lsn long, user_id long, value double",
    )


def _model(rows):
    state: dict[tuple[str, int], int] = {}
    for op, r, lsn, u, v in sorted(rows, key=lambda x: x[2]):
        if op == "READ":
            continue
        if op == "DELETE":
            state.pop((r, u), None)
        else:  # INSERT and UPDATE are both latest-op-wins upserts
            state[(r, u)] = round(v * 100)
    out: dict[str, list[int]] = {}
    for (r, _), cents in state.items():
        out.setdefault(r, [0, 0])
        out[r][0] += 1
        out[r][1] += cents
    return {r: (n, s) for r, (n, s) in out.items()}


def test_delta_algebra_matches_state_model(spark):
    rows = [
        # key 1: insert -> update -> delete -> REinsert (the telescoping
        # sum must land on the reinserted value, not the history)
        ("INSERT", "t0", 1, 1, 10.00),
        ("UPDATE", "t0", 2, 1, 12.50),
        ("DELETE", "t0", 3, 1, 0.0),
        ("INSERT", "t0", 4, 1, 3.25),
        # key 2: UPDATE with no prior INSERT (upsert semantics)
        ("UPDATE", "t0", 5, 2, 7.75),
        # key 3: DELETE only (must contribute nothing, not go negative)
        ("DELETE", "t0", 6, 3, 99.0),
        # key 4: alive then deleted (drops out of both count and sum)
        ("INSERT", "t1", 7, 4, 50.00),
        ("DELETE", "t1", 8, 4, 0.0),
        # key 5: READ noise interleaved (no state change)
        ("INSERT", "t1", 9, 5, 20.00),
        ("READ", "t1", 10, 5, 555.0),
        ("UPDATE", "t1", 11, 5, 21.00),
    ]
    got = {
        r["resource"]: (r["n_live"], r["sum_value_cents"])
        for r in incremental_group_totals(_feed(spark, rows)).collect()
    }
    assert got == _model(rows)
    assert got["t0"] == (2, 325 + 775)
    assert got["t1"] == (1, 2100)


def test_randomized_stress_vs_model(spark):
    # one Spark run over a seeded-random 3000-op churn across 150 keys
    # and 5 groups — the interleavings hypothesis would explore, at
    # DataFrame cost instead of job-per-example cost
    import random

    rng = random.Random(0xC0FFEE)
    rows = []
    for lsn in range(3000):
        u = rng.randrange(150)
        rows.append(
            (
                rng.choice(["INSERT", "UPDATE", "DELETE", "READ"]),
                f"t{u % 5}",
                lsn,
                u,
                round(rng.uniform(0, 500), 2),
            )
        )
    got = {
        r["resource"]: (r["n_live"], r["sum_value_cents"])
        for r in incremental_group_totals(_feed(spark, rows)).collect()
    }
    assert got == _model(rows)


def test_duplicate_lsn_ties_are_deterministic(spark):
    # ADVICE r9: a bare-lsn window order makes the telescoped final
    # value of duplicate (resource, key, lsn) events nondeterministic.
    # The window now carries materialize()'s (op-precedence, commit_ts)
    # tie-break: on an equal-lsn INSERT/UPDATE/DELETE pile-up, DELETE
    # (rank 3) must win — and win IDENTICALLY on every run/partitioning.
    rows = [
        ("INSERT", "t0", 1, 1, 10.00, 100),
        # same lsn, three ops: DELETE outranks UPDATE outranks INSERT
        ("UPDATE", "t0", 2, 1, 55.00, 200),
        ("DELETE", "t0", 2, 1, 0.0, 201),
        ("INSERT", "t0", 2, 1, 99.00, 199),
        # same lsn + same op: commit_ts breaks the tie (later wins)
        ("UPDATE", "t0", 3, 2, 1.00, 300),
        ("UPDATE", "t0", 3, 2, 2.00, 301),
    ]
    df = spark.createDataFrame(
        rows,
        "op string, resource string, lsn long, user_id long,"
        " value double, commit_ts long",
    )
    from outboxx_spark.operators.incragg import incremental_group_totals as igt

    expect = {"t0": (1, 200)}  # key1 deleted at lsn2; key2 holds 2.00
    for frame in (df.coalesce(1), df.repartition(7)):
        got = {
            r["resource"]: (r["n_live"], r["sum_value_cents"])
            for r in igt(frame).collect()
        }
        assert got == expect, got


def test_partition_invariance(spark):
    rows = [
        (op, f"t{u % 3}", lsn, u, float(lsn % 17) + 0.25)
        for lsn, (op, u) in enumerate(
            [("INSERT", u) for u in range(40)]
            + [("UPDATE", u) for u in range(0, 40, 2)]
            + [("DELETE", u) for u in range(0, 40, 5)]
        )
    ]
    df = _feed(spark, rows)
    one = {
        r["resource"]: (r["n_live"], r["sum_value_cents"])
        for r in incremental_group_totals(df.coalesce(1)).collect()
    }
    many = {
        r["resource"]: (r["n_live"], r["sum_value_cents"])
        for r in incremental_group_totals(df.repartition(13)).collect()
    }
    assert one == many == _model(rows)
