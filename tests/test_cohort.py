"""Cohort-retention contracts (r9): matrix equals a plain-Python model
on a crafted event set covering the edges — pre-conversion activity
excluded, offset-0 self-week counted, non-converting users absent,
Monday week alignment."""

from __future__ import annotations

import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.cohort import cohort_retention

# week A = 2024-01-01 (a Monday), week B = 2024-01-08, week C = 2024-01-15
EVENTS = [
    # user 1: converts week A, active weeks A and C
    (1, datetime(2024, 1, 2, 10), "purchase"),
    (1, datetime(2024, 1, 3, 11), "click"),
    (1, datetime(2024, 1, 17, 9), "click"),
    # user 2: active (click) week A BEFORE converting week B -> the
    # week-A activity must not count
    (2, datetime(2024, 1, 4, 8), "click"),
    (2, datetime(2024, 1, 9, 8), "purchase"),
    (2, datetime(2024, 1, 16, 8), "click"),
    # user 3: never converts -> absent entirely
    (3, datetime(2024, 1, 2, 12), "click"),
    # user 4: converts week A, active only that week
    (4, datetime(2024, 1, 7, 23, 59), "purchase"),  # Sunday, still week A
]

WANT = {
    # (cohort_week, offset) -> n_users
    (datetime(2024, 1, 1), 0): 2,  # users 1 and 4
    (datetime(2024, 1, 1), 2): 1,  # user 1 active week C
    (datetime(2024, 1, 8), 0): 1,  # user 2
    (datetime(2024, 1, 8), 1): 1,  # user 2 active week C
}


def test_matrix_matches_model(spark):
    df = spark.createDataFrame(
        EVENTS, "user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == WANT


def test_partition_invariant(spark):
    df = spark.createDataFrame(
        EVENTS, "user_id long, ts timestamp, event_type string"
    )
    a = sorted(map(tuple, cohort_retention(df.coalesce(1)).collect()))
    b = sorted(map(tuple, cohort_retention(df.repartition(7)).collect()))
    assert a == b
