"""Driver-contract invariants over __spark_entry__ — pure dict checks,
no Spark session. These pin the properties the driver's correctness
pass depends on (and that a future queries() rotation could silently
break): oracle coverage, name uniqueness, and the staged r5 queue
staying disjoint from the live surface until its promotion."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E


def test_every_query_has_an_oracle():
    qs, oracles = E.queries(), E.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"queries without oracle SQL: {missing}"


def test_no_orphan_oracles():
    qs, oracles = E.queries(), E.oracle_sql()
    orphans = [n for n in oracles if n not in qs]
    assert not orphans, f"oracle SQL without a query: {orphans}"


def test_driver_window_order_is_stable():
    # The driver records exactly the first 50 entries; the r4 rotation
    # put every previously-unevidenced query inside that window. Pin the
    # window boundary so an accidental reorder is a test failure, not a
    # silently-lost round of driver evidence.
    order = list(E.queries())
    assert len(order) == 73
    must_be_recorded = {
        "docs_edit_dedup",
        "cdc_snapshot_diff",
        "cdc_state_as_of",
        "cdc_gap_check",
        "olap_table_profile",
        "olap_quantiles_approx",
        "olap_cardinality_approx",
    }
    first50 = set(order[:50])
    assert must_be_recorded <= first50, sorted(must_be_recorded - first50)


def test_staged_queue_is_disjoint_and_oracle_complete():
    staged_q, staged_o = E.queries_staged(), E.oracle_sql_staged()
    assert set(staged_q) == set(staged_o)
    live = set(E.queries())
    assert not (set(staged_q) & live), "staged name collides with queries()"


def test_all_callables():
    for name, fn in {**E.queries(), **E.queries_staged()}.items():
        assert callable(fn), name
