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
    # The driver records exactly the first 50 entries; the r6 rotation
    # puts (a) the 3 money queries that hashed red in r5 and were
    # reformulated to fixed-point BIGINT, (b) the 7 queries whose
    # output int widths were aligned this round, and (c) the entire
    # 27-query r5 tail (stalest evidence, last driver row r4) inside
    # that window. Pin the window boundary so an accidental reorder is
    # a test failure, not a silently-lost round of driver evidence.
    order = list(E.queries())
    assert len(order) == 77
    reformulated_r6 = {
        # r5 hash-red, now fixed-point BIGINT money
        "olap_pricing_summary",
        "olap_top_customers",
        "olap_nation_volume",
        # int32 -> int64 output alignment
        "docs_incremental_dedup",
        "emb_ann_lsh",
        "emb_ann_ivf",
        "emb_ann_topk",
        "olap_topk_per_priority",
        "olap_spend_deciles",
        "olap_value_bands",
    }
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r5 = json.loads((repo / "CORRECTNESS_r05.json").read_text())
    # r5 tail = every live query the r5 driver pass did NOT record
    stale_r5_tail = {n for n in order if n not in r5}
    assert len(stale_r5_tail) == 27
    first50 = set(order[:50])
    assert (reformulated_r6 | stale_r5_tail) <= first50, sorted(
        (reformulated_r6 | stale_r5_tail) - first50
    )
    # every tail entry must carry a green r5 driver row in unchanged
    # formulation — losing it to the 50-row cap then costs no
    # cross-round evidence
    tail_without_r5_row = [
        n for n in order[50:] if not r5.get(n, {}).get("hash_match")
    ]
    assert not tail_without_r5_row, tail_without_r5_row


def test_staged_queue_is_disjoint_and_oracle_complete():
    staged_q, staged_o = E.queries_staged(), E.oracle_sql_staged()
    assert set(staged_q) == set(staged_o)
    live = set(E.queries())
    assert not (set(staged_q) & live), "staged name collides with queries()"


def test_all_callables():
    for name, fn in {**E.queries(), **E.queries_staged()}.items():
        assert callable(fn), name
