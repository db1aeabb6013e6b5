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
    # The driver records exactly the first 50 entries; the r7 rotation
    # puts (a) the entire 27-query r6 tail (stalest evidence, last
    # driver row r5) and (b) the 9 queries whose implementation or
    # testbed this round touches (money-guard olap trio,
    # docs_incremental_dedup, docs_dup_clusters, the mm_* trio,
    # docs_bpe_merges) inside that window. Pin the window boundary so
    # an accidental reorder is a test failure, not a silently-lost
    # round of driver evidence.
    order = list(E.queries())
    assert len(order) == 77
    touched_r7 = {
        # fixed-point runtime guard added to the money pipeline
        "olap_pricing_summary",
        "olap_top_customers",
        "olap_nation_volume",
        # per-batch store writes folded
        "docs_incremental_dedup",
        # star-contraction path for high-diameter graphs
        "docs_dup_clusters",
        # testbed gains real PNG/JPEG blobs; metadata parses headers
        "mm_metadata",
        "mm_frame_sample",
        "mm_features",
        # persist-tier lineage cut fixed
        "docs_bpe_merges",
    }
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r6 = json.loads((repo / "CORRECTNESS_r06.json").read_text())
    # r6 tail = every live query the r6 driver pass did NOT record
    stale_r6_tail = {n for n in order if n not in r6}
    assert len(stale_r6_tail) == 27
    first50 = set(order[:50])
    assert (touched_r7 | stale_r6_tail) <= first50, sorted(
        (touched_r7 | stale_r6_tail) - first50
    )
    # every tail entry must carry a green r6 driver row in unchanged
    # formulation — losing it to the 50-row cap then costs no
    # cross-round evidence
    tail_without_r6_row = [
        n for n in order[50:] if not r6.get(n, {}).get("hash_match")
    ]
    assert not tail_without_r6_row, tail_without_r6_row


def test_staged_queue_is_disjoint_and_oracle_complete():
    staged_q, staged_o = E.queries_staged(), E.oracle_sql_staged()
    assert set(staged_q) == set(staged_o)
    live = set(E.queries())
    assert not (set(staged_q) & live), "staged name collides with queries()"


def test_all_callables():
    for name, fn in {**E.queries(), **E.queries_staged()}.items():
        assert callable(fn), name
