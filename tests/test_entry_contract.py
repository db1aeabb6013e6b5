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
    # The driver records exactly the first 50 entries; the r5 rotation
    # put every never-evidenced query (the two r4-staged promotions and
    # the two r5-new operators) plus the 23 queries whose last driver
    # row is r2/r3 inside that window. Pin the window boundary so an
    # accidental reorder is a test failure, not a silently-lost round
    # of driver evidence.
    order = list(E.queries())
    assert len(order) == 77
    never_evidenced = {
        "docs_unigram_lm",
        "emb_diversity_sample",
        "docs_bpe_merges",
        "docs_incremental_dedup",
    }
    stale_r2_r3 = {
        "emb_near_dup_lsh",
        "emb_near_dup_ivf",
        "emb_ann_lsh",
        "emb_ann_ivf",
        "emb_ann_recall",
        "mm_metadata",
        "mm_frame_sample",
        "mm_features",
        "emb_ann_topk",
        "emb_near_dup",
        "emb_kmeans_assign",
        "olap_pricing_summary",
        "olap_top_customers",
        "olap_nation_volume",
        "olap_topk_per_priority",
        "olap_rollup",
        "olap_trailing_spend",
        "olap_semi_join",
        "olap_anti_join",
        "olap_order_count_dist",
        "olap_spend_deciles",
        "olap_cardinality",
        "olap_funnel",
    }
    first50 = set(order[:50])
    assert (never_evidenced | stale_r2_r3) <= first50, sorted(
        (never_evidenced | stale_r2_r3) - first50
    )
    # every tail entry must carry a green r4 driver row — losing it to
    # the 50-row cap then costs no cross-round evidence
    import json
    from pathlib import Path

    r4 = json.loads(
        (Path(__file__).resolve().parent.parent / "CORRECTNESS_r04.json").read_text()
    )
    tail_without_r4_row = [
        n for n in order[50:] if not r4.get(n, {}).get("hash_match")
    ]
    assert not tail_without_r4_row, tail_without_r4_row


def test_staged_queue_is_disjoint_and_oracle_complete():
    staged_q, staged_o = E.queries_staged(), E.oracle_sql_staged()
    assert set(staged_q) == set(staged_o)
    live = set(E.queries())
    assert not (set(staged_q) & live), "staged name collides with queries()"


def test_all_callables():
    for name, fn in {**E.queries(), **E.queries_staged()}.items():
        assert callable(fn), name
