"""Degree-ordered triangle counting (operators/triangles.py):
closed-form graphs, equal-degree tie-breaks, hub skew, and a
brute-force cross-check."""

from __future__ import annotations

import itertools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.operators.triangles import triangle_counts, undirected_edges


def _und(spark, pairs):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    return undirected_edges(df)


def _counts(df):
    return {r["node"]: (r["deg"], r["tri_count"]) for r in df.collect()}


def test_complete_graph_k4(spark):
    und = _und(spark, itertools.combinations(range(4), 2))
    got = _counts(triangle_counts(und))
    assert got == {n: (3, 3) for n in range(4)}  # C(3,2)=3 per node


def test_triangle_with_equal_degrees(spark):
    # C3: every degree equal -> the id tie-break alone orients
    got = _counts(triangle_counts(_und(spark, [(0, 1), (1, 2), (2, 0)])))
    assert got == {0: (2, 1), 1: (2, 1), 2: (2, 1)}


def test_star_has_no_triangles(spark):
    got = _counts(triangle_counts(_und(spark, [(0, i) for i in range(1, 6)])))
    assert got[0] == (5, 0)
    assert all(got[i] == (1, 0) for i in range(1, 6))


def test_hub_with_one_rim_edge(spark):
    # hub 0 to 5 rim nodes, one rim edge (1,2): exactly one triangle
    got = _counts(
        triangle_counts(_und(spark, [(0, i) for i in range(1, 6)] + [(1, 2)]))
    )
    assert got[0] == (5, 1)
    assert got[1] == (2, 1) and got[2] == (2, 1)
    assert all(got[i] == (1, 0) for i in range(3, 6))


def test_direction_and_duplicates_are_canonicalized(spark):
    # both directions + repeats collapse to one undirected edge each
    got = _counts(
        triangle_counts(
            _und(spark, [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2), (0, 1)])
        )
    )
    assert got == {0: (2, 1), 1: (2, 1), 2: (2, 1)}


def test_matches_brute_force_on_a_dense_graph(spark):
    # deterministic pseudo-random graph on 12 nodes
    pairs = [
        (a, b)
        for a, b in itertools.combinations(range(12), 2)
        if (a * 7 + b * 13) % 3 != 0
    ]
    adj = {n: set() for n in range(12)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    want = {
        n: (
            len(adj[n]),
            sum(
                1
                for u, v in itertools.combinations(sorted(adj[n]), 2)
                if v in adj[u]
            ),
        )
        for n in range(12)
        if adj[n]
    }
    got = _counts(triangle_counts(_und(spark, pairs)))
    assert got == want
