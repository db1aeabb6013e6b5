"""Integer fixed-point PageRank (operators/pagerank.py)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from outboxx_spark.operators.pagerank import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    interaction_edges,
    pagerank_int,
    q_pagerank,
)


def _model(edges, iters=5, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    tele = (DAMP_DEN - DAMP_NUM) * scale // DAMP_DEN
    r = {n: scale for n in nodes}
    for _ in range(iters):
        nxt = {n: tele for n in nodes}
        for s, d in edges:
            nxt[d] += (DAMP_NUM * r[s]) // (DAMP_DEN * outdeg[s])
        r = nxt
    return r


def test_matches_python_model_on_crafted_graph(spark):
    edges = [(1, 2), (2, 3), (3, 1), (4, 1), (4, 2), (5, 5 + 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_u12"] for r in pagerank_int(df).collect()}
    assert got == _model(edges)


def test_hub_outranks_leaves(spark):
    # star: everyone points at 0
    edges = [(i, 0) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_u12"] for r in pagerank_int(df).collect()}
    assert got[0] > max(v for n, v in got.items() if n != 0) * 5


def test_partition_invariance(spark, sf_dir):
    from outboxx_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    e1 = interaction_edges(ev)
    a = sorted(map(tuple, pagerank_int(e1).collect()))
    b = sorted(map(tuple, pagerank_int(e1.repartition(17)).collect()))
    assert a == b


def test_sink_mass_drops_but_teleport_floors_every_node(spark):
    # 1 -> 2, and 2 is a sink: after each iteration node 1 holds only
    # the teleport floor; node 2 gets teleport + 1's damped mass
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: r["rank_u12"] for r in pagerank_int(df, iters=2).collect()}
    tele = (DAMP_DEN - DAMP_NUM) * SCALE // DAMP_DEN
    assert got[1] == tele
    assert got[2] == tele + (DAMP_NUM * tele) // DAMP_DEN


def test_edges_are_distinct_directed_no_self_loops(spark, sf_dir):
    from outboxx_spark.sources.tables import read_table

    e = interaction_edges(read_table(spark, sf_dir, "events"))
    rows = e.collect()
    assert len(rows) == len({(r["src"], r["dst"]) for r in rows})
    assert all(r["src"] != r["dst"] for r in rows)
    assert len(rows) > 0


def test_driver_query_shape(spark, sf_dir):
    out = q_pagerank(spark, sf_dir)
    rows = out.collect()
    assert rows and set(out.columns) == {"node", "rank_u12"}
    assert all(r["rank_u12"] > 0 for r in rows)


def test_overflow_guard_names_the_safe_scale(spark):
    # r10 advice: 85 * rank can exceed int64 for |V| * scale large
    # enough, and non-ANSI BIGINT wraps silently. The guard refuses
    # up front and names the largest safe scale for the graph.
    import pytest

    from outboxx_spark.operators.pagerank import pagerank_int

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="pass scale <="):
        pagerank_int(edges, iters=1, scale=2**56)
    # the default scale on the same graph is fine
    assert pagerank_int(edges, iters=1).count() == 3
