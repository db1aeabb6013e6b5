"""Distributed triangle counting over the event interaction graph —
the third graph-analytics operator next to label-propagation
clustering (dataops/curation.py) and integer PageRank
(operators/pagerank.py).

Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
"Counting triangles and the curse of the last reducer", WWW 2011).
Orient every undirected edge from its lower-ranked endpoint to its
higher-ranked one, rank = (degree, node id) — a total order, so the
oriented graph is a DAG and every triangle has exactly ONE node with
two outgoing oriented edges. Enumerate wedges by self-joining the
oriented edges on that apex, close each wedge with one more join:

    triangles = σ(e1.src = e2.src ∧ rank(e1.dst) < rank(e2.dst))
                ⋈ oriented ON (e1.dst, e2.dst)

Why the orientation is THE scale decision: a naive wedge join on the
raw graph generates Σ deg(v)^2 candidates — a single celebrity hub
with 10^6 neighbors yields 10^12 wedges in one reducer (the curse in
the paper's title). Degree-ordering bounds every oriented out-degree
by O(sqrt(|E|)), so the wedge count is O(|E|^{3/2}) TOTAL and no
single key explodes; skewed social graphs become uniformly sized
shuffle partitions. The triangle SET is orientation-independent, so
the DuckDB oracle can enumerate by plain id order (a < b < c) and
still match row-for-row.

Output is per-node: (node, deg, tri_count) — the local clustering
coefficient's exact integer numerator (tri_count) and the degree its
wedge denominator C(deg,2) derives from, with no float anywhere near
the oracle gate. Every join key is an integer; AQE picks
broadcast-vs-shuffle per stage (the rank frame is |V| rows against
|E| edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.operators.pagerank import interaction_edges
from outboxx_spark.sources.tables import read_table


def undirected_edges(edges: DataFrame) -> DataFrame:
    """(a, b) with a < b, distinct: the canonical undirected edge set
    of a directed (src, dst) frame (self-loops already excluded by the
    edge builders)."""
    return edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()


def _degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )


def triangle_counts(und: DataFrame) -> DataFrame:
    """(node, deg, tri_count) for every node of the undirected graph;
    tri_count = triangles incident to the node (0 included).

    Lineage policy (the pagerank r12 lesson, applied r13): ``und``,
    ``deg`` and ``oriented`` each feed 2-3 consumers below, and the
    consumers shuffle them by DIFFERENT keys, so exchange reuse cannot
    deduplicate the subtrees — the un-cut plan expanded the upstream
    edge-builder lineage 47 times (47 scans / 114 exchanges at sf0.1).
    Eager ``localCheckpoint`` (lineage-private, no CacheManager plan
    substitution into sibling queries that share the edge builder)
    computes each tier once; all three frames are |E|- or |V|-scale,
    the same magnitude pagerank already checkpoints."""
    und = und.localCheckpoint(eager=True)
    deg = _degrees(und).localCheckpoint(eager=True)
    # orient: src = lower (deg, node), dst = higher; carry both ranks
    e = (
        und.join(deg.withColumnsRenamed({"node": "a", "deg": "da"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "deg": "db"}), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.struct("db", "b")).otherwise(
            F.struct(F.col("da").alias("db"), F.col("a").alias("b"))
        ).alias("dst_rank"),
    ).localCheckpoint(eager=True)
    e1 = oriented.select(
        "src", F.col("dst").alias("v1"), F.col("dst_rank").alias("r1")
    )
    e2 = oriented.select(
        "src", F.col("dst").alias("v2"), F.col("dst_rank").alias("r2")
    )
    # apex wedges: both oriented edges leave src; order the pair by
    # rank so the closing edge's orientation is known to be v1 -> v2
    wedges = e1.join(e2, "src").filter(F.col("r1") < F.col("r2"))
    tris = wedges.join(
        oriented.select(F.col("src").alias("v1"), F.col("dst").alias("v2")),
        ["v1", "v2"],
    ).select("src", "v1", "v2")
    # one pass over the triangle list: explode the corner array instead
    # of a 3-way union (the union branches project different columns,
    # so each would re-run the wedge+closing joins — 3x the heavy step)
    per_node = (
        tris.select(
            F.explode(F.array(F.col("src"), F.col("v1"), F.col("v2"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("tri_count"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "deg",
        F.coalesce(F.col("tri_count"), F.lit(0)).cast("long").alias("tri_count"),
    )


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return triangle_counts(undirected_edges(interaction_edges(ev)))


TRIANGLES_SQL = """
WITH edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY event_id) AS src,
           user_id AS dst
    FROM events
  ) WHERE src IS NOT NULL AND src <> dst
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
per_node AS (
  SELECT node, CAST(count(*) AS BIGINT) AS tri_count FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT d.node, d.deg, CAST(coalesce(p.tri_count, 0) AS BIGINT) AS tri_count
FROM deg d LEFT JOIN per_node p USING (node)
"""
