"""Integer fixed-point PageRank — iterative graph analytics beyond
label propagation (dataops/curation.py's dup_clusters).

Floating-point PageRank cannot cross the oracle gate: summation order
changes the low bits, so Spark and DuckDB (and two runs of Spark with
different partitioning) disagree. This implementation runs the
power iteration entirely in scaled BIGINT arithmetic:

    r_0(v)   = S                       (S = 10^12 per-node mass)
    r_k+1(v) = (15*S)//100 + Σ_{u→v} (85 * r_k(u)) // (100 * outdeg(u))

Every operation is integer add/multiply/floor-divide on non-negative
values, so the result is EXACTLY the same on any engine and any
partitioning — associativity of integer addition is the whole
determinism argument. Sink mass is deliberately dropped (the classic
MapReduce-PageRank semantics) rather than redistributed: that keeps
the per-iteration dataflow one join + one aggregate, and the ranking
it induces is the same practitioners' variant Hadoop-era pipelines
shipped. The fixed-point quantization error vs real-valued PageRank
is < iters/S per node — 12 decimal digits of headroom.

Scale shape (100 TB of edges):

- ``outdeg`` computes once; each iteration is edges ⨝ ranks on src
  (the ranks side is |V| rows, edges side |E|) followed by a
  partial-aggregable groupBy(dst). Pre-partitioning edges by src lets
  every iteration reuse the same exchange (documented; at testdata
  scale AQE broadcasts the rank side instead, equally correct).
- iteration count is FIXED (default 5): a convergence loop would put
  a float epsilon back into the contract. Callers pick iters by graph
  diameter, the standard practice for ranking (not solving) use.

The driver query derives a real graph from the events table:
consecutive actors within an event_type (ordered by event_id) share
an interaction edge — the same session-adjacency construction the
sessionization operator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100
ITERS = 5


def pagerank_int(
    edges: DataFrame, iters: int = ITERS, scale: int = SCALE
) -> DataFrame:
    """(node, rank_u12) after ``iters`` integer power iterations over
    distinct directed edges (src, dst). Self-loops must be removed by
    the caller (the edge builders here do).

    Overflow bound (r10 advice): total system mass never exceeds
    |V| * scale (teleport injects 0.15*scale per node, inflow is a
    sub-stochastic redistribution of the rest), so the largest value
    the arithmetic ever forms is DAMP_NUM * max_rank <= 85 * |V| *
    scale — which must stay under 2^63 or Spark's non-ANSI BIGINT
    multiply wraps silently. The guard below enforces
    |V| <= (2^63-1) // (85 * scale) (~1.08e5 nodes at the default
    scale=10^12) and tells the caller the largest safe scale for
    their graph: a billion-node graph runs at scale=10^6, still
    < iters/1e6 quantization error — ample for ranking. The count()
    is one cheap job over |V| rows, negligible next to ``iters``
    edge joins.

    ``edges`` and ``nodes`` are materialized via eager
    ``localCheckpoint``: the lazily-composed iteration plan references
    the edge subtree once per iteration and the node subtree once per
    iteration plus once up front, so without materialization the
    upstream derivation (here a window over events) is re-executed
    2*iters+1 times (r11 advice). localCheckpoint rather than
    ``persist()`` deliberately: persist registers the plan in the
    session CacheManager, which substitutes InMemoryRelation into ANY
    other query sharing the subtree — measured: the triangle counter,
    which shares ``interaction_edges``, went 3.7s -> 12.5s after one
    pagerank call flipped its join strategy through the cache.
    Checkpointed blocks are private to this lineage and are freed by
    the ContextCleaner when the frames are garbage collected. (On a
    production cluster reliable checkpointing to the cluster store is
    the same call with ``checkpoint``; local blocks are the right
    trade for an iteration cache.)"""
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if DAMP_NUM * scale * n_nodes > 2**63 - 1:
        safe = (2**63 - 1) // (DAMP_NUM * n_nodes)
        raise ValueError(
            f"pagerank_int: {n_nodes} nodes at scale={scale} can "
            f"overflow 64-bit fixed point (85 * |V| * scale >= 2^63); "
            f"pass scale <= {safe}"
        )
    # outdeg is joined once per iteration — materialize it too (one
    # aggregate job over the checkpointed edges, ~|V| rows stored)
    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    teleport = F.lit(DAMP_NUM_TELEPORT * scale // DAMP_DEN).cast("long")
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outdeg, "src")
            .select(
                F.col("dst"),
                F.call_function(
                    "div",
                    F.lit(DAMP_NUM).cast("long") * F.col("rank"),
                    F.lit(DAMP_DEN).cast("long") * F.col("outdeg"),
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(
            contribs, nodes.node == contribs.dst, "left"
        ).select(
            "node",
            (teleport + F.coalesce(F.col("inflow"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
    return ranks.select("node", F.col("rank").alias("rank_u12"))


# teleport numerator: (100 - 85) of the per-node unit mass
DAMP_NUM_TELEPORT = DAMP_DEN - DAMP_NUM


def interaction_edges(events: DataFrame) -> DataFrame:
    """Directed (src, dst) edges: consecutive distinct actors within
    an event_type, ordered by event_id. Distinct edges, no
    self-loops."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("event_id")
    pairs = events.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    )
    return (
        pairs.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )


def q_pagerank(spark, sf_dir: str) -> DataFrame:
    from outboxx_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    return pagerank_int(interaction_edges(ev))


def PAGERANK_SQL(iters: int = ITERS, scale: int = SCALE) -> str:
    """DuckDB mirror: the same integer recurrence with the iterations
    UNROLLED as chained CTEs (aggregation inside a recursive CTE term
    is engine-dependent; unrolling keeps the SQL portable and the
    fixed-iteration contract explicit)."""
    tele = DAMP_NUM_TELEPORT * scale // DAMP_DEN
    parts = [
        f"""
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT lag(user_id) OVER (PARTITION BY event_type ORDER BY event_id) AS src,
           user_id AS dst
    FROM events
  ) WHERE src IS NOT NULL AND src <> dst
),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
outdeg AS (
  SELECT src, count(*) AS outdeg FROM edges GROUP BY src
),
r0 AS (
  SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes
)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""
r{k} AS (
  SELECT n.node,
         CAST({tele} + coalesce(sum(({DAMP_NUM} * p.rank)
                                    // ({DAMP_DEN} * d.outdeg)), 0) AS BIGINT)
           AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r{k - 1} p ON p.node = e.src
  LEFT JOIN outdeg d ON d.src = e.src
  GROUP BY n.node
)"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"\nSELECT node, rank AS rank_u12 FROM r{iters}"
    )
