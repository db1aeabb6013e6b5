"""FK-orphan audit over the star schema: per parent->child edge, how
many child rows reference a missing parent key.

A CDC-materialized warehouse can violate the source's FKs transiently
(parent DELETE replicated before the child's, a truncated backfill) —
this is the batch gate a pipeline runs before publishing a snapshot.
One left join per edge against the DISTINCT parent key set, counting
child rows and unmatched child rows in the same pass (no second scan
per edge).

The TPC-H-shaped corpus is referentially intact by construction, so
the audit carries a NEGATIVE CONTROL edge (``#drop97``): the parent
set with every 97th key removed, which must report orphans — a
detector whose only observed output is zero is untested.

Scale (100 TB): each edge is an independent join; the distinct
parent-key frame is much smaller than the parent (keys only,
deduplicated map-side) and AQE picks broadcast vs sort-merge per edge
from its runtime size — no hint is forced here precisely because at
100 TB the lineitem->orders parent set is NOT broadcastable while
part/supplier typically are. The final union is rows-per-edge
(5 rows), negligible.

Own module (not olap.py) so the rotation tooling does not flag the
green olap tail queries for re-evidence (the dedup_recall.py rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.sources.tables import read_table


def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = {
        name: read_table(spark, sf_dir, name)
        for name in ("orders", "lineitem", "customer", "part", "supplier")
    }
    customer_dropped = tables["customer"].filter(F.col("c_custkey") % 97 != 0)
    edges = [
        ("lineitem->orders", tables["lineitem"], "l_orderkey", tables["orders"], "o_orderkey"),
        ("lineitem->part", tables["lineitem"], "l_partkey", tables["part"], "p_partkey"),
        ("lineitem->supplier", tables["lineitem"], "l_suppkey", tables["supplier"], "s_suppkey"),
        ("orders->customer", tables["orders"], "o_custkey", tables["customer"], "c_custkey"),
        ("orders->customer#drop97", tables["orders"], "o_custkey", customer_dropped, "c_custkey"),
    ]
    frames = []
    for name, child, fk, parent, pk in edges:
        parent_keys = (
            parent.select(F.col(pk).alias("_pk")).distinct().withColumn("_hit", F.lit(1))
        )
        marked = child.select(F.col(fk).alias("_pk")).join(parent_keys, "_pk", "left")
        frames.append(
            marked.agg(
                F.count("*").cast("long").alias("n_child"),
                F.count(F.when(F.col("_hit").isNull(), 1)).cast("long").alias("n_orphans"),
            ).select(F.lit(name).alias("relationship"), "n_child", "n_orphans")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


REFERENTIAL_INTEGRITY_SQL = """
SELECT 'lineitem->orders' AS relationship,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(count(CASE WHEN p._pk IS NULL THEN 1 END) AS BIGINT) AS n_orphans
FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS _pk FROM orders) p
  ON c.l_orderkey = p._pk
UNION ALL
SELECT 'lineitem->part',
       CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN p._pk IS NULL THEN 1 END) AS BIGINT)
FROM lineitem c LEFT JOIN (SELECT DISTINCT p_partkey AS _pk FROM part) p
  ON c.l_partkey = p._pk
UNION ALL
SELECT 'lineitem->supplier',
       CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN p._pk IS NULL THEN 1 END) AS BIGINT)
FROM lineitem c LEFT JOIN (SELECT DISTINCT s_suppkey AS _pk FROM supplier) p
  ON c.l_suppkey = p._pk
UNION ALL
SELECT 'orders->customer',
       CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN p._pk IS NULL THEN 1 END) AS BIGINT)
FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS _pk FROM customer) p
  ON c.o_custkey = p._pk
UNION ALL
SELECT 'orders->customer#drop97',
       CAST(count(*) AS BIGINT),
       CAST(count(CASE WHEN p._pk IS NULL THEN 1 END) AS BIGINT)
FROM orders c LEFT JOIN
  (SELECT DISTINCT c_custkey AS _pk FROM customer WHERE c_custkey % 97 <> 0) p
  ON c.o_custkey = p._pk
"""
