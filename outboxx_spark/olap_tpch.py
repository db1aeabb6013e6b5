"""Classic TPC-H join-pipeline shapes over the star schema (Q3 / Q5).

Separate module from :mod:`outboxx_spark.olap` on purpose: the
touched-query rotation (tools/touched_queries.py) tracks changes at
module granularity, and these two queries share no code with the
existing olap surface beyond :func:`olap.money_units` — keeping them
here means adding a TPC-H shape never flags the whole olap tail for
driver re-evidence.

Determinism: monetary sums follow olap.py's fixed-point discipline —
the revenue term l_extendedprice * (1 - l_discount) is recovered to
its exact scale-4 decimal per row and summed as BIGINT units, so
group totals, the Q3 top-10 cut, and the driver's value hash are
order- and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.olap import money_units
from outboxx_spark.sources.tables import read_table


def _revenue_u4() -> Column:
    """TPC-H revenue term l_extendedprice * (1 - l_discount) as exact
    scale-4 integer units (see olap.pricing_summary's fixed-point
    history for why doubles and DECIMAL outputs are both banned)."""
    return money_units(
        F.col("l_extendedprice").cast("decimal(20,4)")
        * (F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(5,4)")),
        10000,
        "l_extendedprice*(1-l_discount)",
    )


_REVENUE_U4_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(20,4))"
    " * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))"
    " * 10000 AS BIGINT)"
)


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer -> orders -> lineitem,
    revenue per unshipped order, top 10. The two date filters push to
    the parquet scans (verified: PushedFilters on lineitem/orders); the
    filtered customer side broadcasts; the final top-10 is a
    TakeOrdered over exact BIGINT revenue, so the cut is deterministic
    (ties broken by orderkey)."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue_u4()).alias("revenue_u4"))
        .orderBy(F.col("revenue_u4").desc(), "l_orderkey")
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum({_REVENUE_U4_SQL}) AS BIGINT) AS revenue_u4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_u4 DESC, l_orderkey
LIMIT 10
"""


def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the full 6-way chain (region -> nation ->
    customer -> orders -> lineitem -> supplier) with the LOCAL-supplier
    constraint c_nationkey = s_nationkey — the join that makes Q5 a
    planning test: Catalyst folds the nation-equality filter INTO the
    supplier join key ([l_suppkey, c_nationkey] = [s_suppkey,
    s_nationkey], verified in the executed plan), so no post-join
    filter ever sees the unconstrained pair stream. region/nation
    broadcast. Revenue exact u4 BIGINT per nation."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue_u4()).alias("revenue_u4"))
    )


LOCAL_SUPPLIER_REVENUE_SQL = f"""
SELECT n_name, CAST(sum({_REVENUE_U4_SQL}) AS BIGINT) AS revenue_u4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""
