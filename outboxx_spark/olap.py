"""General analytics queries over the star schema — the OLAP surface a
CDC consumer runs on materialized tables (TPC-H-shaped: scan-agg,
multi-join, top-k per group).

Determinism across engines: double summation order is partition-
dependent, so monetary aggregates are cast to DECIMAL per row and
summed exactly (associative), then cast to double at the end. Filters
are written to push into the parquet scan (verified: `PushedFilters`
in the formatted plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from outboxx_spark.sources.tables import read_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + 2-key groupBy with decimal sums."""
    li = read_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(20,4)")
    price = F.col("l_extendedprice").cast("decimal(20,4)")
    disc_price = price * (F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(5,4)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))
                * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE)
         AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def top_revenue_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Q3/Q10 shape: 3-way join + per-customer revenue + deterministic
    top-k. The customer/orders sides broadcast at small SF; at scale
    Catalyst/AQE picks sort-merge with the same code."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(20,4)") * (
        F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(5,4)")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )
    w = W.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "c_custkey", "c_name", "revenue", "n_items")
    )


def top_revenue_customers_sql(k: int = 10) -> str:
    return f"""
    WITH per_cust AS (
      SELECT c_custkey, c_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))
                      * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE)
               AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name)
    SELECT row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rank,
           c_custkey, c_name, revenue, n_items
    FROM per_cust
    QUALIFY rank <= {k}
    """


def nation_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 4-way join through the dimension chain, grouped by
    nation+region. Dimensions broadcast (region: 5 rows, nation: 25)."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).cast("double").alias("total"),
        )
    )


NATION_ORDER_VOLUME_SQL = """
SELECT r_name, n_name, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def top_orders_per_priority(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-k per group: window rank inside each order priority."""
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
    )


def top_orders_per_priority_sql(k: int = 5) -> str:
    return f"""
    SELECT o_orderpriority,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rank,
           o_orderkey, o_totalprice
    FROM orders
    QUALIFY rank <= {k}
    """
