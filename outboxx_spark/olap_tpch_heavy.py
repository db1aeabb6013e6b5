"""TPC-H decorrelation shapes, part two (Q18 / Q19 / Q22 analogs).

Same module-granularity rationale as :mod:`outboxx_spark.olap_tpch`:
the touched-query rotation tracks change per module, so the Q3/Q5/Q8/
Q17/Q21 surface must not get flagged for driver re-evidence every time
a new TPC-H shape lands. New shapes accumulate here.

Determinism discipline (olap.py's): every money/balance aggregate is
exact scale-4 BIGINT units via ``money_units``; quantities are
integral doubles summed as BIGINT; the one scalar-average comparison
(Q22) is multiplied through by the count so no double division exists
anywhere in the module.

Reference parity: the reference's planner has no subqueries at all
(SURVEY.md §2.9); these document the Spark-first decorrelations of the
three remaining classic correlated shapes — HAVING semi-join (Q18),
disjunctive multi-range scan (Q19), scalar-aggregate anti-join (Q22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.olap import money_units
from outboxx_spark.sources.tables import read_table


def big_order_customers(
    spark: SparkSession, sf_dir: str, min_qty: int = 260
) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line quantity exceeds ``min_qty``, with their customer, top 100 by
    quantity.

    Textbook form is ``o_orderkey IN (SELECT l_orderkey ... HAVING
    sum(l_quantity) > T)`` — a correlated semi-join against an
    aggregate. The scale shape decorrelates it into a single pass:

    - the HAVING aggregate is ONE map-side-combinable groupBy of the
      fact table (the only full-fact shuffle; the exchange carries one
      row per order per map partition);
    - qualifying orders are a tiny survivor set (99th-percentile cut),
      so they BROADCAST to ``orders`` and the joined result broadcasts
      again to ``customer`` — the dimension tables never shuffle;
    - the final top-100 is a TakeOrdered on exact BIGINT quantity,
      ties broken by orderkey.

    100 TB: the survivor broadcast is the point — the naive plan joins
    the full fact to orders first (a second fact-sized shuffle) and
    aggregates after; this shape touches the fact once."""
    li = read_table(spark, sf_dir, "lineitem")
    qual = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(qual), orders.o_orderkey == qual.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(100)
    )


def BIG_ORDER_CUSTOMERS_SQL(min_qty: int = 260) -> str:
    return f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       (SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        FROM lineitem WHERE l_orderkey = o_orderkey) AS total_qty
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > {min_qty}
)
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
"""


_REVENUE_U4_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(20,4))"
    " * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))"
    " * 10000 AS BIGINT)"
)

# The three disjuncts, one tuple per (brand, max size, qty lo, qty hi).
_DISJUNCTS = (
    ("Brand#3", 5, 1, 11),
    ("Brand#12", 10, 10, 20),
    ("Brand#21", 15, 20, 30),
)


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): revenue of lineitems
    matching ANY of three brand x size x quantity range combinations —
    the classic disjunctive join predicate.

    What the shape tests at scale: the OR must not defeat pushdown.
    Each disjunct constrains BOTH sides (part attributes AND lineitem
    quantity), so Catalyst extracts the cross-side common denominators:
    the union of the quantity ranges pushes to the lineitem scan and
    the union of brand/size slices pushes to the part scan (verified:
    PushedFilters on both) BEFORE the join evaluates the exact OR.
    ``part`` after its pushed filter is a few brands — broadcast; the
    fact table never shuffles.

    Output is (matched_lines, revenue_u4) — exact BIGINT both."""
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    pred = None
    for brand, size_hi, q_lo, q_hi in _DISJUNCTS:
        leg = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= size_hi)
            & (qty >= q_lo)
            & (qty <= q_hi)
        )
        pred = leg if pred is None else (pred | leg)
    rev = money_units(
        F.col("l_extendedprice").cast("decimal(20,4)")
        * (F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(5,4)")),
        10000,
        "l_extendedprice*(1-l_discount)",
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(
            F.count(F.lit(1)).alias("matched_lines"),
            F.coalesce(F.sum(rev), F.lit(0)).cast("bigint").alias("revenue_u4"),
        )
    )


DISJUNCTIVE_REVENUE_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS matched_lines,
       CAST(coalesce(sum({_REVENUE_U4_SQL}), 0) AS BIGINT) AS revenue_u4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def dormant_rich_customers(
    spark: SparkSession, sf_dir: str, since: str = "1998-01-01"
) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity), re-keyed to this
    corpus: customers with an above-average positive account balance
    and NO orders since ``since``, counted per market segment.

    Two correlated subqueries decorrelated:

    - the scalar average is a one-row aggregate over positive-balance
      customers; instead of dividing (the module's no-doubles rule),
      the comparison ``bal > sum/cnt`` is multiplied through:
      ``bal_u4 * cnt > sum_u4`` — exact BIGINT on both engines. The
      one-row aggregate crossJoins back (a broadcast of literally one
      row);
    - the NOT EXISTS against recent orders is a LEFT ANTI join on the
      date-filtered order scan (the date filter pushes to parquet, so
      the anti side is the small recent slice, broadcast).

    100 TB: customer scans once, recent orders scan prunes by date;
    no shuffle bigger than the segment-count aggregate."""
    cust = read_table(spark, sf_dir, "customer")
    bal_u4 = money_units(F.col("c_acctbal").cast("decimal(20,4)"), 10000, "c_acctbal")
    positive = cust.filter(F.col("c_acctbal") > 0)
    avg_row = positive.agg(
        F.sum(bal_u4).alias("sum_u4"), F.count(F.lit(1)).alias("cnt")
    )
    recent = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(since))
        .select("o_custkey")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_row))
        .filter(bal_u4 * F.col("cnt") > F.col("sum_u4"))
    )
    return (
        rich.join(F.broadcast(recent), rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(bal_u4).cast("bigint").alias("total_bal_u4"),
        )
    )


def DORMANT_RICH_CUSTOMERS_SQL(since: str = "1998-01-01") -> str:
    bal_u4 = "CAST(CAST(c_acctbal AS DECIMAL(20,4)) * 10000 AS BIGINT)"
    return f"""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum({bal_u4}) AS BIGINT) AS total_bal_u4
FROM customer
WHERE {bal_u4} * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT sum({bal_u4}) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{since}')
GROUP BY c_mktsegment
"""
