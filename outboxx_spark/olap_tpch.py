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


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems whose
    quantity is below 20% of that part's corpus-wide average, for one
    brand/size slice of ``part``. The textbook form is a correlated
    scalar subquery per row; the scale formulation is a two-pass
    aggregate-then-join:

    - pass 1 computes (sum_qty, cnt) per part — a partial-aggregable
      groupBy whose map-side combine reduces the shuffle to one row
      per (partition, part) long before the exchange;
    - the brand/size slice of ``part`` is filtered FIRST and
      broadcast, so pass 1 only aggregates lineitems that survive the
      broadcast semi-join (the avg over a part is unchanged: the part
      filter is on part attributes, not lineitem rows);
    - pass 2 re-joins lineitem to the tiny per-part threshold table
      (broadcast again — at most |selected parts| rows), keeping rows
      with ``5 * l_quantity * cnt < sum_qty``.

    The threshold test is EXACT integer arithmetic: quantities are
    integral (1..50), so ``qty < 0.2 * sum/cnt`` is multiplied through
    by ``5 * cnt`` — no double division, no epsilon, and DuckDB's
    decorrelated evaluation of the textbook subquery agrees
    bit-for-bit. At 100 TB both joins stay broadcasts (the slice is
    ~1/25 of brands x a size filter), the full fact table is scanned
    twice but NEVER shuffled — the only exchange carries the
    brand-sliced, map-side-combined per-part partials; a single-scan
    window-function form was rejected because it shuffles the full
    fact table on l_partkey.

    Reference parity: the reference's star-schema aggregation tests
    (tests/sql/aggregates.zig) stop at single-pass GROUP BY; this is
    the decorrelation shape its planner does not have.
    """
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") < 15)
    )
    li = read_table(spark, sf_dir, "lineitem")
    selected = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    thresholds = selected.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    qualifying = selected.join(
        F.broadcast(thresholds.withColumnRenamed("l_partkey", "t_partkey")),
        F.col("l_partkey") == F.col("t_partkey"),
    ).filter(
        F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("cnt_qty")
        < F.col("sum_qty")
    )
    price_u4 = money_units(
        F.col("l_extendedprice").cast("decimal(20,4)"), 10000, "l_extendedprice"
    )
    return qualifying.agg(
        F.count(F.lit(1)).alias("small_qty_lines"),
        F.coalesce(F.sum(price_u4), F.lit(0)).cast("bigint").alias("total_price_u4"),
    )


SMALL_QTY_REVENUE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS small_qty_lines,
       CAST(coalesce(sum(CAST(CAST(l_extendedprice AS DECIMAL(20,4))
                              * 10000 AS BIGINT)), 0) AS BIGINT)
         AS total_price_u4
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
WHERE p_brand = 'Brand#4' AND p_size < 15
  -- textbook correlated form of qty < 0.2 * avg(qty) over the part,
  -- multiplied through by 5 * cnt so the test is exact integers
  AND 5 * CAST(l.l_quantity AS BIGINT)
        * (SELECT count(*) FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)
      < (SELECT sum(CAST(l3.l_quantity AS BIGINT)) FROM lineitem l3
         WHERE l3.l_partkey = l.l_partkey)
"""


def lone_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), re-keyed to
    this corpus: for multi-supplier orders where EXACTLY ONE supplier
    had a returned line (l_returnflag = 'R'), charge the order to that
    supplier; report the ten most-charged suppliers.

    The textbook formulation is lineitem EXISTS lineitem AND NOT
    EXISTS lineitem — two correlated self-joins of the fact table,
    which at 100 TB is two extra full shuffles plus the risk of a
    nested-loop fallback. The naive Spark rewrite (one groupBy with
    two countDistincts) is also wrong at scale: two distinct
    aggregates plan as an Expand that TRIPLES the rows entering the
    first exchange. The shape here is distinct-free:

    - pass 1 collapses lineitem to (l_orderkey, l_suppkey, has_ret)
      — a groupBy whose map-side combine already deduplicates, so
      the exchange carries at most one row per (order, supplier);
    - pass 2 aggregates the collapsed pairs per order: ``n_supp`` =
      count(*) (the EXISTS), ``n_ret_supp`` = sum(has_ret) (the NOT
      EXISTS), and ``the_supp`` = max(suppkey | has_ret) — well-
      defined exactly when the n_ret_supp = 1 filter holds, so the
      qualifying order's lone returned supplier comes out of the
      SAME aggregate and no join back to lineitem is ever needed.

    Two pair-sized shuffles (no Expand — plan-pinned), one tiny
    shuffle on the surviving supplier keys, one broadcast to names.
    The oracle runs the textbook EXISTS / NOT EXISTS form, so the
    green row IS the proof that the rewrite preserves the correlated
    semantics. Top-10 is deterministic: (waitcount DESC, s_name)
    with s_name unique.

    Reference parity: reference has no correlated-subquery support at
    all (SURVEY §2.7) — this documents the Spark-first replacement.
    """
    li = read_table(spark, sf_dir, "lineitem")
    ret = F.col("l_returnflag") == "R"
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(ret, F.lit(1)).otherwise(F.lit(0))).alias("has_ret")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_ret").alias("n_ret_supp"),
        F.max(F.when(F.col("has_ret") == 1, F.col("l_suppkey"))).alias(
            "the_supp"
        ),
    )
    charged = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)
    )
    supp = read_table(spark, sf_dir, "supplier")
    return (
        charged.groupBy("the_supp")
        .agg(F.count(F.lit(1)).alias("waitcount"))
        .join(F.broadcast(supp), F.col("the_supp") == supp.s_suppkey)
        .select("s_name", "waitcount")
        .orderBy(F.col("waitcount").desc(), "s_name")
        .limit(10)
    )


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): within ASIA-region
    customers' 1996-1998 orders, the share of revenue supplied by one
    nation (NATION_7), per order year.

    The shape under test is CONDITIONAL aggregation at the top of a
    six-way join pipeline: numerator and denominator come out of the
    SAME pass (sum(CASE WHEN supplier-nation THEN revenue END) vs
    sum(revenue)) — no second scan, no self-join, no union of two
    filtered branches. The nation table joins TWICE under different
    roles (customer's nation restricted to ASIA via region; supplier's
    nation read unrestricted for the CASE) — both broadcasts.

    Determinism: the share is deliberately NOT divided here — the
    output carries the two exact u4 BIGINT sums. A double division
    would be the only non-integer in the whole TPC-H surface and the
    one place a 1-ulp cross-engine divergence could hide (the r5
    decimal->double lesson, SCALING.md); callers divide client-side.
    """
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cnat = read_table(spark, sf_dir, "nation").alias("cnat")
    snat = read_table(spark, sf_dir, "nation").alias("snat")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    rev = _revenue_u4()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cnat), cust.c_nationkey == F.col("cnat.n_nationkey"))
        .join(F.broadcast(region), F.col("cnat.n_regionkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snat), supp.s_nationkey == F.col("snat.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("snat.n_name") == "NATION_7", rev)), F.lit(0)
            )
            .cast("bigint")
            .alias("nation_revenue_u4"),
            F.sum(rev).alias("total_revenue_u4"),
        )
    )


MARKET_SHARE_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(coalesce(sum(CASE WHEN snat.n_name = 'NATION_7'
                              THEN {_REVENUE_U4_SQL} END), 0) AS BIGINT)
         AS nation_revenue_u4,
       CAST(sum({_REVENUE_U4_SQL}) AS BIGINT) AS total_revenue_u4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cnat ON c_nationkey = cnat.n_nationkey
JOIN region   ON cnat.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation snat ON s_nationkey = snat.n_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY 1
"""


LONE_RETURN_SUPPLIER_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS waitcount
FROM (
  SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
  FROM lineitem l1
  WHERE l1.l_returnflag = 'R'
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_returnflag = 'R')
) q
JOIN supplier ON q.l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY waitcount DESC, s_name
LIMIT 10
"""
