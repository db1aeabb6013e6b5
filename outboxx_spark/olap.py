"""General analytics queries over the star schema — the OLAP surface a
CDC consumer runs on materialized tables (TPC-H-shaped: scan-agg,
multi-join, top-k per group).

Determinism across engines: double summation order is partition-
dependent, so monetary values are recovered to their exact decimal per
row, scaled to fixed-point integer units (BIGINT cents / scale-4), and
summed as int64 — exact, associative, and stable through every client
materialization (DECIMAL output columns are banned: duckdb's pandas
path coerces them to float64 while Spark keeps Decimal objects, so a
type-sensitive hash diverges on exactly equal values). Filters are
written to push into the parquet scan (verified: `PushedFilters` in
the formatted plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from outboxx_spark.sources.tables import read_table
from pyspark.sql import Column


def money_units(expr: Column, unit_scale: int, what: str) -> Column:
    """Exact fixed-point scaling with a runtime domain guard: scale an
    exact-decimal expression to BIGINT units, RAISING on any row whose
    scaled value is non-integral. The fixed-point formulation rests on
    a data-domain invariant (prices carry 2 fractional digits,
    price*discount 4) — if a corpus violates it, Spark's decimal->long
    cast truncates while DuckDB's CAST rounds (pinned as a negative
    test in test_olap_extra.py), so totals would diverge SILENTLY.
    Fail-stop instead, same rule as the partition-key null guard
    (operators/keys.py). NULL inputs pass through as NULL — aggregates
    skip them, exactly as the unguarded cast did. Cost: one decimal
    comparison per row, inside whole-stage codegen."""
    scaled = expr * unit_scale if unit_scale != 1 else expr
    as_long = scaled.cast("long")
    return (
        F.when(scaled.isNull(), F.lit(None).cast("long"))
        .when(scaled == as_long, as_long)
        .otherwise(
            F.raise_error(
                F.format_string(
                    f"fixed-point domain violated for {what}: "
                    "%s is not integral at the declared scale",
                    scaled.cast("string"),
                )
            ).cast("long")
        )
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + 2-key groupBy with exact sums.

    Money is fixed-point INTEGER end-to-end (BIGINT): per row the
    double is recovered to its exact decimal (prices carry 2 fractional
    digits, price*discount carries 4 — verified against the corpus),
    scaled to integer units, and summed as int64. History of this
    formulation: a final cast-to-double went red at sf0.1 (DuckDB's
    decimal->double is not correctly rounded), and the r5 DECIMAL(38,x)
    output went red at the DRIVER (duckdb's pandas client path coerces
    DECIMAL to float64 while Spark keeps Decimal objects, so the hash
    over client-materialized values can never match). Integer units are
    exact AND representation-stable in every client. Headroom: the
    scale-4 disc sum at SF100 is ~2e17, x40 inside int64."""
    li = read_table(spark, sf_dir, "lineitem")
    qty = money_units(F.col("l_quantity").cast("decimal(20,4)"), 1, "l_quantity")
    price_cents = money_units(
        F.col("l_extendedprice").cast("decimal(20,4)"), 100, "l_extendedprice"
    )
    disc_price_u4 = money_units(
        F.col("l_extendedprice").cast("decimal(20,4)")
        * (F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(5,4)")),
        10000,
        "l_extendedprice*(1-l_discount)",
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price_cents).alias("sum_base_price_cents"),
            F.sum(disc_price_u4).alias("sum_disc_price_u4"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(CAST(l_quantity AS DECIMAL(20,4)) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(20,4)) * 100 AS BIGINT)) AS BIGINT)
         AS sum_base_price_cents,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(20,4))
                     * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
                     * 10000 AS BIGINT)) AS BIGINT) AS sum_disc_price_u4,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def top_revenue_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Q3/Q10 shape: 3-way join + per-customer revenue + deterministic
    top-k. The customer/orders sides broadcast at small SF; at scale
    Catalyst/AQE picks sort-merge with the same code.

    Top-k is ``orderBy(...).limit(k)``, which compiles to
    ``TakeOrderedAndProject`` — per-partition bounded heaps merged at
    the driver (k rows cross the wire). A global
    ``row_number().over(orderBy)`` window would instead funnel every
    per-customer aggregate through one partition; rank is re-derived
    *after* the limit, where the window sorts only k rows
    (plan-pinned in tests/test_plans.py)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    # Fixed-point integer revenue (scale-4 units — price*discount has
    # exactly 4 fractional digits): exact, associative, and client-
    # representation-stable. The r5 DECIMAL(38,8) output hashed red at
    # the driver (Decimal objects vs duckdb's float64 pandas coercion)
    # even with byte-identical values; int64 ranks AND hashes stably.
    rev_u4 = money_units(
        F.col("l_extendedprice").cast("decimal(20,4)")
        * (F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(5,4)")),
        10000,
        "l_extendedprice*(1-l_discount)",
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev_u4).alias("revenue_u4"), F.count("*").alias("n_items"))
    )
    topk = joined.orderBy(F.col("revenue_u4").desc(), F.col("c_custkey")).limit(k)
    w = W.orderBy(F.col("revenue_u4").desc(), F.col("c_custkey"))
    return topk.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "c_custkey", "c_name", "revenue_u4", "n_items"
    )


def top_revenue_customers_sql(k: int = 10) -> str:
    return f"""
    WITH per_cust AS (
      SELECT c_custkey, c_name,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(20,4))
                           * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
                           * 10000 AS BIGINT)) AS BIGINT)
               AS revenue_u4,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name)
    SELECT row_number() OVER (ORDER BY revenue_u4 DESC, c_custkey) AS rank,
           c_custkey, c_name, revenue_u4, n_items
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
            # integer cents — exact (prices carry 2 fractional digits)
            # and client-representation-stable; see pricing_summary
            F.sum(
                money_units(
                    F.col("o_totalprice").cast("decimal(20,4)"), 100, "o_totalprice"
                )
            ).alias("total_cents"),
        )
    )


NATION_ORDER_VOLUME_SQL = """
SELECT r_name, n_name, count(*) AS n_orders,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(20,4)) * 100 AS BIGINT)) AS BIGINT)
         AS total_cents
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
        orders.withColumn("rank", F.row_number().over(w).cast("long"))
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


def nation_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (nation, order-year): per-year, per-nation subtotals
    and a grand total in one pass — Spark's rollup lowers to a single
    Expand + hash aggregate, so the 100 TB cost is one shuffle (same as
    the plain groupBy) with 3x the map-side rows, not three jobs.

    Money is summed in integer cents (exact, order-independent) so the
    subtotal rows hash-match the DuckDB mirror; NULL grouping slots are
    projected to the sentinel 'ALL' (the corpus has no null nations or
    dates, so the sentinel is unambiguous)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("string").alias("yr"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    return (
        base.rollup("nation", "yr")
        .agg(F.sum("cents").alias("revenue_cents"), F.count("*").alias("n_orders"))
        .select(
            F.coalesce("nation", F.lit("ALL")).alias("nation"),
            F.coalesce("yr", F.lit("ALL")).alias("yr"),
            "revenue_cents",
            "n_orders",
        )
    )


NATION_REVENUE_ROLLUP_SQL = """
WITH base AS (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS VARCHAR) AS yr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey)
SELECT COALESCE(nation, 'ALL') AS nation, COALESCE(yr, 'ALL') AS yr,
       CAST(sum(cents) AS BIGINT) AS revenue_cents, count(*) AS n_orders
FROM base GROUP BY ROLLUP (nation, yr)
"""


def customer_trailing_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window-frame aggregate: per customer, the trailing-3-order
    spend (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) ordered by
    (o_orderdate, o_orderkey). Exercises Spark's bounded-frame window
    path (running buffers, no re-sort per row); one shuffle on the
    partition key. Integer cents keep the frame sums exact so the hash
    matches DuckDB's segment-tree evaluation, which sums the same frame
    in a different order."""
    orders = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents).over(w).alias("trailing3_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_in_frame"),
    )


CUSTOMER_TRAILING_SPEND_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS trailing3_cents,
       CAST(count(*) OVER w AS BIGINT) AS n_in_frame
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles (p50/p95/p99) of event value per event
    type, computed as ranked-row picks so the result is integer-exact
    and engine-independent (no interpolation arithmetic to disagree
    on). One shuffle on the group key; the per-key sort is the window
    sort. At 100 TB swap the exact rank pick for approx_percentile
    (t-digest) — same output contract, sublinear state; the exact form
    is the oracle-checkable reference semantics."""
    from outboxx_spark.sources.tables import read_table as _rt

    ev = _rt(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = ev.select("event_type", cents.alias("cents")).filter(F.col("cents").isNotNull())
    wk = W.partitionBy("event_type")
    ranked = base.withColumn("rn", F.row_number().over(wk.orderBy("cents"))).withColumn(
        "n", F.count("*").over(wk)
    )
    picks = {
        "p50_cents": 0.50,
        "p95_cents": 0.95,
        "p99_cents": 0.99,
    }
    aggs = [
        F.max(F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("cents"))).alias(name)
        for name, p in picks.items()
    ]
    return ranked.groupBy("event_type").agg(*aggs)


def event_value_quantiles_approx(
    spark: SparkSession, sf_dir: str, accuracy: int = 10000
) -> DataFrame:
    """Production form of :func:`event_value_quantiles`: one pass of
    ``approx_percentile`` (Greenwald-Khanna sketch, JVM-side) per event
    type — same output contract (p50/p95/p99 in integer cents).

    Scale profile: a partial sketch per map task merged at the
    reducer, so state is O(accuracy) per group regardless of group
    size — no per-key sort, no skew-by-construction. The exact-rank
    form above stays as the oracle-checkable reference semantics; the
    tolerance between the two is pinned in tests/test_olap_extra.py.
    At accuracy=10000 the rank error bound is n/10000 per group, i.e.
    the sketch pick sits within 0.01% of the requested rank."""
    ev = read_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = ev.select("event_type", cents.alias("cents")).filter(F.col("cents").isNotNull())
    return base.groupBy("event_type").agg(
        F.percentile_approx("cents", 0.50, accuracy).alias("p50_cents"),
        F.percentile_approx("cents", 0.95, accuracy).alias("p95_cents"),
        F.percentile_approx("cents", 0.99, accuracy).alias("p99_cents"),
    )


def event_value_quantiles_approx_check(
    spark: SparkSession, sf_dir: str, accuracy: int = 10000
) -> DataFrame:
    """Hard-signal harness for the production approx variant: computes
    BOTH the exact ranked picks and the ``approx_percentile`` sketch
    picks in Spark, and emits the exact values plus a per-group
    ``approx_ok`` flag asserting each sketch pick lies within the
    sketch's provable rank band (GK guarantees rank error <= n/accuracy;
    the band is the exact values at rank ceil(p*n) +/- k,
    k = max(1, ceil(n/accuracy))). The oracle recomputes the exact side
    in DuckDB and asserts TRUE — so the driver hash verifies (a) exact
    quantiles match cross-engine and (b) the sketch landed in-band.
    Both sides are deterministic (GK is data-order-insensitive here:
    single-column long input, fixed accuracy).

    Scale note: the harness doubles the work by design (it exists to
    certify the approx path); production runs only
    :func:`event_value_quantiles_approx` — one sketch pass, O(accuracy)
    state per group."""
    ev = read_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = ev.select("event_type", cents.alias("cents")).filter(F.col("cents").isNotNull())
    wk = W.partitionBy("event_type")
    ranked = base.withColumn("rn", F.row_number().over(wk.orderBy("cents"))).withColumn(
        "n", F.count("*").over(wk)
    )
    k = F.greatest(F.lit(1).cast("long"), F.ceil(F.col("n") / accuracy))
    picks = {"p50": 0.50, "p95": 0.95, "p99": 0.99}
    aggs = []
    for name, p in picks.items():
        r = F.ceil(F.lit(p) * F.col("n"))
        lo_r = F.greatest(F.lit(1).cast("long"), r - k)
        hi_r = F.least(F.col("n"), r + k)
        aggs += [
            F.max(F.when(F.col("rn") == r, F.col("cents"))).alias(f"{name}_cents"),
            F.max(F.when(F.col("rn") == lo_r, F.col("cents"))).alias(f"{name}_lo"),
            F.max(F.when(F.col("rn") == hi_r, F.col("cents"))).alias(f"{name}_hi"),
        ]
    exact = ranked.groupBy("event_type").agg(*aggs)
    approx = base.groupBy("event_type").agg(
        *[
            F.percentile_approx("cents", p, accuracy).alias(f"a_{name}")
            for name, p in picks.items()
        ]
    )
    ok = None
    for name in picks:
        band = F.col(f"a_{name}").between(F.col(f"{name}_lo"), F.col(f"{name}_hi"))
        ok = band if ok is None else (ok & band)
    return (
        exact.join(F.broadcast(approx), "event_type")
        .select(
            "event_type",
            "p50_cents",
            "p95_cents",
            "p99_cents",
            ok.alias("approx_ok"),
        )
    )


EVENT_VALUE_QUANTILES_APPROX_CHECK_SQL = """
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM base)
SELECT event_type,
       max(cents) FILTER (rn = CAST(ceil(0.50 * n) AS BIGINT)) AS p50_cents,
       max(cents) FILTER (rn = CAST(ceil(0.95 * n) AS BIGINT)) AS p95_cents,
       max(cents) FILTER (rn = CAST(ceil(0.99 * n) AS BIGINT)) AS p99_cents,
       TRUE AS approx_ok
FROM ranked
GROUP BY event_type
"""


def event_type_cardinality_approx_check(
    spark: SparkSession, sf_dir: str, rsd: float = 0.01
) -> DataFrame:
    """Hard-signal harness for the HLL++ cardinality variant: exact
    distinct count, the ``approx_count_distinct`` sketch, and the row
    count from ONE scan, emitting the exact values plus ``approx_ok`` =
    |hll - exact| <= max(1, ceil(5 * rsd * exact)) — a 5-sigma band at
    rsd=0.01 (HLL++ is deterministic for fixed input, so the flag is
    stable). The oracle recomputes the exact side in DuckDB and asserts
    TRUE. Production runs only :func:`event_type_cardinality_approx`;
    this harness certifies it against the exact plan cross-engine.

    Shape note: the naive single ``agg`` mixing ``count_distinct`` with
    ``approx_count_distinct`` triggers Catalyst's distinct rewrite,
    which carries the sketch's ~1.6k buffer words through the shuffle
    for EVERY distinct (event_type, user_id) pair — measured 2.3x
    slower here and catastrophic at scale. Instead: reduce to distinct
    pairs first (one shuffle, map-side combined), then count pairs and
    sketch over the deduplicated keys — HLL is duplicate-insensitive,
    so the sketch value is bit-identical, and sketches now exist only
    per (partition x event_type). ``n_users`` counts the pairs rows via
    ``count(user_id)``, not ``count(*)``: a NULL user_id forms its own
    pairs row, and SQL's COUNT(DISTINCT ...) — the oracle's exact side
    and the HLL sketch alike — excludes NULLs, while ``n_events`` must
    still include NULL-user rows."""
    ev = read_table(spark, sf_dir, "events")
    pairs = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("_pair_n"))
    grouped = pairs.groupBy("event_type").agg(
        F.count("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", rsd).alias("n_users_hll"),
        F.sum("_pair_n").alias("n_events"),
    )
    tol = F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(5 * rsd) * F.col("n_users")))
    return grouped.select(
        "event_type",
        "n_users",
        "n_events",
        (F.abs(F.col("n_users_hll") - F.col("n_users")) <= tol).alias("approx_ok"),
    )


EVENT_TYPE_CARDINALITY_APPROX_CHECK_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       TRUE AS approx_ok
FROM events GROUP BY event_type
"""


EVENT_VALUE_QUANTILES_SQL = """
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM base)
SELECT event_type,
       max(cents) FILTER (rn = CAST(ceil(0.50 * n) AS BIGINT)) AS p50_cents,
       max(cents) FILTER (rn = CAST(ceil(0.95 * n) AS BIGINT)) AS p95_cents,
       max(cents) FILTER (rn = CAST(ceil(0.99 * n) AS BIGINT)) AS p99_cents
FROM ranked
GROUP BY event_type
"""


def active_high_value_customers(spark: SparkSession, sf_dir: str, min_total: float = 450000.0) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with at least one order above
    ``min_total``. The semi join shuffles only the distinct keys of the
    probe side and short-circuits on first match — at 100 TB this beats
    inner-join+distinct (no fan-out materialization). The filter pushes
    into the orders scan."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > min_total)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_nationkey")
    )


def ACTIVE_HIGH_VALUE_CUSTOMERS_SQL(min_total: float = 450000.0) -> str:
    return f"""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {min_total})
    """


def customers_without_orders(spark: SparkSession, sf_dir: str, min_total: float = 450000.0) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — the TPC-H Q22 shape: customers with
    no order above ``min_total`` (the complement of the semi join, so
    both branches are exercised on nonzero row sets at every SF). Same
    single-shuffle profile as the semi join."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > min_total)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


def CUSTOMERS_WITHOUT_ORDERS_SQL(min_total: float = 450000.0) -> str:
    return f"""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {min_total})
    """


def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly N orders
    (including N=0 via a left join). Two cascaded aggregations — both
    map-side combinable; the second groups on a tiny domain (order
    counts), so the final shuffle is a few hundred rows regardless of
    corpus size."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .select("c_count", "custdist")
    )


ORDER_COUNT_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) GROUP BY c_count
"""


def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile spend summary: ntile(10) over total customer spend,
    then per-decile aggregates. The ntile window is global by
    construction (a rank cut needs the total order); the scale-safe
    form keeps only (c_custkey, spend) — two longs — in that sort,
    never the wide rows, and the decile aggregate after it is
    map-side combinable on a 10-value domain."""
    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    w = W.orderBy(F.col("spend").desc(), F.col("o_custkey"))
    return (
        spend.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
            F.round(F.min("spend"), 2).alias("min_spend"),
            F.round(F.max("spend"), 2).alias("max_spend"),
        )
    )


CUSTOMER_SPEND_DECILES_SQL = """
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, spend,
         ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
  FROM spend
)
SELECT decile, count(*) AS n_customers,
       round(sum(spend), 2) AS total_spend,
       round(min(spend), 2) AS min_spend,
       round(max(spend), 2) AS max_spend
FROM tiled GROUP BY decile
"""


def event_type_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user cardinality per event type. Spark expands
    count(DISTINCT) into a two-phase aggregate (partial distinct
    map-side, merge on the group key) — the shuffle carries distinct
    (type, user) pairs, not raw events."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def event_type_cardinality_approx(
    spark: SparkSession, sf_dir: str, rsd: float = 0.01
) -> DataFrame:
    """Production cardinality variant: HyperLogLog++ sketches
    (approx_count_distinct). State per group is O(1/rsd^2) registers
    regardless of user count — the 100 TB form when distinct counts
    per group no longer fit the shuffle. Tolerance vs the exact form
    is pinned in tests/test_olap_extra.py."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("n_users"),
        F.count("*").alias("n_events"),
    )


EVENT_TYPE_CARDINALITY_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


def value_band_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi RANGE join: events joined to a banded value dimension
    on ``lo <= value < hi`` (the band table is declared inline so both
    engines build the identical dim). Spark plans this as a broadcast
    nested-loop join with the range predicate — the correct shape for a
    small band dim: the fact side never shuffles, each row probes the
    broadcast bands. At 100 TB the alternative (binning via a codegen'd
    CASE/width_bucket when bands are uniform) is a zero-join projection;
    this query keeps the general-dim form."""
    bands = spark.createDataFrame(
        [(i, float(i * 100), float((i + 1) * 100)) for i in range(10)],
        "band_id long, lo double, hi double",
    )
    ev = read_table(spark, sf_dir, "events")
    joined = ev.join(
        F.broadcast(bands),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


VALUE_BAND_TOTALS_SQL = """
WITH bands AS (
  SELECT i AS band_id, i * 100.0 AS lo, (i + 1) * 100.0 AS hi
  FROM range(0, 10) t(i)
)
SELECT band_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY band_id
"""


PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of lineitem's numeric columns in ONE
    scan: null count, exact distinct count, min, max per column, long
    form (column, n_nulls, n_distinct, min_v, max_v).

    100 TB shape: a single pass computing all per-column aggregates at
    once — Spark expands the multi-distinct into one Expand + partial
    aggregation (shuffle carries (col-tag, value) pairs, map-side
    combined), instead of one scan per column. The production swap for
    approximate profiling is approx_count_distinct (HLL) — same plan
    minus the Expand."""
    li = read_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.round(F.min(F.col(c)).cast("double"), 2).alias(f"{c}__min"),
            F.round(F.max(F.col(c)).cast("double"), 2).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args})"
            " AS (column_name, n_nulls, n_distinct, min_v, max_v)"
        )
    )


def table_profile_sql() -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               round(CAST(min({c}) AS DOUBLE), 2) AS min_v,
               round(CAST(max({c}) AS DOUBLE), 2) AS max_v
        FROM lineitem
        """
        for c in PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


def signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users whose first purchase happened
    AFTER their first signup (event-sequence analytics over the
    changelog). Emits (user_id, signup_lsn, purchase_lsn) per converted
    user — lsn is the global order, so the match is exact.

    100 TB shape: two map-side-combinable min-aggregates per user in
    ONE pass (conditional min), no join and no window — the shuffle
    carries two longs per user. The naive form (self-join signups x
    purchases, take min-after) shuffles events twice and explodes on
    power users; the conditional-aggregate form cannot."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("event_id"))).alias(
            "signup_lsn"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("event_id"))).alias(
            "first_purchase_lsn"
        ),
    )
    # conversion = first purchase strictly after first signup; users who
    # purchased before ever signing up (or never did either) drop out
    return (
        per_user.filter(
            F.col("signup_lsn").isNotNull()
            & F.col("first_purchase_lsn").isNotNull()
            & (F.col("first_purchase_lsn") > F.col("signup_lsn"))
        )
        .select("user_id", "signup_lsn", "first_purchase_lsn")
    )


SIGNUP_PURCHASE_FUNNEL_SQL = """
SELECT user_id,
       min(CASE WHEN event_type = 'signup' THEN event_id END) AS signup_lsn,
       min(CASE WHEN event_type = 'purchase' THEN event_id END) AS first_purchase_lsn
FROM events
GROUP BY user_id
HAVING signup_lsn IS NOT NULL
   AND first_purchase_lsn IS NOT NULL
   AND first_purchase_lsn > signup_lsn
"""
