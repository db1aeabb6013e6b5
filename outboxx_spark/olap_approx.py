"""Executed approx swap-ins for the global-window OLAP forms
(`olap.py`): certification harnesses proving the production sketch
path lands inside its provable band. Split module so adding a swap-in
never mechanically touches every `olap.py` query's driver-evidence
window (tools/touched_queries.py reverse-import closure)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from outboxx_spark.sources.tables import read_table


def customer_spend_deciles_approx_check(
    spark: SparkSession, sf_dir: str, accuracy: int = 10000
) -> DataFrame:
    """EXECUTED production swap-in for :func:`customer_spend_deciles`'s
    global ntile (r11 verdict item 5): at 100 TB the decile CUTS come
    from one ``approx_percentile`` sketch pass (O(accuracy) state, no
    global sort), and customers band by comparison against the 9
    broadcast cut values — map-side only.

    Certification contract (same pattern as
    :func:`event_value_quantiles_approx_check`): one row with the
    EXACT rank-based cut values d1..d9 in integer cents (DuckDB
    recomputes these) plus ``approx_ok`` asserting every sketch cut
    lies within the GK-provable rank band (exact values at rank
    r_i ± k, k = max(1, ceil(n/accuracy))). Rank arithmetic is integer
    (div(n*i + 9, 10)) so both engines agree bit-for-bit. The exact
    side's global window is customer-grain and certification-only —
    production runs the sketch + banding, never the sort."""
    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    base = spend.select(
        F.round(F.col("spend") * 100).cast("long").alias("cents")
    )
    ranked = base.withColumn(
        "rn", F.row_number().over(W.partitionBy().orderBy("cents"))
    ).withColumn("n", F.count("*").over(W.partitionBy()))
    k = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.col("n") / accuracy)
    )
    aggs = []
    for i in range(1, 10):
        r = F.call_function("div", F.col("n") * i + 9, F.lit(10))
        lo_r = F.greatest(F.lit(1).cast("long"), r - k)
        hi_r = F.least(F.col("n"), r + k)
        aggs += [
            F.max(F.when(F.col("rn") == r, F.col("cents"))).alias(f"d{i}_cents"),
            F.max(F.when(F.col("rn") == lo_r, F.col("cents"))).alias(f"d{i}_lo"),
            F.max(F.when(F.col("rn") == hi_r, F.col("cents"))).alias(f"d{i}_hi"),
        ]
    exact = ranked.agg(*aggs)
    approx = base.agg(
        F.percentile_approx(
            "cents",
            F.array(*[F.lit(i / 10.0) for i in range(1, 10)]),
            F.lit(accuracy),
        ).alias("cuts")
    )
    ok = None
    for i in range(1, 10):
        band = (
            F.col("cuts").getItem(i - 1)
            .between(F.col(f"d{i}_lo"), F.col(f"d{i}_hi"))
        )
        ok = band if ok is None else (ok & band)
    return exact.crossJoin(F.broadcast(approx)).select(
        *[F.col(f"d{i}_cents") for i in range(1, 10)],
        ok.alias("approx_ok"),
    )


CUSTOMER_SPEND_DECILES_APPROX_CHECK_SQL = """
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT CAST(round(spend * 100) AS BIGINT) AS cents FROM spend
),
ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
         count(*) OVER () AS n
  FROM base
)
SELECT
  max(CASE WHEN rn = (n * 1 + 9) // 10 THEN cents END) AS d1_cents,
  max(CASE WHEN rn = (n * 2 + 9) // 10 THEN cents END) AS d2_cents,
  max(CASE WHEN rn = (n * 3 + 9) // 10 THEN cents END) AS d3_cents,
  max(CASE WHEN rn = (n * 4 + 9) // 10 THEN cents END) AS d4_cents,
  max(CASE WHEN rn = (n * 5 + 9) // 10 THEN cents END) AS d5_cents,
  max(CASE WHEN rn = (n * 6 + 9) // 10 THEN cents END) AS d6_cents,
  max(CASE WHEN rn = (n * 7 + 9) // 10 THEN cents END) AS d7_cents,
  max(CASE WHEN rn = (n * 8 + 9) // 10 THEN cents END) AS d8_cents,
  max(CASE WHEN rn = (n * 9 + 9) // 10 THEN cents END) AS d9_cents,
  TRUE AS approx_ok
FROM ranked
"""
