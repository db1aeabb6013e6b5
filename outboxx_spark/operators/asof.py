"""As-of join: each left row matched to the latest right row with
``right.ts <= left.ts`` on the same key — the canonical event-to-state
enrichment (orders at event time, price as of trade time). Spark has no
native ASOF JOIN; the scalable formulation is union + one window pass:

    tag both sides -> union -> window per key ordered by (ts, side,
    tiebreak) -> last non-null right payload -> keep left rows

One shuffle on the key, no UDF, no range-explosion — works at any key
cardinality and time density (vs. the naive range join which is
quadratic per key, or per-group ``merge_asof`` which needs the whole
group in one pandas frame). Right rows order before left rows at equal
timestamps, so ``<=`` semantics hold; equal-timestamp right rows are
tiebroken deterministically by ``right_order``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    right_order: str,
) -> DataFrame:
    """Left columns + latest-as-of right payload (nulls when no right
    row precedes the left row)."""
    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_ro"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rp_{c}") for c in right_payload],
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_order).cast("long").alias("_ro"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(c).alias(f"_rp_{c}") for c in right_payload],
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"), F.col("_ro"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    matched = u.select(
        "*",
        *[
            F.last(F.col(f"_rp_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_payload
        ],
    )
    return matched.filter(F.col("_side") == 1).select(
        *left.columns, *[F.col(f"asof_{c}") for c in right_payload]
    )


def asof_join_sql(
    *,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_payload: list[str],
    right_order: str,
) -> str:
    """DuckDB mirror of the exact same union+window formulation (NOT
    DuckDB's native ASOF JOIN, whose tie semantics could differ)."""
    l_sel = ", ".join(left_cols)
    l_nulls = ", ".join(f"NULL AS _rp_{c}" for c in right_payload)
    r_nulls = ", ".join(f"NULL AS {c}" for c in left_cols)
    r_sel = ", ".join(f"{c} AS _rp_{c}" for c in right_payload)
    lastcols = ", ".join(
        f"last_value(_rp_{c} IGNORE NULLS) OVER w AS asof_{c}" for c in right_payload
    )
    outcols = ", ".join(left_cols) + ", " + ", ".join(f"asof_{c}" for c in right_payload)
    return f"""
    WITH u AS (
      SELECT {left_key} AS _k, {left_ts} AS _t, 1 AS _side, NULL AS _ro, {l_sel}, {l_nulls}
      FROM {left_table}
      UNION ALL BY NAME
      SELECT {right_key} AS _k, {right_ts} AS _t, 0 AS _side, {right_order} AS _ro, {r_nulls}, {r_sel}
      FROM {right_table}
    ),
    m AS (
      SELECT *, {lastcols}
      FROM u
      WINDOW w AS (PARTITION BY _k ORDER BY _t, _side, _ro
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT {outcols} FROM m WHERE _side = 1
    """
