"""Cohort / retention analytics over the event stream.

The standard product-analytics matrix: bucket each user into the
cohort of their FIRST conversion event, then count how many of each
cohort are still active N periods later. One narrow pass computes
first-conversion weeks (partial-aggregable min), one computes distinct
(user, week) activity pairs (partial-aggregable distinct), and the
join between them is keyed on user id — co-partitioned with the
activity aggregation's shuffle, so the whole query is two shuffles on
the same key plus a final small aggregate. No window functions, no
self-join of the raw event table.

Period arithmetic is exact: ``date_trunc('week')`` is Monday-aligned
in both Spark and DuckDB, and week offsets are integer divisions of
epoch-second differences between two truncated timestamps — never a
float, so the retention matrix hashes identically cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WEEK = 7 * 24 * 3600


def cohort_retention(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(cohort_week, week_offset, n_users): users whose first
    ``conversion_type`` event falls in cohort_week and who have ANY
    event activity ``week_offset`` weeks later (offset 0 = the cohort
    week itself). Pre-conversion activity is excluded — retention
    measures life after conversion."""
    cohorts = (
        events.where(F.col(type_col) == conversion_type)
        .groupBy(F.col(user_col).alias("uid"))
        .agg(F.date_trunc("week", F.min(ts_col)).alias("cohort_week"))
    )
    activity = events.select(
        F.col(user_col).alias("uid"), F.date_trunc("week", ts_col).alias("aw")
    ).distinct()
    return (
        activity.join(cohorts, "uid")
        .where(F.col("aw") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            (
                (F.unix_timestamp("aw") - F.unix_timestamp("cohort_week"))
                / F.lit(_WEEK)
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("uid").cast("long").alias("n_users"))
    )


def cohort_retention_sql(
    conversion_type: str = "purchase", table: str = "events"
) -> str:
    """DuckDB mirror: same Monday week truncation, same integer epoch
    arithmetic."""
    return f"""
    WITH cohorts AS (
      SELECT user_id AS uid,
             date_trunc('week', MIN(ts)) AS cohort_week
      FROM {table}
      WHERE event_type = '{conversion_type}'
      GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id AS uid, date_trunc('week', ts) AS aw
      FROM {table}
    )
    SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST((CAST(floor(epoch(a.aw)) AS BIGINT)
                 - CAST(floor(epoch(c.cohort_week)) AS BIGINT)) // {_WEEK}
                AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.uid) AS n_users
    FROM activity a JOIN cohorts c USING (uid)
    WHERE a.aw >= c.cohort_week
    GROUP BY 1, 2
    """
