"""CDC materialization: apply a change stream to produce current table
state (the consumer-side view the reference's envelope contract is
designed for, `docs/design/STREAMING_REPLICATION_DESIGN.md` dedup
guidance + O4).

Semantics: per (resource, key), the event with the highest LSN wins
(ties broken deterministically by op precedence); a winning DELETE
removes the row; READ acts as upsert (snapshot bootstrap). This is the
MERGE INTO / SCD1 emulation for engines without Delta: one window over
the key — a single shuffle on (resource, key), partition-parallel,
arbitrary table count in one pass.

At 100 TB: this is the standard "compact the changelog" job — shuffle
is bounded by live keys, and with the feed bucketed by key the shuffle
disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def materialize(feed: DataFrame, key: str = "user_id") -> DataFrame:
    """Latest state per (resource, key): last writer by LSN wins,
    DELETE drops the row."""
    w = W.partitionBy("resource", key).orderBy(F.col("lsn").desc())
    latest = (
        feed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return latest.filter(F.col("op") != "DELETE")


def materialize_sql(key: str = "user_id") -> str:
    """DuckDB mirror (same determinism: LSN is unique per event)."""
    return f"""
    , latest AS (
      SELECT *, row_number() OVER (PARTITION BY resource, {key} ORDER BY lsn DESC) AS rn
      FROM feed
    )
    SELECT op, resource, lsn, commit_ts, user_id, event_type, value, props
    FROM latest WHERE rn = 1 AND op != 'DELETE'
    """
