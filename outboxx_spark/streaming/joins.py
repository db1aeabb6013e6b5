"""Stream-stream join: pair UPDATE events with the INSERTs they modify.

The reference pipeline forwards events independently; a consumer that
needs "which insert did this update touch, and how fast" runs exactly
this shape downstream. In Spark it is the canonical watermarked
stream-stream inner join (SPARK-19211 semantics):

* both sides carry an event-time watermark, and
* the join predicate bounds the event-time distance, so

state for either side is evicted once the watermark passes the join
window — state size is O(events inside the window), independent of
stream length. Without the time-range predicate Spark would have to
buffer both streams forever (and refuses the append-mode query).

At 100 TB the join shuffles both streams on (resource, user_id); the
watermark bound keeps each key's buffered rows to the window, so skew
is bounded by per-key event rate x window, not history.

The batch formulation (`pair_updates_with_inserts`) is the same
predicate as a plain self-join — the driver's DuckDB oracle checks it
(`UPDATE_INSERT_PAIRS_SQL`), and the streaming convergence test pins
stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from outboxx_spark.sources.feed import ORACLE_FEED_CTE


def _sides(feed: DataFrame) -> tuple[DataFrame, DataFrame]:
    ins = feed.filter(F.col("op") == "INSERT").select(
        F.col("resource").alias("resource"),
        F.col("user_id").alias("user_id"),
        F.col("lsn").alias("ins_lsn"),
        F.timestamp_seconds(F.col("commit_ts")).alias("ins_ts"),
    )
    upd = feed.filter(F.col("op") == "UPDATE").select(
        F.col("resource").alias("u_resource"),
        F.col("user_id").alias("u_user_id"),
        F.col("lsn").alias("upd_lsn"),
        F.timestamp_seconds(F.col("commit_ts")).alias("upd_ts"),
    )
    return ins, upd


def _join_cond():
    return (
        (F.col("resource") == F.col("u_resource"))
        & (F.col("user_id") == F.col("u_user_id"))
        & (F.col("ins_ts") <= F.col("upd_ts"))
        & (F.col("ins_ts") >= F.col("upd_ts") - F.expr("INTERVAL 1 HOUR"))
    )


_OUT = [
    "resource",
    "user_id",
    "ins_lsn",
    "upd_lsn",
]


def pair_updates_with_inserts(feed: DataFrame) -> DataFrame:
    """Batch form: every (insert, update) pair on the same (resource,
    user_id) with the update at most 1 hour after the insert. Output
    also carries the pairing lag in whole seconds (int — float-free for
    the oracle hash)."""
    ins, upd = _sides(feed)
    lag = (F.unix_timestamp("upd_ts") - F.unix_timestamp("ins_ts")).cast("long")
    return ins.join(upd, _join_cond()).select(*_OUT, lag.alias("lag_s"))


def pair_updates_with_inserts_stream(
    feed_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form: same predicate, both sides watermarked so join
    state is evicted once event time passes the 1-hour pairing window
    (+ watermark slack)."""
    ins, upd = _sides(feed_stream)
    ins = ins.withWatermark("ins_ts", watermark)
    upd = upd.withWatermark("upd_ts", watermark)
    lag = (F.unix_timestamp("upd_ts") - F.unix_timestamp("ins_ts")).cast("long")
    return ins.join(upd, _join_cond()).select(*_OUT, lag.alias("lag_s"))


UPDATE_INSERT_PAIRS_SQL = (
    ORACLE_FEED_CTE
    + """
SELECT i.resource, i.user_id, i.lsn AS ins_lsn, u.lsn AS upd_lsn,
       CAST(u.commit_ts - i.commit_ts AS BIGINT) AS lag_s
FROM feed i
JOIN feed u
  ON u.op = 'UPDATE' AND i.op = 'INSERT'
 AND u.resource = i.resource AND u.user_id = i.user_id
 AND i.commit_ts <= u.commit_ts
 AND i.commit_ts >= u.commit_ts - 3600
"""
)
