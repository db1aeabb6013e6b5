"""Event-time windowing operators over the change feed.

Beyond the reference's per-batch tally (A1), a 100 TB pipeline wants
event-time rollups: tumbling-window tallies (metrics over commit time)
and gap-based sessionization (user activity segmentation for training-
data curation). Both are pure DataFrame ops:

- tumbling tally: ``window()`` groupBy — map-side partial agg, shuffle
  bounded by (windows x resources x ops).
- sessionization: one shuffle on the entity key; lag + running-sum of
  gap flags inside the partition — the standard scalable formulation
  (no per-user collect, no UDF). In streaming the same semantics come
  from ``session_window`` with a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def windowed_tally(feed: DataFrame, window_s: int = 3600) -> DataFrame:
    """Tumbling event-time tally per (window, resource, op); window start
    as epoch seconds (deterministic, cross-engine)."""
    start = (F.floor(F.col("commit_ts") / window_s) * window_s).cast("long")
    return (
        feed.groupBy(start.alias("window_start"), "resource", "op")
        .agg(F.count("*").alias("n"))
    )


def windowed_tally_sql(window_s: int = 3600) -> str:
    return f"""
    SELECT CAST(floor(commit_ts / {window_s}) * {window_s} AS BIGINT) AS window_start,
           resource, op, count(*) AS n
    FROM feed GROUP BY 1, 2, 3
    """


def streaming_windowed_tally(
    feed_stream: DataFrame, window_s: int = 3600, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form of :func:`windowed_tally`: tumbling event-time
    window + watermark. State per (window, resource, op) is evicted once
    the watermark passes window end; late events inside the watermark
    still land in their window. Output schema matches the batch form
    (window start as epoch seconds)."""
    withts = feed_stream.withColumn("event_ts", F.timestamp_seconds(F.col("commit_ts")))
    return (
        withts.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", f"{window_s} seconds"), "resource", "op")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp("window.start").alias("window_start"), "resource", "op", "n"
        )
    )


def sessionize(feed: DataFrame, gap_s: int = 1800, key: str = "user_id") -> DataFrame:
    """Gap-based sessions per entity: a new session starts when the gap
    from the previous event exceeds ``gap_s``. Output: one row per
    session with bounds and event count (all integers — deterministic)."""
    w = W.partitionBy(key).orderBy("commit_ts", "lsn")
    gapped = feed.select(
        key,
        "commit_ts",
        "lsn",
        F.when(
            (F.col("commit_ts") - F.lag("commit_ts").over(w)) > gap_s, F.lit(1)
        ).otherwise(F.lit(0)).alias("is_new"),
    )
    sessions = gapped.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sessions.groupBy(key, "session_id").agg(
        F.min("commit_ts").alias("session_start"),
        F.max("commit_ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


def streaming_sessionize(
    feed_stream: DataFrame,
    gap_s: int = 1800,
    key: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming form of :func:`sessionize` via ``session_window`` — the
    native stateful operator: state is one in-flight session per entity,
    merged incrementally, evicted once the watermark passes the session
    close (late events inside the watermark still merge).

    Gap alignment with the batch formulation: batch starts a new session
    when the inter-event gap is *strictly greater* than ``gap_s``;
    Spark's session window is half-open ([start, last + gap)), which
    would split at exactly ``gap_s`` — so the window gap is ``gap_s + 1``
    seconds (event times here are whole seconds).

    Output: (key, session_start, session_end, n_events) — same shape as
    batch minus the per-entity sequential session_id, which has no
    incremental meaning."""
    withts = feed_stream.withColumn("event_ts", F.timestamp_seconds(F.col("commit_ts")))
    return (
        withts.withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", f"{gap_s + 1} seconds"), F.col(key))
        .agg(
            F.min("commit_ts").alias("session_start"),
            F.max("commit_ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select(key, "session_start", "session_end", "n_events")
    )


def sessionize_sql(gap_s: int = 1800, key: str = "user_id") -> str:
    # continues the caller's WITH chain (prepend the feed CTE)
    return f"""
    , gapped AS (
      SELECT {key}, commit_ts, lsn,
             CASE WHEN commit_ts - lag(commit_ts) OVER w > {gap_s} THEN 1 ELSE 0 END AS is_new
      FROM feed
      WINDOW w AS (PARTITION BY {key} ORDER BY commit_ts, lsn)
    ),
    sess AS (
      SELECT {key}, commit_ts,
             -- CAST: DuckDB windowed sum yields HUGEINT, which pandas
             -- canonicalizes to float64 and breaks the cross-engine hash
             CAST(sum(is_new) OVER (PARTITION BY {key} ORDER BY commit_ts, lsn
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gapped
    )
    SELECT {key}, session_id, min(commit_ts) AS session_start,
           max(commit_ts) AS session_end, count(*) AS n_events
    FROM sess GROUP BY {key}, session_id
    """
