"""Consumer-side dedup on the at-least-once boundary (O4).

Reference contract (`src/source/postgres/snapshot.zig:32-36`,
`source.zig:219-223`): every event carries ``meta.lsn``; READ rows carry
the slot start LSN = first stream LSN, so consumers dedup across the
snapshot/stream boundary on ``(resource, lsn)`` and treat READ as upsert.

Spark batch: ``dropDuplicates(["resource", "lsn"])`` — hash-shuffle on
the dedup key with partial dedup map-side. Streaming:
``dropDuplicatesWithinWatermark`` bounds state by event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events(events: DataFrame) -> DataFrame:
    return events.dropDuplicates(["resource", "lsn"])


def dedup_events_streaming(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming variant: state bounded by the watermark horizon. Derives
    an event-time column from the feed's Unix-seconds commit_ts."""
    from pyspark.sql import functions as F

    return (
        events.withColumn("event_time", F.timestamp_seconds(F.col("commit_ts")))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["resource", "lsn"])
    )
