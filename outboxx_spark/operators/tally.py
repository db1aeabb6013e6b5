"""Per-batch event tally (A1) — the reference's only aggregation.

Reference (`src/processor/processor.zig:18-28, 174-183`): group routed
events by (stream, operation) within a batch and emit one metrics add per
combo. Spark: ``groupBy(stream, op).count()`` — a partial (map-side)
aggregation followed by a tiny shuffle of at most |streams| x |ops| rows,
regardless of event volume. At 100 TB the shuffle payload is still bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tally(routed: DataFrame) -> DataFrame:
    return routed.groupBy("stream", "op").agg(F.count("*").alias("n"))
