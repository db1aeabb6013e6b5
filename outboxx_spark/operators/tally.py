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


def op_pivot(feed: DataFrame) -> DataFrame:
    """Operation-mix matrix: one row per resource, one column per
    operation (PIVOT). Spark lowers ``groupBy().pivot()`` with an
    explicit value list to a single hash aggregate of conditional
    counts — no second pass to discover pivot values, one tiny shuffle
    (|resources| rows). Missing combinations are 0, not null, so the
    output is total-order comparable."""
    ops = ["INSERT", "UPDATE", "DELETE", "READ"]
    piv = feed.groupBy("resource").pivot("op", ops).count()
    return piv.select(
        "resource",
        *[F.coalesce(F.col(o), F.lit(0)).cast("long").alias(f"n_{o.lower()}") for o in ops],
    )


OP_PIVOT_SQL_BODY = """
SELECT resource,
       CAST(count(*) FILTER (op = 'INSERT') AS BIGINT) AS n_insert,
       CAST(count(*) FILTER (op = 'UPDATE') AS BIGINT) AS n_update,
       CAST(count(*) FILTER (op = 'DELETE') AS BIGINT) AS n_delete,
       CAST(count(*) FILTER (op = 'READ') AS BIGINT) AS n_read
FROM feed
GROUP BY resource
"""
