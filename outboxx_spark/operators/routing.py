"""Routing (R1/R2): match change events to configured streams, with fan-out.

Reference `matchStreams` (`src/processor/processor.zig:31-51`): keep
streams where ``stream.source.resource == change.meta.resource`` (exact
equality on the fully-qualified name) AND ``change.op`` is in the
stream's operation subset (case-insensitive). One change can match N
streams — it is produced once per match (fan-out). READ events route only
to read-opted streams (R2, `config.zig:130-147`).

Spark-first design: the config is exploded to one row per
(stream, resource, op) and **broadcast** — the event stream never
shuffles for routing, and the join is a broadcast-hash join inside
whole-stage codegen. Fan-out is the join's natural 1:N multiplicity
(the `explode`-free formulation). At 100 TB the cost is exactly one
codegen'd hash probe per event; config cardinality (streams x ops ≤ a
few thousand rows) is irrelevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.config import StreamConfig


def streams_dim(spark: SparkSession, streams: list[StreamConfig]) -> DataFrame:
    """Config -> exploded (stream, resource, op, destination, routing_key)
    dimension. Ops are stored lowercase; the join lowercases the event op,
    giving the reference's case-insensitive match (`processor.zig:43-48`)."""
    rows = [
        (s.name, s.resource, op, s.destination, s.routing_key)
        for s in streams
        for op in s.operations
    ]
    return spark.createDataFrame(
        rows, "stream string, resource string, op_lc string, destination string, routing_key string"
    )


def route(events: DataFrame, streams: DataFrame) -> DataFrame:
    """events x broadcast(streams) -> one output row per (event, matched
    stream). Unmatched events drop (inner join) — the reference skips
    changes matching zero streams (`processor.zig:177-179`)."""
    return events.join(
        F.broadcast(streams),
        (events["resource"] == streams["resource"])
        & (F.lower(events["op"]) == streams["op_lc"]),
        "inner",
    ).drop(streams["resource"]).drop("op_lc")
