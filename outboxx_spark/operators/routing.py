"""Routing (R1/R2): match change events to configured streams, with fan-out.

Reference `matchStreams` (`src/processor/processor.zig:31-51`): keep
streams where ``stream.source.resource == change.meta.resource`` (exact
equality on the fully-qualified name) AND ``change.op`` is in the
stream's operation subset (case-insensitive). One change can match N
streams — it is produced once per match (fan-out). READ events route only
to read-opted streams (R2, `config.zig:130-147`).

Spark-first design, two shapes:

- **Literal-map route (production, `route_config`)**: the stream config
  is a driver-side constant, so the whole match table is embedded in
  the plan as ONE folded map literal ``(resource + NUL + op) ->
  array<struct<stream, destination, routing_key>>`` and fan-out is
  ``explode(map[key])`` — a codegen'd Generate with no join, no
  broadcast exchange, and no per-plan ``createDataFrame`` round trip.
  At 100 TB the cost is one hash probe into a plan-constant map per
  event; config cardinality (streams x ops ≤ a few thousand entries)
  adds kilobytes to the task binary, broadcast once per stage.
- **Dim-table route (`route` + `streams_dim`)**: the same semantics as
  a broadcast-hash join against a dimension DataFrame, for deployments
  whose stream config lives in a table (or must join dynamically).
  The event side still never shuffles.

Both shapes produce identical rows (pinned by
``tests/test_cdc_core.py::test_route_config_matches_dim_join``).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.config import StreamConfig

# NUL cannot appear in a Postgres identifier, so resource + NUL + op is
# collision-free as a composite map key
_KEY_SEP = "\x00"

_ROUTE_MAP_SCHEMA = (
    "map<string, array<struct<"
    "stream:string,destination:string,routing_key:string>>>"
)


def streams_route_map(streams: list[StreamConfig]) -> Column:
    """Config -> one constant map column ``(resource NUL op) -> matches``.

    Built as ``from_json`` over a literal string: Catalyst's constant
    folding evaluates it once at optimization time, so the executed
    plan carries a map *literal* — nothing is parsed per row. Ops are
    stored lowercase in config; ``route_config`` lowercases the event
    op, giving the reference's case-insensitive match
    (`processor.zig:43-48`)."""
    entries: dict[str, list[dict[str, str | None]]] = {}
    for s in streams:
        for op in s.operations:
            entries.setdefault(f"{s.resource}{_KEY_SEP}{op}", []).append(
                {
                    "stream": s.name,
                    "destination": s.destination,
                    "routing_key": s.routing_key,
                }
            )
    return F.from_json(F.lit(json.dumps(entries)), _ROUTE_MAP_SCHEMA)


def route_config(events: DataFrame, streams: list[StreamConfig]) -> DataFrame:
    """events x plan-constant config map -> one output row per
    (event, matched stream). Unmatched events drop (``explode`` skips
    null/absent lookups) — the reference skips changes matching zero
    streams (`processor.zig:177-179`)."""
    key = F.concat(F.col("resource"), F.lit(_KEY_SEP), F.lower(F.col("op")))
    matches = F.explode(streams_route_map(streams)[key]).alias("_match")
    return events.select("*", matches).select(
        *events.columns,
        F.col("_match.stream").alias("stream"),
        F.col("_match.destination").alias("destination"),
        F.col("_match.routing_key").alias("routing_key"),
    )


def streams_dim(spark: SparkSession, streams: list[StreamConfig]) -> DataFrame:
    """Config -> exploded (stream, resource, op, destination, routing_key)
    dimension, for the dim-table join shape. Ops are stored lowercase; the
    join lowercases the event op, giving the reference's case-insensitive
    match (`processor.zig:43-48`)."""
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
    stream). Unmatched events drop (inner join). The dim-table shape of
    ``route_config`` — same semantics when the dim comes from
    ``streams_dim``."""
    return events.join(
        F.broadcast(streams),
        (events["resource"] == streams["resource"])
        & (F.lower(events["op"]) == streams["op_lc"]),
        "inner",
    ).drop(streams["resource"]).drop("op_lc")
