"""Shared testbed fixtures: the stream-routing matrix used by queries,
oracles, tests, and bench — declared ONCE, mirrored exactly into DuckDB
VALUES so the driver's correctness gate checks the same config.

Modeled on the reference's routing fixtures
(`src/processor/routing_integration_test.zig:185-204`,
`docs/examples/config.toml:51-77`): a full stream, a partial-ops stream,
a read-only stream, and an overlapping stream so one event fans out to
two destinations; one virtual table (public.t3) intentionally has no
stream (events for it must drop).
"""

from __future__ import annotations

from outboxx_spark.config import PipelineConfig, make_stream, validate

DEFAULT_STREAMS = [
    make_stream("t0_full", "public.t0", ["insert", "update", "delete", "read"], "out.t0", "user_id"),
    make_stream("t0_inserts", "public.t0", ["insert"], "out.t0.inserts", "user_id"),
    make_stream("t1_iu", "public.t1", ["insert", "update"], "out.t1", "user_id"),
    make_stream("t2_read", "public.t2", ["read"], "out.t2", "user_id"),
]


def default_config() -> PipelineConfig:
    return validate(PipelineConfig(streams=list(DEFAULT_STREAMS)))


def streams_values_sql() -> str:
    """DuckDB inline relation mirroring ``streams_dim`` exactly:
    one row per (stream, resource, op_lc, destination, routing_key)."""
    rows = [
        f"('{s.name}', '{s.resource}', '{op}', '{s.destination}', '{s.routing_key}')"
        for s in DEFAULT_STREAMS
        for op in s.operations
    ]
    return (
        "(SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(stream, resource, op_lc, destination, routing_key))"
    )
