"""Stream-routing configuration model + validation.

Semantics from the reference config model (`src/config/config.zig:113-136`
Stream struct; validation matrix `config.zig:213-466`; resource
normalization `config.zig:473-480`): a *stream* maps one fully-qualified
source table (``schema.table``) with an operation subset onto one sink
topic, with a configurable partition-key column (default ``id``).

Re-expressed for Spark: the validated config becomes a tiny DataFrame
(one row per (stream, resource, op)) that is **broadcast** into the
routing join — config-sized dimensions never shuffle the event stream.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

VALID_OPERATIONS = frozenset({"insert", "update", "delete", "read"})
VALID_FORMATS = frozenset({"json"})
VALID_SOURCES = frozenset({"postgres", "parquet", "kafka"})
VALID_SINKS = frozenset({"kafka", "parquet", "memory", "console"})

# Identifier syntax mirrored from the reference validator
# (`src/config/config.zig:5-29`): SQL identifiers and Kafka topic charset.
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")
_TOPIC_RE = re.compile(r"^[A-Za-z0-9._-]+$")

# Unchanged-TOAST placeholder (`src/constants.zig:16`): the column must stay
# present with a sentinel value, never a fake NULL.
TOAST_PLACEHOLDER = "__outboxx_unknown_value__"

DEFAULT_ROUTING_KEY = "id"  # reference default, `src/config/config.zig:110`


class ConfigError(ValueError):
    """Raised for any invalid pipeline configuration (fail at startup)."""


def normalize_resource(resource: str) -> str:
    """Bare table name -> ``public.table`` so routing equality is on one
    opaque fully-qualified string (`config.zig:473-480`)."""
    if "." not in resource:
        return f"public.{resource}"
    return resource


@dataclass(frozen=True)
class StreamConfig:
    """One (table -> topic) routing unit."""

    name: str
    resource: str  # fully-qualified schema.table after normalization
    operations: tuple[str, ...]  # lowercase subset of VALID_OPERATIONS
    destination: str  # sink topic / output path suffix
    routing_key: str = DEFAULT_ROUTING_KEY
    format: str = "json"

    def wants_snapshot(self) -> bool:
        """``read`` in operations opts this stream into the initial
        snapshot (`config.zig:142-147`)."""
        return "read" in self.operations


@dataclass
class PipelineConfig:
    streams: list[StreamConfig] = field(default_factory=list)
    source_kind: str = "parquet"
    sink_kind: str = "parquet"
    # Batching knobs sized after the reference constants
    # (`src/constants.zig:21-28`): 5000-event batches / 100 ms max wait.
    max_events_per_trigger: int = 5000
    trigger_interval: str = "100 milliseconds"

    def snapshot_resources(self) -> list[str]:
        """Distinct resources of read-opted streams, so a table read by
        several streams snapshots once (`processor.zig:280-298`)."""
        seen: dict[str, None] = {}
        for s in self.streams:
            if s.wants_snapshot():
                seen.setdefault(s.resource, None)
        return list(seen)


def make_stream(
    name: str,
    resource: str,
    operations: list[str] | tuple[str, ...],
    destination: str,
    routing_key: str = DEFAULT_ROUTING_KEY,
    format: str = "json",
) -> StreamConfig:
    """Build + normalize one stream config. Operations are lowercased here;
    matching is case-insensitive (`processor.zig:43-48`)."""
    ops = tuple(str(op).lower() for op in operations)
    return StreamConfig(
        name=name,
        resource=normalize_resource(resource),
        operations=ops,
        destination=destination,
        routing_key=routing_key,
        format=format,
    )


def validate(config: PipelineConfig) -> PipelineConfig:
    """Pre-flight validation, mirroring the reference's matrix
    (`config.zig:213-466`): enums, identifier syntax, schema.table shape,
    topic charset, duplicate stream names. Fail-stop at startup — a bad
    config never reaches executors."""
    if not config.streams:
        raise ConfigError("at least one stream is required")
    if config.source_kind not in VALID_SOURCES:
        raise ConfigError(f"unsupported source: {config.source_kind!r}")
    if config.sink_kind not in VALID_SINKS:
        raise ConfigError(f"unsupported sink: {config.sink_kind!r}")

    names: set[str] = set()
    for s in config.streams:
        if not s.name or len(s.name) > 128:
            raise ConfigError(f"bad stream name: {s.name!r}")
        if s.name in names:
            raise ConfigError(f"duplicate stream name: {s.name!r}")
        names.add(s.name)

        parts = s.resource.split(".")
        if len(parts) != 2 or not all(_IDENT_RE.match(p) for p in parts):
            raise ConfigError(f"resource must be schema.table: {s.resource!r}")

        if not s.operations:
            raise ConfigError(f"stream {s.name!r}: empty operations")
        bad = set(s.operations) - VALID_OPERATIONS
        if bad:
            raise ConfigError(f"stream {s.name!r}: invalid operations {sorted(bad)}")
        if len(set(s.operations)) != len(s.operations):
            raise ConfigError(f"stream {s.name!r}: duplicate operations")

        if not _TOPIC_RE.match(s.destination):
            raise ConfigError(f"stream {s.name!r}: bad destination {s.destination!r}")
        if not _IDENT_RE.match(s.routing_key):
            raise ConfigError(f"stream {s.name!r}: bad routing_key {s.routing_key!r}")
        if s.format not in VALID_FORMATS:
            raise ConfigError(f"stream {s.name!r}: unsupported format {s.format!r}")
    return config


def secret_from_env(var: str, *, required: bool = False) -> str | None:
    """Secrets are env-var indirections, never inline config
    (`config.zig:37-94`)."""
    val = os.environ.get(var)
    if required and not val:
        raise ConfigError(f"required secret env var {var} is not set")
    return val
