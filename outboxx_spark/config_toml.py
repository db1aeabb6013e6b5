"""TOML config loading — the reference's config file shape.

Mirrors `Config.loadFromTomlFile` (`src/config/config.zig:172-182`) and
the example layout (`docs/examples/config.toml`): a ``[[streams]]`` array
with ``source.resource`` / ``source.operations`` / ``flow.format`` /
``sink.destination`` / ``sink.routing_key``, plus top-level source/sink
kinds. Resource normalization and the validation matrix run on load, so
a bad file never reaches the data path (V1/V2).

Example:

    [source]
    kind = "parquet"

    [sink]
    kind = "parquet"

    [[streams]]
    name = "users_full"
    [streams.source]
    resource = "public.users"
    operations = ["insert", "update", "delete", "read"]
    [streams.flow]
    format = "json"
    [streams.sink]
    destination = "cdc.public.users"
    routing_key = "id"
"""

from __future__ import annotations

import tomllib

from outboxx_spark.config import (
    DEFAULT_ROUTING_KEY,
    ConfigError,
    PipelineConfig,
    make_stream,
    validate,
)


def load_config(path: str) -> PipelineConfig:
    try:
        with open(path, "rb") as f:
            doc = tomllib.load(f)
    except tomllib.TOMLDecodeError as e:
        raise ConfigError(f"invalid TOML in {path}: {e}") from e

    streams = []
    for raw in doc.get("streams", []):
        try:
            src = raw["source"]
            sink = raw["sink"]
            streams.append(
                make_stream(
                    name=raw["name"],
                    resource=src["resource"],
                    operations=src["operations"],
                    destination=sink["destination"],
                    routing_key=sink.get("routing_key", DEFAULT_ROUTING_KEY),
                    format=raw.get("flow", {}).get("format", "json"),
                )
            )
        except KeyError as e:
            raise ConfigError(f"stream missing required field {e} in {path}") from e

    cfg = PipelineConfig(
        streams=streams,
        source_kind=doc.get("source", {}).get("kind", "parquet"),
        sink_kind=doc.get("sink", {}).get("kind", "parquet"),
    )
    return validate(cfg)
