"""Config model + validation matrix, mirroring the reference's test
coverage of `src/config/config.zig:483-1123` (enums, identifiers,
duplicates, normalization)."""

from __future__ import annotations

import pytest

from outboxx_spark.config import (
    ConfigError,
    PipelineConfig,
    make_stream,
    normalize_resource,
    validate,
)


def _cfg(streams):
    return PipelineConfig(streams=streams)


def test_normalize_bare_table():
    assert normalize_resource("users") == "public.users"
    assert normalize_resource("app.users") == "app.users"


def test_valid_config_passes():
    cfg = _cfg([make_stream("s1", "users", ["insert", "READ"], "topic.a")])
    validate(cfg)
    assert cfg.streams[0].resource == "public.users"
    assert cfg.streams[0].operations == ("insert", "read")


def test_empty_streams_rejected():
    with pytest.raises(ConfigError):
        validate(_cfg([]))


def test_duplicate_stream_names_rejected():
    s = make_stream("dup", "a", ["insert"], "t")
    with pytest.raises(ConfigError, match="duplicate stream name"):
        validate(_cfg([s, make_stream("dup", "b", ["insert"], "t2")]))


def test_invalid_operation_rejected():
    with pytest.raises(ConfigError, match="invalid operations"):
        validate(_cfg([make_stream("s", "a", ["upsert"], "t")]))


def test_empty_operations_rejected():
    with pytest.raises(ConfigError, match="empty operations"):
        validate(_cfg([make_stream("s", "a", [], "t")]))


def test_bad_resource_shape_rejected():
    with pytest.raises(ConfigError, match="schema.table"):
        validate(_cfg([make_stream("s", "a.b.c", ["insert"], "t")]))
    with pytest.raises(ConfigError, match="schema.table"):
        validate(_cfg([make_stream("s", "1bad.table", ["insert"], "t")]))


def test_bad_topic_rejected():
    with pytest.raises(ConfigError, match="bad destination"):
        validate(_cfg([make_stream("s", "a", ["insert"], "bad topic!")]))


def test_unsupported_format_rejected():
    with pytest.raises(ConfigError, match="unsupported format"):
        validate(_cfg([make_stream("s", "a", ["insert"], "t", format="avro")]))


def test_snapshot_resources_deduped():
    cfg = _cfg(
        [
            make_stream("r1", "users", ["read"], "t1"),
            make_stream("r2", "users", ["read", "insert"], "t2"),
            make_stream("x", "orders", ["insert"], "t3"),
        ]
    )
    assert cfg.snapshot_resources() == ["public.users"]


def test_wants_snapshot():
    assert make_stream("s", "a", ["read"], "t").wants_snapshot()
    assert not make_stream("s", "a", ["insert"], "t").wants_snapshot()
