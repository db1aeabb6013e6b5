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


# ---------------------------------------------------------------------------
# Kafka sink security: the tls x sasl matrix + validation tail
# (reference case list `src/config/config.zig:483-1123`)
# ---------------------------------------------------------------------------

from outboxx_spark.config import (  # noqa: E402
    KafkaSasl,
    KafkaSinkConfig,
    kafka_security_options,
    validate_kafka_sink,
)

_SASL = KafkaSasl(mechanism="SCRAM-SHA-512", username="svc", password_env="KPW")


def test_security_protocol_matrix():
    # the four tls x sasl combinations (`config.zig:85-92`)
    b = ("broker:9092",)
    assert KafkaSinkConfig(b, tls=True, sasl=_SASL).security_protocol() == "SASL_SSL"
    assert (
        KafkaSinkConfig(b, tls=False, sasl=_SASL).security_protocol()
        == "SASL_PLAINTEXT"
    )
    assert KafkaSinkConfig(b, tls=True).security_protocol() == "SSL"
    assert KafkaSinkConfig(b, tls=False).security_protocol() == "PLAINTEXT"


def test_tls_is_on_by_default():
    assert KafkaSinkConfig(("b:9092",)).tls is True
    assert KafkaSinkConfig(("b:9092",)).security_protocol() == "SSL"


def test_invalid_sasl_mechanism_rejected():
    # GSSAPI/OAUTHBEARER deliberately unsupported (`config.zig:27-29`)
    for mech in ("GSSAPI", "OAUTHBEARER", "plain", "scram-sha-256", ""):
        bad = KafkaSinkConfig(
            ("b:9092",), sasl=KafkaSasl(mech, "u", "PW_ENV")
        )
        with pytest.raises(ConfigError, match="mechanism"):
            validate_kafka_sink(bad)


def test_valid_sasl_mechanisms_accepted():
    for mech in ("PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512"):
        ok = KafkaSinkConfig(("b:9092",), sasl=KafkaSasl(mech, "u", "PW_ENV"))
        assert validate_kafka_sink(ok) is ok


def test_broker_port_range():
    for bad in ("h:0", "h:65536", "h:-1", "h:port", ":9092"):
        with pytest.raises(ConfigError, match="broker"):
            validate_kafka_sink(KafkaSinkConfig((bad,)))
    # bare hostname (default port) and the full range edges pass
    for ok in ("h", "h:1", "h:65535", "kafka-1.internal:9092"):
        validate_kafka_sink(KafkaSinkConfig((ok,)))


def test_broker_array_limits():
    with pytest.raises(ConfigError, match="at least one broker"):
        validate_kafka_sink(KafkaSinkConfig(()))
    too_many = tuple(f"b{i}:9092" for i in range(51))
    with pytest.raises(ConfigError, match="too many brokers"):
        validate_kafka_sink(KafkaSinkConfig(too_many))
    with pytest.raises(ConfigError, match="too long"):
        validate_kafka_sink(KafkaSinkConfig(("x" * 254,)))


def test_sasl_field_lengths():
    with pytest.raises(ConfigError, match="username"):
        validate_kafka_sink(
            KafkaSinkConfig(("b",), sasl=KafkaSasl("PLAIN", "", "PW"))
        )
    with pytest.raises(ConfigError, match="password_env"):
        validate_kafka_sink(
            KafkaSinkConfig(("b",), sasl=KafkaSasl("PLAIN", "u", "x" * 64))
        )


def test_security_options_sasl_ssl(monkeypatch):
    monkeypatch.setenv("KPW", "s3cret")
    opts = kafka_security_options(
        KafkaSinkConfig(("b1:9092", "b2:9092"), tls=True,
                        tls_ca_location="/certs/ca.pem", sasl=_SASL)
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.ssl.truststore.location"] == "/certs/ca.pem"
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-512"
    assert "ScramLoginModule" in opts["kafka.sasl.jaas.config"]
    assert 'password="s3cret"' in opts["kafka.sasl.jaas.config"]


def test_security_options_plain_uses_plain_login_module(monkeypatch):
    monkeypatch.setenv("KPW", "pw")
    opts = kafka_security_options(
        KafkaSinkConfig(("b:9092",), tls=False,
                        sasl=KafkaSasl("PLAIN", "u", "KPW"))
    )
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"
    assert "PlainLoginModule" in opts["kafka.sasl.jaas.config"]
    assert "ssl.truststore" not in str(sorted(opts))


def test_security_options_missing_password_env_fails(monkeypatch):
    monkeypatch.delenv("NOPE_PW", raising=False)
    with pytest.raises(ConfigError, match="NOPE_PW"):
        kafka_security_options(
            KafkaSinkConfig(("b:9092",), sasl=KafkaSasl("PLAIN", "u", "NOPE_PW"))
        )


def test_security_options_plaintext_minimal():
    opts = kafka_security_options(KafkaSinkConfig(("b:9092",), tls=False))
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "kafka.security.protocol": "PLAINTEXT",
    }


def test_stream_and_operation_count_limits():
    many = [make_stream(f"s{i}", "t", ["insert"], f"d{i}") for i in range(101)]
    with pytest.raises(ConfigError, match="too many streams"):
        validate(_cfg(many))
    # >10 operations is impossible without duplicates (4 valid ops), so
    # the duplicate check subsumes the count guard for valid names —
    # pin the guard with raw duplicates past the cap
    s = make_stream("s", "t", ["insert"] * 11, "d")
    with pytest.raises(ConfigError, match="too many operations"):
        validate(_cfg([s]))


def test_topic_length_cap():
    with pytest.raises(ConfigError, match="bad destination"):
        validate(_cfg([make_stream("s", "t", ["insert"], "x" * 250)]))
    validate(_cfg([make_stream("s", "t", ["insert"], "x" * 249)]))
