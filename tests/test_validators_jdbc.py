"""JDBC pre-flight (V3 deployment path) against a stubbed connection —
the SQL-statement mirror of `validator.zig:76-179` and its test matrix:
happy path, old server, wrong wal_level, missing table, missing
routing-key column, wrong replica identity, and the
identity-only-checked-for-DELETE rule."""

from __future__ import annotations

import pytest

from outboxx_spark.config import ConfigError, PipelineConfig, make_stream, validate
from outboxx_spark.validators_jdbc import (
    SQL_SERVER_VERSION,
    SQL_WAL_LEVEL,
    preflight_postgres,
    sql_column_exists,
    sql_replica_identity,
    sql_table_exists,
)


def _cfg(ops=("insert", "update", "delete")):
    return validate(
        PipelineConfig(
            streams=[make_stream("users_full", "public.users", list(ops), "cdc.users", "id")]
        )
    )


class StubPg:
    """Answers the pre-flight statements like a healthy PG 16; individual
    answers overridable per test. Records every statement."""

    def __init__(self, **overrides) -> None:
        self.overrides = overrides
        self.statements: list[str] = []

    def __call__(self, sql: str):
        self.statements.append(sql)
        if sql == SQL_SERVER_VERSION:
            return self.overrides.get("version", "160002")
        if sql == SQL_WAL_LEVEL:
            return self.overrides.get("wal_level", "logical")
        if "to_regclass" in sql and "IS NOT NULL" in sql:
            return self.overrides.get("table_exists", "t")
        if "pg_attribute" in sql:
            return self.overrides.get("column_exists", "t")
        if "relreplident" in sql:
            return self.overrides.get("identity", "f")
        raise AssertionError(f"unexpected statement: {sql}")


def test_happy_path_runs_reference_statement_sequence():
    stub = StubPg()
    ran = preflight_postgres(_cfg(), stub)
    assert ran == [
        SQL_SERVER_VERSION,
        SQL_WAL_LEVEL,
        sql_table_exists("public.users"),
        sql_column_exists("public.users", "id"),
        sql_replica_identity("public.users"),
    ]
    # the exact catalog queries the reference sends (validator.zig)
    assert sql_table_exists("public.users") == (
        "SELECT to_regclass('public.users') IS NOT NULL;"
    )
    assert sql_column_exists("public.users", "id") == (
        "SELECT EXISTS (SELECT FROM pg_attribute "
        "WHERE attrelid = to_regclass('public.users') AND attname = 'id' "
        "AND attnum > 0 AND NOT attisdropped);"
    )
    assert sql_replica_identity("public.users") == (
        "SELECT relreplident FROM pg_class WHERE oid = to_regclass('public.users');"
    )


def test_old_server_version_fails():
    with pytest.raises(ConfigError, match="PostgreSQL 12"):
        preflight_postgres(_cfg(), StubPg(version="110013"))


def test_wrong_wal_level_fails_with_fix_hint():
    with pytest.raises(ConfigError, match="wal_level = logical"):
        preflight_postgres(_cfg(), StubPg(wal_level="replica"))


def test_missing_table_fails_and_skips_dependent_checks():
    stub = StubPg(table_exists="f")
    with pytest.raises(ConfigError, match="does not exist"):
        preflight_postgres(_cfg(), stub)
    # column/identity checks for the missing table are not attempted
    assert not any("pg_attribute" in s or "relreplident" in s for s in stub.statements)


def test_missing_routing_key_column_fails():
    with pytest.raises(ConfigError, match="routing-key column 'id'"):
        preflight_postgres(_cfg(), StubPg(column_exists="f"))


@pytest.mark.parametrize("identity", ["d", "i", "n"])
def test_non_full_identity_fails_for_delete_streams(identity):
    with pytest.raises(ConfigError, match="REPLICA IDENTITY"):
        preflight_postgres(_cfg(), StubPg(identity=identity))


def test_identity_not_checked_without_delete():
    # FULL is irrelevant for insert/update-only streams (it would just
    # inflate UPDATE WAL) — the reference only checks delete trackers
    stub = StubPg(identity="d")
    preflight_postgres(_cfg(ops=("insert", "update")), stub)
    assert not any("relreplident" in s for s in stub.statements)


def test_all_failures_collected_into_one_error():
    stub = StubPg(version="90600", wal_level="minimal", table_exists="f")
    with pytest.raises(ConfigError) as e:
        preflight_postgres(_cfg(), stub)
    msg = str(e.value)
    assert "too old" in msg and "wal_level" in msg and "does not exist" in msg


def test_jdbc_bool_shapes_accepted():
    # JDBC/psycopg return real booleans where libpq returns 't'
    stub = StubPg(table_exists=True, column_exists=True)
    preflight_postgres(_cfg(ops=("insert",)), stub)
