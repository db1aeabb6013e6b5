"""Pre-flight validator (V3 analog): existence, routing-key column,
full-row-image requirement for DELETE streams."""

from __future__ import annotations

import pytest

from outboxx_spark.config import ConfigError, PipelineConfig, make_stream
from outboxx_spark.validators import SourceCatalog, catalog_from_testdata, preflight


def _cfg(*streams):
    return PipelineConfig(streams=list(streams))


CATALOG = SourceCatalog(
    columns={
        "public.users": ["id", "name", "value"],
        "public.orders": ["order_id", "user_id"],
    }
)


def test_preflight_ok():
    preflight(
        _cfg(make_stream("s", "users", ["insert", "delete"], "t", "id")), CATALOG
    )


def test_missing_table_fails():
    with pytest.raises(ConfigError, match="does not exist"):
        preflight(_cfg(make_stream("s", "nope", ["insert"], "t", "id")), CATALOG)


def test_missing_routing_key_fails():
    with pytest.raises(ConfigError, match="routing_key column"):
        preflight(_cfg(make_stream("s", "users", ["insert"], "t", "missing_col")), CATALOG)


def test_delete_requires_full_images():
    keyonly = SourceCatalog(columns=CATALOG.columns, full_row_images=False)
    with pytest.raises(ConfigError, match="REPLICA IDENTITY FULL"):
        preflight(_cfg(make_stream("s", "users", ["delete"], "t", "id")), keyonly)
    # insert-only stream is fine on a key-only source
    preflight(_cfg(make_stream("s", "users", ["insert"], "t", "id")), keyonly)


def test_all_errors_reported_together():
    with pytest.raises(ConfigError) as e:
        preflight(
            _cfg(
                make_stream("a", "nope", ["insert"], "t1", "id"),
                make_stream("b", "users", ["insert"], "t2", "ghost"),
            ),
            CATALOG,
        )
    assert "does not exist" in str(e.value) and "routing_key" in str(e.value)


def test_catalog_from_testdata(spark, sf_dir):
    cat = catalog_from_testdata(
        spark, sf_dir, feed_resources={"public.t0": ["user_id", "event_type"]}
    )
    assert "c_custkey" in cat.columns["public.customer"]
    assert cat.columns["public.t0"] == ["user_id", "event_type"]
    preflight(
        _cfg(make_stream("c", "customer", ["read"], "t", "c_custkey")), cat
    )
