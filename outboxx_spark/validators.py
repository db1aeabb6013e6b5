"""Pre-flight validation against the live source (V3).

Reference (`src/source/postgres/validator.zig:76-179`, `src/main.zig:
298-334`): before streaming starts, validate server version,
``wal_level=logical``, table existence (``to_regclass``), routing-key
column existence (``pg_attribute``), and REPLICA IDENTITY FULL for any
stream that tracks DELETE (else deleted rows lack non-key columns).
All failures are fail-stop at startup — nothing reaches the data path.

Spark analog: the "catalog" is the source schemas (parquet footers here,
JDBC metadata in deployment). Identity semantics map to a source
capability flag: a source that delivers full old images (the feed
testbed does; a key-only CDC feed does not) plays REPLICA IDENTITY FULL.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from outboxx_spark.config import ConfigError, PipelineConfig
from outboxx_spark.sources.tables import read_table


@dataclass
class SourceCatalog:
    """resource -> available column names, plus delivery capabilities."""

    columns: dict[str, list[str]]
    full_row_images: bool = True  # REPLICA IDENTITY FULL analog


def catalog_from_testdata(
    spark: SparkSession, sf_dir: str, feed_resources: dict[str, list[str]] | None = None
) -> SourceCatalog:
    """Build the catalog: snapshot tables from parquet schemas + virtual
    feed resources with the feed's payload columns."""
    cols: dict[str, list[str]] = {}
    from outboxx_spark.schemas import TPCH_TABLES

    for t in TPCH_TABLES:
        try:
            cols[f"public.{t}"] = read_table(spark, sf_dir, t).columns
        except Exception:  # table absent at this sf — simply not offered
            continue
    for resource, c in (feed_resources or {}).items():
        cols[resource] = c
    return SourceCatalog(columns=cols)


def preflight(config: PipelineConfig, catalog: SourceCatalog) -> None:
    """Fail-stop checks, mirrored from the reference validator:

    - every stream's resource must exist in the catalog
    - the routing_key column must exist on that resource
    - DELETE-tracking streams require full row images from the source
    """
    errors: list[str] = []
    for s in config.streams:
        cols = catalog.columns.get(s.resource)
        if cols is None:
            errors.append(f"stream {s.name!r}: resource {s.resource!r} does not exist")
            continue
        if s.routing_key not in cols:
            errors.append(
                f"stream {s.name!r}: routing_key column {s.routing_key!r} "
                f"not in {s.resource!r} (has: {', '.join(cols)})"
            )
        if "delete" in s.operations and not catalog.full_row_images:
            errors.append(
                f"stream {s.name!r}: tracks DELETE but source does not deliver "
                "full row images (REPLICA IDENTITY FULL required)"
            )
    if errors:
        raise ConfigError("pre-flight validation failed:\n  " + "\n  ".join(errors))
