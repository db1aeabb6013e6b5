"""JSON envelope ingestion: the deployment-shaped source path.

In deployment the CDC feed arrives as Kafka records whose value is the
JSON envelope (F1). This reader parses envelopes back into typed change
events with ONE codegen'd ``from_json`` — the schema-on-read path uses
``map<string,string>`` for ``data`` (the RowData analog,
`change_event.zig:41-47`) so unknown tables flow through untyped and a
per-table projection types them on demand (the RelationRegistry role).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENVELOPE_SCHEMA = (
    "op string, data map<string,string>, "
    "meta struct<source:string, resource:string, timestamp:long, lsn:string>"
)


def parse_envelopes(df: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON envelope strings -> flat change events. ``lsn`` returns in
    Postgres text form (X/X) exactly as serialized; ``lsn_numeric``
    recovers the u64 for offset arithmetic/dedup.

    Staged projection, deliberately: from_json is CodegenFallback, so
    inlining ``e`` into all seven output columns re-parses the JSON
    document per column (the r8 Debezium-decode lesson,
    `sources/debezium.py`); aliasing the parse first pins ONE parse per
    row — CollapseProject keeps the split because merging would
    duplicate a non-cheap expression."""
    parsed = df.select(
        F.from_json(F.col(value_col), ENVELOPE_SCHEMA).alias("e")
    )
    return parsed.select(
        F.col("e.op").alias("op"),
        F.col("e.meta.source").alias("source"),
        F.col("e.meta.resource").alias("resource"),
        F.col("e.meta.timestamp").alias("commit_ts"),
        F.col("e.meta.lsn").alias("lsn_text"),
        _lsn_from_text(F.col("e.meta.lsn")).alias("lsn"),
        F.col("e.data").alias("data"),
    )


def _lsn_from_text(lsn_text: Column) -> Column:
    """X/X text -> u64 (inverse of functions.typemap.lsn_text)."""
    hi = F.conv(F.split_part(lsn_text, F.lit("/"), F.lit(1)), 16, 10).cast("long")
    lo = F.conv(F.split_part(lsn_text, F.lit("/"), F.lit(2)), 16, 10).cast("long")
    return F.shiftleft(hi, 32) + lo


def typed_projection(parsed: DataFrame, columns: dict[str, str]) -> DataFrame:
    """Per-table typed view over the dynamic map: {col: spark_type}.
    This is where the static registry (S7) types a known table."""
    cols = [F.col("op"), F.col("resource"), F.col("lsn"), F.col("commit_ts")]
    for name, typ in columns.items():
        cols.append(F.col("data")[name].cast(typ).alias(name))
    return parsed.select(*cols)
