"""Typed change-event model (StructTypes) for the CDC pipeline.

The reference domain record (`src/domain/change_event.zig:117-130`) is
``{op, data, meta}`` with ``meta = {source, resource, timestamp, lsn}``
(`change_event.zig:109-114`). Rows there are dynamically-typed ordered
(name, value) pairs; in Spark we use a declared StructType per table for
the typed path, and a ``map<string,string>`` for the schema-on-read path.

LSN: the reference carries a u64 LSN rendered as Postgres text ``X/X``
(`converter.zig:95-100`); we carry the numeric offset and render the text
form with ``format_string`` only at serialization.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Operations, `src/domain/change_event.zig:6-12`. READ = snapshot row.
OP_INSERT = "INSERT"
OP_UPDATE = "UPDATE"
OP_DELETE = "DELETE"
OP_READ = "READ"
ALL_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE, OP_READ)

META_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("resource", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), True),  # Unix seconds, commit time
        T.StructField("lsn", T.LongType(), True),  # numeric; text X/X at serialization
    ]
)


def change_event_schema(data_schema: T.DataType) -> T.StructType:
    """ChangeEvent with a typed ``data`` payload.

    ``data`` holds the new image; ``old`` is populated only for UPDATE
    (tagged-union DataSection, `change_event.zig:99-106`). The JSON
    serializer emits only the new image (`src/serialization/json.zig:57-70`),
    so ``old`` exists in the model but never in the envelope.
    """
    return T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField("data", data_schema, True),
            T.StructField("old", data_schema, True),
            T.StructField("meta", META_SCHEMA, False),
        ]
    )


# Schema-on-read payload: ordered map of column name -> text value, the
# Spark analog of RowData (`change_event.zig:41-47`) for tables not known
# at compile time.
DYNAMIC_DATA_SCHEMA = T.MapType(T.StringType(), T.StringType(), True)

# ---------------------------------------------------------------------------
# Driver testdata schemas (snapshot sources; see TESTDATA.md). Declaring
# them (instead of inferring) plays the RelationRegistry role
# (`src/source/postgres/relation_registry.zig`): in the Spark rebuild the
# tables are known from config, so the registry is static.
# ---------------------------------------------------------------------------

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
