"""Partition-key extraction (R3) with fail-fast on missing keys.

Reference (`src/domain/change_event.zig:173-210`,
`src/processor/processor.zig:231-252`): the configured ``routing_key``
column (default ``id``) is read from the event payload (UPDATE uses the
**new** row), stringified, and a missing key is a hard
``PartitionKeyUnavailable`` error — partitioning must never silently
collapse onto a null key.

Spark: a codegen'd ``CAST(... AS STRING)`` plus ``raise_error`` guard.
The cast handles int/string/bool/float/null exactly like the reference's
fallback stringifier; the int fast path is moot under Tungsten codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partition_key(key_col: Column, *, fail_on_null: bool = True) -> Column:
    """Stringified Kafka partition key; null -> query failure (the
    distributed analog of fail-fast, SURVEY §7 'what's hard' #3)."""
    key = key_col.cast("string")
    if not fail_on_null:
        return key
    return F.when(
        key.isNull(),
        F.raise_error(F.lit("PartitionKeyUnavailable: routing key column is null")),
    ).otherwise(key)


def with_partition_key(df: DataFrame, routing_key: str = "user_id", *, fail_on_null: bool = True) -> DataFrame:
    return df.withColumn("key", partition_key(F.col(routing_key), fail_on_null=fail_on_null))
