"""Central testdata table reader.

One quirk handled here once: the driver testdata's ``events.ts`` column is
parquet TIMESTAMP(NANOS), which Spark has no native type for. With
``spark.sql.legacy.parquet.nanosAsLong=true`` it reads as a nanos LongType;
we convert to a microsecond timestamp (exact integer division — no float
precision loss). All other tables read natively (timestamp_ntz).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# columns stored as TIMESTAMP(NANOS) in the testdata
_NANO_TS_COLS = {"ts"}


def read_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # Runtime-settable; applied here so the engine works in any caller's
    # session (the driver builds its own).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for f in df.schema.fields:
        if f.name in _NANO_TS_COLS and isinstance(f.dataType, T.LongType):
            df = df.withColumn(
                f.name, F.timestamp_micros((F.col(f.name) / 1000).cast("long"))
            )
    return df
