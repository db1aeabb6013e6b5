"""Skew-resilient aggregation: salted two-phase groupBy.

At 100 TB a hot key (one resource carrying most of the feed) turns a
groupBy into a straggler. The standard fix: scatter each key across
``n_salts`` partial groups, aggregate, then combine partials — the
shuffle spreads the hot key over n_salts reducers. AQE's skew handling
covers joins; this covers aggregations whose skew AQE can't split
(single hot group). Results are identical to the direct groupBy for
algebraic aggregates (count/sum/min/max) — asserted in tests and usable
under the same SQL oracle as the unsalted form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, keys: list[str], n_salts: int = 16, out: str = "n") -> DataFrame:
    """groupBy(keys).count() with a salt scatter/gather."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_pn"))
    return partial.groupBy(*keys).agg(F.sum("_pn").cast("long").alias(out))


def salted_agg(
    df: DataFrame, keys: list[str], agg_col: str, n_salts: int = 16
) -> DataFrame:
    """Salted sum/min/max/count bundle over one numeric column."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count("*").alias("_n"),
        F.sum(agg_col).alias("_s"),
        F.min(agg_col).alias("_mn"),
        F.max(agg_col).alias("_mx"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").cast("long").alias("n"),
        F.sum("_s").alias("sum"),
        F.min("_mn").alias("min"),
        F.max("_mx").alias("max"),
    )
