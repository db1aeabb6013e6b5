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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key-resilient inner equi-join: scatter the big side across
    ``n_salts`` sub-keys with a random salt (join output is
    salt-invariant), replicate the small side once per salt so every
    (key, salt) bucket finds its matches, join on (*on, salt).

    When to use (r9): the small side is too big to broadcast AND the
    big side's key distribution has hot keys — a plain sort-merge join
    then lands each hot key in a single reducer task while 999
    executors idle. The salt spreads one key's rows over n_salts tasks
    at the cost of an n_salts× replication of the (non-broadcastable
    but still much smaller) build side. AQE's skew-join split covers
    many of these cases at runtime; this operator is the explicit form
    for when statistics are absent (checkpointed/streamed inputs) or
    the skew is known up front. Results are identical to
    ``big.join(small, on)`` — the SQL oracle IS the unsalted join."""
    salted = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(rep, [*on, "_salt"]).drop("_salt")


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
