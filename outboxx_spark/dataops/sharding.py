"""Deterministic size-balanced shard assignment for training export.

The last step of a pretraining data pipeline writes the corpus as N
shards of roughly equal token count, in a pseudo-random but
REPRODUCIBLE document order (so a training run can be resumed and
audited). That is a global weighted cumulative sum — the textbook
"inherently sequential" operation — made distributed here with the
two-pass bucket-offset technique:

1. Order documents by a deterministic pseudo-shuffle key (a Knuth
   multiplicative hash both engines can evaluate exactly).
2. Quantize the key space into ``n_buckets`` fixed-width buckets —
   fixed arithmetic, NOT sampled ranges, so the bucketing is
   deterministic across jobs/retries (``repartitionByRange`` samples
   its boundaries, which silently breaks two-pass prefix sums when a
   stage is recomputed).
3. Pass 1: per-bucket token sums (one partial-aggregable groupBy over
   ``n_buckets`` groups) -> exclusive prefix offsets with a window
   over the TINY bucket-sum frame (n_buckets rows — the only
   single-partition step, and it is O(n_buckets), not O(corpus)).
4. Pass 2: broadcast-join the offsets back and window-cumsum WITHIN
   each bucket; global running offset = bucket offset + local cumsum.

Shard id = exclusive running offset ``div`` target — byte-identical to
a single-node cumsum (the oracle), at any cluster size, because every
step is a pure function of (doc_id, n_tokens).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative hash constant (2^32 / phi); doc_id is mixed
# into the 32-bit space. Exactly expressible in both Spark and DuckDB
# BIGINT arithmetic for doc_id < 2^31 (pin larger ids to a 64-bit
# mixer in both engines together if the id space grows).
_KNUTH = 2654435761
_MOD = 1 << 32


def _shuffle_key(doc_id):
    return F.pmod(F.col(doc_id) * F.lit(_KNUTH), F.lit(_MOD))


def assign_shards(
    df: DataFrame,
    weight: Column,
    target: int,
    doc_id: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Assign each document a shard id such that consecutive documents
    (in deterministic pseudo-shuffle order) fill shards of ``target``
    weight; a document straddling a boundary lands in the shard its
    START offset falls in, so every shard except the last holds at
    least ``target - (w_max - 1)`` weight (w_max = heaviest document —
    the straddler's weight is charged to the shard it starts in).

    Output: (doc_id, n_tokens, shard).
    """
    if target < 1 or n_buckets < 1:
        raise ValueError(f"target/n_buckets must be >= 1, got {target}/{n_buckets}")
    base = df.select(
        F.col(doc_id).alias("doc_id"),
        weight.cast("long").alias("n_tokens"),
        _shuffle_key(doc_id).alias("_key"),
    ).withColumn("_bkt", F.expr(f"_key div {_MOD // n_buckets}"))

    # pass 1: bucket sums -> exclusive prefix offsets (n_buckets rows)
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy("_bkt")
        .agg(F.sum("n_tokens").alias("_bsum"))
        .select("_bkt", F.coalesce(F.sum("_bsum").over(wb), F.lit(0)).alias("_boff"))
    )

    # pass 2: within-bucket cumsum + bucket offset = global offset
    ww = (
        Window.partitionBy("_bkt")
        .orderBy("_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_start",
            F.col("_boff") + F.sum("n_tokens").over(ww) - F.col("n_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"_start div {target}").cast("long").alias("shard"),
        )
    )


def assign_shards_sql(
    target: int, table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB mirror: the same Knuth key, a single global cumulative
    sum (the single-node formulation the distributed plan must equal),
    and // integer division."""
    return f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split({text_col}, ' ')) AS BIGINT) AS n_tokens,
             (doc_id * {_KNUTH}) % {_MOD} AS key
      FROM {table}
    )
    SELECT doc_id, n_tokens,
           CAST((SUM(n_tokens) OVER (
                   ORDER BY key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) - n_tokens) // {target} AS BIGINT) AS shard
    FROM base
    """
