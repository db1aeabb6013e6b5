"""Z-order (Morton) multi-dimensional layout — the OPTIMIZE ZORDER
primitive of Delta/Iceberg, rebuilt as plain DataFrame ops.

Why it exists at 100 TB: file-level min/max statistics prune scans in
ONE dimension when data is range-partitioned on that dimension — and
in NO dimension when it arrives in ingest order. Interleaving the
bits of two (or more) normalized columns into a single Morton key and
range-partitioning on THAT gives every file a tight bounding box in
every interleaved dimension at once, so predicates on either column
skip most files. The operator here produces the key and the bucket
assignment; the write path is the ordinary
``repartitionByRange(zval).write`` every sink in this repo already
uses.

Everything is integer-exact and engine-mirrorable:

- normalization is min-max linear scaling to ``bits`` bits with floor
  division — ``(v - min) * (2^bits - 1) // (max - min)`` — computed
  from a ONE-ROW aggregate broadcast back (the Q11/Q15/Q22 scalar
  pattern); no quantile sketch, no floats. (Production systems use
  range boundaries from a quantile sketch for skew resistance; the
  repo's GK sketch (olap.py) is the drop-in — min-max keeps the
  oracle bit-exact, and the interleave/prune math is identical.)
- the interleave is a fixed unrolled expression of shifts and masks,
  whole-stage-codegen friendly, identical in DuckDB.
- bucket = zval * n_buckets >> (2*bits) — proportional range split of
  the key space (Morton keys of min-max-normalized uniform-ish data
  spread evenly; the repartitionByRange production path needs no such
  assumption).

tests/test_zorder.py quantifies the point: the sum of per-bucket
bounding-box areas under the z-layout is a small fraction of the
ingest-order layout's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # per-dimension resolution; z-key fits in 32 bits


def _interleave(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton interleave: bit i of ``a`` lands at 2i+1, of ``b`` at 2i.
    Unrolled shifts/masks — one codegen expression, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def _interleave_sql(a: str, b: str, bits: int = ZBITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def _norm(v: Column, vmin: Column, vmax: Column, bits: int = ZBITS) -> Column:
    # exact integer floor division (SQL `div`) — float `/` would round
    # the quotient before the floor and can flip a bucket boundary
    span = vmax - vmin
    scale = F.lit((1 << bits) - 1).cast("long")
    return F.when(span == 0, F.lit(0).cast("long")).otherwise(
        F.call_function("div", (v - vmin).cast("long") * scale, span)
    ).cast("long")


def zorder_keys(
    events: DataFrame,
    col_a: str = "user_id",
    col_b: str = "ts_epoch",
    n_buckets: int = 64,
    bits: int = ZBITS,
) -> DataFrame:
    """(event_id, a, b, zval, bucket): the Morton key and range-bucket
    assignment for every row. One scan + a one-row broadcast; the key
    computation is row-local codegen."""
    stats = events.agg(
        F.min(col_a).cast("long").alias("a_min"),
        F.max(col_a).cast("long").alias("a_max"),
        F.min(col_b).cast("long").alias("b_min"),
        F.max(col_b).cast("long").alias("b_max"),
    )
    na = _norm(F.col(col_a).cast("long"), F.col("a_min"), F.col("a_max"), bits)
    nb = _norm(F.col(col_b).cast("long"), F.col("b_min"), F.col("b_max"), bits)
    z = _interleave(na, nb, bits)
    return events.crossJoin(F.broadcast(stats)).select(
        "event_id",
        F.col(col_a).cast("long").alias("a"),
        F.col(col_b).cast("long").alias("b"),
        z.alias("zval"),
        F.shiftrightunsigned(z * n_buckets, 2 * bits).cast("long").alias("bucket"),
    )


def q_zorder_keys(spark, sf_dir: str) -> DataFrame:
    """Driver query: z-layout of events over (user_id, epoch(ts))."""
    from outboxx_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts_epoch", F.unix_timestamp("ts").cast("long")
    )
    return zorder_keys(ev)


def ZORDER_KEYS_SQL(n_buckets: int = 64, bits: int = ZBITS) -> str:
    scale = (1 << bits) - 1
    norm_a = (
        f"CASE WHEN a_max = a_min THEN 0 "
        f"ELSE (a - a_min) * {scale} // (a_max - a_min) END"
    )
    norm_b = (
        f"CASE WHEN b_max = b_min THEN 0 "
        f"ELSE (b - b_min) * {scale} // (b_max - b_min) END"
    )
    return f"""
WITH ev AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS a,
         -- floor before the cast: CAST(double) rounds in DuckDB while
         -- Spark's unix_timestamp floors (the repo's standing ts rule)
         CAST(floor(epoch(ts)) AS BIGINT) AS b
  FROM events
),
stats AS (
  SELECT min(a) AS a_min, max(a) AS a_max,
         min(b) AS b_min, max(b) AS b_max
  FROM ev
),
normed AS (
  SELECT event_id, a, b,
         {norm_a} AS na, {norm_b} AS nb
  FROM ev CROSS JOIN stats
),
keyed AS (
  SELECT event_id, a, b, {_interleave_sql("na", "nb", bits)} AS zval
  FROM normed
)
SELECT event_id, a, b, CAST(zval AS BIGINT) AS zval,
       CAST((zval * {n_buckets}) >> {2 * bits} AS BIGINT) AS bucket
FROM keyed
"""
