"""Binned point-in-interval range join.

A join whose only predicate is a range (``start <= ts <= end``, no
equality key) degenerates in Spark to BroadcastNestedLoopJoin — an
O(|points| x |intervals|) scan that is the canonical 100 TB
scale-killer. The standard fix (used by every interval-join engine,
e.g. Spark's own stream-stream interval join and the Databricks
range-join optimization) is binning: quantize time into fixed-width
buckets, explode each interval into the buckets it covers, tag each
point with its single bucket, and equi-join on the bucket with the
exact range predicate as a post-filter. Catalyst then plans a plain
shuffled hash/sort-merge join that scales linearly.

Each (point, interval) pair can match on at most ONE bucket — the
point's own — so the binned join needs no de-duplication.

Bucket width tuning: the explode factor is ``(end - start) / bucket``
per interval, while bucket width bounds how many non-matching
candidates share a bucket. Pick the bucket near the typical interval
length so both stay O(1). Hot buckets (time-clustered data) can be
salted with :func:`outboxx_spark.operators.skew.salted_join`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_ts <= end_col`` (inclusive both ends; shift
    the columns by one unit for half-open semantics).

    All three range columns must be integral (epoch micros/seconds —
    cast timestamps with ``unix_micros`` first); ``bucket`` is in the
    same unit. ``how='left'`` keeps unmatched points with NULL
    interval columns (the bucket key is exploded on the interval side
    only, so left semantics survive the rewrite).
    """
    if bucket < 1:
        raise ValueError(f"bucket must be >= 1, got {bucket}")
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")
    # integer floor-div bucketing; div (not /) keeps the arithmetic in
    # BIGINT so epoch-micro keys never round through a double
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket}"),
                F.expr(f"{end_col} div {bucket}"),
            )
        ),
    )
    pt = points.withColumn("_bkt", F.expr(f"{point_ts} div {bucket}"))
    joined = pt.join(
        iv,
        (pt["_bkt"] == iv["_bkt"])
        & (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col)),
        how,
    )
    return joined.drop("_bkt")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    bucket: int,
) -> DataFrame:
    """Inner-join interval rows on OVERLAP: ``l_start <= r_end AND
    r_start <= l_end`` (inclusive — two spans touching at one instant
    overlap). Same binning rewrite as :func:`range_join`, with the
    interval-interval twist: a pair can share MANY buckets, so each
    pair is counted only in its CANONICAL bucket — the one containing
    ``greatest(l_start, r_start)``, i.e. where the overlap begins.
    Both sides of an overlapping pair necessarily cover that bucket
    (the overlap's start is <= both ends), so the canonical-bucket
    filter is a pushdown-friendly predicate, never a DISTINCT shuffle
    over the multiplied pairs.

    All four span columns must be integral and each side's span
    non-negative (``start <= end``); ``bucket`` is in the same unit.
    """
    if bucket < 1:
        raise ValueError(f"bucket must be >= 1, got {bucket}")
    ls, le = left_span
    rs, re_ = right_span
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap_cols)}")
    lt = left.withColumn(
        "_lbkt",
        F.explode(
            F.sequence(F.expr(f"{ls} div {bucket}"), F.expr(f"{le} div {bucket}"))
        ),
    )
    rt = right.withColumn(
        "_rbkt",
        F.explode(
            F.sequence(F.expr(f"{rs} div {bucket}"), F.expr(f"{re_} div {bucket}"))
        ),
    )
    joined = lt.join(
        rt,
        (lt["_lbkt"] == rt["_rbkt"])
        & (F.col(ls) <= F.col(re_))
        & (F.col(rs) <= F.col(le))
        & (lt["_lbkt"] == F.expr(f"greatest({ls}, {rs}) div {bucket}")),
        "inner",
    )
    return joined.drop("_lbkt", "_rbkt")
