"""Count-min sketch: mergeable heavy-hitter state as a DataFrame.

The missing member of the repo's approximate family (HLL cardinality,
Greenwald-Khanna quantiles — olap.py): frequency estimation whose
state is O(d x w) REGARDLESS of key cardinality, mergeable by
addition. At 100 TB the exact per-key count of a high-cardinality
column is a full shuffle of the key space; the sketch is a map-side
fold into d*w counters, and unioning two corpora's sketches is a
groupBy-sum over <= 2*d*w rows — the property that lets a fleet of
ingest jobs each carry a sketch and a coordinator merge them without
ever seeing raw keys.

Representation: a (row, bucket, cnt) DataFrame — d*w rows at most —
NOT an opaque binary blob (Spark's builtin count_min_sketch agg emits
one, but nothing SQL-side can read it back; a relational sketch is
queryable, mergeable, and storable with plain operators). Hashes are
xxhash64(key, seed=row) mod w: JVM-side, whole-stage-codegen, and the
same function family every dedup/banding operator here already uses.

Estimation is the textbook min over rows of the addressed counters:
always >= the true count (counters only over-count on collisions);
<= true + ceil(e/w * N) with probability 1 - e^-d per key — and
DETERMINISTIC for fixed input (seeds are the row indices), which is
what lets the certification query pin the bound as an oracle-checked
boolean, the same hard-signal harness pattern as
olap.event_type_cardinality_approx_check.

Reference parity: the reference has no sketches at all (SURVEY §2.7
stops at exact aggregation); this is part of the approximate-query
surface a 100 TB engine needs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.sources.tables import read_table

DEPTH = 4
WIDTH = 2048


def _addresses(key, d: int, w: int):
    """The d (row, bucket) counter addresses of a key — one array
    expression, no Python in the loop body at runtime."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(key, F.lit(i)), F.lit(w)).alias("bucket"),
            )
            for i in range(d)
        ]
    )


def cms_sketch(
    df: DataFrame, key: str, *, d: int = DEPTH, w: int = WIDTH
) -> DataFrame:
    """Fold a column into its (row, bucket, cnt) sketch. NULL keys are
    excluded (COUNT semantics, same as the exact side). The explode
    multiplies rows by d BEFORE the aggregate, but the map-side
    combine collapses them to <= d*w partials per partition — the
    shuffle carries sketch-sized state, never data-sized."""
    return (
        df.filter(F.col(key).isNotNull())
        .select(F.explode(_addresses(F.col(key), d, w)).alias("a"))
        .groupBy(F.col("a.row").alias("row"), F.col("a.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sketch union = counter addition. Exact: sketch(A) ++ sketch(B)
    == sketch(A union B), row for row (test-pinned)."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key: str, *, d: int = DEPTH, w: int = WIDTH
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: min over the
    d addressed counters. The sketch is <= d*w rows, so the join
    BROADCASTS it — estimation never shuffles the key frame.

    LEFT join + coalesce(cnt, 0): a (row, bucket) address absent from
    the sketch means no added key ever hashed there, so that counter
    is 0 — the min must see the 0, or a never-added probe key (e.g.
    querying one source's sketch with another source's keys) would be
    silently dropped (inner join) or over-estimated (min over only the
    present counters), violating est <= true + ceil(e/w * N). Same
    absent-row handling as bloom_probe's coalesce(False)."""
    addressed = keys.withColumn("a", F.explode(_addresses(F.col(key), d, w)))
    return (
        addressed.join(
            F.broadcast(sketch),
            (F.col("a.row") == sketch.row) & (F.col("a.bucket") == sketch.bucket),
            "left",
        )
        .select(key, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(key)
        .agg(F.min("cnt").alias("cms_est"))
    )


def heavy_hitters_check(
    spark: SparkSession, sf_dir: str, *, top: int = 20
) -> DataFrame:
    """Certification query (staged oracle ``olap_heavy_hitters``):
    exact top-``top`` users by event count, plus ``cms_ok`` = the
    sketch estimate respects both sides of the count-min bound
    (exact <= est <= exact + ceil(e/w * N)). Deterministic for fixed
    input; the oracle recomputes the exact side in DuckDB and asserts
    the flag TRUE — if the sketch ever under-counted or blew its
    error budget, the flag flips and the gate fails."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    sketch = cms_sketch(ev, "user_id")
    est = cms_estimate(sketch, exact, "user_id")
    n_total = ev.count()  # one scalar; reused as a literal in the bound
    slack = int(math.ceil(math.e / WIDTH * n_total))
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "exact_n",
            (
                (F.col("cms_est") >= F.col("exact_n"))
                & (F.col("cms_est") <= F.col("exact_n") + F.lit(slack))
            ).alias("cms_ok"),
        )
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(top)
    )


HEAVY_HITTERS_SQL = """
SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n, TRUE AS cms_ok
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
ORDER BY exact_n DESC, user_id
LIMIT 20
"""
