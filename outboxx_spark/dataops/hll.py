"""Relational HyperLogLog: distinct-count state as a mergeable
DataFrame — completing the sketch family next to `cms.py` (frequency)
and `bloom.py` (membership).

Spark's builtin `approx_count_distinct` IS HyperLogLog++, but its
state is an opaque aggregation buffer: it cannot be stored as a table,
merged across independently-built corpora, or inspected. This one
keeps the registers relationally — (bucket, max_rho), at most m rows —
so per-source cardinality state can live as parquet next to the data
and union-merge with a groupBy-max (the HLL merge is register-wise
max, which is exactly what makes it mergeable in SQL at all).

Register math, all JVM expressions:
- bucket = xxhash64(key) & (m-1)  (p low bits);
- the remaining bits v = shiftrightunsigned(hash, p); rho = trailing-
  zero count of v plus 1, computed EXACTLY: v & -v isolates the lowest
  set bit as a power of two (exact in double), and round(log2(.))
  recovers its index — `floor(log(x)/log(2))` would be off-by-one on
  ~1e-16 rounding, `round` is safe because the true value is integral;
- v == 0 (probability 2^-(64-p)) saturates at rho = 64 - p + 1.

Estimation (Flajolet et al. 2007, with the small-range correction):
E = alpha_m * m^2 / (sum over ALL m registers of 2^-M_j), absent
registers contributing 2^0; if E <= 2.5m and empty registers exist,
E = m * ln(m / V). Driver-side over at most m rows — the collect is
register-sized, never data-sized.

The certification query (staged oracle ``olap_hll_relational``) pins
|est - exact| within 5 standard errors (sigma = 1.04/sqrt(m)) — the
same hard-signal band the builtin-HLL check uses; deterministic for
fixed input, so the flag is stable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.sources.tables import read_table

P_BITS = 12  # m = 4096 registers: sigma ~ 1.6%
M_REGS = 1 << P_BITS


def hll_sketch(df: DataFrame, key_col: str, p: int = P_BITS) -> DataFrame:
    """(bucket, max_rho): at most 2^p rows, one scan, map-side combined."""
    m = 1 << p
    w = 64 - p
    h = F.xxhash64(F.col(key_col))
    bucket = F.pmod(h, F.lit(m))  # low bits via mod (m is a power of two)
    v = F.expr(f"shiftrightunsigned(xxhash64({key_col}), {p})")
    lowbit = v.bitwiseAND(-v)
    rho = F.when(v == 0, F.lit(w + 1)).otherwise(
        (F.round(F.log2(lowbit.cast("double"))) + 1).cast("int")
    )
    return (
        df.select(bucket.cast("int").alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union of the underlying sets == register-wise max."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_estimate(sketch: DataFrame, p: int = P_BITS) -> float:
    """The Flajolet estimator over the (at most m-row) register frame.
    Register-sized driver work by construction."""
    m = 1 << p
    rows = sketch.collect()
    denom = sum(2.0 ** -r["max_rho"] for r in rows) + (m - len(rows))  # empty: 2^0
    raw = _alpha(m) * m * m / denom
    empties = m - len(rows)
    if raw <= 2.5 * m and empties > 0:
        return m * math.log(m / empties)
    return raw


P_BITS_BY = 8  # per-group registers: m = 256, sigma ~ 6.5%


def hll_sketch_by(
    df: DataFrame, group_col: str, key_col: str, p: int = P_BITS_BY
) -> DataFrame:
    """(group, bucket, max_rho): one register frame PER GROUP — at most
    2^p rows per group, map-side combined. Merging two corpora's
    grouped sketches is the same groupBy(group, bucket).max."""
    m = 1 << p
    w = 64 - p
    h = F.xxhash64(F.col(key_col))
    bucket = F.pmod(h, F.lit(m))
    v = F.expr(f"shiftrightunsigned(xxhash64({key_col}), {p})")
    lowbit = v.bitwiseAND(-v)
    rho = F.when(v == 0, F.lit(w + 1)).otherwise(
        (F.round(F.log2(lowbit.cast("double"))) + 1).cast("int")
    )
    return (
        df.select(
            F.col(group_col).alias("group"),
            bucket.cast("int").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("group", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_by(sketch: DataFrame, p: int = P_BITS_BY) -> DataFrame:
    """(group, est): the Flajolet estimator evaluated RELATIONALLY —
    one groupBy over the register frame, every arithmetic step a JVM
    expression. No collect anywhere: per-source cardinality over a
    million sources is one aggregation, where the global sketch's
    driver-side estimate would serialize. Small-range correction
    branches per group exactly like the scalar path."""
    m = 1 << p
    alpha = _alpha(m)
    agg = sketch.groupBy("group").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_s"),
        F.count(F.lit(1)).alias("_nz"),
    )
    empties = F.lit(m) - F.col("_nz")
    raw = F.lit(alpha * m * m) / (F.col("_s") + empties)  # absent: 2^0
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / empties)
    return agg.select(
        "group",
        F.when((raw <= 2.5 * m) & (empties > 0), small)
        .otherwise(raw)
        .alias("est"),
    )


def hll_by_group_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification (staged oracle ``olap_hll_by_group``): per
    event_type exact distinct user_id count plus ``hll_ok`` = the
    fully-relational grouped estimate within 5 sigma. One query, two
    plans joined on the group key — the estimate column never leaves
    the JVM."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    est = hll_estimate_by(hll_sketch_by(ev, "event_type", "user_id"))
    band = 5.0 * 1.04 / math.sqrt(1 << P_BITS_BY)
    exact = ev.groupBy(F.col("event_type").alias("group")).agg(
        F.count_distinct("user_id").cast("long").alias("exact_users")
    )
    return (
        exact.join(est, "group")
        .select(
            F.col("group").alias("event_type"),
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= F.lit(band) * F.col("exact_users")
            ).alias("hll_ok"),
        )
    )


HLL_BY_GROUP_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_ok
FROM events
WHERE user_id IS NOT NULL
GROUP BY event_type
"""


def hll_relational_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification (staged oracle ``olap_hll_relational``): exact
    distinct user_id count plus ``hll_ok`` = the relational-register
    estimate within 5 sigma of it. The estimate folds in as a literal:
    it is a deterministic function of the same input the exact side
    scans, and the flag — not the float — is the checked signal."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    est = hll_estimate(hll_sketch(ev, "user_id"))
    band = 5.0 * 1.04 / math.sqrt(M_REGS)
    return ev.agg(
        F.count_distinct("user_id").cast("long").alias("exact_users")
    ).select(
        "exact_users",
        (
            F.abs(F.lit(est) - F.col("exact_users"))
            <= F.lit(band) * F.col("exact_users")
        ).alias("hll_ok"),
    )


HLL_RELATIONAL_SQL = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, TRUE AS hll_ok
FROM events
WHERE user_id IS NOT NULL
"""
