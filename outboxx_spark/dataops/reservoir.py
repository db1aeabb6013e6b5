"""Deterministic distributed reservoir: a mergeable uniform sample by
bottom-k hash ranks — the quantile/inspection member of the mergeable-
state family (CMS frequency, Bloom membership, HLL cardinality, Theta
sets).

A classic reservoir sample needs a sequential pass (the whole point of
Vitter's algorithm is stream order), which distributes badly and is
nondeterministic under partitioning. The hash formulation keeps the
uniformity and drops the sequence: every row's priority is
xxhash64(id) — a fixed uniform draw per identity — and the sample is
the k smallest priorities. That makes it

- **deterministic & partition-invariant**: same corpus, same sample,
  any cluster size (the property the oracle gate needs);
- **mergeable**: sample(A ∪ B) == re-trim(sample(A) ∪ sample(B)),
  pinned by test — so per-shard samples taken at write time fold into
  a corpus sample without touching the corpus again;
- **uniform over identities**: xxhash64 is a fixed pseudorandom
  function of the id, so any k-subset of distinct ids is equally
  likely under the hash's design. ``id_col`` must be unique per row
  (every table here has one); duplicated ids would tie in priority
  and the trim at the k boundary would split them arbitrarily —
  dedupe first if sampling a multiset by identity.

Scale: sort+limit = TakeOrderedAndProject (per-partition partial
top-k, k-row driver merge), the same shape as the theta sketch —
except here the k rows carry PAYLOAD columns, so k trades against row
width. Everything downstream of the sample is sample-sized.

Certification (staged oracle ``olap_sample_quantiles``): sample
quantiles of events.value. The sample-derived estimate's TRUE rank is
recomputed exactly and relationally (count(value <= est)/n), and the
flag pins |rank - q| <= 5 * sqrt(q(1-q)/k) — the binomial rank-error
band for an order statistic of a uniform k-sample. The exact
percentile columns use the element-at-ceil(q*n) discrete definition,
identical arithmetic on both engines (no interpolation floats near
the hash gate).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from outboxx_spark.sources.tables import read_table

K_SAMPLE = 2048
QS = (0.25, 0.50, 0.75, 0.90)


def uniform_sample(df: DataFrame, id_col: str, k: int = K_SAMPLE) -> DataFrame:
    """The k rows whose xxhash64(id) ranks smallest, all columns kept
    plus the rank column ``_pri`` (callers drop it; merge needs it)."""
    return (
        df.withColumn("_pri", F.xxhash64(F.col(id_col)))
        .orderBy("_pri")
        .limit(k)
    )


def merge_samples(a: DataFrame, b: DataFrame, k: int = K_SAMPLE) -> DataFrame:
    """Fold two per-shard samples (disjoint id spaces, e.g. separate
    shards of one corpus): union, re-trim to the k smallest."""
    return a.unionByName(b).orderBy("_pri").limit(k)


def uniform_sample_by(
    df: DataFrame, group_col: str, id_col: str, k: int = K_SAMPLE
) -> DataFrame:
    """k-per-group samples (stratified inspection): the window-rank
    formulation — one shuffle on the group key, zero driver merge,
    same determinism/merge algebra per stratum."""
    w = Window.partitionBy(group_col).orderBy("_pri")
    return (
        df.withColumn("_pri", F.xxhash64(F.col(id_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int = K_SAMPLE
) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement, the
    deterministic distributed form: each row's key is u^(1/w) with
    u = the id's fixed uniform draw ((xxhash64 + 2^63 + 1) / 2^64)
    and w its weight; the sample is the k LARGEST keys. Inclusion
    probabilities match sequential weighted reservoir sampling
    exactly (E-S 2006, Thm 1 — the max-of-powers order statistic
    argument never uses arrival order), but here the draw is a hash,
    so the sample is reproducible, partition-invariant, and mergeable
    by union + re-trim like the uniform sample. Weights must be > 0;
    the operator fail-stops rather than silently dropping rows.

    The data-mixing use: sample a pretraining mix with per-document
    quality/temperature weights in ONE distributed pass, and fold
    per-shard samples without a second scan. Keys are kept in log
    space (ln u / w): u^(1/w) underflows a double for tiny weights,
    ln u / w never does, and the order is identical.
    """
    u = (
        F.xxhash64(F.col(id_col)).cast("double") + F.lit(_TWO63 + 1.0)
    ) / F.lit(_TWO64)
    guarded = F.when(
        F.col(weight_col) > 0, F.log(u) / F.col(weight_col)
    ).otherwise(F.raise_error(F.lit("weighted_sample: weight must be > 0")))
    return (
        df.withColumn("_logkey", guarded)
        .orderBy(F.col("_logkey").desc())
        .limit(k)
    )


def merge_weighted_samples(a: DataFrame, b: DataFrame, k: int = K_SAMPLE) -> DataFrame:
    """Fold per-shard weighted samples (disjoint id spaces)."""
    return a.unionByName(b).orderBy(F.col("_logkey").desc()).limit(k)


_TWO63 = float(1 << 63)
_TWO64 = float(1 << 64)


def sample_quantiles_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification (staged oracle ``olap_sample_quantiles``): per
    probed q, the exact discrete percentile of events.value as checked
    columns, plus ``rank_ok`` = the SAMPLE's q-th order statistic sits
    within the 5-sigma binomial rank band of q — rank recomputed
    exactly against the full table, never trusted from the sample."""
    k = K_SAMPLE
    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    samp = [
        r["value"]
        for r in uniform_sample(ev.select("event_id", "value"), "event_id", k)
        .orderBy("value")
        .collect()
    ]
    n_samp = len(samp)
    probes = [
        (float(q), float(samp[min(n_samp - 1, math.ceil(q * n_samp) - 1)]))
        for q in QS
    ]
    # exact side: ONE aggregation over the globally ranked frame (the
    # global sort is the certification's deliberate exact-side cost),
    # no probe dimension joined anywhere — the 4 probes are literals
    w = Window.orderBy("value")
    n = ev.count()
    ranked = ev.select("value").withColumn("rn", F.row_number().over(w))
    band = 5.0 / math.sqrt(k)
    aggs = []
    for i, (q, est) in enumerate(probes):
        pos = math.ceil(q * n)
        aggs.append(
            F.max(F.when(F.col("rn") == pos, F.col("value"))).alias(f"_eq{i}")
        )
        aggs.append(
            (
                F.sum(F.when(F.col("value") <= est, 1).otherwise(0))
                / F.lit(float(n))
            ).alias(f"_rk{i}")
        )
    one = ranked.agg(*aggs)
    stacked = ", ".join(
        f"{q}D, _eq{i}, _rk{i}" for i, (q, _) in enumerate(probes)
    )
    return (
        one.selectExpr(
            f"stack({len(probes)}, {stacked}) AS (q_pct, exact_q, _rank)"
        )
        .select(
            "q_pct",
            "exact_q",
            (
                F.abs(F.col("_rank") - F.col("q_pct"))
                <= F.lit(band) * F.sqrt(F.col("q_pct") * (1.0 - F.col("q_pct")))
            ).alias("rank_ok"),
        )
        .orderBy("q_pct")
    )


SAMPLE_QUANTILES_SQL = """
WITH ev AS (
  SELECT value FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT value, row_number() OVER (ORDER BY value) AS rn,
         count(*) OVER () AS n
  FROM ev
)
SELECT CAST(q AS DOUBLE) AS q_pct,
       max(CASE WHEN rn = CAST(ceil(q * n) AS BIGINT) THEN value END) AS exact_q,
       TRUE AS rank_ok
FROM ranked, (SELECT unnest([0.25, 0.50, 0.75, 0.90]) AS q)
GROUP BY q
ORDER BY q
"""
