"""Relational Bloom filter: set membership as a mergeable DataFrame.

The pipeline handoff this serves: stage A has seen a huge key set
(crawled URLs, ingested doc fingerprints, trained-on example ids) and
stage B needs "seen before?" without shipping or joining the full set.
Spark's builtin Bloom support is either an opaque driver-side blob
(``DataFrame.stat.bloomFilter`` — collected to the driver, not
composable) or an optimizer-internal runtime filter; this one follows
`dataops/cms.py`'s design instead: the filter IS a tiny DataFrame
(``word`` int, ``bits`` long — m/64 rows), so it is

- **mergeable** with a groupBy-BIT_OR (pinned equal to building over
  the union — the distributed build is just that merge over partial
  builds, map-side combined);
- **point-queryable** with a broadcast join (the probe side computes
  its k addresses, joins the word rows, and ANDs the bit tests);
- **storable** as plain parquet next to the data it summarizes.

Guarantees (the Bloom contract): a key that was added ALWAYS probes
true (no false negatives — structural: its k bits were OR-ed in and
bits are never cleared); a key that was not added probes true with
probability ~(1 - e^(-k*n/m))^k. The certification query pins both:
zero false negatives, and the observed false-positive rate within 3x
of the analytic expectation (slack for the corpus being one fixed
draw, not an average over corpora).

Addressing: bit i of key = xxhash64(key, i) mod m; word = bit >> 6,
mask = 1 << (bit & 63). All JVM expressions — the k-way explode
collapses in the map-side combine, so the shuffle carries filter-sized
state (m/64 rows), never data-sized.

At 100 TB: m scales with the key cardinality (1% FP at n=1e10 needs
m ~ 1.2e11 bits = 1.9e9 words * 8 B ~ 15 GB — too big for one
broadcast, but the RELATIONAL form shards naturally: partition both
sides by word and the probe join is co-located; or keep per-source
filters small and merge lazily). The testbed sizes stay
broadcast-friendly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.sources.tables import read_table

M_BITS = 1 << 16  # testbed default: 64 Kbit = 1024 words
K_HASHES = 5


def _addressed(df: DataFrame, key_col: str, k: int, m_bits: int) -> DataFrame:
    """One row per (key, hash_i) with its (word, mask) address: bit_i =
    xxhash64(key, i) mod m; word = bit >> 6; mask = 1 << (bit & 63)."""
    with_h = df.select(
        key_col, F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("_h")
    )
    bit = F.pmod(F.xxhash64(F.col(key_col), F.col("_h")), F.lit(m_bits))
    # shiftleft's shift amount must be a literal in the Python API, so
    # the column-shift goes through expr over the named _bit column
    return with_h.withColumn("_bit", bit).select(
        key_col,
        (F.col("_bit") / 64).cast("int").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit % 64 AS INT))").alias("mask"),
    )


def bloom_build(df: DataFrame, key_col: str, k: int = K_HASHES, m_bits: int = M_BITS) -> DataFrame:
    """(word, bits): BIT_OR of every added key's k masks. m/64 rows."""
    return (
        _addressed(df, key_col, k, m_bits)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union of the underlying sets == BIT_OR of the word rows."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, key_col: str, k: int = K_HASHES, m_bits: int = M_BITS
) -> DataFrame:
    """(key, might_contain): TRUE iff all k addressed bits are set.
    The filter side broadcasts (m/64 rows at testbed sizes)."""
    addressed = _addressed(probes, key_col, k, m_bits)
    hit = addressed.join(F.broadcast(bloom), "word", "left").select(
        key_col,
        F.coalesce(
            (F.col("bits").bitwiseAND(F.col("mask")) != 0), F.lit(False)
        ).alias("_bit_set"),
    )
    return hit.groupBy(key_col).agg(F.min("_bit_set").alias("might_contain"))


def expected_fp_rate(n: int, k: int = K_HASHES, m_bits: int = M_BITS) -> float:
    return (1.0 - math.exp(-k * n / m_bits)) ** k


def bloom_filter_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification query (staged oracle ``docs_bloom_filter``): build
    over the doc_ids with doc_id % 2 == 0, probe with EVERY doc_id.
    Emits the exact seen/unseen counts (the oracle recomputes them in
    DuckDB) plus ``bloom_ok`` = zero false negatives AND observed FP
    rate <= 3x the analytic expectation. Deterministic for fixed
    input (xxhash64 addressing), so the flag is stable — it flips only
    if the filter loses a bit (impossible by construction) or the
    addressing degrades."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    bloom = bloom_build(seen, "doc_id")
    probed = bloom_probe(bloom, docs, "doc_id").withColumn(
        "_seen", F.col("doc_id") % 2 == 0
    )
    # scalars sizing the analytic FP bound: expected FPs are Poisson-ish
    # with mean mu = p_fp * n_unseen; at testbed sizes mu is <1, so a
    # pure multiplicative band fails on ordinary sampling luck (observed
    # 2 vs mu 0.39 at sf0.1 — P~6%). Bound at 3*mu + 5: tail probability
    # ~1e-6 for the honest filter, while an addressing bug reads ~100%
    # FP and overshoots by orders of magnitude.
    n_seen = seen.count()
    n_unseen = docs.count() - n_seen
    fp_budget = 3.0 * expected_fp_rate(n_seen) * n_unseen + 5.0
    return probed.agg(
        F.count(F.when(F.col("_seen"), 1)).alias("n_seen"),
        F.count(F.when(~F.col("_seen"), 1)).alias("n_unseen"),
        (
            (F.count(F.when(F.col("_seen") & ~F.col("might_contain"), 1)) == 0)
            & (
                F.count(F.when(~F.col("_seen") & F.col("might_contain"), 1))
                <= F.lit(fp_budget)
            )
        ).alias("bloom_ok"),
    )


BLOOM_FILTER_SQL = """
SELECT CAST(count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_seen,
       CAST(count(CASE WHEN doc_id % 2 <> 0 THEN 1 END) AS BIGINT) AS n_unseen,
       TRUE AS bloom_ok
FROM documents
"""
