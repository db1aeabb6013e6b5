"""Relational Bloom filter: no false negatives, merge == build-of-
union, FP behavior, and partition invariance (dataops/bloom.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from outboxx_spark.dataops.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
    expected_fp_rate,
)


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def _bits(bloom):
    return {(r["word"], r["bits"]) for r in bloom.collect()}


def test_added_keys_always_probe_true(spark):
    added = list(range(0, 400, 3))
    bloom = bloom_build(_keys(spark, added), "k")
    probed = bloom_probe(bloom, _keys(spark, added), "k")
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_merge_equals_build_of_union(spark):
    a, b = list(range(100)), list(range(80, 250))
    merged = bloom_merge(
        bloom_build(_keys(spark, a), "k"), bloom_build(_keys(spark, b), "k")
    )
    whole = bloom_build(_keys(spark, sorted(set(a) | set(b))), "k")
    assert _bits(merged) == _bits(whole)


def test_fp_rate_is_near_the_analytic_expectation(spark):
    added = list(range(2000))
    absent = list(range(100000, 104000))
    bloom = bloom_build(_keys(spark, added), "k")
    fp = (
        bloom_probe(bloom, _keys(spark, absent), "k")
        .filter(F.col("might_contain"))
        .count()
    )
    expect = expected_fp_rate(len(added))
    # one fixed draw, not an average: allow a generous band, but the
    # bound must still catch an addressing bug (which reads ~100% FP)
    assert fp / len(absent) <= 3 * expect + 0.01
    assert expect > 0  # the test is non-vacuous: the filter is loaded


def test_build_is_partition_invariant(spark):
    keys = list(range(1000))
    one = bloom_build(_keys(spark, keys).repartition(1), "k")
    many = bloom_build(_keys(spark, keys).repartition(13), "k")
    assert _bits(one) == _bits(many)


def test_empty_filter_rejects_everything(spark):
    empty = bloom_build(_keys(spark, [1]).filter(F.col("k") < 0), "k")
    probed = bloom_probe(empty, _keys(spark, [1, 2, 3]), "k")
    assert probed.filter(F.col("might_contain")).count() == 0
