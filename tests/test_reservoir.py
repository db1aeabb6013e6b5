"""Deterministic mergeable uniform sample (dataops/reservoir.py):
partition invariance, merge == sample-of-union, payload integrity,
and the rank-band guarantee of sample quantiles."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.reservoir import (
    K_SAMPLE,
    merge_samples,
    uniform_sample,
)


def _rows(spark, ids):
    return spark.createDataFrame(
        [(int(i), float(i) * 1.5) for i in ids], "id long, payload double"
    )


def _ids(sample):
    return sorted(r["id"] for r in sample.collect())


def test_sample_is_partition_invariant(spark):
    df = _rows(spark, range(50000))
    assert _ids(uniform_sample(df.repartition(1), "id")) == _ids(
        uniform_sample(df.repartition(23), "id")
    )


def test_sample_below_k_keeps_everything(spark):
    assert _ids(uniform_sample(_rows(spark, range(700)), "id")) == list(
        range(700)
    )


def test_merge_equals_sample_of_union(spark):
    a, b = _rows(spark, range(30000)), _rows(spark, range(30000, 60000))
    merged = merge_samples(
        uniform_sample(a, "id"), uniform_sample(b, "id")
    )
    whole = uniform_sample(a.unionByName(b), "id")
    assert _ids(merged) == _ids(whole)


def test_payload_rides_with_the_sample(spark):
    got = {
        r["id"]: r["payload"]
        for r in uniform_sample(_rows(spark, range(20000)), "id").collect()
    }
    assert len(got) == K_SAMPLE
    assert all(v == i * 1.5 for i, v in got.items())


def test_sample_quantiles_within_rank_band(spark):
    # ids 0..N-1 with payload == id: the true rank of any value x is
    # (x+1)/N, so the sample's order statistics are directly checkable
    n = 60000
    df = _rows(spark, range(n))
    vals = sorted(
        r["payload"] for r in uniform_sample(df, "id").collect()
    )
    band = 5.0 / math.sqrt(K_SAMPLE)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        est = vals[min(len(vals) - 1, math.ceil(q * len(vals)) - 1)]
        true_rank = (est / 1.5 + 1) / n
        assert abs(true_rank - q) <= band * math.sqrt(q * (1 - q)), (
            q,
            true_rank,
        )
