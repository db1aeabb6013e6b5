"""Relational HyperLogLog: register semantics, merge, accuracy band,
partition/duplication invariance (dataops/hll.py)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest
from pyspark.sql import functions as F

from outboxx_spark.dataops.hll import (
    M_REGS,
    P_BITS_BY,
    hll_estimate,
    hll_estimate_by,
    hll_merge,
    hll_sketch,
    hll_sketch_by,
)


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def _regs(sketch):
    return {(r["bucket"], r["max_rho"]) for r in sketch.collect()}


def test_estimate_within_five_sigma(spark):
    for n in (300, 5000, 60000):
        est = hll_estimate(hll_sketch(_keys(spark, range(n)), "k"))
        assert abs(est - n) <= 5 * 1.04 / math.sqrt(M_REGS) * n, (n, est)


def test_duplicates_do_not_move_the_registers(spark):
    once = hll_sketch(_keys(spark, list(range(2000))), "k")
    thrice = hll_sketch(_keys(spark, list(range(2000)) * 3), "k")
    assert _regs(once) == _regs(thrice)


def test_merge_equals_sketch_of_union(spark):
    a, b = list(range(3000)), list(range(2000, 7000))
    merged = hll_merge(
        hll_sketch(_keys(spark, a), "k"), hll_sketch(_keys(spark, b), "k")
    )
    whole = hll_sketch(_keys(spark, sorted(set(a) | set(b))), "k")
    assert _regs(merged) == _regs(whole)


def test_sketch_is_partition_invariant(spark):
    keys = _keys(spark, range(4000))
    assert _regs(hll_sketch(keys.repartition(1), "k")) == _regs(
        hll_sketch(keys.repartition(17), "k")
    )


def test_register_count_is_bounded(spark):
    sketch = hll_sketch(_keys(spark, range(100000)), "k")
    assert sketch.count() <= M_REGS


# -- per-group variant with the relational estimator ----------------


def _grouped(spark, sizes):
    """groups g0..gN with disjoint key ranges of the given sizes."""
    rows, base = [], 0
    for i, n in enumerate(sizes):
        rows += [(f"g{i}", base + j) for j in range(n)]
        base += n
    return spark.createDataFrame(rows, "g string, k long")


def test_grouped_estimate_within_five_sigma_both_paths(spark):
    # m = 256: n=100 takes the small-range branch, n=5000 the raw one
    sizes = [100, 5000, 900]
    est = {
        r["group"]: r["est"]
        for r in hll_estimate_by(
            hll_sketch_by(_grouped(spark, sizes), "g", "k")
        ).collect()
    }
    sigma = 1.04 / math.sqrt(1 << P_BITS_BY)
    for i, n in enumerate(sizes):
        assert abs(est[f"g{i}"] - n) <= 5 * sigma * n, (i, n, est[f"g{i}"])


def test_relational_estimator_matches_scalar_path(spark):
    # one group: the JVM-side formula must equal hll_estimate on the
    # identical registers
    keys = _keys(spark, range(3000))
    rel = hll_estimate_by(
        hll_sketch_by(keys.withColumn("g", F.lit("x")), "g", "k")
    ).collect()[0]["est"]
    scalar = hll_estimate(hll_sketch(keys, "k", p=P_BITS_BY), p=P_BITS_BY)
    assert rel == pytest.approx(scalar, rel=1e-12)


def test_grouped_merge_equals_sketch_of_union(spark):
    a = _grouped(spark, [400, 700])
    b = _grouped(spark, [900, 200])  # overlapping key ranges per group
    merged = (
        hll_sketch_by(a, "g", "k")
        .unionByName(hll_sketch_by(b, "g", "k"))
        .groupBy("group", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = hll_sketch_by(a.unionByName(b), "g", "k")
    key = lambda df: {
        (r["group"], r["bucket"], r["max_rho"]) for r in df.collect()
    }
    assert key(merged) == key(whole)
