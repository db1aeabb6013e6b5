"""Relational HyperLogLog: register semantics, merge, accuracy band,
partition/duplication invariance (dataops/hll.py)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.hll import M_REGS, hll_estimate, hll_merge, hll_sketch


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
