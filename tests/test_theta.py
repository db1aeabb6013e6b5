"""Relational Theta/KMV sketch: exact-below-k regime, accuracy bands,
merge == sketch-of-union, intersection estimation, partition and
duplication invariance (dataops/theta.py)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.theta import (
    K_DEFAULT,
    _pairwise_intersections,
    theta_estimate,
    theta_intersect_estimate,
    theta_sketch,
    theta_sketch_by,
    theta_union,
)


def _keys(spark, keys):
    return spark.createDataFrame([(str(k),) for k in keys], "k string")


def _hashes(sketch):
    return sorted(r["h"] for r in sketch.collect())


def test_exact_below_k(spark):
    est = theta_estimate(theta_sketch(_keys(spark, range(500)), "k"))
    assert est == 500.0


def test_estimate_within_five_sigma(spark):
    sigma = 1.0 / math.sqrt(K_DEFAULT - 2)
    for n in (5000, 60000):
        est = theta_estimate(theta_sketch(_keys(spark, range(n)), "k"))
        assert abs(est - n) <= 5 * sigma * n, (n, est)


def test_duplicates_do_not_move_the_sketch(spark):
    once = theta_sketch(_keys(spark, list(range(6000))), "k")
    thrice = theta_sketch(_keys(spark, list(range(6000)) * 3), "k")
    assert _hashes(once) == _hashes(thrice)


def test_sketch_is_partition_invariant(spark):
    keys = _keys(spark, range(6000))
    assert _hashes(theta_sketch(keys.repartition(1), "k")) == _hashes(
        theta_sketch(keys.repartition(17), "k")
    )


def test_union_equals_sketch_of_union(spark):
    a, b = list(range(6000)), list(range(4000, 10000))
    merged = theta_union(
        theta_sketch(_keys(spark, a), "k"), theta_sketch(_keys(spark, b), "k")
    )
    whole = theta_sketch(_keys(spark, sorted(set(a) | set(b))), "k")
    assert _hashes(merged) == _hashes(whole)


def test_sketch_size_is_bounded(spark):
    assert theta_sketch(_keys(spark, range(50000)), "k").count() == K_DEFAULT


def test_intersection_estimate(spark):
    # |A| = |B| = 8000, |A ∩ B| = 4000: sketching regime on both sides.
    a = theta_sketch(_keys(spark, range(8000)), "k")
    b = theta_sketch(_keys(spark, range(4000, 12000)), "k")
    est = theta_intersect_estimate(a, b)
    # theta ≈ k/8000; rel sigma ≈ sqrt((1-θ)/(4000 θ)) ≈ 2.9%
    theta_cut = K_DEFAULT / 8000
    sigma = math.sqrt((1 - theta_cut) / (4000 * theta_cut))
    assert abs(est - 4000) <= 5 * sigma * 4000, est


def test_intersection_exact_when_both_below_k(spark):
    a = theta_sketch(_keys(spark, range(1000)), "k")
    b = theta_sketch(_keys(spark, range(600, 1600)), "k")
    assert theta_intersect_estimate(a, b) == 400.0


def test_grouped_sketch_equals_global_sketch_per_group(spark):
    rows = [(f"g{i % 3}", str(k)) for i, k in enumerate(range(9000))]
    df = spark.createDataFrame(rows, "g string, k string")
    grouped = theta_sketch_by(df, "g", "k")
    per = {}
    for r in grouped.collect():
        per.setdefault(r["group"], []).append(r["h"])
    for g in ("g0", "g1", "g2"):
        want = _hashes(theta_sketch(df.filter(df.g == g), "k"))
        assert sorted(per[g]) == want, g


def test_pairwise_matrix_exact_below_k(spark):
    rows = (
        [("a", str(k)) for k in range(1000)]
        + [("b", str(k)) for k in range(700, 1700)]
        + [("c", str(k)) for k in range(5000, 6000)]
    )
    df = spark.createDataFrame(rows, "g string, k string")
    per = {}
    for r in theta_sketch_by(df, "g", "k").collect():
        per.setdefault(r["group"], []).append(r["h"])
    for hs in per.values():
        hs.sort()
    got = {
        pair: est
        for pair, (est, _) in _pairwise_intersections(per, K_DEFAULT).items()
    }
    assert got == {("a", "b"): 300.0, ("a", "c"): 0.0, ("b", "c"): 0.0}


def test_disjoint_sets_intersect_to_near_zero(spark):
    a = theta_sketch(_keys(spark, range(8000)), "k")
    b = theta_sketch(_keys(spark, range(100000, 108000)), "k")
    est = theta_intersect_estimate(a, b)
    # binomial(0-mean) fluctuation only: a handful of collisions at most
    assert est <= 5 / (K_DEFAULT / 8000)


def test_disjoint_corpus_inter_ok_true_not_null(spark, tmp_path):
    # r10 advice regression: exact_inter = 0 with theta < 1 made the
    # relative sigma divide by zero — Spark yielded NULL inter_ok
    # while the DuckDB oracle emits TRUE (a gate false-fail on any
    # corpus whose even/odd shingle sets are disjoint). The guard
    # bounds the ESTIMATE absolutely (5*sqrt((1-theta)/theta)) in the
    # zero-intersection case; disjoint sides above k segs each (so
    # theta < 1 on both) must produce a True — not None — flag.
    import pandas as pd

    from outboxx_spark.dataops.theta import theta_sketch_check

    segs = K_DEFAULT + 300  # > k distinct trigrams per side
    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                " ".join(f"even{i}" for i in range(3 * segs)),
                " ".join(f"odd{i}" for i in range(3 * segs)),
            ],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    row = theta_sketch_check(spark, str(tmp_path)).collect()[0]
    assert row["exact_inter"] == 0
    assert row["inter_ok"] is True
