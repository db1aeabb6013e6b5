"""Property-based checks of the KMV estimator math (hypothesis, pure
Python — no Spark): the driver-side half of dataops/theta.py on
adversarial hash configurations the certification corpus never
produces."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.theta import _pairwise_intersections, _rank

I64 = st.integers(-(2**63), 2**63 - 1)


@settings(max_examples=200, deadline=None)
@given(a=I64, b=I64)
def test_rank_is_monotone_in_signed_order(a, b):
    # non-strict: doubles absorb +-1 near 2^63 (ulp there is 2^11),
    # so adjacent hashes may share a rank — documented in _rank
    if a <= b:
        assert _rank(a) <= _rank(b)


@settings(max_examples=200, deadline=None)
@given(a=I64, b=I64)
def test_rank_separates_hashes_at_sample_spacing(a, b):
    # at realistic sample spacing (>= 2^13 apart) ranks are distinct
    if a + (1 << 13) <= b:
        assert _rank(a) < _rank(b)


@settings(max_examples=200, deadline=None)
@given(h=I64)
def test_rank_lands_in_half_open_unit_interval(h):
    assert 0.0 < _rank(h) <= 1.0


hash_sets = st.sets(I64, min_size=0, max_size=60)


@settings(max_examples=100, deadline=None)
@given(sa=hash_sets, sb=hash_sets, sc=hash_sets)
def test_pairwise_matrix_is_exact_below_k(sa, sb, sc):
    # k above every set size -> theta = 1 everywhere -> the matrix
    # must be the EXACT intersection sizes, for any hash values
    per = {"a": sorted(sa), "b": sorted(sb), "c": sorted(sc)}
    got = _pairwise_intersections(per, k=64)
    assert got[("a", "b")][0] == len(sa & sb)
    assert got[("a", "c")][0] == len(sa & sc)
    assert got[("b", "c")][0] == len(sb & sc)
    assert all(theta == 1.0 for _, theta in got.values())


@settings(max_examples=100, deadline=None)
@given(
    universe=st.sets(I64, min_size=8, max_size=200),
    k=st.integers(4, 32),
)
def test_identical_sketches_estimate_their_own_size(universe, k):
    # A == B: cut at theta, the joint survivors are exactly the
    # retained sample, so est = |retained| / theta >= k-ish but more
    # importantly est must be a non-negative finite number and equal
    # for both orders
    hs = sorted(universe)[:k]
    per = {"a": hs, "b": hs}
    (est, theta) = _pairwise_intersections(per, k)[("a", "b")]
    assert est >= 0.0 and theta > 0.0
    if len(hs) < k:
        assert est == len(hs)  # exact regime


@settings(max_examples=100, deadline=None)
@given(sa=hash_sets, sb=hash_sets)
def test_matrix_is_order_independent(sa, sb):
    per = {"a": sorted(sa), "b": sorted(sb)}
    rev = {"b": sorted(sb), "a": sorted(sa)}
    assert _pairwise_intersections(per, 64) == _pairwise_intersections(rev, 64)
