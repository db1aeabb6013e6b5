"""Count-min sketch: merge exactness, the one-sided guarantee, and
partition invariance (dataops/cms.py)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.cms import (
    cms_estimate,
    cms_merge,
    cms_sketch,
    heavy_hitters_check,
)


def _frame(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def _as_dict(sketch):
    return {(r["row"], r["bucket"]): r["cnt"] for r in sketch.collect()}


def test_merge_equals_sketch_of_union(spark):
    a = _frame(spark, [1, 2, 2, 3] * 10)
    b = _frame(spark, [2, 3, 3, 9] * 7)
    merged = _as_dict(cms_merge(cms_sketch(a, "k", w=64), cms_sketch(b, "k", w=64)))
    whole = _as_dict(cms_sketch(a.unionByName(b), "k", w=64))
    assert merged == whole


def test_estimate_never_undercounts_and_is_exact_without_collisions(spark):
    import collections

    keys = [i % 7 for i in range(210)]  # 7 distinct keys, heavy repeats
    truth = collections.Counter(keys)
    df = _frame(spark, keys)
    # w >> distinct keys: collisions are possible but the LOWER bound
    # est >= exact must hold for every key unconditionally
    sk = cms_sketch(df, "k", w=1024)
    est = {
        r["k"]: r["cms_est"]
        for r in cms_estimate(sk, df.select("k").distinct(), "k", w=1024).collect()
    }
    assert set(est) == set(truth)
    for k, t in truth.items():
        assert est[k] >= t, (k, est[k], t)
        assert est[k] <= t + len(keys), "insane overcount"


def test_never_added_keys_estimate_zero_not_dropped(spark):
    # ADVICE r9 (medium): probing a sketch with keys that were never
    # added (e.g. another source's keys) must return est=0 for keys
    # whose addresses are all absent, and must never exceed the CMS
    # bound by min-ing over only the PRESENT counters. With w=8 and
    # heavy keys, a foreign key usually hits some-but-not-all addressed
    # counters — the inner-join bug returned the min over the hits.
    added = _frame(spark, [1, 2, 3] * 50)
    sk = cms_sketch(added, "k", w=8)
    foreign = _frame(spark, list(range(100, 140)))
    est = {
        r["k"]: r["cms_est"]
        for r in cms_estimate(sk, foreign, "k", w=8).collect()
    }
    # every probe key comes back (nothing silently dropped) ...
    assert set(est) == set(range(100, 140))
    # ... and with w=8 and only 8*4 counters holding 150 adds, at least
    # one of 40 foreign keys has an all-absent or partly-absent address
    # set; the min over coalesced-0 counters must floor at 0 and NEVER
    # exceed the dominating counter mass
    assert all(0 <= v <= 150 for v in est.values()), est
    # a tiny sketch of ONE key: any foreign key missing at least one of
    # its d addresses must estimate exactly 0
    one = cms_sketch(_frame(spark, [7]), "k", w=2048)
    zero_est = {
        r["k"]: r["cms_est"]
        for r in cms_estimate(one, _frame(spark, [9999]), "k", w=2048).collect()
    }
    assert zero_est == {9999: 0}


def test_sketch_is_partition_invariant(spark):
    df = _frame(spark, [i % 13 for i in range(400)])
    one = _as_dict(cms_sketch(df.coalesce(1), "k", w=128))
    many = _as_dict(cms_sketch(df.repartition(17), "k", w=128))
    assert one == many


def test_null_keys_excluded(spark):
    df = spark.createDataFrame([(1,), (None,), (1,), (None,)], "k long")
    sk = cms_sketch(df, "k", w=32)
    # total mass per sketch row == number of NON-NULL inputs
    per_row = {
        r["row"]: r["s"]
        for r in sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    }
    assert all(v == 2 for v in per_row.values()), per_row


def test_heavy_hitters_certification_flag_holds(spark, sf_dir):
    rows = heavy_hitters_check(spark, sf_dir).collect()
    assert rows, "no heavy hitters returned"
    assert all(r["cms_ok"] for r in rows)
    # deterministic ordering: exact_n desc then user_id
    pairs = [(r["exact_n"], r["user_id"]) for r in rows]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
