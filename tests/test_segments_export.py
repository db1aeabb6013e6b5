"""Segment-level boilerplate removal, deterministic shard export, and
the binned range join (r9 additions).

LLM-pipeline operators beyond the reference's CDC surface (the build
brief's training-data mandate): contracts are pinned against plain
Python single-node models — the exact formulation the distributed plan
must reproduce bit-for-bit — plus plan-shape pins for the properties
that matter at 100 TB (broadcast strip join, no nested-loop join).
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.segments import boilerplate_segments, strip_boilerplate
from outboxx_spark.dataops.sharding import _KNUTH, _MOD, assign_shards
from outboxx_spark.operators.rangejoin import interval_join, range_join


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# segments: boilerplate strip
# ---------------------------------------------------------------------------


def _py_segments(text, seg_len):
    toks = text.split(" ")
    return [
        " ".join(toks[s : s + seg_len]) for s in range(0, max(len(toks), 1), seg_len)
    ]


def _py_strip(texts, seg_len, min_docs):
    freq = {}
    for i, t in enumerate(texts):
        for seg in set(_py_segments(t, seg_len)):
            freq[seg] = freq.get(seg, 0) + 1
    boiler = {s for s, n in freq.items() if n >= min_docs}
    out = {}
    for i, t in enumerate(texts):
        segs = _py_segments(t, seg_len)
        kept = [s for s in segs if s not in boiler]
        out[i] = (
            len(segs),
            sum(1 for s in segs if s in boiler),
            " ".join(kept),
        )
    return out


BOILER_TEXTS = [
    "cookie banner text alpha beta gamma",
    "cookie banner text delta epsilon",
    "unique words only here nothing shared",
    "cookie banner text",  # document that is 100% boilerplate
    "",
]


def test_strip_matches_python_model(spark):
    rows = strip_boilerplate(_docs(spark, BOILER_TEXTS), seg_len=3, min_docs=2).collect()
    got = {r["doc_id"]: (r["n_segments"], r["n_boiler"], r["clean_text"]) for r in rows}
    assert got == _py_strip(BOILER_TEXTS, 3, 2)


def test_all_boiler_document_survives_as_empty(spark):
    rows = strip_boilerplate(_docs(spark, BOILER_TEXTS), seg_len=3, min_docs=2).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert set(by_id) == set(range(len(BOILER_TEXTS)))  # no doc vanishes
    assert by_id[3]["clean_text"] == ""
    assert by_id[3]["n_boiler"] == by_id[3]["n_segments"] == 1


def test_boiler_counts_distinct_docs_not_occurrences(spark):
    # 'x' appears twice in ONE doc: occurrence count 2, doc count 1 —
    # must NOT reach min_docs=2
    rows = boilerplate_segments(
        _docs(spark, ["x y x", "a b c"]), seg_len=1, min_docs=2
    ).collect()
    assert rows == []


def test_strip_rejects_bad_min_docs(spark):
    with pytest.raises(ValueError, match="min_docs"):
        boilerplate_segments(_docs(spark, ["a"]), seg_len=1, min_docs=0)


def test_strip_join_is_broadcast(spark):
    plan = strip_boilerplate(
        _docs(spark, BOILER_TEXTS), seg_len=3, min_docs=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# sharding: deterministic weighted shard assignment
# ---------------------------------------------------------------------------


def _py_shards(weights, target):
    """Single-node model: Knuth pseudo-shuffle order, running offset."""
    order = sorted(weights, key=lambda d: ((d * _KNUTH) % _MOD, d))
    off, out = 0, {}
    for d in order:
        out[d] = off // target
        off += weights[d]
    return out


def _weighted(spark, weights):
    df = spark.createDataFrame(
        [(d, "w " * (w - 1) + "w") for d, w in weights.items()],
        "doc_id long, text string",
    )
    return assign_shards(df, F.size(F.split("text", " ")), target=10)


@pytest.mark.parametrize("n_buckets", [1, 7, 1024])
def test_shards_match_single_node_cumsum(spark, n_buckets):
    rng = random.Random(9)
    weights = {d: rng.randint(1, 25) for d in range(200)}
    df = spark.createDataFrame(list(weights.items()), "doc_id long, w long")
    got = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(
            df, F.col("w"), target=40, n_buckets=n_buckets
        ).collect()
    }
    assert got == _py_shards(weights, 40)


@pytest.mark.slow
def test_shards_invariant_to_input_partitioning(spark):
    weights = {d: (d % 13) + 1 for d in range(300)}
    df = spark.createDataFrame(list(weights.items()), "doc_id long, w long")
    one = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(df.coalesce(1), F.col("w"), target=50).collect()
    }
    many = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(df.repartition(17), F.col("w"), target=50).collect()
    }
    assert one == many == _py_shards(weights, 50)


def test_shard_size_balance_bound(spark):
    # start-offset assignment: a straddling document is charged to the
    # shard it STARTS in, so a non-final shard holds at least
    # target - (w_max - 1) and at most target + (w_max - 1) weight
    rng = random.Random(11)
    weights = {d: rng.randint(1, 9) for d in range(400)}
    df = spark.createDataFrame(list(weights.items()), "doc_id long, w long")
    rows = assign_shards(df, F.col("w"), target=100).collect()
    sums = {}
    for r in rows:
        sums[r["shard"]] = sums.get(r["shard"], 0) + r["n_tokens"]
    last = max(sums)
    assert set(sums) == set(range(last + 1))  # contiguous shard ids
    for k, s in sums.items():
        if k != last:
            assert 100 - 8 <= s <= 100 + 8, (k, s)


def test_shards_reject_bad_params(spark):
    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="target"):
        assign_shards(df, F.lit(1), target=0)


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------


def _pts(spark, ts_list):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts_list)], "pid long, pts long"
    )


def _ivs(spark, spans):
    return spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(spans)], "iid long, s long, e long"
    )


def _py_range_join(ts_list, spans, how):
    out = []
    for pid, t in enumerate(ts_list):
        hits = [iid for iid, (s, e) in enumerate(spans) if s <= t <= e]
        if hits:
            out.extend((pid, iid) for iid in hits)
        elif how == "left":
            out.append((pid, None))
    return sorted(out, key=lambda x: (x[0], -1 if x[1] is None else x[1]))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_range_join_matches_naive(spark, how):
    rng = random.Random(7)
    ts_list = [rng.randint(0, 500) for _ in range(120)]
    spans = []
    for _ in range(30):
        s = rng.randint(0, 480)
        spans.append((s, s + rng.randint(0, 60)))
    got = sorted(
        (
            (r["pid"], r["iid"])
            for r in range_join(
                _pts(spark, ts_list), _ivs(spark, spans), "pts", "s", "e", bucket=17, how=how
            ).collect()
        ),
        key=lambda x: (x[0], -1 if x[1] is None else x[1]),
    )
    assert got == _py_range_join(ts_list, spans, how)


def test_range_join_multibucket_interval_matches_once(spark):
    # interval spans many buckets; each contained point matches exactly
    # once despite the interval-side explode
    rows = range_join(
        _pts(spark, [0, 5, 99, 100]),
        _ivs(spark, [(0, 99)]),
        "pts",
        "s",
        "e",
        bucket=10,
    ).collect()
    assert sorted(r["pid"] for r in rows) == [0, 1, 2]


def test_range_join_bounds_inclusive(spark):
    rows = range_join(
        _pts(spark, [9, 10, 20, 21]),
        _ivs(spark, [(10, 20)]),
        "pts",
        "s",
        "e",
        bucket=3,
    ).collect()
    assert sorted(r["pts"] for r in rows) == [10, 20]


def test_range_join_validates(spark):
    p, i = _pts(spark, [1]), _ivs(spark, [(0, 2)])
    with pytest.raises(ValueError, match="bucket"):
        range_join(p, i, "pts", "s", "e", bucket=0)
    with pytest.raises(ValueError, match="inner/left"):
        range_join(p, i, "pts", "s", "e", bucket=1, how="outer")
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(p, p.select(F.col("pid"), F.col("pts").alias("e")), "pts", "pid", "e", bucket=1)


def _livs(spark, spans):
    return spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(spans)], "lid long, ls long, le long"
    )


def _py_interval_join(lspans, rspans):
    return sorted(
        (li, ri)
        for li, (ls, le) in enumerate(lspans)
        for ri, (rs, re_) in enumerate(rspans)
        if ls <= re_ and rs <= le
    )


def test_interval_join_matches_naive(spark):
    rng = random.Random(13)
    lspans, rspans = [], []
    for _ in range(80):
        s = rng.randint(0, 400)
        lspans.append((s, s + rng.randint(0, 50)))
    for _ in range(40):
        s = rng.randint(0, 400)
        rspans.append((s, s + rng.randint(0, 90)))
    got = sorted(
        (r["lid"], r["iid"])
        for r in interval_join(
            _livs(spark, lspans),
            _ivs(spark, rspans).withColumnRenamed("iid", "iid")
            .withColumnRenamed("s", "rs").withColumnRenamed("e", "re"),
            ("ls", "le"),
            ("rs", "re"),
            bucket=23,
        ).collect()
    )
    assert got == _py_interval_join(lspans, rspans)


def test_interval_join_long_overlap_counts_once(spark):
    # the pair shares 10 buckets; the canonical-bucket predicate must
    # emit it exactly once
    out = interval_join(
        _livs(spark, [(0, 99)]),
        _ivs(spark, [(50, 120)]).withColumnRenamed("s", "rs").withColumnRenamed("e", "re"),
        ("ls", "le"),
        ("rs", "re"),
        bucket=10,
    ).collect()
    assert len(out) == 1


def test_interval_join_touching_endpoints_inclusive(spark):
    out = interval_join(
        _livs(spark, [(0, 10), (20, 30)]),
        _ivs(spark, [(10, 20)]).withColumnRenamed("s", "rs").withColumnRenamed("e", "re"),
        ("ls", "le"),
        ("rs", "re"),
        bucket=7,
    ).collect()
    assert sorted(r["lid"] for r in out) == [0, 1]


def test_range_join_plans_as_equi_join(spark):
    plan = (
        range_join(
            _pts(spark, [1, 2]), _ivs(spark, [(0, 5)]), "pts", "s", "e", bucket=4
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
