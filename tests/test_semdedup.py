"""Semantic dedup (dataops/semdedup.py) — drop rule, planted behavior,
and the no-crossjoin plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from outboxx_spark.dataops import semdedup
from outboxx_spark.sources.tables import read_table


def _mk_emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_drop_rule_earlier_id_wins(spark):
    # Three co-clustered vectors: 0 ~ 1 (cosine 1.0), 2 orthogonal-ish.
    # Rule: 1 is dropped (earlier near-identical 0), 0 and 2 survive.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0, 0.0]),  # same direction as 0
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = _mk_emb(spark, rows)
    centroids = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
    out = semdedup.semantic_dedup_with_centroids(emb, centroids, threshold=0.9)
    got = {r.vec_id for r in out.collect()}
    assert got == {0, 2}


def test_not_exists_semantics_chain(spark):
    # A ~ B, B ~ C, A !~ C (chain): the NOT-EXISTS-earlier rule drops
    # BOTH B and C (each has an earlier >=-threshold neighbor), unlike
    # the greedy-survivor-chain variant which would keep C. Pin the
    # documented semantics.
    a = np.array([1.0, 0.0])
    b = np.array([1.0, 0.6])  # cos(a,b) ~ .857, cos(b,c) ~ .857, cos(a,c)=.64
    c = np.array([0.6, 0.936])
    c = c / np.linalg.norm(c) * 2
    rows = [(0, a.tolist()), (1, b.tolist()), (2, c.tolist())]
    emb = _mk_emb(spark, rows)
    centroids = np.array([[0.707, 0.707]])  # single cluster
    th = 0.8
    cos_ab = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    cos_bc = float(b @ c / (np.linalg.norm(b) * np.linalg.norm(c)))
    cos_ac = float(a @ c / (np.linalg.norm(a) * np.linalg.norm(c)))
    assert cos_ab >= th and cos_bc >= th and cos_ac < th
    out = semdedup.semantic_dedup_with_centroids(emb, centroids, threshold=th)
    assert {r.vec_id for r in out.collect()} == {0}


def test_planted_copies_dropped(spark, sf_dir):
    base = read_table(spark, sf_dir, "embeddings")
    n_base = base.count()
    out = semdedup.planted_semantic_dedup(spark, sf_dir, n_plant=50)
    rows = out.collect()
    ids = {r.vec_id for r in rows}
    # Every planted copy (id >= 1M) whose source survived must be gone:
    # cosine to its source >= 0.9996 > 0.8 and the pair co-clusters
    # (identical direction up to the even/odd scaling).
    dropped_planted = sum(1 for i in range(50) if (i + 1_000_000) not in ids)
    assert dropped_planted >= 45  # allow a few cross-cluster splits
    # No base vector is dropped by a planted one: planted ids are
    # LARGER, and the corpus's natural pairs top out near cosine 0.6.
    assert sum(1 for i in ids if i < 1_000_000) == n_base


def test_plan_has_no_cartesian(spark, sf_dir):
    out = semdedup.planted_semantic_dedup(spark, sf_dir, n_plant=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
