"""Product-quantization contracts (r9): the Spark path must equal a
single-node numpy ADC model bit-for-bit (codes, scores, ranks), codes
must be partition-invariant, and the approximation must actually rank
near neighbors first (recall floor vs the exact scan on the corpus
fixture)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.pq import (
    PQ_K,
    PQ_M,
    _pq_luts,
    _pq_train,
    pq_codebooks,
    pq_codebooks_from_parquet,
    pq_encode,
    pq_topk,
)


def _read_emb(spark, sf_dir):
    from outboxx_spark.sources.tables import read_table

    return read_table(spark, sf_dir, "embeddings")


def _numpy_codes(V, books):
    m, k, sd = books.shape
    out = np.empty((len(V), m), dtype=np.int32)
    for mm in range(m):
        sub = V[:, mm * sd : (mm + 1) * sd]
        d = (books[mm] * books[mm]).sum(axis=1) - 2.0 * (sub @ books[mm].T)
        out[:, mm] = d.argmin(axis=1)
    return out


def test_train_rejects_indivisible_dim():
    with pytest.raises(ValueError, match="not divisible"):
        _pq_train(np.zeros((10, 10)), m=3)


def test_spark_codebooks_equal_parquet_replay(spark, sf_dir):
    emb = _read_emb(spark, sf_dir)
    a = pq_codebooks(emb)
    b = pq_codebooks_from_parquet(sf_dir)
    assert np.array_equal(a, b)  # bit-identical, not just close


def test_encode_matches_numpy_and_is_partition_invariant(spark, sf_dir):
    emb = _read_emb(spark, sf_dir)
    books = pq_codebooks(emb)
    pdf = emb.orderBy("vec_id").toPandas()
    V = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    want = {
        int(v): list(map(int, c)) for v, c in zip(pdf["vec_id"], _numpy_codes(V, books))
    }
    for df in (emb.coalesce(1), emb.repartition(13)):
        got = {
            r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()
        }
        assert got == want
    assert all(0 <= c < PQ_K and len(v) == PQ_M for v in want.values() for c in v)


def test_topk_matches_numpy_adc_model(spark, sf_dir):
    emb = _read_emb(spark, sf_dir)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in pq_topk(emb, n_queries=5, topk=8, rerank=False).collect()
    }
    books = pq_codebooks(emb)
    pdf = emb.orderBy("vec_id").toPandas()
    V = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    codes = _numpy_codes(V, books)
    luts = _pq_luts(V[ids < 5], books)
    m, k, _ = books.shape
    want = {}
    for qi, qid in enumerate(ids[ids < 5]):
        # sequential fold in subspace order, like both engines
        scores = np.zeros(len(V))
        for mm in range(m):
            scores += luts[qi][mm * k + codes[:, mm]]
        order = sorted(
            (float(s), int(n)) for s, n in zip(scores, ids) if n != qid
        )
        for rank, (_, n) in enumerate(order[:8], start=1):
            want[(int(qid), rank)] = n
    assert got == want


def test_topk_recall_floor_vs_exact_scan(spark, sf_dir):
    # embeddings are ~unit-norm, so PQ-L2 ADC approximates the cosine
    # exact scan; the two-stage search (ADC shortlist -> exact cosine
    # re-rank) must clear a high recall floor on the corpus fixture
    from outboxx_spark.dataops.similarity import ann_bruteforce_topk

    emb = _read_emb(spark, sf_dir)
    exact = {}
    for r in ann_bruteforce_topk(emb, n_queries=10, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in pq_topk(emb, n_queries=10, topk=10).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.9, f"PQ+rerank recall {hits}/{total}"


def test_ivf_pq_results_come_from_probed_lists_only(spark, sf_dir):
    # composition contract: every returned neighbor must live in one of
    # its query's probed coarse clusters (ADC never touched the rest)
    from outboxx_spark.dataops.pq import ivf_pq_topk
    from outboxx_spark.dataops.similarity import (
        _train_corpus_centroids,
        ivf_assignments,
    )

    emb = _read_emb(spark, sf_dir)
    cents = _train_corpus_centroids(emb, 16, 1024)
    assigned = {
        r["vid"]: r["cluster"] for r in ivf_assignments(emb, cents).collect()
    }
    qpd = emb.filter(F.col("vec_id") < 10).orderBy("vec_id").toPandas()
    qm = np.vstack(qpd["embedding"].to_numpy()).astype(np.float64)
    probes = (qm @ cents.T).argsort(axis=1, kind="stable")[:, ::-1][:, :4]
    probed = {
        int(qid): set(map(int, cs)) for qid, cs in zip(qpd["vec_id"], probes)
    }
    for r in ivf_pq_topk(emb, n_queries=10, topk=10).collect():
        assert assigned[r["neighbor_id"]] in probed[r["query_id"]], r


def test_ivf_pq_plan_evaluates_each_kernel_once(spark, sf_dir):
    # Catalyst trap pin (same class as the r8 dedup band-kernel fix):
    # joining on the raw assignment-UDF column lets
    # InferFiltersFromConstraints push isnotnull(cluster) below the
    # probe join and re-evaluate the kernel above it. The coalesce
    # barrier in ivf_pq_topk must keep the plan at exactly TWO
    # ArrowEvalPython nodes (encode + assign, once each).
    from outboxx_spark.dataops.pq import ivf_pq_topk

    plan = (
        ivf_pq_topk(_read_emb(spark, sf_dir), n_queries=3, topk=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 2, plan


def test_ivf_pq_recall_floor(spark, sf_dir):
    from outboxx_spark.dataops.pq import ivf_pq_topk
    from outboxx_spark.dataops.similarity import ann_bruteforce_topk

    emb = _read_emb(spark, sf_dir)
    exact = {}
    for r in ann_bruteforce_topk(emb, n_queries=10, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in ivf_pq_topk(emb, n_queries=10, topk=10).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    # bounded above by the IVF probe recall (lists never probed are
    # lost regardless of ADC quality) and measured EQUAL to plain
    # ivf_ann_topk's recall on both corpus fixtures — the ADC shortlist
    # + exact re-rank stage loses nothing. Floor matches the repo's
    # IVF floor (test_dataops.test_ivf_ann_recall).
    assert hits / total >= 0.3, f"IVF-PQ recall {hits}/{total}"
