"""Incremental IVF index maintenance (dataops/ivf_store.py): sealed
generations, frozen quantizer, torn-add invisibility, and the
file-copy equivalence pin against the immutable serve path."""

from __future__ import annotations

import glob
import os
import shutil
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.ivf_store import (
    _GEN_COMMIT,
    committed_generations,
    ivf_index_add,
    ivf_serve,
    ivf_store_stats,
)
from outboxx_spark.dataops.similarity import (
    build_ivf_index,
    ivf_ann_topk_from_store,
)
from outboxx_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def grown_store(spark, tmp_path_factory):
    """Base index on the first 300 vectors, two adds of 100 each."""
    root = tmp_path_factory.mktemp("ivfstore")
    store = str(root / "idx")
    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") < 300)
    add1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    add2 = emb.filter(F.col("vec_id") >= 400)
    build_ivf_index(base, store, n_clusters=8, sample_size=256)
    g1 = ivf_index_add(add1, store)
    g2 = ivf_index_add(add2, store)
    assert (g1, g2) == (1, 2)
    return store, base, add1, add2


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()
    )


def test_serve_without_generations_equals_immutable_path(spark, tmp_path):
    store = str(tmp_path / "baseonly")
    build_ivf_index(_emb(spark).filter(F.col("vec_id") < 300), store, n_clusters=8, sample_size=256)
    q = _emb(spark).filter(F.col("vec_id") < 10)
    assert _rows(ivf_serve(spark, store, q)) == _rows(
        ivf_ann_topk_from_store(spark, store, q)
    )


def test_added_vectors_become_findable(spark, grown_store):
    store, _, add1, _ = grown_store
    # each added vector must find ITSELF when self-exclusion is off —
    # the hard proof its list partition is actually being scanned
    q = add1.limit(20)
    got = ivf_serve(spark, store, q, k=1, exclude_self=False)
    assert all(r["query_id"] == r["neighbor_id"] for r in got.collect())


def test_grown_store_equals_flat_copy_of_same_segments(spark, grown_store, tmp_path):
    """THE equivalence pin: copy base+gen list FILES into a fresh
    store's lists/ (same meta — same centroids), and the immutable
    serve path over that flat store must return bit-identical results
    to ivf_serve over the segmented one."""
    store, *_ = grown_store
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    shutil.copy(os.path.join(store, "_ivf_meta.json"), flat)
    for seg in ["lists", "add_gen=1/lists", "add_gen=2/lists"]:
        for cdir in glob.glob(os.path.join(store, seg, "cluster=*")):
            dst = os.path.join(flat, "lists", os.path.basename(cdir))
            os.makedirs(dst, exist_ok=True)
            for f in glob.glob(os.path.join(cdir, "*.parquet")):
                shutil.copy(f, os.path.join(dst, f"{seg.split('/')[0]}-{os.path.basename(f)}"))
    q = _emb(spark).filter(F.col("vec_id") % 37 == 0)
    assert _rows(ivf_serve(spark, store, q)) == _rows(
        ivf_ann_topk_from_store(spark, flat, q)
    )


def test_torn_generation_is_invisible(spark, grown_store):
    store, *_ = grown_store
    torn = os.path.join(store, "add_gen=9", "lists", "cluster=0")
    os.makedirs(torn)
    # real parquet content, but no commit marker
    _emb(spark).limit(3).select(
        F.col("vec_id"), F.col("embedding"), F.lit(0).alias("cluster")
    ).write.mode("overwrite").parquet(torn)
    try:
        assert committed_generations(spark, store) == [1, 2]
        q = _emb(spark).filter(F.col("vec_id") < 5)
        served = ivf_serve(spark, store, q)
        assert served.count() > 0  # and no crash scanning past the torn dir
    finally:
        shutil.rmtree(os.path.join(store, "add_gen=9"))


def test_next_add_skips_torn_generation_id(spark, grown_store):
    store, _, add1, _ = grown_store
    os.makedirs(os.path.join(store, "add_gen=5"), exist_ok=True)  # torn stub
    try:
        g = ivf_index_add(add1.limit(5), store)
        assert g == 6, "must allocate PAST the torn id, never into it"
        assert 5 not in committed_generations(spark, store)
    finally:
        shutil.rmtree(os.path.join(store, "add_gen=5"))
        shutil.rmtree(os.path.join(store, "add_gen=6"))


def test_dimension_drift_fail_stops(spark, grown_store):
    store, *_ = grown_store
    bad = spark.createDataFrame(
        [(9999, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        ivf_index_add(bad, store)


@pytest.mark.slow
def test_compact_serves_identically_and_is_single_segment(spark, grown_store, tmp_path):
    from outboxx_spark.dataops.ivf_store import committed_generations, ivf_compact

    store, base, add1, add2 = grown_store
    dest = str(tmp_path / "compacted")
    n = ivf_compact(spark, store, dest)
    assert n == base.count() + add1.count() + add2.count()
    assert committed_generations(spark, dest) == []
    q = _emb(spark).filter(F.col("vec_id") % 41 == 0)
    assert _rows(ivf_serve(spark, dest, q)) == _rows(ivf_serve(spark, store, q))
    # and the compacted store serves through the immutable path too
    assert _rows(ivf_ann_topk_from_store(spark, dest, q)) == _rows(
        ivf_serve(spark, store, q)
    )
    # double-compact into the same dest must fail-stop
    with pytest.raises(ValueError, match="already holds"):
        ivf_compact(spark, store, dest)


def test_stats_cover_all_segments(spark, grown_store):
    store, base, add1, add2 = grown_store
    total = sum(
        r["n_vectors"] for r in ivf_store_stats(spark, store).collect()
    )
    assert total == base.count() + add1.count() + add2.count()
