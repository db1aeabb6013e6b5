"""Incremental maintenance for the persisted IVF index: append new
vectors WITHOUT rebuilding, FAISS-add style.

build_ivf_index (similarity.py) is deliberately immutable — the
serving contract there is build-once/swap. Real corpora grow between
reindexes, and the standard answer (FAISS `IndexIVF.add`, Milvus
segment sealing) is: keep the COARSE QUANTIZER frozen, assign the new
vectors to the existing centroids, and append them as a new sealed
segment. Recall for the new vectors is exactly base-index recall as
long as their distribution matches the training sample; drift is a
reindex trigger, not something an add may silently repair (a retrain
would change every existing assignment — that IS the rebuild).

Layout and protocol (no metadata is ever rewritten — fs_write_text is
write-once by design, fsutil.py):

    store_dir/
      _ivf_meta.json            base build's commit mark (+ centroids)
      lists/cluster=K/          base inverted lists
      add_gen=1/cluster=K/      one sealed segment per add
      add_gen=1/_gen_commit.json   segment commit mark, written LAST
      add_gen=2/...

A crashed add leaves a marker-less directory that every reader skips
(same manifest-last discipline as the shard export and the dedup
store); the next add writes a FRESH generation id, never into the
torn one. Serving reads base + committed generations, still partition-
pruned to the probed clusters — cost stays O(probed lists) and grows
only with the probed SLICE of the added data.

Kept separate from similarity.py on purpose: the rotation tooling
(tools/touched_queries.py) tracks module granularity, and this module
must not flag the eight emb_* tail queries for re-evidence; the serve
path here intentionally mirrors ivf_ann_topk_from_store over a
multi-segment scan and is pinned equal to it file-for-file by test
(tests/test_ivf_store.py) — fold the two at the next window rotation.
"""

from __future__ import annotations

import json
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from outboxx_spark.dataops.similarity import _IVF_META, cosine, ivf_assign_udf
from outboxx_spark.fsutil import fs_read_text, fs_write_text, hadoop_fs

_GEN_COMMIT = "_gen_commit.json"
_GEN_PREFIX = "add_gen="


def _load_meta(spark: SparkSession, store_dir: str) -> dict:
    raw = fs_read_text(spark, f"{store_dir}/{_IVF_META}")
    if raw is None:
        raise ValueError(f"no IVF index at {store_dir} (missing {_IVF_META})")
    return json.loads(raw)


def _generations(spark: SparkSession, store_dir: str) -> tuple[list[int], list[int]]:
    """(committed, all-present) generation ids under the store."""
    fs, path, _ = hadoop_fs(spark, store_dir)
    present: list[int] = []
    committed: list[int] = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not name.startswith(_GEN_PREFIX):
            continue
        gen = int(name[len(_GEN_PREFIX):])
        present.append(gen)
        if fs_read_text(spark, f"{store_dir}/{name}/{_GEN_COMMIT}") is not None:
            committed.append(gen)
    return sorted(committed), sorted(present)


def committed_generations(spark: SparkSession, store_dir: str) -> list[int]:
    return _generations(spark, store_dir)[0]


def committed_add_tags(spark: SparkSession, store_dir: str) -> set[str]:
    """The ``tag`` of every COMMITTED generation — the idempotence
    check streaming ingest replays against (a torn generation has no
    commit json, so its tag is invisible and the replay re-adds)."""
    tags: set[str] = set()
    for gen in committed_generations(spark, store_dir):
        raw = fs_read_text(spark, f"{store_dir}/{_GEN_PREFIX}{gen}/{_GEN_COMMIT}")
        tag = json.loads(raw).get("tag") if raw else None
        if tag is not None:
            tags.add(tag)
    return tags


def ivf_index_add(
    emb: DataFrame,
    store_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tag: str | None = None,
) -> int:
    """Append ``emb`` to the index as a new sealed generation using the
    STORED quantizer. Returns the generation id. Fail-stops on
    dimension drift (the add that 'works' by truncating or padding
    vectors would silently poison every later probe). ``tag`` rides in
    the commit json so replay-driven callers (streaming ingest) can
    recognize an already-committed addition."""
    spark = emb.sparkSession
    meta = _load_meta(spark, store_dir)
    dim = int(meta["dim"])
    bad = emb.filter(F.size(F.col(vec_col)) != dim).count()
    if bad:
        raise ValueError(
            f"ivf_index_add: {bad} vectors do not match index dim {dim}"
        )
    n_new = emb.count()
    if n_new == 0:
        raise ValueError("ivf_index_add: empty addition")

    centroids = np.array(meta["centroids"], dtype=np.float64)
    assign = ivf_assign_udf(centroids)
    present = _generations(spark, store_dir)[1]
    gen = (max(present) if present else 0) + 1  # never reuse a torn dir's id
    gen_dir = f"{store_dir}/{_GEN_PREFIX}{gen}"
    (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            assign(F.col(vec_col)).alias("cluster"),
        )
        .repartition("cluster")
        .write.mode("errorifexists")
        .partitionBy("cluster")
        .parquet(f"{gen_dir}/lists")
    )
    # marker LAST = the segment's commit mark
    commit = {"n_vectors": int(n_new), "dim": dim}
    if tag is not None:
        commit["tag"] = tag
    fs_write_text(spark, f"{gen_dir}/{_GEN_COMMIT}", json.dumps(commit))
    return gen


def ivf_segment_paths(spark: SparkSession, store_dir: str) -> list[str]:
    """Base lists + every COMMITTED generation's lists — the serving
    scan set. Torn generations are invisible."""
    paths = [f"{store_dir}/lists"]
    for gen in committed_generations(spark, store_dir):
        paths.append(f"{store_dir}/{_GEN_PREFIX}{gen}/lists")
    return paths


def ivf_serve(
    spark: SparkSession,
    store_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Serve a query batch from base + committed generations. Same
    probe arithmetic and re-rank as similarity.ivf_ann_topk_from_store
    (pinned equal by test when the segment sets match); the only
    difference is the multi-segment scan list."""
    meta = _load_meta(spark, store_dir)
    centroids = np.array(meta["centroids"], dtype=np.float64)

    qpd = queries.select(id_col, vec_col).toPandas()
    if len(qpd) == 0:
        return spark.createDataFrame([], "query_id long, neighbor_id long, rank long")
    qm = np.vstack(qpd[vec_col].to_numpy()).astype(np.float64)
    probes = (qm @ centroids.T).argsort(axis=1, kind="stable")[:, ::-1][:, :n_probe]
    probe_rows = [
        (int(qid), int(c)) for qid, cs in zip(qpd[id_col], probes) for c in cs
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, cluster int")
    probed_clusters = sorted({c for _, c in probe_rows})

    # one reader per segment root, unioned: each root carries its own
    # cluster=K partition discovery (a multi-path read would need a
    # shared basePath the segment layout deliberately doesn't have);
    # the cluster filter partition-prunes INSIDE every segment
    segs = [spark.read.parquet(p) for p in ivf_segment_paths(spark, store_dir)]
    scan = segs[0]
    for s in segs[1:]:
        scan = scan.unionByName(s)
    corpus = scan.filter(F.col("cluster").isin(probed_clusters)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "cluster",
    )
    qv = spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in zip(qpd[id_col], qpd[vec_col])],
        "query_id long, qv array<double>",
    )
    cands = corpus.join(F.broadcast(probe_df), "cluster")
    if exclude_self:
        cands = cands.filter(F.col("neighbor_id") != F.col("query_id"))
    cands = cands.join(F.broadcast(qv), "query_id").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_compact(spark: SparkSession, store_dir: str, dest_dir: str) -> int:
    """Fold base + committed generations into a FRESH single-segment
    store at ``dest_dir`` (build-and-swap, never in place: the source
    store stays immutable and serving until the caller repoints — the
    same swap discipline build_ivf_index documents for reindex).

    The quantizer is carried over verbatim, so assignments are already
    correct and compaction is a pure file-layout operation: one
    cluster-partitioned rewrite, no UDF, no retrain. Serving the
    compacted store is bit-identical to serving the segmented one
    (test-pinned). Returns the number of vectors written.

    Why not compact in place: deleting consumed add_gen dirs after a
    rewrite has two non-atomic steps with readers live, and the dedup
    store's park-and-rename dance (incremental.py) is only needed
    when the store's PATH must be stable. The IVF serving path is
    indirected by the caller (index registry / symlink / config), so
    swap-by-path is the simpler correct protocol."""
    meta = _load_meta(spark, store_dir)
    if fs_read_text(spark, f"{dest_dir}/{_IVF_META}") is not None:
        raise ValueError(f"destination {dest_dir} already holds an index")
    segs = [spark.read.parquet(p) for p in ivf_segment_paths(spark, store_dir)]
    scan = segs[0]
    for s in segs[1:]:
        scan = scan.unionByName(s)
    (
        scan.select("vec_id", "embedding", "cluster")
        .repartition("cluster")
        .write.mode("errorifexists")
        .partitionBy("cluster")
        .parquet(f"{dest_dir}/lists")
    )
    n = spark.read.parquet(f"{dest_dir}/lists").count()
    # meta LAST: the compacted store becomes servable atomically
    fs_write_text(spark, f"{dest_dir}/{_IVF_META}", json.dumps(meta))
    return int(n)


def ivf_store_stats(spark: SparkSession, store_dir: str) -> DataFrame:
    """Operator's view: per-cluster list sizes across base + committed
    generations, with the imbalance ratio (max/mean) that signals a
    drifted quantizer needing reindex."""
    segs = [spark.read.parquet(p) for p in ivf_segment_paths(spark, store_dir)]
    scan = segs[0]
    for s in segs[1:]:
        scan = scan.unionByName(s)
    per = scan.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))
    stats = per.agg(
        F.max("n_vectors").alias("_mx"), F.avg("n_vectors").alias("_mean")
    )
    return per.crossJoin(F.broadcast(stats)).select(
        "cluster",
        "n_vectors",
        (F.col("_mx") / F.col("_mean")).alias("imbalance"),
    )
