"""Similarity search over an embedding column (``array<float>``).

- ``cosine``: exact double-precision cosine as a single codegen'd
  fold (zip_with + aggregate) — bit-identical to the DuckDB oracle's
  sequential sum, verified empirically.
- ``ann_bruteforce_topk``: baseline exact top-k — broadcast the (small)
  query set against the corpus; one window per query for ranking. At
  100 TB the corpus side stays partitioned; cost is one pass per query
  batch (fine for query sets up to ~10^4 with the broadcast).
- ``lsh_ann_topk``: the scale path — random-hyperplane signatures
  bucket the corpus; candidates = bucket collisions across L tables;
  exact cosine re-rank on candidates only. Signature computation is a
  vectorized Arrow/Pandas UDF (numpy matmul) — the one place built-ins
  can't express the math efficiently.
- ``embedding_near_dup_pairs``: pairs with cosine >= threshold
  (embedding-space near-dup detection for dedup pipelines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

IVF_SEED = 42
LSH_SEED = 42
# 6-bit signatures x 8 tables: expected bucket occupancy n/64 per table,
# so a query sees ~n/8 candidates total — enough to fill top-k with decent
# recall while scanning ~12% of the corpus. Tune both knobs per corpus
# size/recall target (more planes = finer buckets = fewer candidates).
LSH_N_PLANES = 6
LSH_N_TABLES = 8


def cosine(a: Column, b: Column) -> Column:
    """Exact double cosine, sequential fold in index order (deterministic
    and cross-engine stable)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return dot / (na * nb)


# NOTE (measured, do not "optimize" back): unrolling the 64-term dot
# product into a flat Add chain knocks the plan out of WholeStageCodegen
# entirely (deep expression tree -> interpreted eval, 3x slower than the
# higher-order-function fold). The fold + explicit pair-block
# repartitioning below is the fast shape.
def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


COSINE_SQL = """
list_sum(list_transform(range(1, len({a})+1), i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE)))
/ (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


def ann_bruteforce_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k neighbors for the first ``n_queries`` vectors.
    Output is float-free (ids + rank); rank ties broken by neighbor id.
    The query side is broadcast — the corpus never shuffles."""
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # A small corpus arrives as one file -> one partition; spread the
    # scoring across cores (at scale the corpus is already partitioned
    # and this is a cheap round-robin).
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")).repartition(
        emb.sparkSession.sparkContext.defaultParallelism
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_bruteforce_topk_sql(n_queries: int = 10, k: int = 10) -> str:
    cos = COSINE_SQL.format(a="q.embedding", b="c.embedding")
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos
      FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
      WHERE q.vec_id < {n_queries})
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM scored
    QUALIFY rank <= {k}
    """


def _norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.4, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(a < b) pairs with cosine >= threshold. Exact O(n^2) formulation
    for the oracle-checked path; at scale, run ``lsh_ann_topk``-style
    bucketing first and verify candidates exactly (same contract).

    Norms are computed once per vector (O(n)), not per pair — the
    per-pair work is a single dot fold. Numerically identical to the
    naive form: sqrt(sum x^2) yields the same double either way, so the
    threshold compare matches the oracle bit-for-bit.
    """
    normed = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),  # norms once per vector, not per pair
    )
    a = normed.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    ).repartition(emb.sparkSession.sparkContext.defaultParallelism)
    b = normed.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = dot_product(F.col("va"), F.col("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dot / (F.col("na") * F.col("nb")) >= threshold)
        .select("id_a", "id_b")
    )


def embedding_near_dup_pairs_sql(threshold: float = 0.4) -> str:
    cos = COSINE_SQL.format(a="a.embedding", b="b.embedding")
    return f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {cos} >= {threshold}
    """


# ---------------------------------------------------------------------------
# IVF ANN (approximate; scale path #2 — inverted file / coarse quantizer)
# ---------------------------------------------------------------------------


def _kmeans_centroids(sample: np.ndarray, n_clusters: int, n_iters: int = 8) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (the coarse
    quantizer is tiny — centroids are a broadcastable constant). Init =
    evenly spaced sample rows; ties and empty clusters resolved
    deterministically."""
    idx = np.linspace(0, len(sample) - 1, n_clusters).astype(int)
    centroids = sample[idx].copy()
    for _ in range(n_iters):
        d = sample @ centroids.T  # cosine-ish assignment on normalized rows
        assign = d.argmax(axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    centroids[c] = m / n
    return centroids


def ivf_assignments(
    emb: DataFrame, centroids: np.ndarray, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """vec_id -> nearest-centroid cluster id (one Arrow-batched matmul
    per batch; centroids ride the closure as a broadcast constant)."""

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pd.Series((m @ centroids.T).argmax(axis=1).astype("int32"))

    return emb.select(F.col(id_col).alias("vid"), assign(F.col(vec_col)).alias("cluster"))


def ivf_ann_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_size: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF: coarse-quantize the corpus into inverted lists; each query
    probes its ``n_probe`` nearest centroids and exact-re-ranks only
    those lists (~n_probe/n_clusters of the corpus).

    At 100 TB: centroids are trained once on a sample and broadcast;
    assignment is a narrow Arrow map; the probe join shuffles only the
    candidate lists. Same output contract as the brute-force baseline
    (rows-only driver check; recall asserted in tests)."""
    sample_rows = (
        emb.orderBy(id_col).limit(sample_size).select(vec_col).toPandas()[vec_col]
    )
    sample = np.vstack(sample_rows.to_numpy()).astype(np.float64)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    centroids = _kmeans_centroids(sample, n_clusters)

    assigned = ivf_assignments(emb, centroids, id_col, vec_col)
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).join(assigned.withColumnRenamed("vid", "neighbor_id"), "neighbor_id")

    # queries probe their n_probe nearest centroids
    qpd = emb.filter(F.col(id_col) < n_queries).select(id_col, vec_col).toPandas()
    qm = np.vstack(qpd[vec_col].to_numpy()).astype(np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    probes = (qm @ centroids.T).argsort(axis=1)[:, ::-1][:, :n_probe]
    probe_rows = [
        (int(qid), int(c)) for qid, cs in zip(qpd[id_col], probes) for c in cs
    ]
    probe_df = emb.sparkSession.createDataFrame(probe_rows, "query_id long, cluster int")

    qv = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cands = (
        corpus.join(F.broadcast(probe_df), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# ---------------------------------------------------------------------------
# LSH ANN (approximate; scale path)
# ---------------------------------------------------------------------------


def _plane_matrix(dim: int) -> np.ndarray:
    """Deterministic hyperplanes: (n_tables * n_planes, dim), seeded."""
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((LSH_N_TABLES * LSH_N_PLANES, dim))


def lsh_signatures(emb: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """vec_id -> one signature int per table. Vectorized Arrow batch:
    one numpy matmul per batch (planes broadcast in the closure)."""
    planes = _plane_matrix(dim)
    bits_weights = (1 << np.arange(LSH_N_PLANES)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def signatures(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        proj = m @ planes.T > 0  # (batch, tables*planes)
        proj = proj.reshape(len(m), LSH_N_TABLES, LSH_N_PLANES)
        sigs = (proj * bits_weights).sum(axis=2)  # (batch, tables)
        return pd.Series(list(sigs))

    return emb.select(F.col(id_col).alias("vec_id_"), signatures(F.col(vec_col)).alias("sigs"))


def lsh_ann_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket join -> exact cosine
    re-rank of candidates. Same output schema as the brute-force baseline
    (query_id, neighbor_id, rank); recall checked in tests, not the SQL
    oracle (the driver records rows-only for this one)."""
    dim = len(emb.select(vec_col).first()[0])
    sigs = lsh_signatures(emb, dim, id_col, vec_col)
    tables = F.array(
        *[
            F.struct(F.lit(t).alias("table"), F.col("sigs")[t].alias("sig"))
            for t in range(LSH_N_TABLES)
        ]
    )
    buckets = sigs.select("vec_id_", F.explode(tables).alias("ts")).select(
        F.col("vec_id_").alias("vid"), F.col("ts.table").alias("table"), F.col("ts.sig").alias("sig")
    )
    qb = buckets.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"), "table", "sig"
    )
    cands = (
        buckets.join(F.broadcast(qb), ["table", "sig"])
        .filter(F.col("vid") != F.col("query_id"))
        .select(F.col("query_id"), F.col("vid").alias("neighbor_id"))
        .distinct()
    )
    qv = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cv = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
