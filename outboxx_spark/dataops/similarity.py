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
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
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


BRUTE_FORCE_PAIR_LIMIT = 200_000


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_quadratic_above_limit: bool = False,
) -> DataFrame:
    """(a < b) pairs with cosine >= threshold. Exact O(n^2) formulation
    — the ORACLE BASELINE only, deliberately bounded: the corpus must
    stay under ``BRUTE_FORCE_PAIR_LIMIT`` vectors (or the caller must
    opt in explicitly) so the crossJoin can never be pointed at a
    production corpus by accident. The scale paths with the same
    output contract are ``embedding_near_dup_pairs_lsh`` (high
    threshold) and ``embedding_near_dup_pairs_ivf`` (low threshold),
    both bucketed + exact-verified and driver-oracle-checked.

    Norms are computed once per vector (O(n)), not per pair — the
    per-pair work is a single dot fold. Numerically identical to the
    naive form: sqrt(sum x^2) yields the same double either way, so the
    threshold compare matches the oracle bit-for-bit.
    """
    if not allow_quadratic_above_limit:
        n = emb.count()
        if n > BRUTE_FORCE_PAIR_LIMIT:
            raise ValueError(
                f"embedding_near_dup_pairs is the O(n^2) oracle baseline; "
                f"corpus has {n} > {BRUTE_FORCE_PAIR_LIMIT} vectors — use "
                "embedding_near_dup_pairs_lsh/_ivf, or pass "
                "allow_quadratic_above_limit=True deliberately"
            )
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


def _seq_fold_cosine_ge_udf(threshold: float):
    """Arrow-vectorized exact-cosine threshold test whose float
    arithmetic is BIT-IDENTICAL to the sequential JVM/DuckDB fold: the
    accumulation loops over DIMENSIONS (64 numpy ops over the pair
    batch), so each pair's dot and squared-norm sums run in strict
    index order — the same add/mul sequence as ``F.aggregate`` and
    ``list_sum``, just computed for every pair in the batch at once.
    numpy's pairwise-summation reductions (``np.sum``/BLAS ``@``) would
    NOT preserve this order; the explicit loop is the point."""

    @F.pandas_udf("boolean")
    def ok(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype=bool)
        a = np.vstack(va.to_numpy()).astype(np.float64)
        b = np.vstack(vb.to_numpy()).astype(np.float64)
        dot = np.zeros(len(a))
        na = np.zeros(len(a))
        nb = np.zeros(len(a))
        for d in range(a.shape[1]):
            x, y = a[:, d], b[:, d]
            dot = dot + x * y
            na = na + x * x
            nb = nb + y * y
        cos = dot / (np.sqrt(na) * np.sqrt(nb))
        return pd.Series(cos >= threshold)

    return ok


def _verify_pairs(
    emb: DataFrame,
    cand: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine verification of candidate (id_a < id_b) pairs —
    shared tail of every blocked/bucketed near-dup formulation. The
    threshold test runs in the Arrow sequential-fold kernel
    (:func:`_seq_fold_cosine_ge_udf`): bit-identical to the JVM fold /
    DuckDB ``list_sum`` mirror (``_verify_pairs_jvm`` is the pinned
    reference), but vectorized across the candidate batch — at
    candidate volumes of millions the interpreted per-pair fold was
    the dominant cost of the IVF/LSH near-dup paths."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    ok = _seq_fold_cosine_ge_udf(threshold)
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(ok(F.col("va"), F.col("vb")))
        .select("id_a", "id_b")
    )


def _verify_pairs_jvm(
    emb: DataFrame,
    cand: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The original pure-JVM verification (norms once per vector, one
    interpreted dot fold per pair) — kept as the bit-identity reference
    for :func:`_verify_pairs` and the no-Python fallback."""
    normed = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    a = normed.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = normed.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = dot_product(F.col("va"), F.col("vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(dot / (F.col("na") * F.col("nb")) >= threshold)
        .select("id_a", "id_b")
    )


def embedding_near_dup_pairs_ivf(
    emb: DataFrame,
    threshold: float = 0.4,
    n_clusters: int = 64,
    n_assign: int = 6,
    sample_size: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Low-threshold scale path for embedding near-dup: IVF (k-means)
    blocking with multi-assignment -> same-block candidate pairs ->
    exact cosine verification.

    Why this and not hyperplane LSH: at low cosine thresholds (c ~ 0.4)
    the LSH table count needed for near-exact recall makes nearly every
    pair collide somewhere (see :func:`embedding_near_dup_pairs_lsh`'s
    regime note), so candidate volume approaches n^2. K-means blocking
    prunes by the corpus's *cluster structure* instead of random
    projections: each vector joins only its ``n_assign`` nearest
    centroids' blocks, so candidates ~ sum of block sizes squared —
    n^2 * n_assign^2 / n_clusters for balanced blocks. Recall is
    empirical (corpus-dependent): a pair is missed iff the two vectors
    share none of their n_assign nearest centroids, which happens for
    pairs near the threshold that straddle cluster boundaries. Measured
    grid on this corpus at sf0.1 (this corpus's cos>=0.4 pairs are ~66
    degrees apart, inherently hard to block): (16 clusters, 4 assigns)
    = 95% recall but candidate factor 1.0 (no pruning); the defaults
    (64, 6) = 92% recall at factor 0.56 — actual pruning, which is the
    point of blocking. The operator's *contract* is the blocked set
    itself: :func:`embedding_near_dup_pairs_ivf_sql` mirrors the exact
    computation (deterministic centroids inlined as literals) so the
    driver hash-checks it, and tests measure recall against the exact
    pair set. Use the LSH variant when provable recall matters more
    than pruning; use this when pruning matters and bounded recall loss
    is acceptable (the standard trade at 100 TB).

    At 100 TB: centroids are trained once on a bounded driver-side
    sample and broadcast; assignment is one Arrow matmul per batch; the
    block self-join shuffles (cluster, id) keys only; verification
    touches candidate pairs, never the cross product.
    """
    centroids = _train_corpus_centroids(emb, n_clusters, sample_size, id_col, vec_col)

    @F.pandas_udf("array<int>")
    def assign_multi(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        d = m @ centroids.T
        # top n_assign by dot desc; stable argsort on -d = lower cid on ties
        order = np.argsort(-d, axis=1, kind="stable")[:, :n_assign]
        return pd.Series(list(order.astype("int32")))

    # The (vid, cluster) block table is tiny (n_docs x n_assign keyed
    # rows) but feeds BOTH sides of the self-join — without a
    # materialization the Arrow assignment matmul runs once per side on
    # every action (measured 15% of query time). The operator is
    # already eager at build (driver-side centroid training), so the
    # checkpoint changes composability nothing.
    blocks = emb.select(
        F.col(id_col).alias("vid"), F.explode(assign_multi(F.col(vec_col))).alias("cluster")
    ).localCheckpoint(eager=True)
    left = blocks.select(F.col("vid").alias("id_a"), "cluster")
    right = blocks.select(F.col("vid").alias("id_b"), "cluster")
    cand = (
        left.join(right, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_pairs(emb, cand, threshold, id_col, vec_col)


def embedding_near_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for embedding near-dup: hyperplane-LSH buckets ->
    per-table self-join on (table, signature) -> distinct candidate
    pairs -> exact cosine verification. Never materializes the O(n^2)
    cross product; the join key is (table, sig) so work is bounded by
    bucket occupancy (choose n_planes ~ log2(n/target_bucket) as the
    corpus grows; more tables = higher recall).

    With 4 planes x 64 tables, a pair at cosine c collides in one table
    with probability (1 - acos(c)/pi)^4, so P(miss) at c=0.4 is
    (1-0.159)^64 ~ 1.6e-5 — and the seeded planes make the result
    deterministic: recall 1.0 on this corpus is asserted in tests and
    the oracle compares against the exact pair set.

    Regime honesty: hyperplane LSH pays off at HIGH similarity
    thresholds. At c=0.9 (p_bit=0.86), 16-bit signatures keep per-table
    collisions ~n^2/2^16 while ~100 tables already give miss < 1e-5 — a
    ~600x candidate reduction. At c=0.4 (p_bit=0.63) the table count
    needed for near-exact recall makes nearly every pair collide
    somewhere, so candidate volume approaches n^2 and only the
    *verification* is saved, not the pairing. For low-threshold dedup
    at 100 TB, compose blocking (IVF/k-means buckets) with this exact
    verify instead; this operator is the provable-recall formulation.
    """
    sigs = lsh_signatures(emb, id_col, vec_col, n_planes=n_planes, n_tables=n_tables)
    tables = F.array(
        *[
            F.struct(F.lit(t).alias("table"), F.col("sigs")[t].alias("sig"))
            for t in range(n_tables)
        ]
    )
    buckets = (
        sigs.select("vec_id_", F.explode(tables).alias("ts"))
        .select(
            F.col("vec_id_").alias("vid"),
            F.col("ts.table").alias("table"),
            F.col("ts.sig").alias("sig"),
        )
        # both join sides — materialize once so the hyperplane signature
        # computation upstream doesn't run per side (same fix as the
        # IVF block table and the minhash bucket table)
        .localCheckpoint(eager=True)
    )
    left = buckets.select(F.col("vid").alias("id_a"), "table", "sig")
    right = buckets.select(F.col("vid").alias("id_b"), "table", "sig")
    cand = (
        left.join(right, ["table", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_pairs(emb, cand, threshold, id_col, vec_col)


def with_planted_near_dups(
    emb: DataFrame,
    n_plant: int = 50,
    id_offset: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Append deterministic near-identical copies of the first
    ``n_plant`` vectors: component j is scaled by 1.02 (j even) or
    0.98 (j odd). The planted copy's cosine to its source is
    >= 0.9996 for ANY vector (worst case is an even/odd energy
    split; a lopsided split degenerates toward a pure scaling,
    cosine 1), so a high-threshold near-dup query has a non-empty,
    analytically-known answer on a corpus whose natural pairs top
    out near 0.6. The scaling is plain double arithmetic, so the
    DuckDB oracle reproduces it bit-for-bit
    (:func:`embedding_near_dup_planted_sql`)."""
    planted = emb.filter(F.col(id_col) < n_plant).select(
        (F.col(id_col) + id_offset).alias(id_col),
        F.transform(
            F.col(vec_col),
            lambda x, i: x.cast("double")
            * F.when(i % 2 == 0, F.lit(1.02)).otherwise(F.lit(0.98)),
        ).alias(vec_col),
    )
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
    return base.unionByName(planted)


PLANTED_AUG_SQL = """
aug AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(range(1, len(embedding) + 1),
           i -> CAST(embedding[i] AS DOUBLE)
                * (CASE WHEN i % 2 = 1 THEN 1.02 ELSE 0.98 END)) AS embedding
  FROM embeddings WHERE vec_id < {n_plant}
)
"""


def embedding_near_dup_planted_sql(threshold: float = 0.8, n_plant: int = 50) -> str:
    """Exact O(n^2) pair set over the planted-augmented corpus — the
    oracle for the high-threshold LSH near-dup query."""
    cos = COSINE_SQL.format(a="a.embedding", b="b.embedding")
    return (
        "WITH "
        + PLANTED_AUG_SQL.format(n_plant=n_plant)
        + f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE {cos} >= {threshold}
    """
    )


def embedding_near_dup_pairs_ivf_sql(
    threshold: float = 0.4,
    n_clusters: int = 64,
    n_assign: int = 6,
    sample_size: int = 1024,
    sf_dir: str | None = None,
) -> str:
    """Exact mirror of :func:`embedding_near_dup_pairs_ivf`: centroids
    retrained at SQL-build time from the same parquet, multi-assignment
    as row_number over dot desc (cid asc ties = numpy stable argsort),
    same-block candidates, exact cosine verify."""
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    centroids = _train_centroids_from_parquet(sf_dir, n_clusters, sample_size)
    dim = centroids.shape[1]
    cos = COSINE_SQL.format(a="a.embedding", b="b.embedding")
    return f"""
    WITH centroids(cid, c) AS (VALUES
    {_matrix_values(centroids)}),
    dots AS (
      SELECT e.vec_id, ct.cid,
             list_sum(list_transform(range(1, {dim + 1}),
               i -> CAST(e.embedding[i] AS DOUBLE) * (ct.c)[i])) AS d
      FROM embeddings e, centroids ct
    ),
    blocks AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM dots) WHERE rn <= {n_assign}
    ),
    cand AS (
      SELECT DISTINCT la.vec_id AS id_a, lb.vec_id AS id_b
      FROM blocks la JOIN blocks lb
        ON la.cluster = lb.cluster AND la.vec_id < lb.vec_id
    )
    SELECT c.id_a, c.id_b
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.id_a
    JOIN embeddings b ON b.vec_id = c.id_b
    WHERE {cos} >= {threshold}
    """


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


def _train_corpus_centroids(
    emb: DataFrame,
    n_clusters: int,
    sample_size: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """THE corpus centroid-training recipe — first ``sample_size`` rows
    by id, float64, row-normalized, deterministic k-means — shared by
    every IVF/k-means operator. Single definition on purpose: the SQL
    oracles replay exactly this via ``_train_centroids_from_parquet``,
    so a tweak applied to one operator's copy would silently
    desynchronize the others from their oracles."""
    sample_rows = (
        emb.orderBy(id_col).limit(sample_size).select(vec_col).toPandas()[vec_col]
    )
    sample = np.vstack(sample_rows.to_numpy()).astype(np.float64)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    return _kmeans_centroids(sample, n_clusters)


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


def ivf_assign_udf(centroids: np.ndarray):
    """The nearest-centroid assignment UDF (one Arrow-batched matmul
    per batch; centroids ride the closure as a broadcast constant) —
    shared by every operator that assigns, so the arithmetic the SQL
    mirrors replay stays defined once.

    No per-vector normalization: argmax_j (v . c_j) is invariant to a
    positive scaling of v, so dividing by ||v|| can't change the
    assignment — skipping it saves work and keeps the SQL mirror's
    arithmetic identical."""

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        return pd.Series((m @ centroids.T).argmax(axis=1).astype("int32"))

    return assign


def ivf_assignments(
    emb: DataFrame, centroids: np.ndarray, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """vec_id -> nearest-centroid cluster id (see ivf_assign_udf)."""
    assign = ivf_assign_udf(centroids)
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
    centroids = _train_corpus_centroids(emb, n_clusters, sample_size, id_col, vec_col)

    assigned = ivf_assignments(emb, centroids, id_col, vec_col)
    # driver-side sample + kmeans is deterministic, so the SQL oracle can
    # retrain identical centroids from the same parquet (ivf_ann_topk_sql)
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).join(assigned.withColumnRenamed("vid", "neighbor_id"), "neighbor_id")

    # queries probe their n_probe nearest centroids
    qpd = emb.filter(F.col(id_col) < n_queries).select(id_col, vec_col).toPandas()
    qm = np.vstack(qpd[vec_col].to_numpy()).astype(np.float64)
    # same argmax-scale-invariance: probe ranking needs no normalization
    probes = (qm @ centroids.T).argsort(axis=1, kind="stable")[:, ::-1][:, :n_probe]
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
        cands.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# ---------------------------------------------------------------------------
# LSH ANN (approximate; scale path)
# ---------------------------------------------------------------------------


def _plane_matrix(
    dim: int, n_planes: int = LSH_N_PLANES, n_tables: int = LSH_N_TABLES
) -> np.ndarray:
    """Deterministic hyperplanes: (n_tables * n_planes, dim), seeded."""
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((n_tables * n_planes, dim))


def lsh_signatures(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = LSH_N_PLANES,
    n_tables: int = LSH_N_TABLES,
) -> DataFrame:
    """vec_id -> one signature int per table. Vectorized Arrow batch:
    one numpy matmul per batch. The seeded plane matrix is derived from
    the batch's own vector width, so no extra Spark job probes the
    dimension up front."""
    bits_weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def signatures(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        planes = _plane_matrix(m.shape[1], n_planes=n_planes, n_tables=n_tables)
        proj = m @ planes.T > 0  # (batch, tables*planes)
        proj = proj.reshape(len(m), n_tables, n_planes)
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
    (query_id, neighbor_id, rank). Fully deterministic (seeded planes),
    so ``lsh_ann_topk_sql`` mirrors it exactly with the planes inlined
    as literals."""
    sigs = lsh_signatures(emb, id_col, vec_col)
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
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_recall(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Measured quality of the approximate ANN path: per-query hit count
    of :func:`lsh_ann_topk`'s top-k against the exact
    :func:`ann_bruteforce_topk` top-k. Both sides are deterministic, so
    this is an oracle-checkable *quality metric as a query* — the
    pattern a production pipeline uses to monitor ANN recall drift
    after reindexing (ground truth on a sampled query set, approximate
    result from the serving index).

    Queries with zero overlap still emit a row (hits_at_k = 0)."""
    bf = ann_bruteforce_topk(emb, n_queries, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    ap = lsh_ann_topk(emb, n_queries, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    hits = bf.join(ap, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count("*").alias("hits")
    )
    qs = bf.select("query_id").distinct()
    return qs.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("hits", F.lit(0)).cast("long").alias("hits_at_k")
    )


def ann_recall_sql(n_queries: int = 10, k: int = 10, dim: int = 64) -> str:
    bf = ann_bruteforce_topk_sql(n_queries, k)
    ap = lsh_ann_topk_sql(n_queries, k, dim)
    return f"""
    WITH bf AS ({bf}), ap AS ({ap}),
    hits AS (
      SELECT bf.query_id, count(*) AS hits
      FROM bf JOIN ap ON bf.query_id = ap.query_id AND bf.neighbor_id = ap.neighbor_id
      GROUP BY bf.query_id)
    SELECT q.query_id, CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_at_k
    FROM (SELECT DISTINCT query_id FROM bf) q
    LEFT JOIN hits h ON h.query_id = q.query_id
    """


# ---------------------------------------------------------------------------
# SQL oracles for the approximate ANN paths. Both algorithms are fully
# deterministic (seeded planes; deterministic k-means on a deterministic
# sample), so the oracle inlines the trained constants as literals and
# replays the exact candidate-generation + re-rank pipeline in SQL.
# ---------------------------------------------------------------------------


def _vec_literal(v) -> str:
    """Full-precision DOUBLE list literal (repr roundtrips float64)."""
    return "[" + ", ".join(repr(float(x)) for x in v) + "]"


def _matrix_values(m: np.ndarray) -> str:
    return ",\n    ".join(f"({i}, {_vec_literal(row)})" for i, row in enumerate(m))


def lsh_ann_topk_sql(n_queries: int = 10, k: int = 10, dim: int = 64) -> str:
    """Mirror of :func:`lsh_ann_topk`: seeded hyperplanes inlined as
    literals; signature = little-endian bits of sign(v . plane) per
    table; candidates = bucket collisions across tables; exact cosine
    re-rank."""
    planes = _plane_matrix(dim)
    cos = COSINE_SQL.format(a="q.embedding", b="n.embedding")
    return f"""
    WITH planes(pid, p) AS (VALUES
    {_matrix_values(planes)}),
    bits AS (
      SELECT e.vec_id, pl.pid,
             CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                    i -> CAST(e.embedding[i] AS DOUBLE) * (pl.p)[i])) > 0
                  THEN 1 ELSE 0 END AS bit
      FROM embeddings e, planes pl
    ),
    sigs AS (
      SELECT vec_id, pid // {LSH_N_PLANES} AS tbl,
             CAST(sum(bit * (1 << (pid % {LSH_N_PLANES}))) AS BIGINT) AS sig
      FROM bits GROUP BY 1, 2
    ),
    qb AS (SELECT vec_id AS query_id, tbl, sig FROM sigs WHERE vec_id < {n_queries}),
    cands AS (
      SELECT DISTINCT qb.query_id, s.vec_id AS neighbor_id
      FROM sigs s JOIN qb ON s.tbl = qb.tbl AND s.sig = qb.sig
      WHERE s.vec_id != qb.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id, {cos} AS cos
      FROM cands c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings n ON n.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM scored QUALIFY rank <= {k}
    """


def _train_centroids_from_parquet(
    sf_dir: str, n_clusters: int, sample_size: int
) -> np.ndarray:
    """Replay ivf_ann_topk's training: first ``sample_size`` vectors by
    vec_id, float64, row-normalized, deterministic k-means. Same numpy
    code on the same bytes -> bit-identical centroids."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    pdf = t.to_pandas().sort_values("vec_id").head(sample_size)
    sample = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    return _kmeans_centroids(sample, n_clusters)


def ivf_ann_topk_sql(
    n_queries: int = 10,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_size: int = 1024,
    sf_dir: str | None = None,
) -> str:
    """Mirror of :func:`ivf_ann_topk`: centroids retrained at SQL-build
    time from the same parquet (driver's correctness gate runs at
    sf0.01; local replicas pin ``SPARK_GRAFT_ORACLE_SF_DIR`` to their
    sf_dir), then assignment (argmax dot, first-wins ties), probes
    (top n_probe centroids, stable-argsort-reversed ties = higher cid
    first), candidate lists, exact cosine re-rank.

    Float caveat (documented assumption): the Spark side ranks centroid
    dots computed by numpy/BLAS while DuckDB folds ``list_sum``
    sequentially — different summation orders. The mirror is exact so
    long as no centroid-RANKING decision (argmax / probe cutoff /
    multi-assign cutoff) lands within one ulp of a tie; with random
    float data the probability of a rank-relevant sub-ulp tie is
    negligible, and the exact cosine re-rank downstream is
    order-identical (sequential fold on both engines), so a flipped
    far-from-tie centroid choice cannot silently corrupt values — it
    would change the candidate SET and fail the gate loudly."""
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    centroids = _train_centroids_from_parquet(sf_dir, n_clusters, sample_size)
    dim = centroids.shape[1]
    cos = COSINE_SQL.format(a="q.embedding", b="n.embedding")
    return f"""
    WITH centroids(cid, c) AS (VALUES
    {_matrix_values(centroids)}),
    dots AS (
      SELECT e.vec_id, ct.cid,
             list_sum(list_transform(range(1, {dim + 1}),
               i -> CAST(e.embedding[i] AS DOUBLE) * (ct.c)[i])) AS d
      FROM embeddings e, centroids ct
    ),
    assign AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM dots) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid DESC) AS rn
        FROM dots WHERE vec_id < {n_queries}) WHERE rn <= {n_probe}
    ),
    cands AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM assign a JOIN probes p ON a.cluster = p.cluster
      WHERE a.vec_id != p.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id, {cos} AS cos
      FROM cands c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings n ON n.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM scored QUALIFY rank <= {k}
    """


# ---------------------------------------------------------------------------
# persistent IVF index (build once, serve many query batches)
# ---------------------------------------------------------------------------

_IVF_META = "_ivf_meta.json"


def build_ivf_index(
    emb: DataFrame,
    store_dir: str,
    n_clusters: int = 16,
    sample_size: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF serving index: the trained coarse quantizer
    (centroids, in a JSON meta file — ``repr`` floats roundtrip
    float64 exactly, so a reload is bit-identical) plus the inverted
    lists (every vector with its assigned cluster, parquet partitioned
    BY CLUSTER so a probe reads only its n_probe list partitions).

    ``ivf_ann_topk`` retrains and re-assigns per call — right for a
    one-shot query, wrong for a serving corpus: a real 100 TB index is
    built once (one training sample + one assignment pass over the
    corpus) and then answers many query batches at O(probed lists)
    each. The index is immutable once built (serving-index contract —
    the same reason the dedup store fail-stops on parameter drift):
    building into a non-empty ``store_dir`` raises; reindex into a
    fresh directory and swap."""
    from outboxx_spark.fsutil import fs_exists, fs_write_text

    spark = emb.sparkSession
    if fs_exists(spark, f"{store_dir}/{_IVF_META}"):
        raise ValueError(
            f"IVF index at {store_dir} already exists; indexes are "
            "immutable — build into a fresh directory and swap"
        )
    centroids = _train_corpus_centroids(emb, n_clusters, sample_size, id_col, vec_col)
    assign = ivf_assign_udf(centroids)
    (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            assign(F.col(vec_col)).alias("cluster"),
        )
        .repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{store_dir}/lists")
    )
    # meta written LAST: readers treat its presence as the commit mark,
    # so a crash mid-build leaves an unreadable (never half-served) dir
    meta = {
        "n_clusters": n_clusters,
        "sample_size": sample_size,
        "dim": int(centroids.shape[1]),
        "centroids": [[float(x) for x in row] for row in centroids],
    }
    import json as _json

    fs_write_text(spark, f"{store_dir}/{_IVF_META}", _json.dumps(meta))


def ivf_ann_topk_from_store(
    spark,
    store_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Serve a query batch from a persisted IVF index: rank each
    query's centroids from the stored quantizer (driver-side — the
    query batch is bounded by contract, like every ANN query set here),
    then exact-cosine re-rank ONLY the probed list partitions. Equals
    :func:`ivf_ann_topk` on the same corpus/queries bit-for-bit
    (pytest-pinned): the stored centroids reload exactly, so
    assignment, probes, and re-rank replay the same arithmetic. The
    corpus scan is partition-pruned with an explicit cluster filter
    (driver knows the probe set), so served cost is O(probed lists),
    not O(corpus).

    ID contract: with ``exclude_self=True`` (the default, and the
    pinned-equality contract with ``ivf_ann_topk``) query ids are
    assumed DRAWN FROM THE CORPUS id space, and a candidate whose
    ``neighbor_id`` equals the query id is excluded as "the query
    itself". An EXTERNAL query batch whose ids are a different
    namespace must pass ``exclude_self=False`` — otherwise an id that
    coincidentally collides with a corpus vec_id silently loses a
    legitimate neighbor."""
    import json as _json

    from outboxx_spark.fsutil import fs_read_text

    raw = fs_read_text(spark, f"{store_dir}/{_IVF_META}")
    if raw is None:
        raise ValueError(f"no IVF index at {store_dir} (missing {_IVF_META})")
    meta = _json.loads(raw)
    centroids = np.array(meta["centroids"], dtype=np.float64)

    qpd = queries.select(id_col, vec_col).toPandas()
    if len(qpd) == 0:
        # steady-state serving can legitimately see an empty query
        # batch; answer with an empty frame, not a vstack crash
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank long"
        )
    qm = np.vstack(qpd[vec_col].to_numpy()).astype(np.float64)
    probes = (qm @ centroids.T).argsort(axis=1, kind="stable")[:, ::-1][:, :n_probe]
    probe_rows = [
        (int(qid), int(c)) for qid, cs in zip(qpd[id_col], probes) for c in cs
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, cluster int")
    probed_clusters = sorted({c for _, c in probe_rows})

    corpus = (
        spark.read.parquet(f"{store_dir}/lists")
        .filter(F.col("cluster").isin(probed_clusters))
        .select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "cluster")
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


def kmeans_assignments(
    emb: DataFrame,
    n_clusters: int = 16,
    sample_size: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus clustering as a first-class query: every vector's
    coarse-quantizer cluster id plus the cluster population — the
    partitioning step of IVF indexing, diversity-balanced sampling, or
    per-cluster corpus curation.

    100 TB shape: centroids train on a bounded driver-side sample and
    ride to executors as a broadcast constant inside one Arrow-batched
    matmul; the only shuffle is the final population count on a
    ``n_clusters``-value domain (map-side combinable)."""
    centroids = _train_corpus_centroids(emb, n_clusters, sample_size, id_col, vec_col)
    # Materialize the 2-column assignment once: it feeds BOTH the
    # population count and the join's left side, and without the cut
    # Catalyst plans two full scan+matmul branches (r8 plan audit: two
    # parquet scans, four ArrowEvalPython nodes). The checkpoint is
    # (vid, cluster) — tiny next to re-running the corpus matmul — and
    # the corpus still never shuffles (the count aggregates to
    # n_clusters values map-side; windowing by cluster instead would
    # funnel the corpus through n_clusters reducers).
    assigned = ivf_assignments(emb, centroids, id_col, vec_col).localCheckpoint(
        eager=True
    )
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (
        assigned.join(F.broadcast(sizes), "cluster")
        .select(F.col("vid").alias(id_col), "cluster", "cluster_size")
    )


def kmeans_assignments_sql(
    n_clusters: int = 16, sample_size: int = 1024, sf_dir: str | None = None
) -> str:
    """Mirror of :func:`kmeans_assignments`: identical centroid
    retraining (see ivf_ann_topk_sql for the determinism and ulp-tie
    notes), argmax assignment with first-wins ties, then the
    population join."""
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    centroids = _train_centroids_from_parquet(sf_dir, n_clusters, sample_size)
    dim = centroids.shape[1]
    return f"""
    WITH centroids(cid, c) AS (VALUES
    {_matrix_values(centroids)}),
    dots AS (
      SELECT e.vec_id, ct.cid,
             list_sum(list_transform(range(1, {dim + 1}),
               i -> CAST(e.embedding[i] AS DOUBLE) * (ct.c)[i])) AS d
      FROM embeddings e, centroids ct
    ),
    assign AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM dots) WHERE rn = 1
    ),
    sizes AS (
      SELECT cluster, count(*) AS cluster_size FROM assign GROUP BY cluster
    )
    SELECT a.vec_id, a.cluster, s.cluster_size
    FROM assign a JOIN sizes s USING (cluster)
    """


def diversity_sample(
    emb: DataFrame,
    fraction: float = 0.25,
    n_clusters: int = 16,
    sample_size: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-stratified coreset selection — the training-data
    curation step that downsamples a corpus while preserving its
    semantic spread: per k-means cluster, keep ``ceil(fraction *
    cluster_size)`` vectors, closest-to-centroid first (the cluster's
    most representative members), ties broken by id.

    Output is float-free (vec_id, cluster, keep_rank): ranks come from
    an exact cosine between each vector and its assigned centroid
    computed with the SEQUENTIAL fold (:func:`cosine`) against the
    centroid inlined as a literal array column — the same summation
    order as the DuckDB mirror's ``list_sum`` fold, so the ranking is
    reproducible across engines (the Arrow argmax assignment carries
    the documented sub-ulp-tie assumption of :func:`ivf_ann_topk_sql`).

    100 TB shape: centroids are a broadcast constant (trained on a
    bounded driver-side sample); assignment is one Arrow matmul
    computed INLINE in the projection that keeps the vector — no
    corpus-scale self-join to reattach cluster ids; the centroid
    lookup is a broadcast join on an ``n_clusters``-row dim; ranking
    is one window partitioned BY CLUSTER — no global sort. For very
    hot clusters at extreme scale, swap the window for a per-cluster
    approximate threshold (quantile of the score) to avoid a
    single-reducer cluster; at sane cluster counts the window is the
    exact, simpler choice."""
    spark = emb.sparkSession
    centroids = _train_corpus_centroids(emb, n_clusters, sample_size, id_col, vec_col)
    assign = ivf_assign_udf(centroids)
    cent_df = spark.createDataFrame(
        [(c, [float(x) for x in centroids[c]]) for c in range(n_clusters)],
        "cluster int, c array<double>",
    )
    scored = (
        emb.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
            assign(F.col(vec_col)).alias("cluster"),
        )
        .join(F.broadcast(cent_df), "cluster")
        .select(
            "vid",
            "cluster",
            F.round(cosine(F.col("v"), F.col("c")), 6).alias("score"),
        )
    )
    # The ranking window already shuffles by cluster, so the cluster
    # population rides the SAME pass as an unordered count window —
    # the previous groupBy+broadcast-join consumed `scored` twice and
    # Catalyst planned the whole assignment+cosine twice (r8 plan
    # audit: two scans, four ArrowEvalPython nodes). One consumer, one
    # shuffle, one evaluation.
    quota = F.ceil(F.lit(float(fraction)) * F.col("n")).cast("int")
    w = W.partitionBy("cluster").orderBy(F.col("score").desc(), F.col("vid"))
    w_all = W.partitionBy("cluster")
    return (
        scored.withColumn("keep_rank", F.row_number().over(w))
        .withColumn("n", F.count("*").over(w_all))
        .filter(F.col("keep_rank") <= quota)
        .select(F.col("vid").alias(id_col), "cluster", "keep_rank")
    )


def diversity_sample_sql(
    fraction: float = 0.25,
    n_clusters: int = 16,
    sample_size: int = 1024,
    sf_dir: str | None = None,
) -> str:
    """Mirror of :func:`diversity_sample`: identical centroid retrain,
    argmax assignment (first-wins ties), sequential-fold cosine to the
    assigned centroid rounded to 6dp, per-cluster rank, ceil quota."""
    import os

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    centroids = _train_centroids_from_parquet(sf_dir, n_clusters, sample_size)
    dim = centroids.shape[1]
    return f"""
    WITH centroids(cid, c) AS (VALUES
    {_matrix_values(centroids)}),
    dots AS (
      SELECT e.vec_id, ct.cid,
             list_sum(list_transform(range(1, {dim + 1}),
               i -> CAST(e.embedding[i] AS DOUBLE) * (ct.c)[i])) AS d
      FROM embeddings e, centroids ct
    ),
    assign AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM dots) WHERE rn = 1
    ),
    scored AS (
      SELECT a.vec_id, a.cluster,
             round(
               list_sum(list_transform(range(1, {dim + 1}),
                 i -> CAST(e.embedding[i] AS DOUBLE) * (ct.c)[i]))
               / (sqrt(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(ct.c, x -> x * x)))),
               6) AS score
      FROM assign a
      JOIN embeddings e ON e.vec_id = a.vec_id
      JOIN centroids ct ON ct.cid = a.cluster
    ),
    sizes AS (SELECT cluster, count(*) AS n FROM scored GROUP BY cluster)
    SELECT s.vec_id, s.cluster,
           CAST(row_number() OVER (PARTITION BY s.cluster
                                   ORDER BY s.score DESC, s.vec_id)
                AS INTEGER) AS keep_rank
    FROM scored s JOIN sizes z USING (cluster)
    QUALIFY keep_rank <= CAST(ceil(CAST({fraction!r} AS DOUBLE) * z.n) AS INTEGER)
    """
