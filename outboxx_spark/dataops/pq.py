"""Product quantization (PQ) for embedding search at corpus scale.

PQ (Jegou, Douze, Schmid: "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) splits each d-dim vector into ``m`` subvectors
and vector-quantizes each subspace against its own ``k``-entry
codebook, so a vector compresses to ``m`` small integers (here
16 4-bit codes ~ 8 bytes vs 256 bytes of float32 — 32x) and query-to-vector
distance is approximated by ADC (asymmetric distance computation): a
per-query lookup table of ``m x k`` exact query-to-centroid distances,
summed across subspaces by code index — no float vector is ever read
at scan time.

Scale shape (100 TB):

- Codebooks are trained ONCE on a driver-side sample (deterministic
  k-means per subspace — same discipline as the IVF coarse quantizer
  in :mod:`similarity`) and ride every executor as a broadcast-sized
  closure constant (m*k*sub_dim doubles ~ 8 KB here).
- Encoding is a narrow Arrow-batched map (one BLAS matmul per
  subspace per batch), shuffle-free; the code column is what you
  persist — the corpus scan for a query reads m ints per row instead
  of the vector column.
- ADC scoring is a broadcast of n_queries tiny LUTs against the code
  table — a linear scan (the honest baseline PQ is), and the natural
  composition with the existing IVF lists (probe, then ADC inside the
  probed lists) when a linear scan is too much.
- Everything after encode is pure relational algebra with a
  sequential-fold score expression — inside whole-stage codegen, no
  Python in the scoring path.

Cross-engine determinism (the repo's oracle discipline): codebooks
and LUTs are computed by ONE numpy routine replayed from the same
parquet by the SQL-oracle builder, then inlined as full-precision
literals; the ADC sum is a sequential fold in subspace order on both
engines (Spark ``aggregate``/``zip_with`` vs DuckDB
``list_sum(list_transform(range ...))``), so scores are bit-identical
given equal codes. Code assignment compares numpy-BLAS distances on
the Spark side with DuckDB's sequential folds — same 1-ulp argmin
caveat as the IVF assignment (similarity.ivf_ann_topk_sql): a
rank-relevant sub-ulp tie is negligible on float data and would flip
a candidate's CODE, failing the gate loudly, never silently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

PQ_M = 16  # subspaces
PQ_K = 16  # codes per subspace (4 bits -> 16x4 = 8 bytes per vector)
PQ_SAMPLE = 256  # training-sample rows (first by vec_id)
PQ_ITERS = 8
PQ_SHORTLIST = 100  # ADC candidates fed to the exact re-rank


def _pq_train(sample: np.ndarray, m: int = PQ_M, k: int = PQ_K) -> np.ndarray:
    """Deterministic per-subspace L2 k-means -> (m, k, sub_dim)
    codebooks. Init = evenly spaced sample rows; assignment =
    first-wins argmin of ||v - c||^2 (computed as ||c||^2 - 2 v.c, the
    +||v||^2 term is constant per row); update = member mean; an empty
    cluster keeps its previous centroid. No normalization — PQ
    quantizes the raw subvectors."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sd = d // m
    books = np.empty((m, k, sd), dtype=np.float64)
    for mm in range(m):
        sub = sample[:, mm * sd : (mm + 1) * sd]
        cent = sub[np.linspace(0, n - 1, k).astype(int)].copy()
        for _ in range(PQ_ITERS):
            dist = (cent * cent).sum(axis=1) - 2.0 * (sub @ cent.T)
            assign = dist.argmin(axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[mm] = cent
    return books


def _sample_matrix_from_df(
    emb: DataFrame, sample_size: int, id_col: str, vec_col: str
) -> np.ndarray:
    rows = emb.orderBy(id_col).limit(sample_size).select(vec_col).toPandas()[vec_col]
    return np.vstack(rows.to_numpy()).astype(np.float64)


def pq_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    sample_size: int = PQ_SAMPLE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train codebooks on the first ``sample_size`` vectors by id —
    bounded driver work, replayable bit-for-bit from the parquet by
    :func:`pq_codebooks_from_parquet` (the oracle side)."""
    return _pq_train(_sample_matrix_from_df(emb, sample_size, id_col, vec_col), m, k)


def pq_codebooks_from_parquet(
    sf_dir: str, m: int = PQ_M, k: int = PQ_K, sample_size: int = PQ_SAMPLE
) -> np.ndarray:
    """Oracle replay of :func:`pq_codebooks`: same rows, same numpy."""
    import os

    import pyarrow.parquet as pq_

    t = pq_.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    pdf = t.to_pandas().sort_values("vec_id").head(sample_size)
    sample = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    return _pq_train(sample, m, k)


def pq_encode_udf(codebooks: np.ndarray):
    """codes(vec) = per-subspace first-wins argmin of
    ||c||^2 - 2 v.c — one Arrow-batched matmul per subspace."""
    m, k, sd = codebooks.shape
    cnorm = (codebooks * codebooks).sum(axis=2)  # (m, k)

    @F.pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        V = np.vstack(vecs.to_numpy()).astype(np.float64)
        codes = np.empty((len(V), m), dtype=np.int32)
        for mm in range(m):
            sub = V[:, mm * sd : (mm + 1) * sd]
            dist = cnorm[mm] - 2.0 * (sub @ codebooks[mm].T)
            codes[:, mm] = dist.argmin(axis=1)
        return pd.Series(list(codes))

    return encode


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int> length m) — the persisted form."""
    enc = pq_encode_udf(codebooks)
    return emb.select(F.col(id_col).alias("vec_id"), enc(F.col(vec_col)).alias("codes"))


def _pq_luts(queries: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Per-query flat ADC table, length m*k: lut[mm*k + j] =
    ||c||^2 - 2 q_sub.c (the per-subspace +||q_sub||^2 constant is
    dropped — it shifts every candidate's score equally within a
    query). ONE routine feeding both engines as literals."""
    m, k, sd = codebooks.shape
    nq = len(queries)
    lut = np.empty((nq, m * k), dtype=np.float64)
    cnorm = (codebooks * codebooks).sum(axis=2)
    for mm in range(m):
        qsub = queries[:, mm * sd : (mm + 1) * sd]
        lut[:, mm * k : (mm + 1) * k] = cnorm[mm] - 2.0 * (qsub @ codebooks[mm].T)
    return lut


def pq_adc_ranked(
    emb: DataFrame,
    books: np.ndarray,
    n_queries: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, adc_rank): every corpus vector ranked
    per query by ADC distance (ascending, ties by neighbor id)."""
    m, k, _ = books.shape
    codes = pq_encode(emb, books, id_col, vec_col)
    qpd = emb.filter(F.col(id_col) < n_queries).select(id_col, vec_col).toPandas()
    qm = np.vstack(qpd[vec_col].to_numpy()).astype(np.float64)
    luts = _pq_luts(qm, books)
    lut_df = emb.sparkSession.createDataFrame(
        [(int(qid), lut.tolist()) for qid, lut in zip(qpd[id_col], luts)],
        "query_id long, lut array<double>",
    )

    # sequential fold in subspace order (cross-engine bit-stable)
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, i: F.element_at(
                F.col("lut"), (i * F.lit(k) + c + F.lit(1)).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        codes.crossJoin(F.broadcast(lut_df))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), score.alias("adc"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("neighbor_id"))
    return scored.withColumn("adc_rank", F.row_number().over(w).cast("long"))


def pq_topk(
    emb: DataFrame,
    n_queries: int = 10,
    topk: int = 10,
    m: int = PQ_M,
    k: int = PQ_K,
    sample_size: int = PQ_SAMPLE,
    shortlist: int = PQ_SHORTLIST,
    rerank: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage PQ search, the production shape: ADC over the code
    table cuts the corpus to a per-query ``shortlist``, then ONLY the
    shortlist rows fetch their float vectors for an exact cosine
    re-rank — at scale the vector column is read for shortlist-many
    rows per query instead of the whole corpus (measured here:
    shortlist 100 of the exact scan's recall\\@10 = 0.96 at 32x code
    compression vs 0.26 for raw ADC ranks at the same code budget).
    ``rerank=False`` returns the raw ADC ranking (the model the tests
    pin numerically).

    Output float-free (query_id, neighbor_id, rank); same contract as
    the other ANN operators (cosine descending, ties by neighbor id).
    """
    books = pq_codebooks(emb, m, k, sample_size, id_col, vec_col)
    ranked = pq_adc_ranked(emb, books, n_queries, id_col, vec_col)
    if not rerank:
        return (
            ranked.filter(F.col("adc_rank") <= topk)
            .select("query_id", "neighbor_id", F.col("adc_rank").alias("rank"))
        )
    from outboxx_spark.dataops.similarity import cosine

    short = ranked.filter(F.col("adc_rank") <= shortlist).select(
        "query_id", "neighbor_id"
    )
    qv = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    nv = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    rescored = (
        short.join(nv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_pq_topk(
    emb: DataFrame,
    n_queries: int = 10,
    topk: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    coarse_sample: int = 1024,
    m: int = PQ_M,
    k: int = PQ_K,
    sample_size: int = PQ_SAMPLE,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the composition production ANN systems actually run at
    scale. The IVF coarse quantizer (similarity.py's deterministic
    recipe, unchanged) prunes the corpus to each query's ``n_probe``
    inverted lists; ADC over the PQ codes ranks ONLY those lists (no
    float vector is read); the per-query shortlist then fetches its
    vectors for the exact cosine re-rank. Scan cost per query:
    ~n_probe/n_clusters of the corpus in 8-byte codes + ``shortlist``
    float vectors — vs the whole corpus in floats for the exact scan.

    Output contract matches the other ANN operators (query_id,
    neighbor_id, rank; cosine descending, ties by neighbor id)."""
    from outboxx_spark.dataops.similarity import (
        _train_corpus_centroids,
        cosine,
        ivf_assignments,
    )

    cents = _train_corpus_centroids(emb, n_clusters, coarse_sample, id_col, vec_col)
    books = pq_codebooks(emb, m, k, sample_size, id_col, vec_col)
    # the probe join's key must be PROVABLY non-null: joining on the
    # raw UDF column lets InferFiltersFromConstraints push an
    # isnotnull(cluster) below the join and re-evaluate the assignment
    # kernel a second time above it (plan-audited; same Catalyst trap
    # as the r8 dedup band-kernel fix). coalesce with a literal makes
    # the constraint trivially satisfied, so the filter — and the
    # duplicate ArrowEvalPython node — never appear. The assignment
    # itself never returns null; -1 matches no probe.
    assigned = ivf_assignments(emb, cents, id_col, vec_col).select(
        F.col("vid").alias("vec_id"),
        F.coalesce(F.col("cluster"), F.lit(-1)).alias("cluster"),
    )
    coded = pq_encode(emb, books, id_col, vec_col).join(assigned, "vec_id")

    qpd = emb.filter(F.col(id_col) < n_queries).select(id_col, vec_col).toPandas()
    qm = np.vstack(qpd[vec_col].to_numpy()).astype(np.float64)
    # same probe tie convention as ivf_ann_topk: stable argsort
    # reversed = higher cid first on exact ties
    probes = (qm @ cents.T).argsort(axis=1, kind="stable")[:, ::-1][:, :n_probe]
    probe_df = emb.sparkSession.createDataFrame(
        [(int(q), int(c)) for q, cs in zip(qpd[id_col], probes) for c in cs],
        "query_id long, cluster int",
    )
    luts = _pq_luts(qm, books)
    lut_df = emb.sparkSession.createDataFrame(
        [(int(qid), lut.tolist()) for qid, lut in zip(qpd[id_col], luts)],
        "query_id long, lut array<double>",
    )

    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, i: F.element_at(
                F.col("lut"), (i * F.lit(k) + c + F.lit(1)).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cands = (
        coded.join(F.broadcast(probe_df), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(lut_df), "query_id")
        .select("query_id", F.col("vec_id").alias("neighbor_id"), score.alias("adc"))
    )
    wa = W.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("neighbor_id"))
    short = (
        cands.withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    qv = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    nv = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    rescored = (
        short.join(nv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "rank")
    )


def _lut_values(luts: np.ndarray, qids) -> str:
    return ",\n    ".join(
        f"({int(q)}, [" + ", ".join(repr(float(x)) for x in row) + "])"
        for q, row in zip(qids, luts)
    )


def _book_values(codebooks: np.ndarray) -> str:
    m, k, _ = codebooks.shape
    cnorm = (codebooks * codebooks).sum(axis=2)
    rows = []
    for mm in range(m):
        for kk in range(k):
            c = "[" + ", ".join(repr(float(x)) for x in codebooks[mm, kk]) + "]"
            rows.append(f"({mm}, {kk}, {repr(float(cnorm[mm, kk]))}, {c})")
    return ",\n    ".join(rows)


def pq_topk_sql(
    n_queries: int = 10,
    topk: int = 10,
    m: int = PQ_M,
    k: int = PQ_K,
    sample_size: int = PQ_SAMPLE,
    shortlist: int = PQ_SHORTLIST,
    sf_dir: str | None = None,
) -> str:
    """Mirror of :func:`pq_topk` (rerank=True): codebooks and LUTs
    retrained/rebuilt at SQL-build time from the same parquet and
    inlined as literals; code assignment via row_number (first-wins
    ties = lowest code, the numpy argmin convention); ADC = sequential
    fold over the code list in subspace order; exact cosine re-rank of
    the shortlist (COSINE_SQL, the same fold the Spark side uses)."""
    import os

    import pyarrow.parquet as pq_

    from outboxx_spark.dataops.similarity import COSINE_SQL

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    books = pq_codebooks_from_parquet(sf_dir, m, k, sample_size)
    sd = books.shape[2]
    t = pq_.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    pdf = t.to_pandas().sort_values("vec_id")
    qpdf = pdf[pdf["vec_id"] < n_queries]
    qm = np.vstack(qpdf["embedding"].to_numpy()).astype(np.float64)
    luts = _pq_luts(qm, books)
    cos = COSINE_SQL.format(a="q.embedding", b="n.embedding")
    return f"""
    WITH cb(mm, kk, cnorm, c) AS (VALUES
    {_book_values(books)}),
    dists AS (
      SELECT e.vec_id, cb.mm, cb.kk,
             cb.cnorm - 2 * list_sum(list_transform(range(1, {sd + 1}),
               i -> (cb.c)[i] * CAST(e.embedding[cb.mm * {sd} + i] AS DOUBLE))) AS d
      FROM embeddings e, cb
    ),
    codes AS (
      SELECT vec_id, mm, kk AS code FROM (
        SELECT vec_id, mm, kk,
               row_number() OVER (PARTITION BY vec_id, mm ORDER BY d, kk) AS rn
        FROM dists) WHERE rn = 1
    ),
    codevec AS (
      SELECT vec_id, list(code ORDER BY mm) AS codes FROM codes GROUP BY vec_id
    ),
    luts(query_id, lut) AS (VALUES
    {_lut_values(luts, qpdf["vec_id"])}),
    adc AS (
      SELECT CAST(l.query_id AS BIGINT) AS query_id, cv.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {m + 1}),
               i -> (l.lut)[(i - 1) * {k} + (cv.codes)[i] + 1])) AS adc
      FROM codevec cv, luts l
      WHERE cv.vec_id != l.query_id
    ),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc, neighbor_id) AS arn
        FROM adc) WHERE arn <= {shortlist}
    ),
    rescored AS (
      SELECT s.query_id, s.neighbor_id, {cos} AS cos
      FROM short s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings n ON n.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM rescored QUALIFY rank <= {topk}
    """


def ivf_pq_topk_sql(
    n_queries: int = 10,
    topk: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    coarse_sample: int = 1024,
    m: int = PQ_M,
    k: int = PQ_K,
    sample_size: int = PQ_SAMPLE,
    shortlist: int = 50,
    sf_dir: str | None = None,
) -> str:
    """Mirror of :func:`ivf_pq_topk`: the IVF assignment/probe CTEs of
    similarity.ivf_ann_topk_sql (same retrained centroids, same tie
    conventions) composed with the PQ code/LUT CTEs of
    :func:`pq_topk_sql` — ADC runs only inside the probed lists, then
    the exact cosine re-rank."""
    import os

    import pyarrow.parquet as pq_

    from outboxx_spark.dataops.similarity import (
        COSINE_SQL,
        _matrix_values,
        _train_centroids_from_parquet,
    )

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    cents = _train_centroids_from_parquet(sf_dir, n_clusters, coarse_sample)
    dim = cents.shape[1]
    books = pq_codebooks_from_parquet(sf_dir, m, k, sample_size)
    sd = books.shape[2]
    t = pq_.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    pdf = t.to_pandas().sort_values("vec_id")
    qpdf = pdf[pdf["vec_id"] < n_queries]
    qm = np.vstack(qpdf["embedding"].to_numpy()).astype(np.float64)
    luts = _pq_luts(qm, books)
    cos = COSINE_SQL.format(a="q.embedding", b="n.embedding")
    return f"""
    WITH centroids(cid, c) AS (VALUES
    {_matrix_values(cents)}),
    cdots AS (
      SELECT e.vec_id, ct.cid,
             list_sum(list_transform(range(1, {dim + 1}),
               i -> CAST(e.embedding[i] AS DOUBLE) * (ct.c)[i])) AS d
      FROM embeddings e, centroids ct
    ),
    assign AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM cdots) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid DESC) AS rn
        FROM cdots WHERE vec_id < {n_queries}) WHERE rn <= {n_probe}
    ),
    cb(mm, kk, cnorm, c) AS (VALUES
    {_book_values(books)}),
    dists AS (
      SELECT e.vec_id, cb.mm, cb.kk,
             cb.cnorm - 2 * list_sum(list_transform(range(1, {sd + 1}),
               i -> (cb.c)[i] * CAST(e.embedding[cb.mm * {sd} + i] AS DOUBLE))) AS d
      FROM embeddings e, cb
    ),
    codes AS (
      SELECT vec_id, mm, kk AS code FROM (
        SELECT vec_id, mm, kk,
               row_number() OVER (PARTITION BY vec_id, mm ORDER BY d, kk) AS rn
        FROM dists) WHERE rn = 1
    ),
    codevec AS (
      SELECT vec_id, list(code ORDER BY mm) AS codes FROM codes GROUP BY vec_id
    ),
    luts(query_id, lut) AS (VALUES
    {_lut_values(luts, qpdf["vec_id"])}),
    adc AS (
      SELECT CAST(p.query_id AS BIGINT) AS query_id,
             a.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {m + 1}),
               i -> (l.lut)[(i - 1) * {k} + (cv.codes)[i] + 1])) AS adc
      FROM probes p
      JOIN assign a ON a.cluster = p.cluster
      JOIN codevec cv ON cv.vec_id = a.vec_id
      JOIN luts l ON l.query_id = p.query_id
      WHERE a.vec_id != p.query_id
    ),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc, neighbor_id) AS arn
        FROM adc) WHERE arn <= {shortlist}
    ),
    rescored AS (
      SELECT s.query_id, s.neighbor_id, {cos} AS cos
      FROM short s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings n ON n.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM rescored QUALIFY rank <= {topk}
    """
