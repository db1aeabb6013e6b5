"""Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540).

Embedding-space near-duplicate *pruning* as a corpus-curation pass:
cluster the corpus with the shared coarse quantizer, then inside each
cluster drop every vector that is semantically redundant with an
earlier one. Unlike the pairwise near-dup queries
(:mod:`outboxx_spark.dataops.similarity`), the output here is the
SURVIVOR SET — the corpus a training pipeline would actually keep.

Semantics (deterministic, SQL-expressible): a vector is dropped iff
some SAME-CLUSTER vector with a SMALLER id has cosine >= threshold to
it. This is the "keep the first seen" tie-break of the paper's
keep-one-per-similar-group rule, made order-free: the comparison set
is all earlier ids, not the greedy survivor chain, so the answer is a
pure function of the corpus (no iteration order), and the DuckDB
oracle can state it as a NOT EXISTS.

Scale shape (100 TB):
- Clustering is the shared recipe (`_train_corpus_centroids`):
  bounded driver-side sample, centroids ride as a broadcast constant
  into one Arrow matmul; the corpus never shuffles for assignment.
- Candidate generation is a WITHIN-CLUSTER self-join on the cluster
  id — the paper's cost model exactly (quadratic inside a cluster,
  zero across). Cluster size is the knob: n_clusters scales with the
  corpus so each cluster stays executor-sized; the join shuffles the
  (id, cluster) pair stream only, vectors are fetched by the shared
  verify kernel afterwards.
- The threshold test is `_verify_pairs` — the Arrow sequential-fold
  kernel already pinned bit-identical to the JVM fold and DuckDB's
  `list_sum` (similarity.py), so the oracle compare is exact.

This module is deliberately separate from similarity.py: the
touched-query rotation (tools/touched_queries.py) tracks change at
module granularity, and the semantic-dedup surface evolving must not
flag the eleven emb_* tail queries for driver re-evidence.

Reference parity: the reference engine has no embedding operators at
all (SURVEY.md §2.9 — absent operator classes); this is part of the
LLM-training-data surface built Spark-first on top of its CDC core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from outboxx_spark.dataops.similarity import (
    COSINE_SQL,
    _matrix_values,
    _train_centroids_from_parquet,
    _train_corpus_centroids,
    _verify_pairs,
    ivf_assignments,
    with_planted_near_dups,
    PLANTED_AUG_SQL,
)


def semantic_dedup(
    emb: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.8,
    sample_size: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Survivors of semantic dedup: (vec_id, cluster) for every vector
    NOT dropped. Dropped = some smaller-id same-cluster vector has
    cosine >= threshold.

    Centroids train on the BASE corpus passed in (callers that plant
    near-dups train before planting — the oracle replays training from
    the parquet file, which never contains the planted rows)."""
    centroids = _train_corpus_centroids(emb, n_clusters, sample_size, id_col, vec_col)
    return semantic_dedup_with_centroids(
        emb, centroids, threshold=threshold, id_col=id_col, vec_col=vec_col
    )


def semantic_dedup_with_centroids(
    emb: DataFrame,
    centroids,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Core pass, centroids supplied (so the planted query can train on
    the unplanted corpus and then dedup the augmented one)."""
    # (vid, cluster): one Arrow matmul, corpus never shuffles here.
    # localCheckpoint for the same reason as kmeans_assignments: the
    # assignment feeds both sides of the self-join and the final
    # survivor projection — without the cut Catalyst re-runs the scan
    # + matmul once per branch (three ArrowEvalPython nodes, r10 plan
    # read).
    assigned = ivf_assignments(emb, centroids, id_col, vec_col).localCheckpoint(
        eager=True
    )
    a = assigned.select(F.col("vid").alias("id_a"), F.col("cluster").alias("ca"))
    b = assigned.select(F.col("vid").alias("id_b"), F.col("cluster").alias("cb"))
    # Within-cluster candidate pairs — the ONLY quadratic surface, and
    # it is per-cluster (the SemDeDup cost model). The join carries
    # 2-column rows; vectors join in inside _verify_pairs.
    cand = a.join(b, (F.col("ca") == F.col("cb")) & (F.col("id_a") < F.col("id_b"))).select(
        "id_a", "id_b"
    )
    dropped = (
        _verify_pairs(emb, cand, threshold, id_col, vec_col)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.select(F.col("vid").alias("vec_id"), "cluster")
        .join(dropped, "vec_id", "left_anti")
    )


def planted_semantic_dedup(
    spark, sf_dir: str, n_clusters: int = 16, threshold: float = 0.8, n_plant: int = 50
) -> DataFrame:
    """The driver/oracle query: plant near-identical copies (cosine >=
    0.9996 to their sources, similarity.with_planted_near_dups), then
    run semantic dedup — every planted copy that lands in its source's
    cluster is dropped, so the survivor set is a real, analytically
    explainable subset rather than the trivial whole corpus (natural
    pairs top out near cosine 0.6 < 0.8)."""
    from outboxx_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = _train_corpus_centroids(emb, n_clusters, 1024)
    # The augmented corpus feeds the assignment pass AND both vector
    # sides of the verify join; un-cut, each consumer re-runs the
    # scan + planted-union (4 embeddings scans in the r13 sink plan).
    # The frame is tiny (n + n_plant rows of one 64-float vector), so
    # one eager checkpoint is strictly narrower than its recompute.
    aug = with_planted_near_dups(emb, n_plant=n_plant).localCheckpoint(eager=True)
    return semantic_dedup_with_centroids(aug, centroids, threshold=threshold)


def planted_semantic_dedup_sql(
    n_clusters: int = 16,
    threshold: float = 0.8,
    n_plant: int = 50,
    sample_size: int = 1024,
    sf_dir: str | None = None,
) -> str:
    """DuckDB mirror: centroid training replayed from the parquet file
    (identical recipe — see ivf_ann_topk_sql's determinism notes),
    argmax assignment with first-wins ties over the PLANTED corpus,
    then the NOT EXISTS drop rule with the exact sequential-fold
    cosine."""
    import os

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    centroids = _train_centroids_from_parquet(sf_dir, n_clusters, sample_size)
    dim = centroids.shape[1]
    cos = COSINE_SQL.format(a="ea.embedding", b="eb.embedding")
    return (
        "WITH "
        + PLANTED_AUG_SQL.format(n_plant=n_plant)
        + f""",
    centroids(cid, c) AS (VALUES
    {_matrix_values(centroids)}),
    dots AS (
      SELECT a.vec_id, ct.cid,
             list_sum(list_transform(range(1, {dim + 1}),
               i -> CAST(a.embedding[i] AS DOUBLE) * (ct.c)[i])) AS d
      FROM aug a, centroids ct
    ),
    assign AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM dots) WHERE rn = 1
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assign a JOIN assign b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN aug ea ON ea.vec_id = a.vec_id
      JOIN aug eb ON eb.vec_id = b.vec_id
      WHERE {cos} >= {threshold}
    )
    SELECT s.vec_id, s.cluster
    FROM assign s
    WHERE s.vec_id NOT IN (SELECT vec_id FROM dropped)
    """
    )
