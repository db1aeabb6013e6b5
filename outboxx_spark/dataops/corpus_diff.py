"""Corpus-version diff: what changed between two crawls of a corpus.

A training-data pipeline re-ingests sources (crawl N vs crawl N+1) and
needs the delta — which documents appeared, vanished, or changed — to
do incremental downstream work (re-dedup only the added set, expire
embeddings of removed docs, re-score changed ones). This is
`operators/materialize.snapshot_diff`'s idea applied to a document
corpus, but keyed by doc_id and compared by CONTENT FINGERPRINT: one
full-outer join on doc_id, md5 vs md5 (both engines compute identical
hex digests, so the oracle is exact), emitting only the non-identical
rows (`added` / `removed` / `changed` — the unchanged bulk never
leaves the join).

Scale (100 TB): both sides shuffle once on doc_id (or zero times if
the corpus versions are bucket-stored on doc_id, the table-sink
layout); the fingerprint reduces the compare to 16 bytes per side —
full text never crosses the exchange because the md5 projects before
the shuffle. Output is proportional to the DELTA, not the corpus.

The testbed has one `documents` table, so the driver query PLANTS the
two versions deterministically (the emb_near_dup_lsh precedent):
v_old = docs except doc_id % 7 == 0 (these become `added`), v_new =
docs except doc_id % 11 == 0 (`removed`), and doc_id % 5 == 0 text
gets a marker suffix in v_new (`changed`). Modular arithmetic keeps
both engines' plants identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.sources.tables import read_table


def corpus_diff(
    old: DataFrame, new: DataFrame, key: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Row-level delta between two corpus versions: ``added`` (key only
    in new), ``removed`` (only in old), ``changed`` (fingerprint
    differs). Unchanged rows are dropped inside the join."""
    o = old.select(F.col(key), F.md5(text_col).alias("_fp_old"))
    n = new.select(F.col(key), F.md5(text_col).alias("_fp_new"))
    joined = o.join(n, key, "full_outer")
    return joined.select(
        key,
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .alias("status"),
    ).filter(F.col("status").isNotNull())


def planted_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: plant v_old/v_new from the one documents table
    (doc_id % 7 -> added, % 11 -> removed, % 5 -> changed; %35/%55
    collisions land on the add/remove side since the doc is absent
    from one version entirely), then diff."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    v_old = docs.filter(F.col("doc_id") % 7 != 0)
    v_new = docs.filter(F.col("doc_id") % 11 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(v_old, v_new)


PLANTED_CORPUS_DIFF_SQL = """
WITH v_old AS (
  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 7 <> 0
),
v_new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END) AS fp
  FROM documents WHERE doc_id % 11 <> 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp <> n.fp THEN 'changed' END AS status
FROM v_old o FULL OUTER JOIN v_new n ON o.doc_id = n.doc_id
WHERE (o.fp IS NULL) OR (n.fp IS NULL) OR (o.fp <> n.fp)
"""
