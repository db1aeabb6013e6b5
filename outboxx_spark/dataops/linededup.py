"""First-occurrence-wins paragraph dedup (Dolma / RedPajama style).

Boilerplate removal (:mod:`outboxx_spark.dataops.segments`) strips a
repeated segment from EVERY document; paragraph dedup keeps exactly
ONE occurrence — the first in corpus order — and drops the rest, so
repeated content contributes one training copy instead of zero. Both
operations run in real pretraining pipelines (Dolma runs paragraph
dedup after its boilerplate pass); the ownership rule is what
distinguishes them, and it echoes the repo's incremental-dedup
first-seen-wins contract (dataops/incremental.py) at segment
granularity.

The segmentation unit is the non-overlapping token window
(chunk_documents with window == stride), the same substitution
segments.py documents: production corpora split on newlines, this
corpus has none.

Ownership: for every duplicated segment text the keeper is the
occurrence with the SMALLEST (doc_id, chunk_id) — corpus order, total
and engine-independent. Repeats inside one document drop too (only
the owner occurrence survives), matching Dolma's exact-paragraph
semantics.

Scale shape (100 TB):

- One corpus-order shuffle keyed on the segment text (production: its
  xxhash64 — both sides Spark-derived; the oracle joins on text to
  stay bit-exact) computing ``min(struct(doc_id, chunk_id))`` and the
  occurrence count — partial-aggregable, the exchange carries
  per-map-partition combines.
- The ownership frame joins back to the occurrences on the segment
  key: occurrence rows are (key, doc_id, chunk_id) — narrow — and the
  join is the second and last fact-sized shuffle. No broadcast is
  assumed: unlike the boilerplate SET (tiny), the ownership frame is
  corpus-sized.
- Reassembly is a per-document sorted aggregate (shuffle on doc_id,
  combiner-friendly collect_list), emitting the deduped text plus
  kept/dropped counts so the pipeline can audit volume loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from outboxx_spark.dataops.chunking import chunk_documents, chunk_documents_sql

SEG_TOKENS = 3  # segment length; window == stride -> non-overlapping


def segment_occurrences(df: DataFrame, seg_len: int = SEG_TOKENS) -> DataFrame:
    """(doc_id, chunk_id, seg): the occurrence frame both the batch
    and streaming dedup mark up."""
    return chunk_documents(df, window=seg_len, stride=seg_len).select(
        "doc_id", "chunk_id", F.col("chunk").alias("seg")
    )


def mark_owners(segs: DataFrame) -> DataFrame:
    """(doc_id, chunk_id, seg, keep): keep = this occurrence is the
    segment's smallest (doc_id, chunk_id) within ``segs`` — the
    first-occurrence-wins rule, frame-local."""
    own = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "chunk_id")).alias("owner"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    keep_flag = (F.col("n_occ") == 1) | (
        (F.col("owner.doc_id") == F.col("doc_id"))
        & (F.col("owner.chunk_id") == F.col("chunk_id"))
    )
    return segs.join(own, "seg").select(
        "doc_id", "chunk_id", "seg", keep_flag.alias("keep")
    )


def reassemble(marked: DataFrame) -> DataFrame:
    """(doc_id, kept, dropped, new_text) from a marked occurrence
    frame: per-document sorted aggregate, original order preserved."""
    kept_list = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("keep"), F.struct("chunk_id", "seg"))
            )
        ),
        lambda s: s["seg"],
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("kept"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1))
            .cast("bigint")
            .alias("dropped"),
            F.array_join(kept_list, " ").alias("new_text"),
        )
    )


def dedup_paragraphs(df: DataFrame, seg_len: int = SEG_TOKENS) -> DataFrame:
    """(doc_id, kept, dropped, new_text): every duplicated segment
    survives only at its first corpus-order occurrence; new_text is
    the document with later occurrences removed, original order
    preserved."""
    return reassemble(mark_owners(segment_occurrences(df, seg_len)))


def DEDUP_PARAGRAPHS_SQL(seg_len: int = SEG_TOKENS) -> str:
    """DuckDB mirror: same segmentation CTE as the chunking oracle,
    ownership via min(row(doc_id, chunk_id)) replicated with a
    row_number over corpus order, reassembly via ordered string_agg.
    string_agg over zero kept rows yields NULL -> coalesce to ''
    (array_join of an empty array is '' on the Spark side)."""
    return f"""
    WITH segs AS (
      SELECT doc_id, chunk_id, chunk AS seg
      FROM ({chunk_documents_sql(window=seg_len, stride=seg_len)})
    ),
    marked AS (
      SELECT doc_id, chunk_id, seg,
             count(*) OVER (PARTITION BY seg) = 1
             OR row_number() OVER (PARTITION BY seg
                                   ORDER BY doc_id, chunk_id) = 1 AS keep
      FROM segs
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS dropped,
           coalesce(string_agg(CASE WHEN keep THEN seg END, ' '
                               ORDER BY chunk_id), '') AS new_text
    FROM marked
    GROUP BY doc_id
    """
