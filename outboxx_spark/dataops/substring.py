"""Exact substring-span dedup via winnowing fingerprints.

Lee et al. 2022 (arXiv:2107.06499, "Deduplicating Training Data Makes
Language Models Better") dedups exact text SPANS — substrings repeated
across documents — with a single-node suffix array, which cannot shard
across 1000 executors. The distributed substitute here is WINNOWING
(Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS fingerprinting
scheme): hash every k-gram, slide a window of ``w`` consecutive k-gram
hashes over the document, and select each window's minimal hash
(rightmost on ties). Selection depends only on CONTENT, never on the
k-gram's offset in the document, which buys the theorem naive strided
shingling cannot offer:

    any span of length >= k + w - 1 chars shared by two documents
    yields at least one COMMON fingerprint in both

(a window of w k-grams spans k + w - 1 chars; a window fully inside
the shared span sees identical hashes in both copies, so both select
the same k-gram). A first cut of this module used stride-aligned
shingles and FAILED its own recall test — two copies of a span at
offsets differing by a non-multiple of the stride emit disjoint
window sets; winnowing replaced it rather than patching the stride.

Scale shape (100 TB):
- The entire select-fingerprints pass is ONE codegen'd projection per
  document — higher-order array functions (transform / slice /
  array_min / reverse / array_position), zero Python, zero shuffle,
  O(len * w) work per doc with w a small constant.
- The only shuffle carries (fingerprint_md5, doc_id) — 48-byte rows,
  ~2/(w+1) of the k-gram count per doc (the expected winnowing
  density), NOT the text. Map-side combinable group-by.
- Output is one row per REPEATED fingerprint (HAVING >= 2 distinct
  docs): volume proportional to the duplication present.

The md5 hex string is the hash everywhere — Spark and DuckDB order
VARCHAR identically, so the per-window min (and thus the selected
fingerprint set) is engine-identical by construction.

Reference parity: reference has no text operators (SURVEY.md §2.9);
module is separate from dedup.py so the rotation never re-flags the
exact/minhash/simhash surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winnow_fingerprints(
    docs: DataFrame, k: int = 16, w: int = 8, text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, fp): the winnowing fingerprint set — ``pos`` is the
    1-based start of a selected k-gram, ``fp`` its md5. Documents
    shorter than k + w - 1 chars have no window and emit nothing (on
    both engines)."""
    # All arithmetic in one SQL expression tree: grams = md5 of every
    # k-gram; for window i (over gram indices), the selected absolute
    # index is the RIGHTMOST position of the window's minimal hash —
    # found by scanning the reversed slice for the min. array_distinct
    # collapses adjacent windows that picked the same gram.
    sel = f"""
    array_distinct(transform(
      sequence(1, size(_grams) - {w} + 1),
      i -> i - 1 + ({w} + 1 - array_position(
             reverse(slice(_grams, i, {w})),
             array_min(slice(_grams, i, {w}))))
    ))
    """
    # Scatter BEFORE the gram projection: unlike the other text ops
    # (whose heavy work happens after an explode already spread by the
    # shuffle), winnowing's entire O(len * w) cost sits in this first
    # projection — left on the scan's own splits, one small parquet
    # file = one task doing all the work (measured: 5.7s single-task
    # vs 2.9s scattered at sf0.1). The shuffle moves only the raw
    # (doc_id, text) rows once — input-proportional, and at real
    # corpus volumes where the scan yields thousands of splits the
    # exchange is balanced-vs-balanced, costing one text pass to buy
    # even projection parallelism on any layout.
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.filter(F.length(F.col(text_col)) >= k + w - 1)
        .repartition(par)
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, length({text_col}) - {k} + 1),"
                f" p -> md5(cast(substring({text_col}, p, {k}) as binary)))"
            ).alias("_grams"),
        )
        .select("doc_id", "_grams", F.explode(F.expr(sel)).alias("pos"))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.element_at("_grams", F.col("pos").cast("int")).alias("fp"),
        )
    )


def duplicated_spans(
    docs: DataFrame, k: int = 16, w: int = 8, text_col: str = "text"
) -> DataFrame:
    """Fingerprints shared across documents: (fp, n_docs, n_occurrences,
    exemplar) for every winnowing fingerprint selected in >= 2 distinct
    docs — by the winnowing theorem, a superset pointer to every
    cross-document duplicated span of length >= k + w - 1. The single
    count-distinct plans as one aggregate (no Expand)."""
    return (
        winnow_fingerprints(docs, k, w, text_col)
        .groupBy("fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("exemplar"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def duplicated_spans_sql(k: int = 16, w: int = 8) -> str:
    """DuckDB mirror: same grams, same per-window rightmost-min
    selection, same md5 VARCHAR ordering."""
    return f"""
WITH grams AS (
  SELECT doc_id,
         list_transform(range(1, length(text) - {k} + 2),
           p -> md5(substring(text, CAST(p AS INTEGER), {k}))) AS g
  FROM documents
  WHERE length(text) >= {k} + {w} - 1
),
sel AS (
  SELECT doc_id, g,
         list_distinct(list_transform(range(1, len(g) - {w} + 2),
           i -> i - 1 + ({w} + 1 - list_position(
                  list_reverse(g[CAST(i AS INTEGER):CAST(i + {w} - 1 AS INTEGER)]),
                  list_min(g[CAST(i AS INTEGER):CAST(i + {w} - 1 AS INTEGER)]))))) AS picks
  FROM grams
),
fps AS (
  SELECT doc_id, g[CAST(p AS INTEGER)] AS fp
  FROM sel, unnest(picks) AS u(p)
)
SELECT fp,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       min(doc_id) AS exemplar
FROM fps
GROUP BY fp
HAVING count(DISTINCT doc_id) >= 2
"""
