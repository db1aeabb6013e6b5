"""Document chunking and sequence packing for LLM training pipelines.

Two operators a 100 TB pretraining corpus runs between curation and
tokenizer output:

- :func:`chunk_documents` — sliding token-window chunks with overlap
  (context-window preparation). One narrow pass: split, generate the
  chunk start offsets per document, posexplode, slice — all built-in
  JVM expressions inside whole-stage codegen, no shuffle at all (the
  explode multiplies rows partition-locally), so it scales with scan
  bandwidth.
- :func:`pack_sequences` — assign chunks to fixed-token-capacity
  training sequences by token offset. A GLOBAL greedy bin-pack is a
  sequential dependency (unusable at scale); the scalable formulation
  shards by document id and packs by running token offset within each
  shard: one shuffle on the shard key, a window cumsum, and an
  aggregate. Sequences are deterministic given (doc_id, chunk_id)
  order, independent of partitioning — so the operator is
  oracle-checkable and stable across cluster sizes. Offset packing
  (cut at capacity boundaries) matches how token streams are actually
  packed for pretraining; it is NOT first-fit bin packing, and says so.

Tokenization is the repo's whitespace convention (`dataops/text.py
tokens()` = split on single space, DuckDB mirror ``string_split``),
keeping every count bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from outboxx_spark.dataops.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunks: start offsets 0, stride, 2*stride, ...
    while < n_tokens; each chunk is ``window`` tokens (shorter at the
    tail). Empty text still yields its one (empty) chunk — a document
    must never vanish silently between pipeline stages.

    Output: (doc_id, chunk_id, n_tokens, chunk) — chunk_id is the
    0-based window index, n_tokens the chunk's actual token count.
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1, got {window}/{stride}")
    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    exploded = df.select(
        "doc_id", toks.alias("_toks"), F.posexplode(starts).alias("_pos", "_start")
    )
    return exploded.select(
        "doc_id",
        F.col("_pos").cast("long").alias("chunk_id"),
        F.least(F.lit(window), F.size("_toks") - F.col("_start"))
        .cast("long")
        .alias("n_tokens"),
        F.array_join(
            F.slice("_toks", F.col("_start") + 1, F.lit(window)), " "
        ).alias("chunk"),
    )


def chunk_documents_sql(
    window: int = 64, stride: int = 48, table: str = "documents"
) -> str:
    """DuckDB mirror: ``range(0, n, stride)`` enumerates the same start
    set as Spark's ``sequence(0, n-1, stride)`` (n >= 1 always — a
    split of '' is ['']), and 1-based inclusive list slicing matches
    ``slice(toks, start+1, window)`` element-for-element."""
    return f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM {table}
    ),
    s AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), {stride})) AS start
      FROM t
    )
    SELECT doc_id,
           CAST(start // {stride} AS BIGINT) AS chunk_id,
           CAST(least({window}, len(toks) - start) AS BIGINT) AS n_tokens,
           array_to_string(toks[start + 1 : start + {window}], ' ') AS chunk
    FROM s
    """


def pack_sequences(
    chunks: DataFrame,
    capacity: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Token-offset packing: within each shard (doc_id mod n_shards),
    order chunks by (doc_id, chunk_id), accumulate token counts, and
    assign each chunk to sequence floor(start_offset / capacity).

    Scale shape: ONE shuffle (on the shard key) + a window cumsum + a
    partial-aggregable groupBy. n_shards bounds the window partition
    width — at 100 TB raise it to executor-count scale; the output is
    shard-deterministic either way, so resizing the cluster never
    changes the packing. A chunk larger than ``capacity`` still lands
    in exactly one sequence (its start offset decides), mirroring
    token-stream packing where oversized items straddle cut points.

    Output: (shard, seq_id, n_chunks, seq_tokens).
    """
    if capacity < 1 or n_shards < 1:
        raise ValueError(f"capacity/n_shards must be >= 1, got {capacity}/{n_shards}")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_seq = (
        chunks.select(
            F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("long").alias("shard"),
            "doc_id",
            "chunk_id",
            "n_tokens",
        )
        .withColumn("_start", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        # integer division on the BIGINT running offset — float division
        # would lose exactness past 2^53 token offsets
        .withColumn("seq_id", F.expr(f"_start div {capacity}").cast("long"))
    )
    return with_seq.groupBy("shard", "seq_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("seq_tokens"),
    )


def pack_sequences_sql(
    capacity: int = 256,
    n_shards: int = 8,
    window: int = 64,
    stride: int = 48,
    table: str = "documents",
) -> str:
    """DuckDB mirror over the same chunking CTE: identical shard
    arithmetic (doc_id is non-negative, so plain %), an explicit ROWS
    frame matching the Spark window, and // integer division."""
    return f"""
    WITH chunks AS ({chunk_documents_sql(window, stride, table)}),
    offs AS (
      SELECT doc_id % {n_shards} AS shard, doc_id, chunk_id, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY doc_id % {n_shards}
               ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS start_off
      FROM chunks
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(start_off // {capacity} AS BIGINT) AS seq_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
    FROM offs
    GROUP BY shard, start_off // {capacity}
    """
