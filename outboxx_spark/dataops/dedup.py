"""Deduplication operators for training-data pipelines, on ``documents``:

- exact (hash-groupBy)
- n-gram Jaccard pairs (shingle inverted index self-join)
- MinHash + LSH banding (the 100 TB scale path, verified exactly)
- SimHash with banded Hamming join (pigeonhole-exact recall)

Scale design notes (the part that matters at 1000 executors):

* Exact dedup is one hash-partitioned groupBy with map-side partial
  aggregation — the minimum possible shuffle (one row per distinct hash).
* The Jaccard inverted index explodes distinct shingles; join traffic is
  sum over shingles of df^2. Hot shingles (stopword runs) create skew —
  production path caps document frequency (``max_df``) before the join,
  the standard prefix-filtering trick; AQE skew-join splits the rest.
* MinHash replaces the quadratic candidate step with O(n · bands) bucket
  keys; bucket joins shuffle only (band, hash) keys. 128 perms / 32
  bands x 4 -> P(miss at j=0.8) ~ 5e-8, so verifying candidates with
  exact Jaccard reproduces the exact pair set (what the oracle checks).
* SimHash bands are *provably* exact for hamming <= 3 with 4 x 15-bit
  bands (pigeonhole): the banded equi-join is a lossless replacement for
  the O(n^2) scan.

Everything is built-in expressions (explode / groupBy / join) — no
Python in the hot path; md5-derived hashes keep the DuckDB oracle exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from outboxx_spark.dataops.hashing import (
    HASH_P,
    LSH_BAND_SIZE,
    MINHASH_A,
    MINHASH_B,
    N_MINHASHES,
    SIMHASH_BITS,
    md5_hash60,
    md5_hash60_sql,
)
from outboxx_spark.dataops.text import shingles, shingles_sql
from outboxx_spark.dataops.util import parallelized as _parallelized

# Worker-memory invariant for the fused Arrow minhash kernel: the
# (shingles x 128) permutation matrix is built over chunks of at most
# this many shingles (~256 MB peak at int64), across docs and within
# one oversized doc. Module-level so tests can shrink it and exercise
# the chunk-boundary paths on small inputs.
PERM_CHUNK_BUDGET = 1 << 18

# Materialization tier for CORPUS-SCALE intermediates that feed more
# than one consumer (the shingle inverted index, the per-doc verify
# sets). These grow with corpus bytes, unlike the bounded n_docs-scale
# key tables (band buckets, prefixes), which are always safe to
# localCheckpoint.
#   "checkpoint" — fastest scans; non-fault-tolerant executor storage
#                  (an executor loss mid-job fails the job). Right for
#                  single-node/bench profiles; the local default.
#   "persist"    — DISK_ONLY, lineage-recoverable and spillable; the
#                  1000-executor setting (measured ~5x slower scans on
#                  array-heavy data locally).
#   "none"       — no materialization: each consumer recomputes from
#                  the source (two extra corpus scans, zero storage).
CORPUS_MATERIALIZE = "checkpoint"


def _materialize_corpus(df: DataFrame) -> DataFrame:
    if CORPUS_MATERIALIZE == "checkpoint":
        return df.localCheckpoint(eager=True)
    if CORPUS_MATERIALIZE == "persist":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.DISK_ONLY)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical texts by md5; keep the min doc_id as survivor.
    One shuffle on the hash key, partial-agg map-side."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), "doc_id")
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
    )


EXACT_DEDUP_SQL = """
SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_docs
FROM documents GROUP BY md5(text)
"""

# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact, inverted-index join)
# ---------------------------------------------------------------------------


# Default document-frequency cap for the exact n-gram join. Join traffic
# per shingle is df^2, so one stopword-run shingle with df=10^6 is a
# 10^12-row key; capping df bounds every key at max_df^2 (the standard
# prefix-filtering trick). Jaccard over the *capped* shingle set is what
# both engines compute, so the oracle stays exact by construction.
NGRAM_MAX_DF = 100


def shingle_index(df: DataFrame, k: int = 3, text_col: str = "text", max_df: int | None = None) -> DataFrame:
    """(doc_id, shingle) inverted index over distinct shingles. ``max_df``
    drops shingles appearing in more than that many documents — the
    skew/volume cap for the production path (changes candidate recall
    only for pairs connected solely through ubiquitous shingles).

    The cap is applied as a broadcast ANTI join against the *drop list*:
    shingles with df > max_df are few by construction (total corpus
    volume / max_df bounds their count), so the blocklist broadcasts
    even at 100 TB — broadcasting the keep side would not."""
    idx = _parallelized(df).select("doc_id", F.explode(shingles(F.col(text_col), k)).alias("s"))
    if max_df is not None:
        hot = idx.groupBy("s").agg(F.count("*").alias("df_")).filter(F.col("df_") > max_df)
        idx = idx.join(F.broadcast(hot.select("s")), "s", "left_anti")
    return idx


def ngram_jaccard_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    max_df: int | None = NGRAM_MAX_DF,
) -> DataFrame:
    """All (a < b) document pairs with shingle-set Jaccard >= threshold,
    computed over the df-capped shingle sets (``max_df``, on by default —
    pass None for the uncapped oracle formulation).
    Output columns are integers only (intersection/set sizes) so the
    correctness compare is float-free; jaccard >= t is applied as
    inter * 1 >= t * (|A|+|B|-inter) in exact integer/decimal arithmetic.
    """
    # the index feeds both self-join sides AND the size table — it is
    # corpus-scale (one row per distinct shingle occurrence), so the
    # tier is configurable; see CORPUS_MATERIALIZE. Makes the builder
    # eager under the default tier.
    idx = _materialize_corpus(shingle_index(df, k, text_col, max_df=max_df))
    sizes = idx.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = idx.alias("a")
    b = idx.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("inter").cast("double")
            >= F.lit(threshold) * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .select("doc_a", "doc_b", "inter", "n_a", "n_b")
    )


def ngram_jaccard_pairs_sql(
    k: int = 3, threshold: float = 0.5, max_df: int | None = NGRAM_MAX_DF
) -> str:
    sh = shingles_sql("text", k)
    cap = (
        f", hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > {max_df})"
        ", sh AS (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot))"
        if max_df is not None
        else ", sh AS (SELECT * FROM sh0)"
    )
    return f"""
    WITH sh0 AS (SELECT doc_id, unnest({sh}) AS s FROM documents)
    {cap},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b, i.inter, sa.n_sh AS n_a, sb.n_sh AS n_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.inter AS DOUBLE) >= {threshold} * (sa.n_sh + sb.n_sh - i.inter)
    """


def dedup_survivors(
    df: DataFrame, k: int = 3, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Greedy min-id dedup: a document is dropped iff it appears as the
    higher id of a near-dup pair (so each dup cluster keeps its lowest
    id, and chains collapse toward the minimum). One anti-join against
    the pair set — composable with either the exact or the LSH pair
    generator."""
    pairs = minhash_dedup_pairs(df, k, threshold, text_col)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return df.join(dropped, "doc_id", "left_anti").select("doc_id")


def dedup_survivors_sql(k: int = 3, threshold: float = 0.5) -> str:
    # survivors mirror minhash_dedup_pairs (full-set verification), so
    # the pair oracle here stays uncapped
    pairs = ngram_jaccard_pairs_sql(k, threshold, max_df=None)
    return f"""
    WITH pairs AS ({pairs})
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
    """


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame | None = None,
    k: int = 3,
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """doc_id -> N_MINHASHES minimum permuted hashes. One explode + one
    groupBy with N partial mins (all map-side combinable). Pass a
    prebuilt distinct-shingle ``index`` (doc_id, s) to skip re-shingling
    when the caller already materialized one."""
    if df is None and index is None:
        raise ValueError("minhash_signatures: pass df or index")
    idx = index if index is not None else shingle_index(df, k, text_col)
    idx = idx.withColumn("h", md5_hash60(F.col("s")) % HASH_P)
    mins = [
        F.min((F.col("h") * MINHASH_A[i] + MINHASH_B[i]) % HASH_P).alias(f"mh{i}")
        for i in range(N_MINHASHES)
    ]
    return idx.groupBy("doc_id").agg(*mins)


def minhash_signatures_from_sets(sets: DataFrame, sh_col: str = "sh") -> DataFrame:
    """Same signatures as :func:`minhash_signatures`, computed WITHOUT
    the corpus-scale explode + 128-buffer hash aggregation (and without
    its shuffle): the element hashes stay md5-derived JVM-side (one
    ``transform`` per row), and the 128 permuted minima are one
    Arrow-batched numpy pass — a (shingles x 128) broadcasted
    multiply-mod and a ``minimum.reduceat`` over the per-doc segments,
    all vectorized C. Values are bit-identical to the groupBy
    formulation (min over the same distinct-shingle hash set under the
    same int64 arithmetic — asserted in tests), so the DuckDB oracles
    and any existing incremental store need no change.

    Why not pure JVM: signatures never appear in an oracle (the checked
    output is the exact verified pair set), and the pure-expression
    alternative — 128 ``array_min(transform(...))`` higher-order calls —
    is interpreted, not codegen'd; measured at sf0.1 it costs ~2.3s vs
    ~1.3s for this path (signatures+buckets stage, steady-state).

    Memory: the permutation matrix is built over chunks capped at 2^18
    shingles (~256 MB peak) — BOTH across docs and within one doc (a
    single pathologically large document is sliced and its minima
    combined), so no input shape can balloon the python worker.

    Null hygiene (INTENTIONAL semantics, pinned in
    tests/test_dataops.py): null hash elements (null text rows hit
    ``shingles``'s whole-text fallback as ``[NULL]``) are compacted
    away and hash-less docs are DROPPED from the signature table — they
    produce no bucket keys, are never dedup candidates, and always
    survive. This is a deliberate DIVERGENCE from the explode+groupBy
    formulation this path replaced: there, a null-text doc produced an
    all-null signature row whose band sigs concat_ws to "", so two
    null-text docs could bucket-collide and then VERIFY as a duplicate
    pair (``array_intersect`` treats NULL elements as equal —
    jaccard([NULL],[NULL]) = 1). Declaring two contentless documents
    duplicates of each other is not a dedup semantics any pipeline
    wants; content-less rows belong to a quality filter, not the
    dedup pass."""
    sa = _nonempty_hashes(sets, sh_col).select(
        "doc_id", _perm_mins_udf()(F.col("ha")).alias("sa")
    )
    return sa.select("doc_id", *[F.col("sa")[i].alias(f"mh{i}") for i in range(N_MINHASHES)])


def _nonempty_hashes(sets: DataFrame, sh_col: str) -> DataFrame:
    """(doc_id, ha): per-doc shingle-hash arrays with null elements
    compacted away and hash-less docs dropped (see the null-hygiene
    note in minhash_signatures_from_sets)."""
    h_arr = F.array_compact(
        F.transform(F.col(sh_col), lambda s: md5_hash60(s) % HASH_P)
    )
    return sets.select("doc_id", h_arr.alias("ha")).filter(F.size("ha") > 0)


def _perm_min_matrix(h_arrs: pd.Series) -> np.ndarray:
    """The shared numpy core: (n_docs, N_MINHASHES) permuted minima
    over per-doc hash segments, with the 2^18-shingle chunk cap applied
    both ACROSS docs and WITHIN one oversized doc."""
    perm_a = np.array(MINHASH_A, dtype=np.int64)
    perm_b = np.array(MINHASH_B, dtype=np.int64)
    lens = h_arrs.map(len).to_numpy(dtype=np.int64)
    n = len(lens)
    if n == 0:
        return np.empty((0, N_MINHASHES), dtype=np.int64)
    flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in h_arrs])
    ends = np.cumsum(lens)
    starts = ends - lens
    out = np.empty((n, N_MINHASHES), dtype=np.int64)
    chunk_budget = PERM_CHUNK_BUDGET
    d0 = 0
    while d0 < n:
        d1 = d0 + 1
        # admit doc d1 only if the chunk INCLUDING d1 stays in budget —
        # checking only the docs already admitted (ends[d1-1]) let a
        # huge doc ride in behind a small one and build an unbounded
        # (shingles x 128) matrix; a doc that doesn't fit starts its
        # own chunk, where the oversized branch below slices it
        while d1 < n and ends[d1] - starts[d0] <= chunk_budget:
            d1 += 1
        if d1 == d0 + 1 and lens[d0] > chunk_budget:
            # one oversized doc: slice its shingle run, fold minima
            acc = np.full(N_MINHASHES, np.iinfo(np.int64).max)
            for s0 in range(int(starts[d0]), int(ends[d0]), chunk_budget):
                seg = flat[s0 : min(s0 + chunk_budget, int(ends[d0]))]
                m = (seg[:, None] * perm_a + perm_b) % HASH_P
                np.minimum(acc, m.min(axis=0), out=acc)
            out[d0] = acc
        else:
            seg = flat[starts[d0] : ends[d1 - 1]]
            m = (seg[:, None] * perm_a + perm_b) % HASH_P
            out[d0:d1] = np.minimum.reduceat(m, starts[d0:d1] - starts[d0], axis=0)
        d0 = d1
    return out


def _perm_mins_udf():
    @F.pandas_udf("array<long>")
    def _sig(h_arrs: pd.Series) -> pd.Series:
        out = _perm_min_matrix(h_arrs)
        return pd.Series(list(out)) if len(out) else pd.Series([], dtype=object)

    return _sig


def _bands_all_udf():
    """The ONE definition of the fused minhash band-assembly kernel:
    an ``array<string>`` pandas UDF mapping a doc's shingle-hash array
    to its 32 ``m0_m1_m2_m3`` band signature strings (empty array for
    hash-less docs). Shared by ``lsh_band_arrays_from_sets`` (the
    incremental store's checkpointed frame) and
    ``lsh_band_buckets_from_sets`` (the batch pair generator), so the
    two paths can never drift bit-wise."""
    n_bands = N_MINHASHES // LSH_BAND_SIZE

    @F.pandas_udf("array<string>")
    def _bands_all(h_arrs: pd.Series) -> pd.Series:
        out: list[list[str]] = [[] for _ in range(len(h_arrs))]
        # `a is not None`: a NULL sh array (possible when a caller
        # bypasses shingles(), whose fallback never yields NULL) must
        # degrade to empty bands, not TypeError the task
        nonempty = [i for i, a in enumerate(h_arrs) if a is not None and len(a)]
        if nonempty:
            mins = _perm_min_matrix(h_arrs.iloc[nonempty])
            digits = mins.astype("U10")
            for i, row in zip(nonempty, digits):
                out[i] = [
                    "_".join(row[b * LSH_BAND_SIZE : (b + 1) * LSH_BAND_SIZE])
                    for b in range(n_bands)
                ]
        return pd.Series(out)

    return _bands_all


def _hash_arr(sh_col: str) -> Column:
    return F.array_compact(
        F.transform(F.col(sh_col), lambda s: md5_hash60(s) % HASH_P)
    )


def lsh_band_buckets_from_sets(sets: DataFrame, sh_col: str = "sh") -> DataFrame:
    """(doc_id, band, sig) LSH bucket keys straight from the
    shingle-set table: the permuted minima AND the 32 band signature
    strings are assembled in the same Arrow pass, then one posexplode.
    Values are identical to ``lsh_band_buckets(
    minhash_signatures_from_sets(sets))`` (test-pinned — same minima,
    same ``m0_m1_m2_m3`` string assembly, same 0-based band numbers,
    so existing incremental-store generations keep joining and
    ``pmod(xxhash64(band, sig))`` pruning stays stable). Measured at
    sf0.1: 1.52s -> 0.38s for the signatures+buckets stage — extracting
    128 array elements into columns and re-concatenating them in the
    decomposed form cost ~4x the actual minhash arithmetic.

    The generator MUST explode the UDF expression directly, not a
    named ``bands`` column from ``lsh_band_arrays_from_sets``: with a
    plain attribute as the generator child, Catalyst's
    InferFiltersFromGenerate adds ``size(bands) > 0 AND
    isnotnull(bands)`` below the Generate, the alias substitutes the
    UDF into that filter, and the extracted plan evaluates the whole
    minhash kernel in TWO ArrowEvalPython nodes (r7's thin-view
    regression: dedup_4x buckets stage 5.8s vs 1.2s at 4x sf0.1,
    plan-pinned in tests/test_plans.py). With the UDF as the generator
    child the rule skips inference (SPARK-33544) and the kernel runs
    once. Hash-less docs yield an empty bands array — zero rows on
    explode, exactly as the old ``_nonempty_hashes`` prefilter did."""
    return sets.select(
        "doc_id",
        F.posexplode(_bands_all_udf()(_hash_arr(sh_col))).alias("band", "sig"),
    )


def lsh_band_arrays_from_sets(sets: DataFrame, sh_col: str = "sh") -> DataFrame:
    """(doc_id, sh, bands): each doc's distinct-shingle set AND its 32
    band signature strings assembled in ONE Arrow pass — the fused
    frame the incremental store checkpoints once per batch instead of
    checkpointing a sets frame and a buckets frame separately (two
    jobs, two pandas passes over the same hashes; measured ~0.7s/batch
    of pure overhead at sf0.1).

    ``select(doc_id, posexplode(bands))`` over this frame — AFTER
    persisting/checkpointing it, which every store consumer does — is
    bit-identical to ``lsh_band_buckets_from_sets(sets)`` (test-pinned:
    same minima, same ``m0_m1_m2_m3`` assembly, same 0-based band
    numbers), with ONE divergence by design: hash-less docs (null/empty
    text) are KEPT here with an empty ``bands`` array — they produce no
    bucket keys on explode (same dedup semantics: never candidates,
    always survive) but must flow through to the store's docs tree,
    which doubles as the survivor registry (``read_survivors``).
    Exploding this frame UNMATERIALIZED re-runs the Arrow kernel twice
    (see lsh_band_buckets_from_sets's docstring) — use that function
    for the one-shot path."""
    return sets.select(
        "doc_id",
        F.col(sh_col).alias("sh"),
        _bands_all_udf()(_hash_arr(sh_col)).alias("bands"),
    )


def lsh_band_buckets(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, sig): each signature banded into 32 bands of 4 —
    the LSH bucket keys. Shared by the batch self-join pair generator
    and the incremental store (dataops/incremental.py)."""
    n_bands = N_MINHASHES // LSH_BAND_SIZE
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[F.col(f"mh{b * LSH_BAND_SIZE + j}").cast("string") for j in range(LSH_BAND_SIZE)],
                ).alias("sig"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig")
    )


def lsh_bucket_pairs(buckets: DataFrame) -> DataFrame:
    """Self-join precomputed (doc_id, band, sig) bucket rows on (band,
    sig), emit distinct candidate (a < b) pairs. Shared by the batch
    path and the incremental store (which has the buckets checkpointed
    already)."""
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Band the signature (32 bands of 4), bucket-join on (band, band
    signature), emit distinct candidate (a < b) pairs. Shuffle volume:
    n_docs x n_bands tiny keyed rows — the scale path.

    The bucket table is materialized once: it feeds both sides of the
    self-join, and without the checkpoint the signature pipeline (128
    partial mins over the exploded shingle index) runs once PER SIDE on
    every action — measured 4.3x slower at sf0.1. The table is tiny
    (n_docs x n_bands keyed rows); the incremental store checkpoints
    its buckets the same way before calling lsh_bucket_pairs."""
    return lsh_bucket_pairs(lsh_band_buckets(sigs).localCheckpoint(eager=True))


def verify_jaccard_pairs(
    cand: DataFrame, sets_a: DataFrame, sets_b: DataFrame, threshold: float
) -> DataFrame:
    """Exact set-Jaccard verification of candidate (doc_a, doc_b) pairs
    against (doc_id, sh) distinct-shingle sets; integer arithmetic only
    (same output contract as ``ngram_jaccard_pairs``). The single
    definition of the threshold predicate — the batch minhash path and
    the incremental store must never diverge on it."""
    a = sets_a.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets_b.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            # cast long: the ngram path's counts are int64, and mixed
            # int widths in a checked output are a gate typewarn
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("inter"),
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
        )
        .filter(
            F.col("inter").cast("double")
            >= F.lit(threshold) * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
    )


def minhash_dedup_pairs(
    df: DataFrame, k: int = 3, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard — same output
    contract as ``ngram_jaccard_pairs`` but near-linear candidate
    generation. Verification joins each candidate pair to the two
    distinct-shingle arrays and computes the exact intersection."""
    # ONE corpus text pass: the per-doc shingle-set table is
    # materialized (corpus-scale — tier per CORPUS_MATERIALIZE), the
    # signature index derives from it by a cheap explode, and the same
    # table verifies both pair sides. Makes the builder eager under the
    # default tier.
    sets_ = _materialize_corpus(
        _parallelized(df).select("doc_id", shingles(F.col(text_col), k).alias("sh"))
    )
    cands = lsh_bucket_pairs(
        lsh_band_buckets_from_sets(sets_).localCheckpoint(eager=True)
    )
    return verify_jaccard_pairs(cands, sets_, sets_, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash over the distinct-token set: bit j set iff the sum
    of ±1 votes (token hash bit j) is >= 0. One Arrow pass per row: the
    distinct-token hash array is computed JVM-side (md5, oracle-stable)
    and the 60 vote sums + bit assembly happen in vectorized numpy —
    no corpus-scale explode, no 60-buffer groupBy shuffle. Bit-identical
    to the groupBy formulation (``simhash_via_groupby``, test-pinned)
    and to the DuckDB oracle. Docs whose token-hash array is empty
    (null text) are dropped, as the exploded formulation dropped them."""
    h_arr = F.array_compact(
        F.transform(
            F.array_distinct(F.split(F.col(text_col), " ")),
            lambda t: md5_hash60(t),
        )
    )
    bit_idx = np.arange(SIMHASH_BITS, dtype=np.int64)
    weights = (1 << bit_idx).astype(np.int64)

    @F.pandas_udf("long")
    def _sig(h_arrs: pd.Series) -> pd.Series:
        out = np.empty(len(h_arrs), dtype=np.int64)
        chunk_budget = 1 << 18  # caps the (tokens x 60) vote matrix
        for i, arr in enumerate(h_arrs):
            h = np.asarray(arr, dtype=np.int64)
            votes = np.zeros(SIMHASH_BITS, dtype=np.int64)
            # slice a pathologically token-rich doc so the per-slice
            # matrix stays ~128 MB (same worker-memory invariant as
            # _perm_min_matrix); integer vote sums are order-free
            for s0 in range(0, len(h), chunk_budget):
                bits = (h[s0 : s0 + chunk_budget, None] >> bit_idx) & 1
                votes += (2 * bits - 1).sum(axis=0)
            out[i] = int(((votes >= 0) * weights).sum())
        return pd.Series(out)

    rows = (
        _parallelized(df)
        .select("doc_id", h_arr.alias("ha"))
        .filter(F.size("ha") > 0)
    )
    return rows.select("doc_id", _sig(F.col("ha")).alias("simhash"))


def simhash_via_groupby(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The original explode + 60-partial-sum groupBy formulation —
    kept as the bit-identity reference for :func:`simhash` (the
    signature VALUES are oracle-checked, so the fused path must never
    drift) and as the fallback shape if a deployment forbids Python."""
    toks = _parallelized(df).select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
    ).withColumn("h", md5_hash60(F.col("tok")))
    votes = [
        F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    # Assemble the signature as a bit string + conv(_, 2, 10): a flat
    # expression. The natural nested when/add chain over 60 bits drops
    # the projection out of codegen (measured 4.5s vs 1.3s at sf0.1).
    bits = F.concat(
        *[
            F.when(F.col(f"v{j}") >= 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(SIMHASH_BITS - 1, -1, -1)
        ]
    )
    return agg.select("doc_id", F.conv(bits, 2, 10).cast("long").alias("simhash"))


def simhash_sql() -> str:
    h = md5_hash60_sql("tok")
    votes = ", ".join(
        f"sum(((h >> {j}) & 1) * 2 - 1) AS v{j}" for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN v{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
    hashed AS (SELECT doc_id, {h} AS h FROM toks),
    votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
    SELECT doc_id, {sig} AS simhash FROM votes
    """


def simhash_near_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(a < b) pairs with Hamming distance <= max_hamming, via 4-band
    pigeonhole join: with 4 x 15-bit bands, any pair within distance 3
    agrees on >= 1 band, so the banded equi-join has EXACT recall — a
    provably lossless replacement for the O(n^2) scan at scale."""
    n_bands = 4
    bits = SIMHASH_BITS // n_bands  # 15
    mask = (1 << bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * bits).bitwiseAND(F.lit(mask)).alias("chunk"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = (
        sigs.select(F.col("doc_id"), F.col("simhash"), F.explode(bands).alias("bb"))
        .select(
            "doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk")
        )
        # both join sides — materialize once so the 60-partial-sum
        # signature aggregation upstream doesn't run per side
        .localCheckpoint(eager=True)
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cands.filter(dist <= max_hamming).select(
        "doc_a", "doc_b", dist.cast("long").alias("hamming")
    )


def simhash_near_pairs_sql(max_hamming: int = 3) -> str:
    return f"""
    , sigs2 AS (SELECT doc_id, simhash FROM sigs)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sigs2 a JOIN sigs2 b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """
