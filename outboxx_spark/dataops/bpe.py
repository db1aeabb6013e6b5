"""Distributed BPE tokenizer training over the ``documents`` corpus.

The real tokenizer-training workload behind `text.bpe_tokens`'s
regex approximation: learn byte-pair-encoding merge rules from corpus
statistics (Sennrich et al. 2016, the public BPE algorithm), expressed
Spark-first.

Shape: ONE corpus-scale pass builds the distinct-word frequency table
(`word-count vocab`), which for natural text is orders of magnitude
smaller than the corpus (Heaps' law) — every merge round after that
touches only the vocab table:

    round i:  adjacent-symbol pair counts  = one explode + one
              map-side-combinable groupBy over the vocab,
              weighted by word frequency;
              argmax pair                  = a 1-row driver action
              (deterministic tie-break: count desc, then pair);
              merge the pair in every word = one codegen'd fold
              projection (no shuffle), lineage cut per round
              exactly like `curation.dup_clusters`.

All arithmetic is integer (counts) and string (symbols) — there is no
float anywhere, so results are exactly reproducible on any engine and
any partitioning; the pytest gate compares against a from-scratch
Python implementation of the published algorithm.

Semantics (matching the original published implementation): pair
counts are the overlapping zip count (``aaa`` counts (a,a) twice);
merging replaces occurrences greedily left-to-right (``aaa`` ->
``aa a``); words are whitespace tokens, symbols start as single
characters (no end-of-word marker — the corpus is single-space
separated, so the in-word/cross-word distinction the marker encodes
does not arise).

100 TB: the corpus pass is one shuffle on word; vocab rounds are
bounded by vocabulary size, not corpus size. n_merges rounds = n
driver-coordinated vocab-sized jobs — the same iterate-on-bounded-
state pattern as k-means training and label propagation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Cut the logical plan every N merge rounds (bpe_train) / applied rules
# (bpe_segment): each round adds one nested fold expression, and both
# the analyzer and codegen degrade superlinearly past a few dozen.
_LINEAGE_CUT = 8
# Persist tier: every _PERSIST_CUT_FACTOR-th _LINEAGE_CUT
# materialization also truncates the logical plan (a hard cut) —
# bounds plan depth at _LINEAGE_CUT * _PERSIST_CUT_FACTOR folds while
# keeping recompute-from-scan fault tolerance within each window.
_PERSIST_CUT_FACTOR = 4


def _chars(word: Column) -> Column:
    """Word -> array of single-character symbols. The split point must
    be followed by a character — Spark's split otherwise emits a
    trailing empty symbol that would be learned as a merge target. The
    lookahead is [\\s\\S], not '.', because Java's '.' excludes line
    terminators: a token with an embedded newline must still split to
    true single characters."""
    return F.split(word, "(?!^)(?=[\\s\\S])")


def _adjacent_pairs(syms: Column) -> Column:
    """array<string> -> array<struct<a,b>> of adjacent symbol pairs
    (overlapping, Sennrich counting)."""
    n = F.size(syms)
    return F.arrays_zip(
        F.slice(syms, 1, n - 1).alias("a"),
        F.slice(syms, 2, n - 1).alias("b"),
    )


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Replace adjacent (a, b) occurrences with the merged symbol,
    greedily left-to-right — one fold, stays in the JVM."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(syms: array<string>, n: long) — the distinct-word frequency
    table with words pre-split into character symbols. The only
    corpus-scale operation in BPE training."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .select(_chars(F.col("w")).alias("syms"), "n")
    )


def _materialize_vocab(df: DataFrame, hard_cut: bool = False) -> DataFrame:
    """Vocab-table materialization through the dedup corpus tier
    (``dedup.CORPUS_MATERIALIZE``): ``"persist"`` -> DISK_ONLY with
    lineage intact — an executor loss recomputes from the corpus scan
    (the 1000-executor profile) — otherwise eager localCheckpoint
    (fastest; restart-on-loss; the local default). The merge rounds
    REQUIRE a real materialization (each round's fold nests the plan),
    so tier ``"none"`` also checkpoints rather than skipping.

    ``hard_cut`` (persist tier only; requested every
    ``_LINEAGE_CUT * _PERSIST_CUT_FACTOR`` merge rounds) TRUNCATES the
    logical plan as well: persist alone keeps lineage, so each merge
    round otherwise nests another fold and a 10^4-merge training run
    grows Catalyst analysis cost per round until the driver
    stack-overflows on plan traversal. Uses a reliable checkpoint when
    ``spark.sparkContext.setCheckpointDir`` was called (lineage cut AND
    executor-loss-safe), else localCheckpoint — accepting that a loss
    inside the window since the last cut restarts from that cut rather
    than the corpus scan, the standard checkpoint-interval tradeoff."""
    from outboxx_spark.dataops import dedup as _dd

    if _dd.CORPUS_MATERIALIZE == "persist":
        from pyspark import StorageLevel

        if hard_cut:
            if df.sparkSession.sparkContext.getCheckpointDir() is not None:
                # persist first: Dataset.checkpoint runs one job to
                # compute and a SECOND to rewrite into the checkpoint
                # dir — without the cache each hard cut computes the
                # plan twice. Unpersist after; the checkpoint owns the
                # data now. Checkpoint dirs accumulate for the session
                # unless spark.cleaner.referenceTracking.cleanCheckpoints
                # is enabled (note this in the deployment conf; ~1 dir
                # per _LINEAGE_CUT * _PERSIST_CUT_FACTOR merge rounds).
                df = df.persist(StorageLevel.DISK_ONLY)
                out = df.checkpoint(eager=True)
                df.unpersist()
                return out
            return df.localCheckpoint(eager=True)
        df = df.persist(StorageLevel.DISK_ONLY)
        df.count()  # eager, like the checkpoint branch
        return df
    return df.localCheckpoint(eager=True)


def merge_rounds_local(
    vocab: dict[tuple[str, ...], int],
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """The exact merge-round algorithm on a driver-local word-frequency
    table: overlapping pair counts weighted by word frequency, greedy
    left-to-right merge, (count desc, a, b) tie-break — the published
    semantics, identical to the distributed loop (property-tested).
    Shared by ``bpe_train``'s driver path and the DuckDB oracle builder
    (``bpe_merges_sql``), so the two can't drift apart."""
    from collections import Counter

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_pair_count: int = 2,
    mode: str = "auto",
    driver_vocab_limit: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus; stops early
    when the best remaining pair occurs fewer than ``min_pair_count``
    times. Returns the rules in the order learned.

    Fault tolerance: the vocab table (initial and per-round lineage
    cuts) routes through the SAME tier switch as the corpus-scale
    dedup intermediates, ``dedup.CORPUS_MATERIALIZE`` — under
    ``"persist"`` (the 1000-executor profile) it is DISK_ONLY with
    lineage intact, so an executor loss recomputes from the corpus
    scan instead of failing the job; the default ``"checkpoint"``
    keeps the fast non-fault-tolerant localCheckpoint (the vocab is
    Heaps'-law bounded and rounds are short, so a restart is cheap on
    single-node profiles).

    Execution modes (``mode``): the corpus pass is always distributed;
    the merge ROUNDS run driver-local whenever the word vocab fits
    ``driver_vocab_limit`` rows (``"auto"``, the default — collected
    once off the checkpointed vocab, then ``merge_rounds_local``; this
    is how production BPE trainers work, since realistic merge counts
    are 10^4+ and a per-round distributed job would mean 10^4+ vocab
    jobs), falling back to the distributed per-round loop above the
    limit. ``"distributed"``/``"driver"`` force a path (tests pin the
    two bit-identical). At 100 TB, frequency-threshold the vocab
    (min_count filter on ``word_vocab``) to bring it under the driver
    limit — the standard practice — or accept the distributed rounds."""
    # Round storage discipline (distributed path): each round caches
    # the new vocab, runs the (eager) pair-count action against it, and
    # unpersists the previous round's copy — executor storage stays
    # O(1) vocab copies however many rounds run. Every _LINEAGE_CUT
    # rounds the vocab is re-materialized through the tier, and every
    # _PERSIST_CUT_FACTOR-th such materialization takes a HARD lineage
    # cut (see _materialize_vocab) — so the logical plan (one nested
    # fold per round otherwise) stays bounded under every tier,
    # including persist.
    vocab = _materialize_vocab(word_vocab(df, text_col))
    if mode == "driver" or (mode == "auto" and vocab.count() <= driver_vocab_limit):
        rows = vocab.collect()
        vocab.unpersist()
        local = {}
        for r in rows:
            key = tuple(r["syms"])
            local[key] = local.get(key, 0) + r["n"]
        return merge_rounds_local(local, n_merges, min_pair_count)
    merges: list[tuple[str, str]] = []
    for round_i in range(n_merges):
        best = (
            vocab.select(F.col("n"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .first()
        )
        if best is None or best["cnt"] < min_pair_count:
            break
        merges.append((best["a"], best["b"]))
        new_vocab = vocab.select(
            _merge_pair(F.col("syms"), best["a"], best["b"]).alias("syms"), "n"
        )
        if (round_i + 1) % _LINEAGE_CUT == 0:
            new_vocab = _materialize_vocab(
                new_vocab,
                hard_cut=(round_i + 1) % (_LINEAGE_CUT * _PERSIST_CUT_FACTOR) == 0,
            )
        else:
            new_vocab = new_vocab.cache()
            new_vocab.count()  # materialize before dropping the parent
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return merges


def bpe_merges_sql(
    n_merges: int = 12,
    min_pair_count: int = 2,
    sf_dir: str | None = None,
) -> str:
    """DuckDB oracle for the learned merge table: replay the exact
    algorithm in pure Python over the same parquet at SQL-build time
    and inline the rules as VALUES (the inlined-model pattern the
    k-means oracles use, ``similarity._train_centroids_from_parquet``).
    All arithmetic is integer/string, so the replay is exactly
    reproducible — no float caveat here. Word splitting mirrors the
    Spark side exactly: literal single-space split, empty tokens
    dropped, every character (incl. line terminators) a symbol."""
    import os

    import pyarrow.parquet as pq

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    from collections import Counter

    words = Counter(w for t in texts for w in t.split(" ") if w)
    merges = merge_rounds_local(
        {tuple(w): n for w, n in words.items()}, n_merges, min_pair_count
    )
    if not merges:
        return (
            "SELECT CAST(NULL AS INTEGER) AS rule_idx, CAST(NULL AS VARCHAR) AS pair_a, "
            "CAST(NULL AS VARCHAR) AS pair_b WHERE FALSE"
        )

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vals = ",\n    ".join(f"({i}, {_q(a)}, {_q(b)})" for i, (a, b) in enumerate(merges))
    return f"SELECT * FROM (VALUES\n    {vals}) AS t(rule_idx, pair_a, pair_b)"


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned merge rules to every document: (doc_id, token,
    pieces) — each whitespace token segmented into its BPE pieces by
    replaying the rules in learned order. One explode plus chains of
    fold projections; no shuffle beyond the explode.

    Rules are applied in chunks of ``_LINEAGE_CUT`` with a
    ``localCheckpoint`` between chunks: one nested fold per rule in a
    single projection blows past Catalyst's analyzer/codegen limits at
    realistic (10^3+) rule counts, while chunking keeps every plan
    shallow at the cost of materializing the intermediate frame per
    chunk. Note the checkpoints make this eager, unlike most operators
    here."""
    out = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    out = out.withColumn("pieces", _chars(F.col("token")))
    for start in range(0, len(merges), _LINEAGE_CUT):
        pieces = F.col("pieces")
        for a, b in merges[start : start + _LINEAGE_CUT]:
            pieces = _merge_pair(pieces, a, b)
        out = out.withColumn("pieces", pieces)
        if start + _LINEAGE_CUT < len(merges):
            out = out.localCheckpoint(eager=True)
    return out.select(id_col, "token", "pieces")
