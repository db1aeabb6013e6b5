"""Relational Theta/KMV sketch: distinct-SET state as a mergeable
DataFrame — the fourth member of the sketch family next to `cms.py`
(frequency), `bloom.py` (membership) and `hll.py` (cardinality).

What HLL cannot do and this can: **set intersection**. Estimating
|A ∩ B| from two HLLs needs inclusion-exclusion, whose error compounds
with the set sizes rather than the intersection size; a theta sketch
intersects the retained hash samples directly, so overlap between two
independently-sketched corpora (train-vs-benchmark contamination, two
corpus versions, per-source shingle overlap) is a first-class query.
At 100 TB the workflow is: sketch each source/version once at write
time (k rows of parquet each), then answer any pairwise union /
intersection / Jaccard question from the sketches alone — no second
scan of either corpus.

Sketch state = the k smallest distinct xxhash64 values of the key set
(KMV, Beyer et al. 2007 / Dasgupta et al. 2016 theta sketch). Hashes
stay signed longs relationally; ranks map monotonically to [0, 1) via
u = (h + 2^63) / 2^64, so ORDER BY the signed long IS the KMV order.

- estimate:  n ≈ (k - 1) / u_k   (u_k = k-th smallest rank); exact
  (theta = 1, est = row count) while |set| <= k.
- union:     union the hash frames, distinct, keep k smallest again.
- intersect: theta = min(theta_A, theta_B); retained = hashes present
  in BOTH frames with rank < theta; est = |retained| / theta. Each
  retained hash is an (almost) Bernoulli(theta) sample of A ∩ B, so
  rel. sigma ≈ sqrt((1-theta) / (|A∩B| * theta)).

Scale shape: the k-smallest selection is `sort + limit`, which
Catalyst executes as TakeOrderedAndProject — per-partition partial
top-k, then a k·numPartitions driver merge. k = 2048 keeps that
metadata-sized (32 MB even at 1000 partitions); for k large enough to
matter, pre-shrink with one `groupBy(pmod(h, P)).agg(sort+slice)`
round so the driver merge sees P·k rows max. Everything else is
joins/aggregates over at-most-k-row frames.

Certification (staged oracle ``olap_theta_sketch``): 3-token shingle
sets of the even/odd doc_id halves of `documents` — the contamination
use-case in miniature. Exact |A|, |B|, |A∩B|, |A∪B| are the checked
columns; the sketch estimates fold in as literals (deterministic
functions of the same input) and the flags pin each estimate within
5 sigma of exact. xxhash64 is fixed, so the flags are stable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.dataops.chunking import chunk_documents
from outboxx_spark.sources.tables import read_table

K_DEFAULT = 2048
_TWO63 = float(1 << 63)
_TWO64 = float(1 << 64)


def _rank(h: int) -> float:
    """Signed long -> (0, 1] KMV rank, monotone (non-strictly: hashes
    within one double ulp — 2^11 near the extremes — share a rank;
    sample neighbors sit ~2^64/n apart, so collisions are statistical
    noise far below the estimator's own sigma) in the signed order."""
    return (float(h) + _TWO63 + 1.0) / _TWO64


def theta_sketch(df: DataFrame, key_col: str, k: int = K_DEFAULT) -> DataFrame:
    """(h,): the k smallest distinct xxhash64 values of ``key_col``.
    sort+limit => TakeOrderedAndProject (partial top-k per partition,
    k-row driver merge) after the one distinct shuffle."""
    return (
        df.select(F.xxhash64(F.col(key_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def theta_union(a: DataFrame, b: DataFrame, k: int = K_DEFAULT) -> DataFrame:
    """Sketch of A ∪ B: merge the retained samples, re-trim to k.
    Associative and commutative — fold any number of per-source
    sketches this way."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def _collect_hashes(sketch: DataFrame) -> list[int]:
    return sorted(r["h"] for r in sketch.collect())  # <= k rows


def theta_estimate(sketch: DataFrame, k: int = K_DEFAULT) -> float:
    """KMV estimator over the (<= k)-row frame: exact below k, else
    (k-1)/u_k. Driver work is sketch-sized by construction."""
    hs = _collect_hashes(sketch)
    if len(hs) < k:
        return float(len(hs))
    return (k - 1) / _rank(hs[-1])


def theta_intersect_estimate(
    a: DataFrame, b: DataFrame, k: int = K_DEFAULT
) -> float:
    """|A ∩ B| from the two sketches alone: cut both at the smaller
    theta, count hashes retained by BOTH, divide by theta."""
    ha, hb = _collect_hashes(a), _collect_hashes(b)
    theta = min(
        1.0 if len(ha) < k else _rank(ha[-1]),
        1.0 if len(hb) < k else _rank(hb[-1]),
    )
    both = set(h for h in ha if _rank(h) < theta or theta == 1.0) & set(
        h for h in hb if _rank(h) < theta or theta == 1.0
    )
    return len(both) / theta


def theta_sketch_by(
    df: DataFrame, group_col: str, key_col: str, k: int = K_DEFAULT
) -> DataFrame:
    """(group, h): one KMV sample PER GROUP — the k smallest distinct
    hashes within each group, via a window rank instead of the global
    sort+limit (one shuffle on the group key, no driver merge at all;
    the per-source sketch-at-write-time shape)."""
    from pyspark.sql import Window

    w = Window.partitionBy("group").orderBy("h")
    return (
        df.select(
            F.col(group_col).alias("group"),
            F.xxhash64(F.col(key_col)).alias("h"),
        )
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _pairwise_intersections(
    sketches: dict[str, list[int]], k: int
) -> dict[tuple[str, str], tuple[float, float]]:
    """{(a, b): (est_inter, theta)} for every a < b group pair, from
    the collected per-group samples (G*k rows total — the matrix costs
    nothing more than the sketches)."""
    out = {}
    for ga in sorted(sketches):
        for gb in sorted(sketches):
            if ga >= gb:
                continue
            ha, hb = sketches[ga], sketches[gb]
            theta = min(
                1.0 if len(ha) < k else _rank(ha[-1]),
                1.0 if len(hb) < k else _rank(hb[-1]),
            )
            both = set(
                h for h in ha if _rank(h) < theta or theta == 1.0
            ) & set(h for h in hb if _rank(h) < theta or theta == 1.0)
            out[(ga, gb)] = (len(both) / theta, theta)
    return out


def _shingles(spark: SparkSession, sf_dir: str, seg_len: int = 3) -> DataFrame:
    """(doc_id, seg): non-overlapping seg_len-token segments — the
    linededup segmentation, reused so the oracle CTE matches."""
    docs = read_table(spark, sf_dir, "documents")
    return chunk_documents(docs, window=seg_len, stride=seg_len).select(
        "doc_id", F.col("chunk").alias("seg")
    )


def theta_sketch_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification (staged oracle ``olap_theta_sketch``): even/odd
    doc_id shingle sets; exact sizes as checked columns, sketch
    estimates pinned within 5 sigma via boolean flags.

    Bands: distinct/union rel. sigma = 1/sqrt(k-2) (Beyer et al.);
    intersection rel. sigma = sqrt((1-theta)/(n_inter*theta)), both
    evaluated against the exact counts the query itself computes.
    """
    k = K_DEFAULT
    segs = _shingles(spark, sf_dir)
    # ONE grouped-sketch job collects both halves' KMV samples (parity
    # group). The previous shape called theta_estimate /
    # theta_intersect_estimate on the lazy sk_a / sk_b frames — eight
    # separate collects, each re-running the corpus chunk+distinct
    # lineage (measured 12 driver jobs / 2.8 s of builder time at
    # sf0.1). Every estimator below is a pure function of the two
    # <= k-row hash lists, so collect them once and fold the identical
    # formulas driver-side: same doubles, bit-identical flags.
    per: dict[int, list[int]] = {0: [], 1: []}
    for r in theta_sketch_by(
        segs.select((F.col("doc_id") % 2).alias("par"), "seg"), "par", "seg", k
    ).collect():
        per[int(r["group"])].append(r["h"])
    ha, hb = sorted(per[0]), sorted(per[1])

    def _est(hs: list[int]) -> float:
        return float(len(hs)) if len(hs) < k else (k - 1) / _rank(hs[-1])

    est_a = _est(ha)
    est_b = _est(hb)
    est_union = _est(sorted(set(ha) | set(hb))[:k])

    sigma_kmv = 1.0 / math.sqrt(k - 2)
    exact = (
        segs.select(
            "seg",
            (F.col("doc_id") % 2 == 0).alias("in_a"),
            (F.col("doc_id") % 2 == 1).alias("in_b"),
        )
        .groupBy("seg")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .agg(
            F.count(F.when(F.col("in_a"), 1)).cast("long").alias("exact_a"),
            F.count(F.when(F.col("in_b"), 1)).cast("long").alias("exact_b"),
            F.count(F.when(F.col("in_a") & F.col("in_b"), 1))
            .cast("long")
            .alias("exact_inter"),
            F.count(F.lit(1)).cast("long").alias("exact_union"),
        )
    )

    def _within(est: float, col: str, rel_sigma) -> F.Column:
        return F.abs(F.lit(est) - F.col(col)) <= 5.0 * rel_sigma * F.col(col)

    # theta actually applied to the intersection sample: min of the two
    # per-sketch cut ranks (1.0 while a side is exact). Folded in as a
    # literal for the sigma formula, like the estimates themselves.
    theta = min(
        1.0 if len(ha) < k else _rank(ha[-1]),
        1.0 if len(hb) < k else _rank(hb[-1]),
    )
    both = set(h for h in ha if _rank(h) < theta or theta == 1.0) & set(
        h for h in hb if _rank(h) < theta or theta == 1.0
    )
    est_inter = len(both) / theta
    inter_sigma = F.when(
        F.lit(theta) >= 1.0, F.lit(0.0)  # exact regime: demand equality
    ).otherwise(
        F.sqrt((1.0 - theta) / (F.col("exact_inter") * theta))
    )
    # disjoint-sides guard (r10 advice): with exact_inter = 0 and
    # theta < 1 the relative sigma divides by zero (Spark -> NULL ->
    # NULL inter_ok vs the oracle's TRUE). Zero true intersection has
    # no relative scale, so bound the ESTIMATE absolutely instead:
    # each false-positive intersection row contributes ~1/theta to the
    # estimator, so est <= 5 * sqrt((1-theta)/theta) is the 5-sigma
    # analog (0 in the exact theta >= 1 regime — demand est == 0).
    inter_abs_bound = (
        5.0 * math.sqrt((1.0 - theta) / theta) if theta < 1.0 else 0.0
    )
    inter_ok = F.when(
        F.col("exact_inter") == 0, F.lit(est_inter) <= F.lit(inter_abs_bound)
    ).otherwise(_within(est_inter, "exact_inter", inter_sigma))
    return exact.select(
        "exact_a",
        "exact_b",
        "exact_inter",
        "exact_union",
        _within(est_a, "exact_a", F.lit(sigma_kmv)).alias("a_ok"),
        _within(est_b, "exact_b", F.lit(sigma_kmv)).alias("b_ok"),
        _within(est_union, "exact_union", F.lit(sigma_kmv)).alias("union_ok"),
        inter_ok.alias("inter_ok"),
    )


def source_overlap_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification (staged oracle ``docs_source_overlap``): the
    per-source workflow end-to-end — ONE corpus pass materializes the
    distinct (lang, seg) frame (eager localCheckpoint, lineage-private
    per the pagerank cache lesson), then the grouped sketch pass and
    the exact side both read it. The full pairwise overlap matrix is
    computed from the G·k collected sample rows alone. Exact pair
    intersections are the checked columns; each estimate's flag pins
    it within 5 sigma (equality in the exact-below-k regime).

    Exact-side shape: per seg, every unordered lang pair counts once,
    so instead of a distinct self-join on seg (the chunk+distinct
    subtree twice feeding a SortMergeJoin) it is groupBy(seg).
    collect_set(lang) -> in-row pair explosion -> count — identical
    pair counts by construction, one shuffle on seg, no join, and the
    final count gets map-side partial aggregation. The set of langs
    per seg is G-bounded, so the explosion is at most G^2 rows per
    seg, never data-sized."""
    k = K_DEFAULT
    docs = read_table(spark, sf_dir, "documents")
    segs = chunk_documents(docs, window=3, stride=3).select(
        "doc_id", F.col("chunk").alias("seg")
    )
    lsegs = segs.join(docs.select("doc_id", "lang"), "doc_id").select(
        "lang", "seg"
    )
    d = lsegs.localCheckpoint(eager=True)
    per: dict[str, list[int]] = {}
    for r in theta_sketch_by(d, "lang", "seg", k).collect():  # G*k rows
        per.setdefault(r["group"], []).append(r["h"])
    for hs in per.values():
        hs.sort()
    ests = _pairwise_intersections(per, k)
    est_df = F.broadcast(
        spark.createDataFrame(
            [
                (a, b, float(est), float(theta))
                for (a, b), (est, theta) in ests.items()
            ],
            "lang_a string, lang_b string, est double, theta double",
        )
    )
    exact = (
        d.groupBy("seg")
        .agg(F.collect_set("lang").alias("ls"))
        .select(F.explode("ls").alias("lang_a"), "ls")
        .select("lang_a", F.explode("ls").alias("lang_b"))
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    sigma = F.sqrt((1.0 - F.col("theta")) / (F.col("exact_inter") * F.col("theta")))
    ok = F.when(
        F.col("theta") >= 1.0, F.col("est") == F.col("exact_inter")
    ).otherwise(
        F.abs(F.col("est") - F.col("exact_inter"))
        <= 5.0 * sigma * F.col("exact_inter")
    )
    return exact.join(est_df, ["lang_a", "lang_b"]).select(
        "lang_a", "lang_b", "exact_inter", ok.alias("inter_ok")
    )


SOURCE_OVERLAP_SQL = """
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
s0 AS (
  SELECT lang, toks, unnest(range(0, len(toks), 3)) AS st FROM t
),
s AS (
  SELECT DISTINCT lang, array_to_string(toks[st + 1 : st + 3], ' ') AS seg
  FROM s0
)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       CAST(count(*) AS BIGINT) AS exact_inter,
       TRUE AS inter_ok
FROM s a JOIN s b ON a.seg = b.seg AND a.lang < b.lang
GROUP BY 1, 2
"""


THETA_SKETCH_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s0 AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 3)) AS st FROM t
),
s AS (
  SELECT doc_id, array_to_string(toks[st + 1 : st + 3], ' ') AS seg FROM s0
),
o AS (
  SELECT seg,
         bool_or(doc_id % 2 = 0) AS in_a,
         bool_or(doc_id % 2 = 1) AS in_b
  FROM s GROUP BY seg
)
SELECT CAST(count(*) FILTER (in_a) AS BIGINT)          AS exact_a,
       CAST(count(*) FILTER (in_b) AS BIGINT)          AS exact_b,
       CAST(count(*) FILTER (in_a AND in_b) AS BIGINT) AS exact_inter,
       CAST(count(*) AS BIGINT)                        AS exact_union,
       TRUE AS a_ok, TRUE AS b_ok, TRUE AS union_ok, TRUE AS inter_ok
FROM o
"""
