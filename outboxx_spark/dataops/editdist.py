"""Edit-distance (Levenshtein) near-dup pairs with provably-complete
q-gram prefix blocking.

The fuzzy-dedup family member the shingle/Jaccard operators can't
express: pairs within an absolute number of character EDITS (typo-level
duplication, OCR noise, template drift), reference test-data semantics
alongside `docs_ngram_dedup`/`docs_minhash_dedup` (SURVEY §2.10 family).

Blocking is the classic q-gram count + prefix filter (Gravano et al.,
VLDB'01; the All-Pairs/PPJoin prefix lemma):

- count filter: one edit destroys at most ``q`` positional q-grams, so
  ``ed(A,B) <= d`` implies multiset overlap
  ``|G(A) ∩ G(B)| >= max(|G(A)|,|G(B)|) - d*q``.
- prefix filter: order every gram occurrence by a canonical global
  rarity key (document frequency asc, gram, position). If the overlap
  bound holds, the first ``d*q + 1`` gram occurrences of A and of B
  must intersect. Candidates are therefore pairs sharing a gram in
  their rarity prefixes — join traffic is Σ df(prefix gram)², tiny
  because the prefix keeps the RAREST grams.

100 TB shape: one groupBy for global gram frequencies (map-side
partial agg), one groupBy per doc for the rarity prefix (in-array
sort + slice — no window, no extra shuffle), a bucket join keyed on
(prefix gram, length band) so the |len| filter rides the join key,
then JVM `levenshtein` with an early exit threshold on the candidate
tail. No Python anywhere. The count
bound is vacuous when ``max(|G|) <= d*q`` (both docs shorter than
``d*q + q - 1`` chars), so docs at or below that length go through a
short-bucket cross join — a negligible sliver of any length-filtered
corpus, and bounded by construction (the bucket only ever holds
sub-``d*q+q-1``-char docs).

Oracle (``edit_distance_pairs_sql``) is an INDEPENDENT formulation:
brute force over a length-difference + character-bag prefilter
(one edit shifts the char histogram by at most 2, so
``Σ_c |cnt_A(c) - cnt_B(c)| <= 2d``) with DuckDB ``levenshtein`` —
no shared blocking logic with the Spark path, so the gate genuinely
cross-checks the prefix-filter math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from outboxx_spark.dataops.util import parallelized

DEFAULT_D = 8
# q=5 measured 1.6x fewer candidates and ~1.4x less wall time than q=3
# on the synthetic corpus (its 3-gram vocabulary is ~377 grams, so
# 3-gram "rarity" prefixes barely discriminate; 5-grams are rare enough
# to filter). The tradeoff is the short-doc bucket boundary d*q+q-1
# growing to 44 chars — still a negligible sliver of a length-filtered
# corpus.
DEFAULT_Q = 5


def _positional_grams(docs: DataFrame, q: int, id_col: str, text_col: str) -> DataFrame:
    """(id, len, pos, g): every positional q-gram occurrence. Docs
    shorter than ``q`` emit no grams — the CASE guard matters because
    Spark's sequence(start, stop) counts DOWN when stop < start, so an
    unguarded sequence(1, len-q+1) would emit phantom grams for them."""
    gram_expr = (
        f"CASE WHEN length({text_col}) >= {q} THEN "
        f"transform(sequence(1, length({text_col}) - {q - 1}),"
        f" i -> substring({text_col}, i, {q})) "
        f"ELSE array() END"
    )
    return docs.select(
        F.col(id_col),
        F.col("len"),
        F.posexplode(F.expr(gram_expr)).alias("pos", "g"),
    )


def edit_distance_pairs(
    df: DataFrame,
    d: int = DEFAULT_D,
    q: int = DEFAULT_Q,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_salt: int = 1,
) -> DataFrame:
    """All (a < b) pairs with ``levenshtein(text_a, text_b) <= d``.

    Output: (doc_a, doc_b, dist) — integers only, exact (the blocking
    is complete by the count/prefix lemmas; the short bucket covers the
    regime where the count bound is vacuous).
    """
    # single-file corpora arrive as one partition — spread the
    # explode/levenshtein work across cores (no-op on real multi-file
    # tables)
    df = parallelized(df)
    docs = df.select(F.col(id_col), F.col(text_col), F.length(text_col).alias("len"))
    # |G(doc)| = len - q + 1; the count bound needs max(|G|) > d*q.
    short_len = d * q + q - 1  # both docs <= this => bound vacuous

    grams = _positional_grams(docs, q, id_col, text_col)
    # gram vocabulary is bounded by charset^q regardless of corpus size,
    # so the frequency dim broadcasts at any scale
    gram_df = grams.groupBy("g").agg(F.count("*").alias("df_"))
    ranked = grams.join(F.broadcast(gram_df), "g")
    # per-doc prefix in ONE shuffle: collect this doc's occurrences,
    # sort by the canonical rarity key (df, gram, pos) in-array, keep
    # the d*q+1 rarest, then dedupe grams (sharing >=1 gram is a
    # set-level test — duplicate grams only inflate join fan-out).
    # A row_number window + a distinct would spend two extra shuffles
    # on the same result.
    prefix = (
        ranked.groupBy(id_col, "len")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("df_", "g", "pos"))),
                1,
                d * q + 1,
            ).alias("pfx")
        )
        .select(
            F.col(id_col),
            F.col("len"),
            F.explode(F.array_distinct(F.transform("pfx", lambda s: s["g"]))).alias("g"),
        )
        # The prefix table feeds BOTH sides of the candidate self-join;
        # without a materialization the whole grams -> frequency-dim ->
        # collect_list pipeline runs once per side on every action
        # (measured 2.6s -> 1.0s steady-state at sf0.1). It is tiny —
        # n_docs x (d*q+1) keyed rows. This makes the operator eager at
        # build, like the IVF family's centroid training.
        .localCheckpoint(eager=True)
    )
    # Candidate join on (gram, length band[, salt]):
    #
    # - BAND: |len_a - len_b| <= d implies the docs' length bands (width
    #   d+1) differ by at most 1, so replicating side B to its adjacent
    #   bands and joining band-equal moves the length filter INTO the
    #   join key — a hot gram's pair grid shrinks from df² to
    #   Σ_band df_band·df_adjacent, and over-length pairs never reach
    #   the join output at all. Replacing the old gram-only 8x salt with
    #   banding measured 4.4s -> 3.0s at sf0.1: 3x replication instead
    #   of 8x AND ~(len spread / d)x more join keys spreading the grid.
    # - SALT (opt-in, ``n_salt > 1``): a corpus whose lengths CLUSTER
    #   collapses the bands and re-concentrates hot grams in one task;
    #   there, side A salts by doc hash and side B fans out S-fold on
    #   top of the band replication. Off by default: a measured
    #   per-(g,band)-frequency adaptive variant cost MORE than it saved
    #   locally (+1.5s — the frequency dim forces a third computation of
    #   the prefix pipeline), and at real scale AQE's skew-join split
    #   already re-splits any oversized join partition at runtime. Same
    #   pair set exactly once at any n_salt.
    band = (F.col("len") / (d + 1)).cast("int")
    if n_salt > 1:
        a_salt = F.pmod(F.xxhash64(id_col), F.lit(n_salt))
        b_salts = F.sequence(F.lit(0), F.lit(n_salt - 1))
    else:
        a_salt = F.lit(0)
        b_salts = F.array(F.lit(0))
    a = prefix.withColumn("band", band).withColumn("salt", a_salt).alias("a")
    b = (
        prefix.withColumn("band", F.explode(F.array(band - 1, band, band + 1)))
        .withColumn("salt", F.explode(b_salts))
        .alias("b")
    )
    cand_prefix = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= d),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
    )

    shorts = docs.filter(F.col("len") <= short_len)
    sa = shorts.select(F.col(id_col).alias("doc_a"), F.col("len").alias("len_a"))
    sb = shorts.select(F.col(id_col).alias("doc_b"), F.col("len").alias("len_b"))
    cand_short = sa.join(
        sb,
        (F.col("doc_a") < F.col("doc_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= d),
    ).select("doc_a", "doc_b")

    cand = cand_prefix.unionByName(cand_short).distinct()

    ta = df.select(F.col(id_col).alias("doc_a"), F.col(text_col).alias("text_a"))
    tb = df.select(F.col(id_col).alias("doc_b"), F.col(text_col).alias("text_b"))
    # levenshtein's threshold form short-circuits (returns -1 above d).
    # The explicit repartition defeats AQE's coalescePartitions on the
    # verify stage: the candidate rows are BYTE-small but CPU-heavy
    # (each carries an O(d*min(len)) edit-distance evaluation), so
    # size-based coalescing serializes exactly the most expensive stage
    # (measured 3.3s -> 2.6s at sf0.1 on local[32]).
    par = df.sparkSession.sparkContext.defaultParallelism
    dist = F.levenshtein("text_a", "text_b", d)
    return (
        cand.repartition(par)
        .join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        # long: duckdb levenshtein is BIGINT; int-width splits typewarn
        .select("doc_a", "doc_b", F.col("dist").cast("long").alias("dist"))
    )


def edit_distance_pairs_sql(d: int = DEFAULT_D) -> str:
    """Independent DuckDB oracle: length-diff + char-bag complete
    prefilters (each edit moves the histogram by <= 2), then exact
    levenshtein. Bag covers a-z, space; any other character still only
    TIGHTENS nothing — unlisted chars are simply not counted, which
    WEAKENS the filter (safe direction: more candidates, never fewer).
    """
    return f"""
WITH chars(c) AS (
  SELECT unnest(string_split('a b c d e f g h i j k l m n o p q r s t u v w x y z _SP', ' '))
),
bags AS (
  SELECT doc_id, text, length(text) AS len,
         list(length(text) - length(replace(text, CASE WHEN c = '_SP' THEN ' ' ELSE c END, ''))
              ORDER BY c) AS bag
  FROM documents, chars GROUP BY doc_id, text
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.text AS ta, b.text AS tb
  FROM bags a JOIN bags b ON a.doc_id < b.doc_id
  AND abs(a.len - b.len) <= {d}
  AND list_sum(list_transform(range(1, 28), i -> abs(a.bag[i] - b.bag[i]))) <= {2 * d}
)
SELECT doc_a, doc_b, levenshtein(ta, tb) AS dist FROM cand
WHERE levenshtein(ta, tb) <= {d}
"""
