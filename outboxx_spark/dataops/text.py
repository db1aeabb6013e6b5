"""Text analysis operators for training-data pipelines, over the
``documents`` table: token counting, quality scoring, language ID,
document fingerprinting, shingling.

All hot-path expressions are built-in JVM functions (split/filter/
aggregate/md5) — no Python UDFs — so they stay inside whole-stage
codegen and scale linearly with partitions. Each operator has an exact
DuckDB-SQL mirror for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from outboxx_spark.dataops.hashing import HASH_P, md5_hash60, md5_hash60_sql
from outboxx_spark.dataops.util import parallelized

# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    """Whitespace tokens (the corpus is single-space separated; a BPE-ish
    regex tokenizer is below for irregular text)."""
    return F.split(text, " ")


TOKENS_SQL = "string_split({t}, ' ')"

# BPE-ish fallback: word pieces = runs of letters, digits, or single
# punctuation — for text where whitespace split under-segments.
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(BPE_REGEX), 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

# tiny stopword set — enough to exercise the ratio features
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/stopword/uniqueness features + a composite quality score.

    Formula kept to exact-reproducible arithmetic (int counts + one
    double division each) so the oracle matches bit-for-bit.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_uniq = F.size(F.array_distinct(toks))
    return df.select(
        "doc_id",
        # counts cast long: duckdb length/len are BIGINT and int-width
        # splits in checked outputs are a gate typewarn
        F.length(t).cast("long").alias("n_chars_obs"),
        n_tok.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        n_uniq.cast("long").alias("n_unique_tokens"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
        (n_uniq.cast("double") / n_tok).alias("unique_ratio"),
        (F.length(t).cast("double") / n_tok).alias("avg_token_span"),
    )


QUALITY_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars_obs,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_filter(string_split(text, ' '), x -> list_contains({list(STOPWORDS)}, x))) AS n_stopwords,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
       CAST(len(list_filter(string_split(text, ' '), x -> list_contains({list(STOPWORDS)}, x))) AS DOUBLE)
         / len(string_split(text, ' ')) AS stopword_ratio,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS unique_ratio,
       CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_span
FROM documents
"""

# ---------------------------------------------------------------------------
# language identification (marker-token heuristic)
# ---------------------------------------------------------------------------

# n-gram/marker heuristic: score = marker-token hits per language,
# argmax with deterministic alphabetical tie-break ('en' wins ties via
# ordering below). Real corpora get real marker lists; the mechanism —
# a codegen'd filter+argmax, no UDF — is the scalable part.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "nicht", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "y", "de", "es"),
    "fr": ("le", "la", "et", "de", "est"),
    "zh": (),  # no latin markers; never wins on this corpus
}


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        if markers:
            arr = F.array(*[F.lit(m) for m in markers])
            out[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
        else:
            out[lang] = F.lit(0)
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    scores = lang_scores(F.col(text_col))
    # argmax over a deterministic language order (ties -> first)
    pairs = F.array(
        *[F.struct(scores[lang].alias("s"), F.lit(lang).alias("l")) for lang in sorted(LANG_MARKERS)]
    )
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).alias("s"), F.lit("und").alias("l")),
        lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc),
    )
    return df.select("doc_id", best["l"].alias("pred_lang"))


def lang_id_sql() -> str:
    # same argmax, same deterministic order, via a greatest-chain
    score = {
        lang: (
            f"len(list_filter(string_split(text, ' '), x -> list_contains({list(m)}, x)))"
            if m
            else "0"
        )
        for lang, m in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)
    # fold left: pick first max
    expr = "'und'"
    best = "-1"
    for lang in langs:
        expr = f"CASE WHEN {score[lang]} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"greatest({score[lang]}, {best})"
    return f"SELECT doc_id, {expr} AS pred_lang FROM documents"


# ---------------------------------------------------------------------------
# curation pipeline (composition)
# ---------------------------------------------------------------------------

# thresholds chosen for the synthetic corpus; real pipelines tune these
CURATION_MIN_TOKENS = 40
CURATION_MIN_UNIQUE_RATIO = 0.25


def curate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data curation filter: length + repetitiveness gates over
    the quality features. Composes as one codegen'd projection+filter —
    no extra pass over the corpus."""
    feats = quality_features(df, text_col)
    return feats.filter(
        (F.col("n_tokens") >= CURATION_MIN_TOKENS)
        & (F.col("unique_ratio") >= CURATION_MIN_UNIQUE_RATIO)
    ).select("doc_id", "n_tokens", "unique_ratio")


def curate_sql() -> str:
    return f"""
    WITH feats AS ({QUALITY_SQL})
    SELECT doc_id, n_tokens, unique_ratio FROM feats
    WHERE n_tokens >= {CURATION_MIN_TOKENS} AND unique_ratio >= {CURATION_MIN_UNIQUE_RATIO}
    """


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two content fingerprints: md5 of the normalized text (exact-dup
    key) and the minimum 60-bit shingle hash (a 1-perm MinHash, the
    rolling-hash flavor robust to local edits)."""
    t = F.col(text_col)
    norm = F.lower(F.trim(t))
    sh = shingles(t, 3)
    min_shingle = F.array_min(F.transform(sh, lambda s: md5_hash60(s) % HASH_P))
    return parallelized(df).select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        min_shingle.alias("min_shingle_hash"),
    )


def fingerprint_sql() -> str:
    sh = shingles_sql("text", 3)
    h = md5_hash60_sql("s")
    return f"""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_md5,
           list_min(list_transform({sh}, s -> {h} % {HASH_P})) AS min_shingle_hash
    FROM documents
    """


# ---------------------------------------------------------------------------
# shingling (shared by fingerprint + dedup)
# ---------------------------------------------------------------------------


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles; documents shorter than k tokens yield a
    single whole-text shingle (both engines apply the same guard)."""
    toks = tokens(text)
    return F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - k),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
            )
        ),
    ).otherwise(F.array(text))


def shingles_sql(text_expr: str, k: int = 3) -> str:
    toks = f"string_split({text_expr}, ' ')"
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - {k} + 2), "
        f"i -> array_to_string(({toks})[i:i+{k - 1}], ' '))) "
        f"ELSE [{text_expr}] END"
    )


def vocab_top_tokens(df: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: top-k tokens by total occurrence count with a
    deterministic (count desc, token asc) order — the candidate-vocab
    pass of tokenizer training, run corpus-wide.

    100 TB shape: explode + one groupBy(token) with map-side partial
    counts (shuffle carries one row per distinct token per mapper, not
    per occurrence), then ``orderBy().limit(k)`` which compiles to
    TakeOrderedAndProject — per-partition top-k heaps, k rows to the
    driver, no global sort."""
    occ = parallelized(df).select(F.explode(tokens(F.col(text_col))).alias("token"))
    return (
        occ.filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )


def vocab_top_tokens_sql(k: int = 100) -> str:
    return f"""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token != ''
GROUP BY token ORDER BY n DESC, token LIMIT {k}
"""


def tfidf_top_terms(
    df: DataFrame, top: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``top`` TF-IDF terms per document — the classic relevance /
    keyword-extraction projection, corpus-wide.

    tf = occurrences in doc; idf = ln((N + 1) / (df + 1)) + 1 (smoothed,
    sklearn-style); scores rounded to 6 decimals BEFORE ranking so the
    (score desc, token) order — and therefore the emitted row set — is
    reproducible across engines regardless of last-ulp libm drift.

    100 TB shape: term frequencies are one map-side-combinable groupBy;
    the doc-frequency table is vocabulary-sized (bounded, broadcastable);
    ranking is one window partitioned BY DOCUMENT — embarrassingly
    parallel, no global sort anywhere."""
    occ = parallelized(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    # ONE corpus explode (r14, §2.4): tf is materialized eagerly and
    # docfreq DERIVED from it — tf holds exactly one row per distinct
    # (doc, token), so the per-token row count IS the distinct-doc
    # count. The cut is load-bearing, not belt-and-braces: without it
    # Catalyst prunes tf's count and rewrites the derived branch back
    # into a distinct-aggregate over the corpus (canonically different
    # from tf's exchange, so AQE stage reuse never fires — verified on
    # the executed adaptive plan in r13). tf's narrow (id, token, n)
    # rows are strictly cheaper to re-read than the corpus explode
    # that produces them (the §9 narrowness rule).
    tf = (
        occ.groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    n_docs = df.select(id_col).distinct().count()
    docfreq = tf.groupBy("token").agg(F.count("*").alias("df_"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df_") + 1)) + 1.0
    scored = tf.join(F.broadcast(docfreq), "token").select(
        F.col(id_col),
        F.col("token"),
        F.round(F.col("tf") * idf, 6).alias("tfidf"),
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= top)
        .select(id_col, "token", "tfidf", "rnk")
    )


def tfidf_top_terms_sql(top: int = 5) -> str:
    return f"""
WITH occ AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
occf AS (SELECT doc_id, token FROM occ WHERE token != ''),
tf AS (SELECT doc_id, token, count(*) AS tf FROM occf GROUP BY doc_id, token),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
docfreq AS (SELECT token, count(DISTINCT doc_id) AS df_ FROM occf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * (ln((n.n_docs + 1.0) / (docfreq.df_ + 1)) + 1.0), 6) AS tfidf
  FROM tf, n JOIN docfreq ON tf.token = docfreq.token
)
SELECT doc_id, token, tfidf,
       row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
FROM scored
QUALIFY rnk <= {top}
"""


def unigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", min_df: int = 2
) -> DataFrame:
    """Per-document unigram language-model quality scores — the
    CCNet-style corpus filter: train add-one-smoothed token
    probabilities on the corpus itself, score every document by mean
    token log-probability (low = gibberish / boilerplate outlier) and
    by OOV rate against a ``min_df``-pruned vocabulary.

    p(tok) = (n_tok + 1) / (total + |V| + 1) with n_tok = 0 for tokens
    whose document frequency is below ``min_df`` (the OOV mass).
    Emits (doc_id, n_tokens, oov_rate, avg_logprob); documents with no
    tokens are absent (no tokens to score).

    Determinism: a double sum over a document's token log-probs is
    float-order-dependent, so each log-prob is quantized to integer
    micro-nats FIRST (CAST(round(ln(p) * 1e6) AS BIGINT)) — the same
    integer-domain trick as the quantile queries' cents — making the
    per-doc sum exact and order-independent; only the final mean is
    rounded back. Mirrored verbatim in :func:`unigram_lm_scores_sql`.

    100 TB shape: one explode, one vocabulary-sized groupBy (map-side
    combinable), a broadcast vocab join, one per-doc aggregation. The
    two corpus scalars (total occurrences, vocab size) are single
    aggregate actions at plan-build time."""
    occ = parallelized(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    # counts is vocabulary-sized (bounded) and feeds the vocab filter,
    # BOTH corpus scalars, and the broadcast join — materialize it once
    # so the corpus-scale explode runs exactly twice total (here and in
    # the scoring join), not once per derived use
    counts = occ.groupBy("token").agg(
        F.count("*").alias("n_tok"), F.count_distinct(id_col).alias("df_")
    ).localCheckpoint(eager=True)
    vocab = counts.filter(F.col("df_") >= min_df).select("token", "n_tok")
    total = counts.agg(F.sum("n_tok")).first()[0] or 0
    v_size = vocab.count()
    denom = float(total + v_size + 1)
    lp_micro = F.round(
        F.log((F.coalesce(F.col("n_tok"), F.lit(0)) + 1.0) / F.lit(denom)) * 1e6
    ).cast("long")
    scored = occ.join(F.broadcast(vocab), "token", "left").select(
        F.col(id_col),
        F.when(F.col("n_tok").isNull(), 1).otherwise(0).alias("is_oov"),
        lp_micro.alias("lp_micro"),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.sum("is_oov") / F.count("*"), 6).alias("oov_rate"),
        F.round(F.sum("lp_micro") / F.count("*") / 1e6, 6).alias("avg_logprob"),
    )


def unigram_lm_scores_sql(min_df: int = 2) -> str:
    return f"""
WITH occ AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
occf AS (SELECT doc_id, token FROM occ WHERE token != ''),
counts AS (
  SELECT token, count(*) AS n_tok, count(DISTINCT doc_id) AS df_
  FROM occf GROUP BY token
),
vocab AS (SELECT token, n_tok FROM counts WHERE df_ >= {min_df}),
tot AS (SELECT count(*) AS total FROM occf),
vsz AS (SELECT count(*) AS v FROM vocab),
lp AS (
  SELECT o.doc_id,
         CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS is_oov,
         CAST(round(ln((COALESCE(v.n_tok, 0) + 1.0)
                       / (tot.total + vsz.v + 1.0)) * 1000000) AS BIGINT)
           AS lp_micro
  FROM occf o LEFT JOIN vocab v USING (token), tot, vsz
)
SELECT doc_id,
       count(*) AS n_tokens,
       round(sum(is_oov) * 1.0 / count(*), 6) AS oov_rate,
       round(sum(lp_micro) * 1.0 / count(*) / 1000000.0, 6) AS avg_logprob
FROM lp GROUP BY doc_id
"""
