"""Corpus-curation operators for training-data pipelines, over
``documents``: PII redaction, deterministic stratified sampling,
weighted corpus mixing (up/down-sampling), Gopher-style repetition
features, and connected-components duplicate clustering.

Scale posture (the 100 TB contract):

* PII redaction is a chain of codegen'd ``regexp_replace`` — narrow
  map, no shuffle, no Python.
* Sampling/mixing decisions are pure functions of md5(doc_id): no RNG
  state, no sampleBy() (whose Bernoulli draws differ per engine/run),
  reproducible across engines AND across re-runs on different cluster
  sizes — the property a 100 TB curation run actually needs (re-running
  a failed stage must pick the same rows).
* Repetition features: one explode + groupBy per document key — the
  shuffle is bounded by total n-gram volume, map-side combinable.
* Duplicate clustering is iterative min-label propagation over the
  near-dup pair set: each round is one shuffle-on-key join; rounds =
  graph diameter (dup clusters are shallow — pairs all share a common
  near-identical core, so a handful of rounds closes them). The
  classic large-star/small-star refinement halves the round count at
  extreme diameters; plain min-propagation is the right default.

Every operator has an exact DuckDB mirror (the clustering one via a
recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from outboxx_spark.dataops.hashing import md5_hash60, md5_hash60_sql
from outboxx_spark.dataops.util import parallelized as _parallelized

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax Java regex and RE2 (DuckDB) treat
# identically: character classes, bounded repetition, \b — no
# lookaround, no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{3,4}-\d{4}\b"

# order matters: emails first (they contain dots and digits), then IPs
# (dotted digits), then phone shapes
_PII_CHAIN = [
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_IP_RE, "<IP>"),
    (PII_PHONE_RE, "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    out = text
    for pattern, token in _PII_CHAIN:
        out = F.regexp_replace(out, pattern, token)
    return out


def redact_pii_sql(text_expr: str) -> str:
    out = text_expr
    for pattern, token in _PII_CHAIN:
        # DuckDB '...' literals are escape-free: backslashes pass through
        # to RE2 verbatim, so the pattern embeds as-is
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select("doc_id", redact_pii(F.col(text_col)).alias("clean_text"))


# ---------------------------------------------------------------------------
# deterministic sampling / mixing
# ---------------------------------------------------------------------------

_SAMPLE_MOD = 10_000  # rate resolution 0.01%


def _keep_hash(key: Column, salt: str) -> Column:
    """Uniform [0, _SAMPLE_MOD) draw as a pure function of (salt, key)."""
    return md5_hash60(F.concat(F.lit(salt), key.cast("string"))) % _SAMPLE_MOD


def _keep_hash_sql(key_expr: str, salt: str) -> str:
    h = md5_hash60_sql(f"concat('{salt}', CAST({key_expr} AS VARCHAR))")
    return f"({h}) % {_SAMPLE_MOD}"


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep each row of stratum s with probability rates[s], decided by
    a salted hash of the key — deterministic, engine-independent, and
    stable under re-runs/repartitioning (unlike ``df.sampleBy``). Strata
    without a configured rate are dropped (rate 0)."""
    rate_expr = F.lit(-1)
    for stratum, rate in rates.items():
        rate_expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * _SAMPLE_MOD))
        ).otherwise(rate_expr)
    return df.filter(_keep_hash(F.col(key_col), salt) < rate_expr)


def stratified_sample_sql(
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "sample",
    table: str = "documents",
) -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {int(r * _SAMPLE_MOD)}" for s, r in rates.items()
    )
    return (
        f"SELECT * FROM {table} "
        f"WHERE {_keep_hash_sql(key_col, salt)} < (CASE {strata_col} {whens} ELSE -1 END)"
    )


def per_source_cap(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Cap documents per source/domain: keep at most ``cap`` docs from
    each source — the C4/RefinedWeb-style guard against one domain
    dominating a pretraining mix. Selection is by salted keep-hash
    order (ties broken by key), so the survivor set is deterministic,
    uniformly random per source, and stable under re-runs and
    repartitioning — re-capping a grown corpus keeps prior survivors
    until the source actually exceeds the cap window.

    Scale shape: sources at or under the cap bypass the window
    entirely (a broadcast semi-join on the aggregated over-cap source
    list — aggregation is partial/map-side combined, and the list is
    tiny: #sources >> cap violators). Only over-cap sources pay the
    per-source sort, which bounds the skew exposure to the heavy
    domains themselves; for a single pathological domain the
    keep-hash is uniform, so a pre-filter on an approximate hash
    threshold (cap/count quantile) can shrink its sort input ~to cap —
    noted, not needed at tested scales (plan: one agg + one window over
    the minority)."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    over = counts.filter(F.col("_n") > cap).select(source_col)
    under = df.join(F.broadcast(over), source_col, "left_anti")
    w = W.partitionBy(source_col).orderBy(
        _keep_hash(F.col(key_col), salt), F.col(key_col)
    )
    capped = (
        df.join(F.broadcast(over), source_col, "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return under.unionByName(capped.select(*under.columns))


def per_source_cap_sql(
    cap: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "cap",
    table: str = "documents",
) -> str:
    """DuckDB mirror: identical keep-hash order + tie-break."""
    return f"""
    WITH ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY {source_col}
        ORDER BY {_keep_hash_sql(key_col, salt)}, {key_col}) AS _rn
      FROM {table}
    )
    SELECT * EXCLUDE (_rn) FROM ranked WHERE _rn <= {cap}
    """


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Corpus mixing with real-valued weights: weight 2.5 repeats a row
    2 times plus once more for a deterministic 50% of keys; weight 0.25
    keeps a 25% slice. Output adds ``copy`` (1..n) so downstream
    shuffling/packing can tell repeats apart. The decision is again a
    pure hash of the key — the mix is reproducible row-for-row."""
    whole = F.lit(-1)
    frac = F.lit(0)
    for source, w in weights.items():
        is_src = F.col(source_col) == source
        whole = F.when(is_src, F.lit(int(w))).otherwise(whole)
        frac = F.when(is_src, F.lit(int(round((w - int(w)) * _SAMPLE_MOD)))).otherwise(frac)
    n_copies = whole + (_keep_hash(F.col(key_col), salt) < frac).cast("int")
    return (
        df.withColumn("n_copies_", n_copies)
        .filter(F.col("n_copies_") >= 1)
        .withColumn(
            "copy",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies_").cast("long"))),
        )
        .drop("n_copies_")
    )


def weighted_mix_sql(
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    table: str = "documents",
    cols: str = "doc_id, text, lang, source, n_chars",
) -> str:
    whole = " ".join(f"WHEN '{s}' THEN {int(w)}" for s, w in weights.items())
    frac = " ".join(
        f"WHEN '{s}' THEN {int(round((w - int(w)) * _SAMPLE_MOD))}" for s, w in weights.items()
    )
    n = (
        f"(CASE {source_col} {whole} ELSE -1 END) + "
        f"(CASE WHEN {_keep_hash_sql(key_col, salt)} < (CASE {source_col} {frac} ELSE 0 END) "
        "THEN 1 ELSE 0 END)"
    )
    return (
        f"SELECT {cols}, u.copy FROM (SELECT *, {n} AS n_copies_ FROM {table}) t "
        "CROSS JOIN unnest(generate_series(1, t.n_copies_)) AS u(copy) "
        "WHERE t.n_copies_ >= 1"
    )


# ---------------------------------------------------------------------------
# repetition features (Gopher-style quality signals)
# ---------------------------------------------------------------------------


def repetition_features(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Per-document n-gram repetition counters: total n-grams, distinct
    n-grams, and the top n-gram's frequency. Downstream filters derive
    the Gopher fractions (dup fraction = 1 - distinct/total; top-gram
    fraction = top/total) — integer outputs keep the compare exact.
    Documents shorter than n tokens report (0, 0, 0)."""
    toks = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # spread the single-file scan before the ~len(text) x n explode
    exploded = _parallelized(df).select("doc_id", F.explode_outer(grams).alias("g"))
    per_gram = exploded.groupBy("doc_id", "g").agg(F.count("g").alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.sum(F.when(F.col("g").isNotNull(), 1).otherwise(0)).alias("n_distinct"),
        F.max(F.coalesce(F.col("c"), F.lit(0))).alias("top_count"),
    )


def repetition_features_sql(n: int = 2, table: str = "documents") -> str:
    toks = "string_split(text, ' ')"
    grams = (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) "
        "ELSE [] END"
    )
    return f"""
    WITH exploded AS (
      SELECT doc_id, unnest(list_concat({grams}, [NULL])) AS g FROM {table}
    ),
    -- the NULL sentinel keeps empty documents present (explode_outer)
    per_gram AS (
      SELECT doc_id, g, count(g) AS c FROM exploded GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct,
           CAST(max(coalesce(c, 0)) AS BIGINT) AS top_count
    FROM per_gram GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# connected-components duplicate clustering
# ---------------------------------------------------------------------------


def dup_clusters(
    pairs: DataFrame, max_iter: int = 25, on_unconverged: str = "contract"
) -> DataFrame:
    """Near-dup pairs -> (doc_id, cluster_id = min doc_id in component).

    Iterative min-label propagation with POINTER JUMPING: each round,
    every node adopts the minimum label among itself and its neighbors,
    then (from round 1 on) replaces its label with its label's label —
    labels are node ids, so the indirection is one self-join. The jump
    doubles the distance already covered, so the distance-to-minimum
    reached after round k grows ~2^k and a diameter-d component
    converges in O(log d) rounds instead of O(d) (r9; the 4096-node
    chain probe needed >4000 plain rounds — past any sane max_iter —
    and now closes in ~12). Round 0 skips the jump: shallow near-dup
    stars (the overwhelmingly common shape) converge in 1-2 rounds and
    shouldn't pay the extra node-count join. Correctness: labels start
    at ≤ node and both steps take minima of in-component node ids, so
    labels decrease monotonically within the component; a round with
    zero changes is therefore a neighbor-min fixpoint, which forces the
    label constant across every edge, and the constant is the component
    minimum (the min node's label can only be itself). Each round is a
    shuffle-on-node join (+ the jump self-join); ``localCheckpoint``
    cuts the lineage so plan size stays constant across rounds.

    A component whose min-node DISTANCE-to-everything exceeds ~2^max_iter
    (unreachable for real graphs with the default; still reachable for
    callers that bound max_iter low, as the fallback bench probe does)
    falls back per ``on_unconverged``:

    - ``"contract"`` (default): alternating large-star/small-star
      contraction (`_star_contraction_labels`) — O(log^2 n) rounds
      worst-case regardless of diameter, same output contract.
    - ``"raise"``: the pre-r7 fail-stop, for callers that want a
      shallow-graph invariant enforced rather than silently paying the
      contraction rounds."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    # Seed each node with min(self, direct neighbors) — the same
    # aggregation a distinct-nodes init would cost, but it performs
    # round 1 for free (halves rounds on chain-shaped components, and
    # star-shaped near-dup clusters often converge immediately).
    labels = (
        edges.groupBy(F.col("dst").alias("node"))
        .agg(F.min("src").alias("nbr_min"))
        .select("node", F.least(F.col("node"), F.col("nbr_min")).alias("label"))
        .localCheckpoint(eager=True)
    )
    changed = None  # max_iter <= 0 must hit the unconverged raise, not NameError
    for round_i in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the round-entry label through as `prev` so the changed
        # count below is a filter on THIS frame, not a join back against
        # the old labels — one fewer node-frame shuffle join per round
        # (r9; the loop is round-latency-bound, so per-round stage count
        # IS its cost)
        new_labels = labels.join(nbr_min, labels.node == nbr_min.dst, "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            F.col("label").alias("prev"),
        )
        if round_i >= 1:
            # pointer jump, TWICE: label <- label(label) applied twice
            # quadruples the distance already covered per round (chain
            # coverage grows ~4^k; the 4096-node chain probe closes in
            # ~6 rounds instead of ~12 single-jump / >4000 no-jump
            # rounds). Every label value IS a node id present in
            # `labels` (init = least(node, nbr)); the left join +
            # coalesce is belt-and-braces for callers feeding
            # pre-labeled frames.
            for _ in range(2):
                ptr = new_labels.select(
                    F.col("node").alias("p_node"), F.col("label").alias("p_label")
                )
                new_labels = new_labels.join(
                    ptr, new_labels.label == ptr.p_node, "left"
                ).select(
                    "node",
                    F.coalesce("p_label", "label").alias("label"),
                    "prev",
                )
        # Lineage discipline: materialize every round (the changed-count
        # and the next round both consume new_labels), but pay the
        # lineage CUT (localCheckpoint) only every other round — odd
        # rounds cache over a <=1-round-deep plan, keeping plan depth
        # bounded. Both are LAZY (r9): localCheckpoint persists through
        # the caching subsystem during the first action, so the changed
        # count below materializes AND measures in ONE job instead of
        # an eager-checkpoint job followed by a count job per round.
        if round_i % 2 == 1:
            new_labels = new_labels.localCheckpoint(eager=False)
        else:
            new_labels = new_labels.cache()
        changed = new_labels.filter(F.col("label") != F.col("prev")).count()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        # Conservative: labels that changed on the FINAL round may in
        # fact have reached the fixpoint, but certifying that costs the
        # same join as another round — so treat it as unconverged.
        if on_unconverged == "contract":
            # SEEDED contraction (r8): don't discard the propagation
            # rounds already paid — contract the LABEL QUOTIENT graph
            # (one supernode per current label, edges between distinct
            # labels) and map members back through their label. At
            # scale this is the difference between the first — and
            # most expensive — contraction rounds running on the full
            # edge set vs the already-shrunk quotient (each
            # propagation round at least halves chain components'
            # supernode count; duplicate quotient edges collapse in
            # the distinct). Equivalence with raw-edge contraction is
            # random-graph-tested against union-find.
            lab = labels.select("node", "label")
            quotient = (
                edges.join(
                    lab.withColumnRenamed("node", "src").withColumnRenamed("label", "ls"),
                    "src",
                )
                .join(
                    lab.withColumnRenamed("node", "dst").withColumnRenamed("label", "ld"),
                    "dst",
                )
                .filter(F.col("ls") != F.col("ld"))
                .select(
                    F.least("ls", "ld").alias("src"),
                    F.greatest("ls", "ld").alias("dst"),
                )
            )
            roots = _star_contraction_labels(quotient)
            # labels whose group has no out-edge are their own root;
            # eager checkpoint so `labels` can be unpersisted safely
            out = (
                lab.join(roots.withColumnRenamed("doc_id", "label"), "label", "left")
                .select(
                    F.col("node").alias("doc_id"),
                    F.coalesce("cluster_id", "label").alias("cluster_id"),
                )
                .localCheckpoint(eager=True)
            )
            labels.unpersist()
            return out
        raise RuntimeError(
            f"dup_clusters: min-label propagation not certified converged in "
            f"{max_iter} rounds ({changed} labels changed on the last round); "
            f"raise max_iter or use on_unconverged='contract'"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def _star_contraction_labels(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond"): per round every node hooks its larger neighbors
    (large-star), then its smaller neighbors (small-star), onto the
    minimum of its neighborhood. Converges to a disjoint union of flat
    stars centered at each component's minimum id in O(log^2 n) rounds
    REGARDLESS of diameter — the deep-graph fallback behind
    dup_clusters' shallow-graph propagation fast path.

    ``edges`` is the both-direction (src, dst) frame; output matches
    dup_clusters' contract: (doc_id, cluster_id = component min) for
    every node with at least one pair. ``max_rounds`` is a safety net
    far above the mathematical bound (2^64-node graphs), not a tunable."""
    # A node whose ONLY pair is a self-pair (src == dst) has no edge in
    # the canonical set below but still owns a singleton cluster — the
    # propagation path and the recursive-CTE oracle both label it, so
    # the fallback must too. This repo's pair generators enforce
    # doc_a < doc_b (never emitting self-pairs), so the branch is for
    # external callers; the anti-join below runs over an empty frame
    # then.
    self_only = edges.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("doc_id")
    )
    # canonical undirected edge set, one row per {a < b}
    cur = (
        edges.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # (Shrinking spark.sql.shuffle.partitions for the loop was tried
    # and measured NEUTRAL at toy scale — 9.15s sized vs 8.54s at the
    # session's 32 on a 4k chain, within host noise; AQE already
    # coalesces the tiny shuffles, and at real scale the session
    # default is the right size anyway. Not worth the conf juggling.)
    return _star_contraction_loop(cur, cur.count(), self_only, max_rounds)


def _star_contraction_loop(
    cur: DataFrame, cur_count: int, self_only: DataFrame, max_rounds: int
) -> DataFrame:
    for _ in range(max_rounds):
        # large-star: for each node u, every LARGER neighbor v hooks to
        # m = min(N(u) + {u}); m <= u < v keeps pairs canonical
        both = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = both.groupBy("u").agg(F.min("v").alias("mn"))
        large = (
            both.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.least(F.col("u"), F.col("mn")).alias("a"), F.col("v").alias("b")
            )
            .distinct()
        )
        # small-star: orient edges larger -> smaller; every smaller
        # neighbor v of u (and u itself) hooks to m = min(N_smaller(u))
        oriented = large.select(F.col("b").alias("u"), F.col("a").alias("v"))
        smins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        hooked = oriented.join(smins, "u")
        nxt = (
            hooked.filter(F.col("v") != F.col("m"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .unionAll(hooked.select(F.col("m").alias("a"), F.col("u").alias("b")))
            .distinct()
            # LAZY checkpoint (r9): persists via the caching subsystem
            # during the count below — materialize + lineage-cut +
            # measure in ONE job per round instead of two (the loop is
            # round-latency-bound, so job count IS its cost).
            .localCheckpoint(eager=False)
        )
        # Count-gated convergence: both frames are DISTINCT sets, so
        # equality <=> same count AND nxt ⊆ cur. The exceptAll scan
        # runs only on count-equal rounds (usually just the final one),
        # replacing the every-round two-sided symmetric diff — neutral
        # at toy scale (round latency dominates) but at a billion-edge
        # frame it removes two full-edge-set shuffles from EVERY
        # non-final round.
        nxt_count = nxt.count()
        converged = nxt_count == cur_count and nxt.exceptAll(cur).isEmpty()
        cur.unpersist()
        cur, cur_count = nxt, nxt_count
        if converged:
            # fixpoint = flat stars: every edge is (component_min, node)
            labeled = (
                cur.select(F.col("b").alias("doc_id"), F.col("a").alias("cluster_id"))
                .unionAll(
                    cur.select(F.col("a").alias("doc_id"), F.col("a").alias("cluster_id"))
                )
                .distinct()
            )
            # singleton components seen only as self-pairs: label as
            # their own cluster unless a real edge already labeled them
            return labeled.unionByName(
                self_only.distinct()
                .join(labeled, "doc_id", "left_anti")
                .select("doc_id", F.col("doc_id").alias("cluster_id"))
            )
    raise RuntimeError(
        f"star contraction not converged in {max_rounds} rounds — "
        "impossible for any graph with < 2^64 nodes; corrupted edge input?"
    )


def dup_clusters_sql(pairs_sql: str) -> str:
    """DuckDB mirror: transitive closure by recursive CTE, then min
    reachable id per node."""
    return f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, rid) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.rid FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, min(rid) AS cluster_id FROM reach GROUP BY node
    """


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def contamination(
    df: DataFrame,
    eval_max_id: int = 20,
    k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Train/eval overlap detection (benchmark decontamination): flag
    training documents sharing any k-word shingle with the eval set.
    Here the eval set is the documents with ``doc_id < eval_max_id``;
    in production it is the benchmark suite loaded as its own table —
    the plan is identical.

    Scale shape: the eval side's distinct shingle set is tiny relative
    to the corpus (benchmarks are ~10^5 documents, corpora ~10^10), so
    it BROADCASTS and the corpus-side explode never shuffles — one
    narrow pass over the training set, count per doc map-side
    combinable. Output: contaminated docs only, with the evidence count
    (number of distinct overlapping shingles).
    """
    from outboxx_spark.dataops.text import shingles
    from outboxx_spark.dataops.util import parallelized as _parallelized

    ev = (
        df.filter(F.col("doc_id") < eval_max_id)
        .select(F.explode(shingles(F.col(text_col), k)).alias("s"))
        .distinct()
    )
    corpus = _parallelized(df.filter(F.col("doc_id") >= eval_max_id)).select(
        "doc_id", F.explode(shingles(F.col(text_col), k)).alias("s")
    )
    return (
        corpus.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap_shingles"))
    )


def contamination_sql(eval_max_id: int = 20, k: int = 5) -> str:
    from outboxx_spark.dataops.text import shingles_sql

    sh = shingles_sql("text", k)
    return f"""
    WITH ev AS (
      SELECT DISTINCT unnest({sh}) AS s FROM documents WHERE doc_id < {eval_max_id}),
    corpus AS (
      SELECT doc_id, unnest({sh}) AS s FROM documents WHERE doc_id >= {eval_max_id})
    SELECT c.doc_id, count(*) AS n_overlap_shingles
    FROM corpus c JOIN ev ON c.s = ev.s
    GROUP BY c.doc_id
    """
