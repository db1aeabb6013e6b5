"""CDC materialization: apply a change stream to produce current table
state (the consumer-side view the reference's envelope contract is
designed for, `docs/design/STREAMING_REPLICATION_DESIGN.md` dedup
guidance + O4).

Semantics: per (resource, key), the event with the highest LSN wins
(ties broken deterministically by op precedence); a winning DELETE
removes the row; READ acts as upsert (snapshot bootstrap). This is the
MERGE INTO / SCD1 emulation for engines without Delta: one window over
the key — a single shuffle on (resource, key), partition-parallel,
arbitrary table count in one pass.

At 100 TB: this is the standard "compact the changelog" job — shuffle
is bounded by live keys, and with the feed bucketed by key the shuffle
disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# Tie-break when two events share (resource, key, lsn) — shouldn't
# happen (LSNs are unique per event) but row_number() over a
# non-deterministic order could silently diverge between Spark and the
# oracle if it ever did. Precedence: the destructive op wins, READ
# (snapshot refresh) always loses to a real change.
_OP_PRECEDENCE = {"DELETE": 3, "UPDATE": 2, "INSERT": 1, "READ": 0}


def _op_rank(op: Column) -> Column:
    expr = F.lit(0)
    for name, rank in _OP_PRECEDENCE.items():
        expr = F.when(op == name, F.lit(rank)).otherwise(expr)
    return expr


def _op_rank_sql(col: str = "op") -> str:
    whens = " ".join(f"WHEN '{n}' THEN {r}" for n, r in _OP_PRECEDENCE.items())
    return f"CASE {col} {whens} ELSE 0 END"


def materialize(feed: DataFrame, key: str = "user_id", drop_deleted: bool = True) -> DataFrame:
    """Latest state per (resource, key): last writer by LSN wins,
    DELETE drops the row. Deterministic even under (lsn) ties: the
    window also orders by op precedence, then commit_ts.

    ``drop_deleted=False`` keeps winning DELETE rows as tombstones —
    the form stateful streaming materializers (which emit tombstone
    winners) are compared against."""
    w = W.partitionBy("resource", key).orderBy(
        F.col("lsn").desc(),
        _op_rank(F.col("op")).desc(),
        F.col("commit_ts").desc(),
    )
    latest = (
        feed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return latest.filter(F.col("op") != "DELETE") if drop_deleted else latest


def materialize_sql(key: str = "user_id") -> str:
    """DuckDB mirror (identical tie-break chain)."""
    return f"""
    , latest AS (
      SELECT *, row_number() OVER (
        PARTITION BY resource, {key}
        ORDER BY lsn DESC, {_op_rank_sql("op")} DESC, commit_ts DESC) AS rn
      FROM feed
    )
    SELECT op, resource, lsn, commit_ts, user_id, event_type, value, props
    FROM latest WHERE rn = 1 AND op != 'DELETE'
    """


def scd2_intervals(feed: DataFrame) -> DataFrame:
    """SCD Type-2 materialization of the change stream: every change
    event becomes a validity interval per (resource, user_id) —
    ``valid_from`` = its commit time, ``valid_to`` = the next change's
    commit time (null while current). The standard shape for an
    analytics consumer that needs "state as of T" instead of
    latest-wins (:func:`materialize`).

    One window over the entity key ordered by LSN — a single shuffle on
    (resource, user_id), identical cost profile to materialize(); at
    100 TB the lead() is computed inside each key partition with no
    extra pass. READ (snapshot) rows open the first interval; DELETE
    closes one without opening (emitted with is_deleted so downstream
    can drop it from as-of joins).
    """
    w = W.partitionBy("resource", "user_id").orderBy("lsn")
    return feed.select(
        "resource",
        "user_id",
        "lsn",
        "op",
        F.col("commit_ts").alias("valid_from"),
        F.lead("commit_ts").over(w).alias("valid_to"),
        (F.lead("commit_ts").over(w).isNull()).alias("is_current"),
        (F.col("op") == "DELETE").alias("is_deleted"),
    )


SCD2_INTERVALS_SQL_BODY = """
SELECT resource, user_id, lsn, op,
       commit_ts AS valid_from,
       lead(commit_ts) OVER w AS valid_to,
       lead(commit_ts) OVER w IS NULL AS is_current,
       op = 'DELETE' AS is_deleted
FROM feed
WINDOW w AS (PARTITION BY resource, user_id ORDER BY lsn)
"""


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...] = ("resource", "user_id"),
    compare_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Changelog from two table snapshots — the INVERSE of
    :func:`materialize`: given state-at-T1 and state-at-T2, emit the
    INSERT / UPDATE / DELETE set that transforms one into the other
    (snapshot-based CDC for sources with no WAL access, and the
    validation tool for any replication pipeline).

    One full outer join on the key — a single co-partitioned shuffle;
    with both snapshots bucketed on the key it runs shuffle-free.
    ``compare_cols`` limits change detection to named columns (default:
    every non-key column present in both sides); comparison is
    null-safe (``<=>``).
    """
    if compare_cols is None:
        compare_cols = tuple(
            c for c in old.columns if c in set(new.columns) and c not in key_cols
        )
    # Row presence is detected via a literal flag attached BEFORE the
    # join, not via key nullability: the join is null-safe (<=>), so a
    # row whose first key column is legitimately NULL would otherwise be
    # misclassified as INSERT even when present unchanged in both sides.
    o = (
        old.select(*key_cols, *compare_cols)
        .withColumn("_o_present", F.lit(True))
        .alias("o")
    )
    n = (
        new.select(*key_cols, *compare_cols)
        .withColumn("_n_present", F.lit(True))
        .alias("n")
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    old_exists = F.col("o._o_present").isNotNull()
    new_exists = F.col("n._n_present").isNotNull()
    changed = None
    for c in compare_cols:
        ne = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        changed = ne if changed is None else (changed | ne)
    change_op = (
        F.when(~old_exists, F.lit("INSERT"))
        .when(~new_exists, F.lit("DELETE"))
        .when(changed if changed is not None else F.lit(False), F.lit("UPDATE"))
    )
    keys_out = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols
    ]
    return (
        joined.withColumn("change_op", change_op)
        .filter(F.col("change_op").isNotNull())
        .select(*keys_out, "change_op")
    )


def snapshot_diff_sql(
    old_cte: str = "old_state",
    new_cte: str = "new_state",
    key_cols: tuple[str, ...] = ("resource", "user_id"),
    compare_cols: tuple[str, ...] = ("event_type", "value"),
) -> str:
    """DuckDB mirror: same full-outer-join + null-safe compare, with
    the same literal presence flags (not key nullability) so NULL-keyed
    rows classify identically."""
    on = " AND ".join(f"o.{k} IS NOT DISTINCT FROM n.{k}" for k in key_cols)
    changed = " OR ".join(
        f"o.{c} IS DISTINCT FROM n.{c}" for c in compare_cols
    )
    keys_out = ", ".join(f"COALESCE(n.{k}, o.{k}) AS {k}" for k in key_cols)
    return f"""
    SELECT {keys_out},
           CASE WHEN o._p IS NULL THEN 'INSERT'
                WHEN n._p IS NULL THEN 'DELETE'
                WHEN {changed} THEN 'UPDATE' END AS change_op
    FROM (SELECT *, TRUE AS _p FROM {old_cte}) o
    FULL OUTER JOIN (SELECT *, TRUE AS _p FROM {new_cte}) n ON {on}
    WHERE CASE WHEN o._p IS NULL THEN 'INSERT'
               WHEN n._p IS NULL THEN 'DELETE'
               WHEN {changed} THEN 'UPDATE' END IS NOT NULL
    """
