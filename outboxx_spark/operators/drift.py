"""Schema-drift audit over a JSON-carrying change feed.

A long-lived CDC pipeline sees upstream DDL as *payload drift*: a new
column starts appearing in row images, an old one stops. The reference
handles the transport half of this through relation-message versioning
(`src/source/postgres/pg_output_decoder.zig` re-registers a relation on
every Relation message); what it does NOT give operators is a corpus
-level answer to "which fields exist in this resource's payloads, and
over which LSN range?" — the question you ask before evolving a sink
schema or backfilling a column. This operator answers it with one scan:

- explode the top-level JSON key set of each payload
  (``json_object_keys`` — JVM-side, no Python in the plan),
- per (resource, key): row count + [first_lsn, last_lsn],
- flag ``added`` (key first seen after the resource's stream began) and
  ``dropped`` (key last seen before the resource's stream ended).

Scale notes (100 TB): one wide scan -> explode (keys per row is tiny,
so the fan-out is ~x|keys|) -> two aggregations sharing the resource
key; the per-resource bounds frame is |resources| rows and is
broadcast into the final join. Malformed payloads yield NULL from
``json_object_keys`` and drop out of the explode — the audit reports
what parseable payloads carry (the envelope's fail-stop owns rejecting
malformed input; see functions/envelope.py).

The synthetic feed's ``props`` column carries a single stable key, so
the driver query PLANTS drift first (the emb_near_dup_lsh precedent:
deterministic plant, detect, oracle replicates the plant): a
``legacy`` key in the oldest LSN quartile and a ``v2`` key in the
newest, spliced into the JSON text. Exact integer era arithmetic
(lsn*4 vs max_lsn) keeps both engines' plants identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def payload_key_stats(
    feed: DataFrame,
    resource_col: str = "resource",
    lsn_col: str = "lsn",
    props_col: str = "props",
) -> DataFrame:
    """Per (resource, top-level JSON key): presence count + LSN range.
    MERGEABLE: stats of a union == re-aggregate (sum/min/max) of the
    parts' stats — the property the streaming monitor builds on."""
    keyed = feed.select(
        resource_col,
        lsn_col,
        F.explode(F.json_object_keys(F.col(props_col))).alias("key"),
    )
    return keyed.groupBy(resource_col, "key").agg(
        F.count("*").alias("n_events"),
        F.min(lsn_col).alias("first_lsn"),
        F.max(lsn_col).alias("last_lsn"),
    )


def resource_bounds(
    feed: DataFrame, resource_col: str = "resource", lsn_col: str = "lsn"
) -> DataFrame:
    """Per resource: the LSN span of the WHOLE stream (every row, also
    those whose payload is malformed — the span is transport-level).
    Mergeable like payload_key_stats."""
    return feed.groupBy(resource_col).agg(
        F.min(lsn_col).alias("rmin"), F.max(lsn_col).alias("rmax")
    )


def drift_flags(
    per_key: DataFrame, bounds: DataFrame, resource_col: str = "resource"
) -> DataFrame:
    """Join key stats with the resource spans and derive the flags.
    ``bounds`` is |resources| rows — always broadcast."""
    return per_key.join(F.broadcast(bounds), resource_col).select(
        resource_col,
        "key",
        "n_events",
        "first_lsn",
        "last_lsn",
        (F.col("first_lsn") > F.col("rmin")).alias("added"),
        (F.col("last_lsn") < F.col("rmax")).alias("dropped"),
    )


def schema_drift_report(
    feed: DataFrame,
    resource_col: str = "resource",
    lsn_col: str = "lsn",
    props_col: str = "props",
) -> DataFrame:
    """Per (resource, top-level JSON key): presence count, LSN range,
    and added/dropped flags relative to the resource's own LSN span."""
    per_key = payload_key_stats(feed, resource_col, lsn_col, props_col)
    bounds = resource_bounds(feed, resource_col, lsn_col)
    return drift_flags(per_key, bounds, resource_col)


def plant_drift(feed: DataFrame, lsn_col: str = "lsn", props_col: str = "props") -> DataFrame:
    """Deterministically splice era-gated keys into the JSON payloads:
    ``legacy`` where lsn*4 <= max_lsn (oldest quartile), ``v2`` where
    lsn*4 >= 3*max_lsn (newest). String splice keeps the original keys
    byte-identical; the scalar max broadcasts (1-row frame)."""
    mx = feed.agg(F.max(lsn_col).alias("_mx"))
    lsn4 = F.col(lsn_col) * 4
    extra = F.concat(
        F.when(lsn4 <= F.col("_mx"), F.lit(', "legacy": 1')).otherwise(F.lit("")),
        F.when(lsn4 >= 3 * F.col("_mx"), F.lit(', "v2": 1')).otherwise(F.lit("")),
    )
    planted = F.concat(
        F.regexp_replace(F.col(props_col), r"\}\s*$", ""), extra, F.lit("}")
    )
    return feed.crossJoin(F.broadcast(mx)).withColumn(props_col, planted).drop("_mx")


# Oracle: the detector's output computed directly from the plant
# definition (the oracle checks WHAT the detector must report, not the
# JSON machinery used to report it — key sets via UNION ALL instead of
# json_keys/unnest so the SQL stays ANSI-portable). Prepend the feed CTE.
SCHEMA_DRIFT_SQL = """
, m AS (SELECT max(lsn) AS mx FROM feed),
keyed AS (
  SELECT resource, lsn, 'k' AS key FROM feed
  UNION ALL SELECT resource, lsn, 'legacy' FROM feed, m WHERE lsn * 4 <= mx
  UNION ALL SELECT resource, lsn, 'v2' FROM feed, m WHERE lsn * 4 >= 3 * mx
),
bounds AS (SELECT resource, min(lsn) AS rmin, max(lsn) AS rmax FROM feed GROUP BY resource)
SELECT k.resource, key,
       CAST(count(*) AS BIGINT) AS n_events,
       min(k.lsn) AS first_lsn,
       max(k.lsn) AS last_lsn,
       min(k.lsn) > any_value(b.rmin) AS added,
       max(k.lsn) < any_value(b.rmax) AS dropped
FROM keyed k JOIN bounds b ON k.resource = b.resource
GROUP BY k.resource, key
"""
