"""Physical-plan regression guards: the scale properties SCALING.md
claims must stay true as code evolves — routing stays a broadcast join,
scans stay pruned, the CDC hot path stays Python-free."""

from __future__ import annotations

import contextlib
import io

import pytest

from outboxx_spark.pipeline import routed_envelopes
from outboxx_spark.sources.feed import read_feed
from outboxx_spark.testbed import default_config


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_routing_is_broadcast_join_no_shuffle_of_events(spark, sf_dir):
    plan = _plan(routed_envelopes(spark, sf_dir, default_config()))
    assert "BroadcastHashJoin" in plan
    # the event side must not hash-exchange for the routing join
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_cdc_hot_path_has_no_python(spark, sf_dir):
    plan = _plan(routed_envelopes(spark, sf_dir, default_config()))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan


def test_projection_prunes_scan(spark, sf_dir):
    df = read_feed(spark, sf_dir).select("lsn", "resource")
    plan = _plan(df)
    # only the columns the projection needs reach the parquet scan
    assert "event_id" in plan  # lsn <- event_id
    assert "props" not in plan
    assert "value:" not in plan


def test_snapshot_filter_pushdown(spark, sf_dir):
    from outboxx_spark.sources.tables import read_table
    from pyspark.sql import functions as F

    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") == 7).select("l_orderkey")
    plan = _plan(li)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,7)]" in plan


def test_olap_dims_broadcast(spark, sf_dir):
    from outboxx_spark.olap import nation_order_volume

    plan = _plan(nation_order_volume(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at least


def test_embedding_near_dup_lsh_never_cross_joins(spark, sf_dir):
    from outboxx_spark.dataops.similarity import embedding_near_dup_pairs_lsh
    from outboxx_spark.sources.tables import read_table

    plan = _plan(embedding_near_dup_pairs_lsh(read_table(spark, sf_dir, "embeddings")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_broadcasts_eval_side(spark, sf_dir):
    """The eval shingle set must broadcast; the corpus explode must not
    hash-exchange for the contamination join."""
    from outboxx_spark.dataops.curation import contamination
    from outboxx_spark.sources.tables import read_table

    plan = _plan(contamination(read_table(spark, sf_dir, "documents")))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rollup_is_single_aggregate_pass(spark, sf_dir):
    """ROLLUP must lower to Expand + one hash-aggregate chain, not a
    union of three scans."""
    from outboxx_spark.olap import nation_revenue_rollup

    plan = _plan(nation_revenue_rollup(spark, sf_dir))
    assert "Expand" in plan
    assert "Union" not in plan  # one Expand pass, not 3 unioned aggs
