"""Rollup, window-frame, decontamination, and ANN-recall operators —
internal-consistency tests (the cross-engine exactness is the driver
oracle's job; these pin the semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_rollup_grand_total_consistent(spark, sf_dir):
    from outboxx_spark.olap import nation_revenue_rollup

    rows = nation_revenue_rollup(spark, sf_dir).collect()
    grand = [r for r in rows if r.nation == "ALL" and r.yr == "ALL"]
    nations = [r for r in rows if r.nation != "ALL" and r.yr == "ALL"]
    leaves = [r for r in rows if r.nation != "ALL" and r.yr != "ALL"]
    assert len(grand) == 1
    # subtotal algebra: nation subtotals and leaves both sum to the grand total
    assert sum(r.revenue_cents for r in nations) == grand[0].revenue_cents
    assert sum(r.revenue_cents for r in leaves) == grand[0].revenue_cents
    assert sum(r.n_orders for r in leaves) == grand[0].n_orders


def test_trailing_spend_frame_semantics(spark, sf_dir):
    from outboxx_spark.olap import customer_trailing_spend

    df = customer_trailing_spend(spark, sf_dir)
    assert df.filter((F.col("n_in_frame") < 1) | (F.col("n_in_frame") > 3)).count() == 0
    # each customer's first order (by date, key) has a single-row frame
    first = df.withColumn(
        "rn",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                "o_custkey"
            ).orderBy("o_orderkey")
        ),
    )
    # frame of the earliest order contains only itself
    one_row_frames = df.groupBy("o_custkey").agg(F.min("n_in_frame").alias("mn"))
    assert one_row_frames.filter(F.col("mn") != 1).count() == 0


def test_contamination_flags_shared_shingles(spark):
    from outboxx_spark.dataops.curation import contamination

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),  # eval
            (100, "the quick brown fox jumps over the lazy dog tonight ok"),  # contaminated
            (101, "completely different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_overlap_shingles for r in contamination(docs, eval_max_id=20, k=5).collect()}
    assert 100 in got and got[100] >= 5
    assert 101 not in got


def test_ann_recall_bounds_and_quality(spark, sf_dir):
    from outboxx_spark.dataops.similarity import ann_recall

    from outboxx_spark.sources.tables import read_table

    rows = ann_recall(read_table(spark, sf_dir, "embeddings"), n_queries=10, k=10).collect()
    assert len(rows) == 10
    assert all(0 <= r.hits_at_k <= 10 for r in rows)
    # the LSH index is tuned for ~12% corpus scan, so recall tracks
    # candidate coverage (measured 0.32 here) — assert it stays an order
    # of magnitude above random chance (10-of-500 overlap ~ 0.02)
    assert sum(r.hits_at_k for r in rows) / 100 >= 0.2


def test_scd2_intervals_chain(spark, sf_dir):
    from outboxx_spark.operators.materialize import scd2_intervals
    from outboxx_spark.sources.feed import read_feed

    rows = scd2_intervals(read_feed(spark, sf_dir)).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r.resource, r.user_id), []).append(r)
    assert rows
    for history in by_key.values():
        history.sort(key=lambda r: r.lsn)
        # intervals chain: each valid_to equals the next valid_from
        for a, b in zip(history, history[1:]):
            assert a.valid_to == b.valid_from
        # exactly the last interval is current/open
        assert [r.is_current for r in history] == [False] * (len(history) - 1) + [True]


def test_op_pivot_matches_tally(spark, sf_dir):
    from outboxx_spark.operators.tally import op_pivot
    from outboxx_spark.sources.feed import read_feed

    feed = read_feed(spark, sf_dir)
    piv = {r.resource: r for r in op_pivot(feed).collect()}
    totals = {
        (r.resource, r.op): r.n
        for r in feed.groupBy("resource", "op").agg(F.count("*").alias("n")).collect()
    }
    assert piv
    for resource, r in piv.items():
        for op in ("INSERT", "UPDATE", "DELETE", "READ"):
            assert getattr(r, f"n_{op.lower()}") == totals.get((resource, op), 0)


def test_value_quantiles_ordered(spark, sf_dir):
    from outboxx_spark.olap import event_value_quantiles

    rows = event_value_quantiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50_cents <= r.p95_cents <= r.p99_cents


def test_approx_quantiles_within_tolerance_of_exact(spark, sf_dir):
    """VERDICT r2 #4: the production approx_percentile variant must sit
    within the sketch's rank-error bound of the exact-rank oracle form.
    At accuracy=10000 the bound is n/10000 ranks per group; translate it
    to values by comparing against the exact values at rank +- bound."""
    from outboxx_spark.olap import event_value_quantiles, event_value_quantiles_approx

    exact = {r["event_type"]: r for r in event_value_quantiles(spark, sf_dir).collect()}
    approx = {r["event_type"]: r for r in event_value_quantiles_approx(spark, sf_dir).collect()}
    assert set(exact) == set(approx)

    # value-domain tolerance: cents quantiles of this corpus move ~1 cent
    # per rank in the tails; allow a generous slack of 0.5% of the exact
    # value plus 2 cents absolute.
    for et, ex in exact.items():
        ap = approx[et]
        for col in ("p50_cents", "p95_cents", "p99_cents"):
            tol = abs(ex[col]) * 0.005 + 2
            assert abs(ap[col] - ex[col]) <= tol, (et, col, ex[col], ap[col])


def test_approx_cardinality_within_hll_tolerance(spark, sf_dir):
    """HyperLogLog++ production variant vs the exact distinct count:
    relative error must stay within ~5x the configured rsd (generous
    slack over the 1.04/sqrt(m) standard error)."""
    from outboxx_spark.olap import event_type_cardinality, event_type_cardinality_approx

    exact = {r["event_type"]: r["n_users"] for r in event_type_cardinality(spark, sf_dir).collect()}
    approx = {
        r["event_type"]: r["n_users"]
        for r in event_type_cardinality_approx(spark, sf_dir, rsd=0.01).collect()
    }
    assert set(exact) == set(approx)
    for et, ex in exact.items():
        assert abs(approx[et] - ex) <= max(5, ex * 0.05), (et, ex, approx[et])


def test_fixed_point_money_conversion_cross_engine_exact(spark):
    """Per-row double -> fixed-point BIGINT conversion must agree
    between Spark and DuckDB on adversarial inputs — this is the
    primitive every olap_* money aggregate now rests on (r6: DECIMAL
    outputs are banned from checked schemas; integer units are the
    representation-stable exact form). Spark's decimal->long cast
    truncates while DuckDB's decimal->BIGINT cast rounds, so the
    conversion is only engine-identical because the scaled decimal is
    exactly integral for every 2-decimal money double; exercise
    rounding boundaries, big magnitudes, and a dense random sweep."""
    import random

    import duckdb

    def spark_u(values):
        sdf = spark.createDataFrame([(v,) for v in values], "v double")
        return [
            r["u"]
            for r in sdf.select(
                (F.col("v").cast("decimal(20,4)") * 100).cast("long").alias("u")
            ).collect()
        ]

    def duck_u(values):
        return [
            r[0]
            for r in duckdb.sql(
                "SELECT CAST(CAST(unnest($v::DOUBLE[]) AS DECIMAL(20,4)) * 100 AS BIGINT)",
                params={"v": values},
            ).fetchall()
        ]

    # 2-decimal money: boundaries, big magnitudes, dense random sweep
    vals = [0.01, 0.05, 0.10, 0.29, 1e10 + 0.01, 99999999999.99]
    rng = random.Random(42)
    vals += [round(rng.randrange(10**13) / 100, 2) for _ in range(5000)]
    assert spark_u(vals) == duck_u(vals)
    # Domain boundary, pinned as a NEGATIVE example: a 3-decimal input
    # (2.675) breaks the integrality precondition — the scaled decimal
    # is 267.5, Spark's decimal->long cast truncates to 267 while
    # DuckDB's rounds to 268. This is why the money columns' 2-decimal
    # property is verified against the corpus: past that domain the
    # engines diverge silently.
    assert spark_u([2.675]) == [267]
    assert duck_u([2.675]) == [268]


def test_money_units_guard_fail_stops_on_domain_violation(spark):
    """The production money pipeline must not reach the silent
    truncate-vs-round divergence above: money_units raises on any row
    whose scaled decimal is non-integral, and passes valid rows
    through exactly."""
    from outboxx_spark import olap

    def run(values):
        sdf = spark.createDataFrame([(v,) for v in values], "v double")
        return [
            r["u"]
            for r in sdf.select(
                olap.money_units(
                    F.col("v").cast("decimal(20,4)"), 100, "v"
                ).alias("u")
            ).collect()
        ]

    assert run([0.01, 2.67, 99999999999.99]) == [1, 267, 9999999999999]
    import pytest

    with pytest.raises(Exception, match="fixed-point domain violated"):
        run([2.675])


def test_referential_integrity_audit(spark, sf_dir):
    from outboxx_spark.integrity import referential_integrity
    from outboxx_spark.sources.tables import read_table

    got = {r["relationship"]: r for r in referential_integrity(spark, sf_dir).collect()}
    n_lineitem = read_table(spark, sf_dir, "lineitem").count()
    n_orders = read_table(spark, sf_dir, "orders").count()
    # the corpus is referentially intact: every real edge audits clean
    for edge, n_child in [
        ("lineitem->orders", n_lineitem),
        ("lineitem->part", n_lineitem),
        ("lineitem->supplier", n_lineitem),
        ("orders->customer", n_orders),
    ]:
        assert got[edge]["n_child"] == n_child
        assert got[edge]["n_orphans"] == 0, edge
    # the negative-control edge (parents % 97 removed) must report
    # orphans — a detector that has only ever output zero is untested
    ctrl = got["orders->customer#drop97"]
    assert ctrl["n_child"] == n_orders and 0 < ctrl["n_orphans"] < n_orders
