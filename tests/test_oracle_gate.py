"""The local gate replica (tools/check_oracles.py) must predict the
driver's type-sensitive value hash. Each test pins a failure mode that
actually shipped (or nearly did) in a past round — the replica printing
green for a formulation the driver rejects is the worst gate bug."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracles import canon_type, type_findings  # noqa: E402


def test_r5_escape_decimal_both_sides_is_flagged():
    # The exact r5 formulation the driver hashed red: DECIMAL(38,x) on
    # BOTH engines, values byte-identical via fetchall(). The old
    # replica compared precision strings (equal) and printed 77/77
    # green; the driver's hash over client-materialized values went red
    # because duckdb .df() coerces DECIMAL to float64 while Spark keeps
    # Decimal objects.
    findings = type_findings(
        {"sum_qty": "decimal(38,4)", "l_returnflag": "string"},
        {"sum_qty": "DECIMAL(38,4)", "l_returnflag": "VARCHAR"},
    )
    assert len(findings) == 1
    col, _, _, why = findings[0]
    assert col == "sum_qty" and "DECIMAL" in why


def test_decimal_on_one_side_only_is_flagged():
    assert type_findings({"v": "bigint"}, {"v": "DECIMAL(18,2)"})
    assert type_findings({"v": "decimal(20,4)"}, {"v": "BIGINT"})


def test_hugeint_still_flagged():
    # the r3 red: duckdb sum(CASE..) returns HUGEINT
    assert type_findings({"n": "bigint"}, {"n": "HUGEINT"})


def test_int_width_split_is_flagged():
    # int32 vs int64 never actually hashed red at the driver
    # (CORRECTNESS_r05: olap_topk_per_priority was green with Spark
    # int32 rank vs DuckDB BIGINT) but width splits are zero-cost to
    # align and the strict gate removes the whole class of doubt.
    assert type_findings({"rank": "int"}, {"rank": "BIGINT"})
    assert not type_findings({"rank": "bigint"}, {"rank": "BIGINT"})


def test_float_width_split_is_flagged():
    assert type_findings({"x": "float"}, {"x": "DOUBLE"})
    assert not type_findings({"x": "double"}, {"x": "DOUBLE"})


def test_array_element_widths_recurse():
    assert type_findings({"a": "array<int>"}, {"a": "BIGINT[]"})
    assert not type_findings({"a": "array<bigint>"}, {"a": "BIGINT[]"})
    # DECIMAL inside a list is still the red-flag class
    assert type_findings({"a": "array<decimal(10,2)>"}, {"a": "DECIMAL(10,2)[]"})


def test_clean_schema_has_no_findings():
    assert not type_findings(
        {"k": "string", "n": "bigint", "x": "double", "ts": "timestamp"},
        {"k": "VARCHAR", "n": "BIGINT", "x": "DOUBLE", "ts": "TIMESTAMP"},
    )


def test_canon_type_classes():
    assert canon_type("decimal(38,8)") == "DECIMAL-REDFLAG"
    assert canon_type("int") == canon_type("INTEGER") == "int32"
    assert canon_type("long") == canon_type("BIGINT") == "int64"
    assert canon_type("real") == "float32"


def test_one_sided_columns_are_findings():
    # the standalone type gate must flag a column only one engine
    # produces (main() FAILs on name mismatch first, but a direct
    # caller comparing unvalidated schemas relies on this)
    out = type_findings({"a": "bigint", "x": "bigint"}, {"a": "BIGINT"})
    assert [(f[0], f[3]) for f in out] == [
        ("x", "column missing from oracle schema")
    ]
    out = type_findings({"a": "bigint"}, {"a": "BIGINT", "y": "VARCHAR"})
    assert [(f[0], f[3]) for f in out] == [
        ("y", "column missing from spark schema")
    ]


def test_round_drift_direction_aware():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from bench_compare import round_drift

    prev = {
        "queries": {"q_slow": 1.0, "q_fast": 1.0, "q_tiny": 0.05},
        "extra": {
            "x_per_sec": 100000,
            "y_sec": 2.0,
            "z_ratio": 2.0,
            "n_files": 768,  # counter: never a drift
        },
    }
    cur_q = {"q_slow": 1.5, "q_fast": 0.4, "q_tiny": 5.0}
    cur_e = {"x_per_sec": 70000, "y_sec": 1.0, "z_ratio": 2.1, "n_files": 4}
    out = round_drift(prev, cur_q, cur_e)
    # q_slow +50% flagged; q_fast improved: not flagged; q_tiny below
    # the jitter floor: not flagged; throughput -30% flagged; y_sec
    # improved: not flagged; ratio +5% inside tolerance; counter skipped
    assert out == ["q_slow 1.0->1.5", "x_per_sec 100000->70000"]
    assert round_drift(prev, dict(prev["queries"]), dict(prev["extra"])) == []


def test_round_drift_normalizes_host_speed():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from bench_compare import round_drift

    # 12 queries all +25% = a host-speed phase, not 12 regressions:
    # reported as one host_factor entry, no per-query flags — except
    # the one query that moved beyond the host factor
    prev = {
        "queries": {f"q{i}": 1.0 for i in range(12)},
        "extra": {"x_per_sec": 100000, "y_sec": 2.0, "r_ratio": 2.0},
    }
    cur_q = {f"q{i}": 1.25 for i in range(12)}
    cur_q["q3"] = 1.8  # genuinely worse than the host shift
    cur_e = {"x_per_sec": 80000, "y_sec": 2.4, "r_ratio": 2.3}
    out = round_drift(prev, cur_q, cur_e)
    # x_per_sec -20% and y_sec +20% are inside host*tolerance;
    # r_ratio is host-invariant and +15% is inside plain tolerance
    assert out == ["host_factor 1.25", "q3 1.0->1.8"]
    # identical run: no host factor, nothing flagged
    assert round_drift(prev, dict(prev["queries"]), dict(prev["extra"])) == []
