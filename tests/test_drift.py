"""Schema-drift audit: detector semantics on hand-built payloads and
the plant+detect composition (operators/drift.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.operators.drift import plant_drift, schema_drift_report


def _feed(spark, rows):
    return spark.createDataFrame(rows, "resource string, lsn long, props string")


def _by_key(df):
    return {(r["resource"], r["key"]): r.asDict() for r in df.collect()}


def test_detector_flags_added_and_dropped_keys(spark):
    rows = [
        ("t0", 1, '{"a": 1, "old": 9}'),
        ("t0", 2, '{"a": 2, "old": 9}'),
        ("t0", 3, '{"a": 3}'),
        ("t0", 4, '{"a": 4, "new": 1}'),
        ("t1", 7, '{"a": 0}'),
    ]
    got = _by_key(schema_drift_report(_feed(spark, rows)))
    a = got[("t0", "a")]
    assert (a["n_events"], a["first_lsn"], a["last_lsn"]) == (4, 1, 4)
    assert not a["added"] and not a["dropped"]
    old = got[("t0", "old")]
    assert old["dropped"] and not old["added"] and old["last_lsn"] == 2
    new = got[("t0", "new")]
    assert new["added"] and not new["dropped"] and new["first_lsn"] == 4
    # a resource whose whole stream is one row: stable key, no flags
    t1 = got[("t1", "a")]
    assert not t1["added"] and not t1["dropped"]


def test_detector_skips_malformed_payloads(spark):
    rows = [
        ("t0", 1, '{"a": 1}'),
        ("t0", 2, "not json"),
        ("t0", 3, None),
        ("t0", 4, '{"a": 2}'),
    ]
    got = _by_key(schema_drift_report(_feed(spark, rows)))
    assert set(got) == {("t0", "a")}
    assert got[("t0", "a")]["n_events"] == 2
    # the resource bounds still span the malformed rows: the key was
    # last seen at lsn 4 == rmax, so it is NOT flagged dropped
    assert not got[("t0", "a")]["dropped"]


def test_plant_then_detect_recovers_the_eras(spark):
    # lsns 1..16, max=16: legacy era lsn*4<=16 -> lsn<=4; v2 era
    # lsn*4>=48 -> lsn>=12. Single resource, base key k everywhere.
    rows = [("t0", i, f'{{"k": {i}}}') for i in range(1, 17)]
    got = _by_key(schema_drift_report(plant_drift(_feed(spark, rows))))
    assert set(got) == {("t0", "k"), ("t0", "legacy"), ("t0", "v2")}
    k = got[("t0", "k")]
    assert (k["n_events"], k["added"], k["dropped"]) == (16, False, False)
    legacy = got[("t0", "legacy")]
    assert (legacy["n_events"], legacy["first_lsn"], legacy["last_lsn"]) == (4, 1, 4)
    assert legacy["dropped"] and not legacy["added"]
    v2 = got[("t0", "v2")]
    assert (v2["n_events"], v2["first_lsn"], v2["last_lsn"]) == (5, 12, 16)
    assert v2["added"] and not v2["dropped"]


def test_plant_emits_valid_json_with_original_keys_intact(spark):
    from pyspark.sql import functions as F

    rows = [("t0", i, f'{{"k": {i * 7}}}') for i in range(1, 9)]
    planted = plant_drift(_feed(spark, rows))
    back = planted.select(
        "lsn", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    assert {(r["lsn"], r["k"]) for r in back.collect()} == {
        (i, i * 7) for i in range(1, 9)
    }
