"""As-of join semantics: <= boundary, no-match nulls, deterministic
tie-break among equal right timestamps."""

from __future__ import annotations

import pytest

from outboxx_spark.operators.asof import asof_join


@pytest.mark.slow
def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 5), (3, 100, 50), (4, 200, 10)],
        "id long, k long, t long",
    )
    right = spark.createDataFrame(
        [
            (100, 10, 1001, 1.0),  # exactly at left t=10 -> matches (<=)
            (100, 8, 1000, 2.0),
            (100, 10, 1002, 3.0),  # same ts as 1001 -> higher order wins
            (100, 40, 1003, 4.0),
            (300, 1, 9999, 9.0),  # other key, never matches
        ],
        "k long, t long, okey long, val double",
    )
    out = {
        r["id"]: (r["asof_okey"], r["asof_val"])
        for r in asof_join(
            left,
            right,
            left_key="k",
            right_key="k",
            left_ts="t",
            right_ts="t",
            right_payload=["okey", "val"],
            right_order="okey",
        ).collect()
    }
    assert out[1] == (1002, 3.0)  # t=10: both t=10 rows eligible, max okey wins
    assert out[2] == (None, None)  # t=5: earliest right row is t=8 -> no match
    assert out[3] == (1003, 4.0)  # t=50: latest is t=40
    assert out[4] == (None, None)  # key 200 has no right rows


def test_asof_no_prior_row_is_null(spark):
    left = spark.createDataFrame([(1, 100, 3)], "id long, k long, t long")
    right = spark.createDataFrame([(100, 7, 1, 1.0)], "k long, t long, okey long, val double")
    row = asof_join(
        left, right, left_key="k", right_key="k", left_ts="t", right_ts="t",
        right_payload=["okey", "val"], right_order="okey",
    ).collect()[0]
    assert row["asof_okey"] is None and row["asof_val"] is None
