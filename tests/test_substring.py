"""Winnowing substring-span dedup (dataops/substring.py) — the
winnowing recall theorem (offset-invariance), density, and plan."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from outboxx_spark.dataops.substring import (
    duplicated_spans,
    duplicated_spans_sql,
    winnow_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_caught_at_any_offset_pair(spark):
    # THE winnowing theorem (and exactly the case stride shingling
    # fails): a shared span of length >= k + w - 1 is caught no matter
    # how the two copies are offset. k=8, w=4 -> guarantee at 11+.
    shared = "THEQUICKBROWNFOX"  # 16 >= 11
    for off_a, off_b in [(0, 1), (2, 5), (3, 7)]:
        d = _docs(
            spark,
            [
                (1, "x" * off_a + shared + "yyyyyyyy"),
                (2, "z" * off_b + shared + "wwwwwwww"),
            ],
        )
        out = duplicated_spans(d, k=8, w=4).collect()
        assert len(out) >= 1, (off_a, off_b)
        assert all(r.n_docs == 2 and r.exemplar == 1 for r in out)


def test_no_cross_doc_span_no_output(spark):
    d = _docs(spark, [(1, "A" * 60), (2, "B" * 60)])
    assert duplicated_spans(d, k=8, w=4).count() == 0


def test_within_doc_repeat_not_reported_without_second_doc(spark):
    d = _docs(spark, [(1, "ABCDEFGHIJ" * 4), (2, "q" * 40)])
    assert duplicated_spans(d, k=8, w=4).count() == 0


def test_every_window_has_a_fingerprint(spark):
    # Coverage half of the theorem: every w consecutive k-gram
    # positions contain at least one selected position.
    import random

    rng = random.Random(11)
    text = "".join(rng.choice("abcdefgh") for _ in range(200))
    k, w = 8, 4
    picks = sorted(
        r.pos for r in winnow_fingerprints(_docs(spark, [(1, text)]), k=k, w=w).collect()
    )
    n_grams = len(text) - k + 1
    assert picks[0] <= w and picks[-1] >= n_grams - w + 1
    assert all(b - a <= w for a, b in zip(picks, picks[1:]))


def test_short_docs_emit_nothing(spark):
    d = _docs(spark, [(1, "ABCDEFGHIJ")])  # len 10 < k + w - 1 = 11
    assert winnow_fingerprints(d, k=8, w=4).count() == 0


def test_spark_matches_duckdb_on_adversarial_text(spark):
    # Tie-heavy input (repeated grams force the rightmost tie-break)
    # plus multi-byte UTF-8: the full fingerprint sets must agree.
    rows = [
        (1, "ABABABABABABABABABAB"),
        (2, "xxABABABABABABABABABzz"),
        (3, "déjà vu déjà vu déjà vu déjà vu"),
        (4, "zz déjà vu déjà vu déjà vu q"),
    ]
    d = _docs(spark, rows)
    got = {
        (r.fp, r.n_docs, r.n_occurrences, r.exemplar)
        for r in duplicated_spans(d, k=8, w=4).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = set(map(tuple, con.execute(duplicated_spans_sql(k=8, w=4)).fetchall()))
    assert got == want and len(want) >= 1


def test_plan_single_projection_no_expand(spark):
    d = _docs(spark, [(1, "ABCDEFGHIJKLMNOP"), (2, "ABCDEFGHIJKLMNOP")])
    plan = duplicated_spans(d, k=8, w=4)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
