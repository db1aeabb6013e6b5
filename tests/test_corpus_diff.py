"""Corpus-version diff: status classification and delta-only output
(dataops/corpus_diff.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.corpus_diff import corpus_diff, planted_corpus_diff


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_diff_classifies_every_transition(spark):
    old = _corpus(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    new = _corpus(spark, [(2, "b"), (3, "c CHANGED"), (4, "d"), (5, "e")])
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    # unchanged docs (2, 4) never appear in the delta
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_diff_of_identical_corpora_is_empty(spark):
    docs = _corpus(spark, [(i, f"t{i}") for i in range(20)])
    assert corpus_diff(docs, docs).count() == 0


def test_planted_diff_matches_the_modular_plant(spark, sf_dir):
    from outboxx_spark.sources.tables import read_table

    ids = {
        r["doc_id"]
        for r in read_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    got = {r["doc_id"]: r["status"] for r in planted_corpus_diff(spark, sf_dir).collect()}
    for i in ids:
        if i % 7 == 0 and i % 11 == 0:
            # absent from v_old, absent from v_new: no row at all
            assert i not in got
        elif i % 7 == 0:
            assert got.get(i) == "added", i
        elif i % 11 == 0:
            assert got.get(i) == "removed", i
        elif i % 5 == 0:
            assert got.get(i) == "changed", i
        else:
            assert i not in got
