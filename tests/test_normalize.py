"""Text canonicalization: each stage (NFC, lower, whitespace collapse)
observably fires, and the composed/decomposed forms converge
(dataops/normalize.py)."""

from __future__ import annotations

import sys
import unicodedata
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from outboxx_spark.dataops.normalize import normalize_expr, normalized_fingerprints

COMPOSED = "Café"  # é as one codepoint
DECOMPOSED = "Café"  # e + combining acute


def _norm(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = df.select("doc_id", normalize_expr(F.col("text")).alias("n")).collect()
    return [r["n"] for r in sorted(rows, key=lambda r: r["doc_id"])]


def test_composed_and_decomposed_forms_converge(spark):
    a, b = _norm(spark, [COMPOSED, DECOMPOSED])
    assert a == b == "café"


def test_case_whitespace_and_nulls(spark):
    got = _norm(spark, ["  A\t\tB\nC  ", "already clean", None])
    assert got[0] == "a b c"
    assert got[1] == "already clean"
    assert got[2] is None


def test_fingerprints_match_a_python_model(spark):
    import hashlib
    import re

    texts = ["  MiXeD   Case ", DECOMPOSED + "  x", "plain"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["norm_md5"] for r in normalized_fingerprints(df).collect()}
    for i, t in enumerate(texts):
        model = re.sub(r"\s+", " ", unicodedata.normalize("NFC", t).lower()).strip()
        assert got[i] == hashlib.md5(model.encode()).hexdigest(), t
