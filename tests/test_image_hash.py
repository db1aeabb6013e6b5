"""Perceptual dHash (dataops/multimodal.py) — bit semantics on known
gradients, exact-duplicate grouping, and the SQL chunk-index mirror."""

from __future__ import annotations

import numpy as np
import pytest

from outboxx_spark.dataops.multimodal import (
    DHASH_ROWS,
    _array_split_idx_sql,
    image_dhash,
    image_dhash_groups,
)
from outboxx_spark.dataops.png import encode_png


def test_dhash_monotone_gradients():
    # Columns strictly increasing left->right: every cell's mean is
    # below its right neighbor's, so every bit (left > right) is '0'.
    w, h = 18, 16
    inc = np.tile(np.arange(w, dtype=np.uint8) * 3, (h, 1))
    assert image_dhash(encode_png(inc)) == "0" * 64
    # Reversed gradient: every bit '1'.
    dec = inc[:, ::-1].copy()
    assert image_dhash(encode_png(dec)) == "1" * 64


def test_dhash_invariant_to_row_permutation_within_bands():
    # dHash only sees per-cell means: permuting rows INSIDE one row
    # band leaves every cell mean unchanged.
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(16, 20), dtype=np.uint8)  # 16 rows / 8 bands = 2 each
    permuted = px.copy()
    permuted[[0, 1]] = permuted[[1, 0]]  # swap rows of band 0
    assert image_dhash(encode_png(px)) == image_dhash(encode_png(permuted))


def test_array_split_idx_sql_matches_numpy():
    import duckdb

    for L in (16, 17, 23, 63):
        for K in (8, 9):
            expr = _array_split_idx_sql("i", str(L), K)
            got = duckdb.sql(
                f"SELECT {expr} AS c FROM (SELECT unnest(range({L})) AS i)"
            ).fetchall()
            want = np.concatenate(
                [np.full(len(chunk), ci) for ci, chunk in enumerate(np.array_split(np.arange(L), K))]
            )
            assert [g[0] for g in got] == want.tolist(), (L, K)


def test_exact_duplicate_images_share_hash(spark):
    # The synthetic pixel formula has period 768 in doc_id (256 for the
    # base value x 48 for each dim): doc 5 and doc 773 are byte-for-byte
    # the same image, so they MUST land in one dHash group.
    docs = spark.createDataFrame([(5,), (773,), (6,)], "doc_id long")
    out = image_dhash_groups(docs).collect()
    by_hash = {r.dhash: r for r in out}
    assert any(r.n_docs == 2 and r.exemplar == 5 for r in out)
    assert sum(r.n_docs for r in out) == 3
