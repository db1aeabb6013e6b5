"""Chunking / sequence packing / salted join (r9 additions).

Reference scope note: these are LLM-pipeline operators beyond the
reference's CDC surface (the build brief's training-data mandate), so
the contracts are pinned against plain-Python models and the unsalted/
unsharded formulations rather than reference files.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.chunking import chunk_documents, pack_sequences
from outboxx_spark.operators.skew import salted_join


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _python_chunks(text, window, stride):
    toks = text.split(" ")
    return [
        (ci, min(window, len(toks) - start), " ".join(toks[start : start + window]))
        for ci, start in enumerate(range(0, len(toks), stride))
    ]


def test_chunks_match_python_model(spark):
    texts = [
        "a b c d e f g h i j",
        "one",
        "",
        "x " * 200,  # trailing space -> empty final token, kept
        "w1 w2  w3",  # double space -> empty token, kept (split contract)
    ]
    out = chunk_documents(_docs(spark, texts), window=4, stride=3).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk"])
        )
    for i, t in enumerate(texts):
        assert sorted(got[i]) == _python_chunks(t, 4, 3), f"doc {i}"


def test_empty_document_yields_one_empty_chunk(spark):
    rows = chunk_documents(_docs(spark, [""]), window=8, stride=8).collect()
    assert len(rows) == 1
    assert (rows[0]["chunk_id"], rows[0]["n_tokens"], rows[0]["chunk"]) == (0, 1, "")


def test_chunking_is_shuffle_free(spark):
    df = chunk_documents(_docs(spark, ["a b c"] * 10))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_chunk_param_validation(spark):
    with pytest.raises(ValueError, match="window/stride"):
        chunk_documents(_docs(spark, ["a"]), window=0)
    with pytest.raises(ValueError, match="capacity/n_shards"):
        pack_sequences(_docs(spark, ["a"]), capacity=0)


def test_packing_is_partitioning_invariant(spark):
    # the packing must depend only on (doc_id, chunk_id) order, never
    # on physical layout — resizing a cluster can't change sequences
    docs = _docs(spark, [f"tok{i} " * (i % 17 + 1) for i in range(60)])
    chunks = chunk_documents(docs, window=8, stride=6)
    a = pack_sequences(chunks, capacity=32, n_shards=4).collect()
    b = pack_sequences(chunks.repartition(17), capacity=32, n_shards=4).collect()
    key = lambda r: (r["shard"], r["seq_id"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every chunk lands in exactly one sequence
    assert sum(r["n_chunks"] for r in a) == chunks.count()
    # sequence boundaries: consecutive seq_ids within a shard, starting at 0
    per_shard = {}
    for r in sorted(a, key=key):
        per_shard.setdefault(r["shard"], []).append(r["seq_id"])
    for shard, seqs in per_shard.items():
        assert seqs == list(range(len(seqs))), (shard, seqs)


def test_packing_python_model(spark):
    # pin the offset-packing semantics against a sequential model
    docs = _docs(spark, ["a b c d e", "x y z", "p q r s t u v w"])
    chunks = chunk_documents(docs, window=3, stride=2)
    got = {
        (r["shard"], r["seq_id"]): (r["n_chunks"], r["seq_tokens"])
        for r in pack_sequences(chunks, capacity=4, n_shards=2).collect()
    }
    rows = sorted(
        chunks.collect(), key=lambda r: (r["doc_id"] % 2, r["doc_id"], r["chunk_id"])
    )
    model: dict = {}
    offs = {}
    for r in rows:
        shard = r["doc_id"] % 2
        start = offs.get(shard, 0)
        seq = start // 4
        n, tot = model.get((shard, seq), (0, 0))
        model[(shard, seq)] = (n + 1, tot + r["n_tokens"])
        offs[shard] = start + r["n_tokens"]
    assert got == model


def test_salted_join_equals_plain_join(spark):
    # skewed big side: one hot key carrying most rows, plus unmatched
    # keys on both sides (inner-join semantics must drop them)
    big = spark.createDataFrame(
        [(1, i) for i in range(500)]
        + [(2, i) for i in range(7)]
        + [(99, 0)],  # no dim row
        "k long, v long",
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unreferenced")], "k long, name string"
    )
    got = salted_join(big, small, ["k"], n_salts=8)
    want = big.join(small, ["k"])
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # degenerate n_salts=1 still correct
    one = salted_join(big, small, ["k"], n_salts=1)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_replicates_small_side_per_salt(spark):
    big = spark.createDataFrame([(1, 1)], "k long, v long")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k long, name string")
    plan = salted_join(big, small, ["k"], n_salts=4)._jdf.queryExecution().optimizedPlan().toString()
    # the replication is a Generate(explode) over the salt array, and
    # the join key is the (key, salt) composite
    assert "explode" in plan, plan
    assert "_salt" in plan, plan
