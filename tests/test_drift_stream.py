"""Streaming schema-drift monitor: convergence with the batch audit,
replay idempotence, torn-generation invisibility, pruning
(streaming/drift_stream.py)."""

from __future__ import annotations

import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from outboxx_spark.operators.drift import schema_drift_report
from outboxx_spark.streaming.drift_stream import (
    _committed_gens,
    apply_drift_batch,
    read_drift_report,
    start_drift_stream,
)

FEED_SCHEMA = "resource string, lsn long, props string"

# key 'legacy' exists only early on t0; key 'v2' appears late; 'k' stable
PART_A = [
    ("t0", 1, '{"k": 1, "legacy": 1}'),
    ("t0", 2, '{"k": 2, "legacy": 1}'),
    ("t1", 3, '{"k": 3}'),
]
PART_B = [
    ("t0", 4, '{"k": 4}'),
    ("t1", 5, '{"k": 5}'),
    ("t0", 6, "not json"),  # transport row: counts for bounds only
]
PART_C = [
    ("t0", 7, '{"k": 7, "v2": 1}'),
    ("t1", 8, '{"k": 8, "v2": 1}'),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, FEED_SCHEMA)


def _report(df):
    return {
        (r["resource"], r["key"]): (
            r["n_events"],
            r["first_lsn"],
            r["last_lsn"],
            r["added"],
            r["dropped"],
        )
        for r in df.collect()
    }


@pytest.mark.slow
def test_stream_converges_to_batch_audit(spark, tmp_path):
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    for rows in (PART_A, PART_B, PART_C):
        _df(spark, rows).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(FEED_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = start_drift_stream(stream, state, ckpt)
    q.awaitTermination(180)

    streamed = _report(read_drift_report(spark, state))
    batch = _report(schema_drift_report(_df(spark, PART_A + PART_B + PART_C)))
    assert streamed == batch
    # and the hand model: legacy dropped, v2 added, k stable on both
    assert streamed[("t0", "legacy")] == (2, 1, 2, False, True)
    assert streamed[("t0", "v2")] == (1, 7, 7, True, False)
    assert streamed[("t0", "k")][3:] == (False, False)
    assert streamed[("t1", "v2")][3:] == (True, False)


def test_replayed_epoch_is_a_noop(spark, tmp_path):
    state = str(tmp_path / "state")
    apply_drift_batch(_df(spark, PART_A), state, 0)
    apply_drift_batch(_df(spark, PART_B), state, 1)
    before = _report(read_drift_report(spark, state))
    # foreachBatch replays the last epoch after a crash-after-commit
    apply_drift_batch(_df(spark, PART_B), state, 1)
    assert _report(read_drift_report(spark, state)) == before


@pytest.mark.slow
def test_torn_generation_is_invisible_then_overwritten(spark, tmp_path):
    state = str(tmp_path / "state")
    apply_drift_batch(_df(spark, PART_A), state, 0)
    committed = _report(read_drift_report(spark, state))
    # simulate a crash mid-write of gen 1: state written, marker absent
    _df(spark, PART_B).coalesce(1).write.mode("overwrite").parquet(
        f"{state}/gen=1/state"
    )
    assert _report(read_drift_report(spark, state)) == committed
    # replayed epoch 1 clobbers the torn dir and commits properly
    apply_drift_batch(_df(spark, PART_B), state, 1)
    expect = _report(schema_drift_report(_df(spark, PART_A + PART_B)))
    assert _report(read_drift_report(spark, state)) == expect


def test_pruning_keeps_retain_and_serving_is_unaffected(spark, tmp_path):
    state = str(tmp_path / "state")
    for i, rows in enumerate((PART_A, PART_B, PART_C)):
        apply_drift_batch(_df(spark, rows), state, i, retain=2)
    assert _committed_gens(spark, state) == [1, 2]
    expect = _report(schema_drift_report(_df(spark, PART_A + PART_B + PART_C)))
    assert _report(read_drift_report(spark, state)) == expect
