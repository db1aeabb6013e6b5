"""Training-shard export: layout, determinism, manifest commit
protocol, and the distributed verifier (dataops/export.py).

The contract: one parquet file per shard, rows inside a shard in the
pseudo-shuffle order that defined membership, manifest published LAST
(its absence == torn export), and verify_export() catching every
tamper class a 100-TB operator actually hits (lost shard, truncated
shard, silent content corruption)."""

from __future__ import annotations

import glob
import json
import os
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outboxx_spark.dataops.export import (
    MANIFEST_NAME,
    export_shards,
    is_committed,
    shard_manifest,
    verify_export,
)
from outboxx_spark.dataops.sharding import assign_shards


def _corpus(spark, n=120):
    # variable-length docs so shards cut at different doc counts
    return spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(1 + (i * 7) % 23))) for i in range(n)],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export") / "shards")
    docs = _corpus(spark)
    manifest = export_shards(docs, out, target=100, n_buckets=16)
    return docs, out, manifest


def test_one_file_per_shard(exported):
    _, out, manifest = exported
    for s in manifest["shards"]:
        files = glob.glob(os.path.join(out, f"shard={s['shard']}", "*.parquet"))
        assert len(files) == 1, (s["shard"], files)
    # no stray shard dirs beyond the manifest
    dirs = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert dirs == {f"shard={s['shard']}" for s in manifest["shards"]}


def test_membership_matches_assign_shards(spark, exported):
    docs, out, _ = exported
    want = {
        (r["doc_id"], r["shard"])
        for r in assign_shards(
            docs, F.size(F.split("text", " ")).cast("long"), 100, n_buckets=16
        ).collect()
    }
    got = {
        (r["doc_id"], int(r["shard"]))
        for r in spark.read.parquet(out).select("doc_id", "shard").collect()
    }
    assert got == want


def test_rows_inside_shard_are_in_shuffle_order(spark, exported):
    _, out, manifest = exported
    from outboxx_spark.dataops.sharding import _KNUTH, _MOD

    s0 = manifest["shards"][0]["shard"]
    df = spark.read.parquet(os.path.join(out, f"shard={s0}"))
    ids = [r["doc_id"] for r in df.collect()]  # parquet preserves row order
    assert ids == sorted(ids, key=lambda d: ((d * _KNUTH) % _MOD, d))


def test_manifest_verifies_and_is_deterministic(spark, exported, tmp_path):
    docs, out, manifest = exported
    assert is_committed(spark, out)
    assert verify_export(spark, out) == []
    # re-export of the same corpus -> identical manifest (fingerprints
    # pin content AND membership, so this is full reproducibility)
    out2 = str(tmp_path / "again")
    manifest2 = export_shards(docs, out2, target=100, n_buckets=16)
    assert manifest2 == manifest


def test_torn_export_detected(spark, exported, tmp_path):
    docs, _, _ = exported
    out = str(tmp_path / "torn")
    export_shards(docs, out, target=100, n_buckets=16)
    os.remove(os.path.join(out, MANIFEST_NAME))
    assert not is_committed(spark, out)
    with pytest.raises(FileNotFoundError):
        verify_export(spark, out)


@pytest.mark.slow
def test_verifier_catches_lost_and_corrupt_shards(spark, exported, tmp_path):
    docs, _, _ = exported
    out = str(tmp_path / "tampered")
    manifest = export_shards(docs, out, target=100, n_buckets=16)
    shards = [s["shard"] for s in manifest["shards"]]
    assert len(shards) >= 3, "fixture too small to tamper meaningfully"

    # lose one whole shard (rmtree: the dir also holds hidden .crc files)
    import shutil

    lost = shards[1]
    shutil.rmtree(os.path.join(out, f"shard={lost}"))

    # corrupt another: rewrite with one doc's text altered (same row
    # count, same token count -> only the fingerprint can catch it)
    bad = shards[2]
    bad_dir = os.path.join(out, f"shard={bad}")
    rows = spark.read.parquet(bad_dir).collect()
    fixed = [
        (r["doc_id"], "x" + r["text"][1:], r["n_tokens"]) for r in rows[:1]
    ] + [(r["doc_id"], r["text"], r["n_tokens"]) for r in rows[1:]]
    for f in glob.glob(os.path.join(bad_dir, "*")):
        os.remove(f)
    spark.createDataFrame(
        fixed, "doc_id long, text string, n_tokens long"
    ).coalesce(1).write.mode("overwrite").parquet(bad_dir)

    errs = {(p["shard"], p["err"]) for p in verify_export(spark, out)}
    assert (lost, "missing on disk") in errs
    assert (bad, "fingerprint") in errs
    # the tamper preserved counts, so ONLY the fingerprint flags it
    assert (bad, "n_docs") not in errs and (bad, "n_tokens") not in errs


def test_shard_manifest_is_partial_aggregable(spark, exported):
    # plan shape: the manifest aggregate must partial-combine (XOR and
    # SUM both map-side) — one exchange of n_shards-sized partials
    docs, out, _ = exported
    df = shard_manifest(
        spark.read.parquet(out).withColumn("shard", F.col("shard").cast("long"))
    )
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "partial_" in plan, plan[:1500]
