"""Incremental MinHash dedup: batches deduped against the survivor
store, first-seen-wins across batches, idempotent replay, and the
streaming wrapper. Jaccard expectations are computed by a plain Python
set model (k=1 shingles = token sets, so the numbers are exact)."""

from __future__ import annotations

import pytest

from outboxx_spark.dataops.incremental import (
    compact_dedup_store,
    incremental_minhash_dedup_batch,
    read_dedup_pairs,
    read_survivors,
    start_incremental_dedup_stream,
)

C8 = "c1 c2 c3 c4 c5 c6 c7 c8"
DOC_A = (1, f"{C8} a1 a2")            # keeper
DOC_B = (2, f"{C8} b1 b2")            # J(A,B) = 8/12 ~ 0.667 -> dropped
DOC_C = (3, "c1 c2 c3 c4 c5 b1 b2 d1 d2 d3")  # J(B,C)=7/13~0.54, J(A,C)=5/15~0.33
DOC_D = (4, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10")  # novel


def _jac(t1: str, t2: str) -> float:
    s1, s2 = set(t1.split()), set(t2.split())
    return len(s1 & s2) / len(s1 | s2)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_first_seen_wins(spark, tmp_path):
    """B drops against batchmate A; C (a dup of the DROPPED B only)
    survives batch 2 because the store holds survivors, not casualties;
    novel D survives. Pair rows carry the exact integer Jaccard parts."""
    assert _jac(DOC_A[1], DOC_B[1]) >= 0.5
    assert _jac(DOC_B[1], DOC_C[1]) >= 0.5
    assert _jac(DOC_A[1], DOC_C[1]) < 0.5
    store = str(tmp_path / "store")
    incremental_minhash_dedup_batch(
        _docs_df(spark, [DOC_A, DOC_B]), store, batch_id=0, k=1
    )
    assert {r.doc_id for r in read_survivors(spark, store).collect()} == {1}
    incremental_minhash_dedup_batch(
        _docs_df(spark, [DOC_C, DOC_D]), store, batch_id=1, k=1
    )
    assert {r.doc_id for r in read_survivors(spark, store).collect()} == {1, 3, 4}
    pairs = {
        (r.doc_a, r.doc_b, r.inter, r.n_a, r.n_b)
        for r in read_dedup_pairs(spark, store).collect()
    }
    assert pairs == {(1, 2, 8, 10, 10)}


def test_cross_batch_dup_is_dropped(spark, tmp_path):
    """An exact re-send of a stored survivor in a later batch drops."""
    store = str(tmp_path / "store")
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_A]), store, batch_id=0, k=1)
    resend = (99, DOC_A[1])
    incremental_minhash_dedup_batch(
        _docs_df(spark, [resend, DOC_D]), store, batch_id=1, k=1
    )
    assert {r.doc_id for r in read_survivors(spark, store).collect()} == {1, 4}
    assert {(r.doc_a, r.doc_b) for r in read_dedup_pairs(spark, store).collect()} == {
        (1, 99)
    }


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch with the same batch_id (Structured Streaming's
    crash-recovery contract) leaves the store byte-identical in content:
    same survivors, same pairs, no duplicated rows."""
    store = str(tmp_path / "store")
    incremental_minhash_dedup_batch(
        _docs_df(spark, [DOC_A, DOC_B]), store, batch_id=0, k=1
    )
    for _ in range(2):  # replay batch 1 twice
        incremental_minhash_dedup_batch(
            _docs_df(spark, [DOC_C, DOC_D]), store, batch_id=1, k=1
        )
    surv = [r.doc_id for r in read_survivors(spark, store).collect()]
    assert sorted(surv) == [1, 3, 4]  # no duplicates from the replay
    assert read_dedup_pairs(spark, store).count() == 1


def test_empty_batch_is_a_noop(spark, tmp_path):
    """An empty micro-batch writes nothing — the store stays readable
    (a data-less batch_id partition tree would break schema inference)."""
    store = str(tmp_path / "store")
    empty = _docs_df(spark, []).filter("doc_id > 0")
    incremental_minhash_dedup_batch(empty, store, batch_id=0, k=1)
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_A]), store, batch_id=1, k=1)
    incremental_minhash_dedup_batch(empty, store, batch_id=2, k=1)
    assert {r.doc_id for r in read_survivors(spark, store).collect()} == {1}


@pytest.mark.slow
def test_streaming_wrapper_end_to_end(spark, tmp_path):
    """File-source stream, one file per micro-batch: the final survivor
    set is the same regardless of which file becomes which batch (the
    corpus is constructed so both orders converge)."""
    src = tmp_path / "src"
    _docs_df(spark, [DOC_A, DOC_B]).coalesce(1).write.parquet(str(src / "f1"))
    _docs_df(spark, [DOC_C, DOC_D]).coalesce(1).write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*/*.parquet")
    )
    q = start_incremental_dedup_stream(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        k=1,
    )
    q.awaitTermination(120)
    assert {r.doc_id for r in read_survivors(spark, str(tmp_path / "store")).collect()} == {
        1,
        3,
        4,
    }


def _parquet_file_count(root) -> int:
    import os

    n = 0
    for _, _, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _store_state(spark, store):
    surv = sorted(r.doc_id for r in read_survivors(spark, store).collect())
    pairs = sorted(
        (r.batch_id, r.doc_a, r.doc_b, r.inter, r.n_a, r.n_b)
        for r in read_dedup_pairs(spark, store).collect()
    )
    return surv, pairs


@pytest.mark.slow
def test_compaction_folds_generations_and_keeps_pruning(spark, tmp_path):
    """Compaction bin-packs every batch generation into batch_id=-1 per
    tree: survivors/pairs unchanged, parquet file count drops, and a
    later batch still dedups against the compacted store (the bkt/dbk
    partition pruning the probe relies on survives the rewrite)."""
    import os

    store = str(tmp_path / "store")
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_A, DOC_B]), store, batch_id=0, k=1)
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_C]), store, batch_id=1, k=1)
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_D]), store, batch_id=2, k=1)
    before = _store_state(spark, store)
    files_before = _parquet_file_count(f"{store}/buckets") + _parquet_file_count(f"{store}/docs")
    compact_dedup_store(spark, store)
    assert _store_state(spark, store) == before
    files_after = _parquet_file_count(f"{store}/buckets") + _parquet_file_count(f"{store}/docs")
    assert files_after < files_before
    assert os.listdir(f"{store}/buckets") == ["batch_id=-1"]
    # probe against the compacted generation: a resend of stored
    # survivor A must still drop
    incremental_minhash_dedup_batch(
        _docs_df(spark, [(99, DOC_A[1])]), store, batch_id=3, k=1
    )
    surv, pairs = _store_state(spark, store)
    assert 99 not in surv
    assert (3, 1, 99, 10, 10, 10) in pairs
    # re-compaction over (compacted + new) generations stays correct
    compact_dedup_store(spark, store)
    assert _store_state(spark, store) == (surv, pairs)


@pytest.mark.slow
def test_compaction_recovery_rolls_forward_after_marker(spark, tmp_path, monkeypatch):
    """A crash AFTER the stage completed (_COMMIT_READY present) must
    roll forward at the next ingest: the staged generation commits and
    the store behaves exactly as if compaction had finished."""
    import os

    import outboxx_spark.dataops.incremental as inc

    store = str(tmp_path / "store")
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_A, DOC_B]), store, batch_id=0, k=1)
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_C]), store, batch_id=1, k=1)
    before = _store_state(spark, store)
    monkeypatch.setattr(inc, "_commit_compaction", lambda *a, **k: None)
    compact_dedup_store(spark, store)  # stages + marker, then "crashes"
    monkeypatch.undo()
    assert os.path.exists(f"{store}/.compact_stage/_COMMIT_READY")
    # next ingest recovers forward, then dedups against the store
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_D]), store, batch_id=2, k=1)
    assert not os.path.exists(f"{store}/.compact_stage")
    surv, pairs = _store_state(spark, store)
    assert surv == sorted(before[0] + [4])
    assert pairs == before[1]
    assert os.listdir(f"{store}/buckets") == sorted(["batch_id=-1", "batch_id=2"])


def test_compaction_recovery_discards_unready_stage(spark, tmp_path):
    """A crash BEFORE the marker (half-written stage) must roll back:
    the junk stage is dropped and the live generations are untouched."""
    import os

    store = str(tmp_path / "store")
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_A]), store, batch_id=0, k=1)
    before = _store_state(spark, store)
    os.makedirs(f"{store}/.compact_stage/buckets")  # no _COMMIT_READY
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_D]), store, batch_id=1, k=1)
    assert not os.path.exists(f"{store}/.compact_stage")
    surv, pairs = _store_state(spark, store)
    assert surv == sorted(before[0] + [4])


@pytest.mark.slow
def test_compaction_commit_crash_at_every_filesystem_step(spark, tmp_path, monkeypatch):
    """Exhaustive crash-point enumeration (r6): replay _commit_compaction's
    exact filesystem operation sequence — park each live generation,
    swap each staged tree in, drop undo, drop stage — and crash after
    EVERY prefix. Recovery (wired into every read) must restore the
    identical logical store state and clear both work areas from any of
    the intermediate states, not just the two endpoints the fixed
    crash tests cover."""
    import os
    import shutil

    import outboxx_spark.dataops.incremental as inc

    base = str(tmp_path / "base")
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_A, DOC_B]), base, batch_id=0, k=1)
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_C]), base, batch_id=1, k=1)
    expected = _store_state(spark, base)
    # stage a complete compacted generation + marker, then "crash"
    # before any commit step
    monkeypatch.setattr(inc, "_commit_compaction", lambda *a, **k: None)
    compact_dedup_store(spark, base)
    monkeypatch.undo()
    assert os.path.exists(f"{base}/.compact_stage/_COMMIT_READY")

    def commit_ops(root):
        seq = []
        for tree in ("buckets", "docs"):
            undo = f"{root}/.compact_undo/{tree}"
            seq.append(lambda undo=undo: os.makedirs(undo, exist_ok=True))
            for name in ("batch_id=0", "batch_id=1"):
                seq.append(
                    lambda t=tree, n=name, undo=undo: shutil.move(
                        f"{root}/{t}/{n}", f"{undo}/{n}"
                    )
                )
            seq.append(
                lambda t=tree: shutil.move(
                    f"{root}/.compact_stage/{t}", f"{root}/{t}/batch_id=-1"
                )
            )
        seq.append(lambda: shutil.rmtree(f"{root}/.compact_undo"))
        seq.append(lambda: shutil.rmtree(f"{root}/.compact_stage"))
        return seq

    n_ops = len(commit_ops(base))
    for k in range(n_ops + 1):
        root = str(tmp_path / f"crash{k}")
        shutil.copytree(base, root)
        for op in commit_ops(root)[:k]:
            op()
        assert _store_state(spark, root) == expected, f"crash after op {k}"
        assert not os.path.exists(f"{root}/.compact_stage"), f"crash after op {k}"
        assert not os.path.exists(f"{root}/.compact_undo"), f"crash after op {k}"


def test_negative_batch_id_refused(spark, tmp_path):
    """batch_id=-1 is the compacted generation's reserved id: a caller
    passing it would both skip the compacted generation in the replay
    filter and overwrite it on the survivor append — fail-stop."""
    with pytest.raises(ValueError, match="batch_id must be >= 0"):
        incremental_minhash_dedup_batch(
            _docs_df(spark, [DOC_A]), str(tmp_path / "s"), batch_id=-1, k=1
        )


def test_null_text_doc_survives_unmatched(spark, tmp_path):
    """A null-text row must not crash the batch (the numpy signature
    path compacts null hashes away, like the exploded formulation
    did): it produces no bucket keys, is never a candidate, and
    survives."""
    store = str(tmp_path / "store")
    rows = [DOC_A, (7, None), DOC_D]
    incremental_minhash_dedup_batch(
        spark.createDataFrame(rows, "doc_id long, text string"), store, batch_id=0, k=1
    )
    assert {r.doc_id for r in read_survivors(spark, store).collect()} == {1, 4, 7}


def test_compaction_without_meta_fails_closed(spark, tmp_path):
    """Like ingest, compaction must refuse a store whose meta file is
    missing rather than assume a bucket count."""
    import os

    store = str(tmp_path / "store")
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_A]), store, batch_id=0, k=1)
    os.remove(os.path.join(store, "_dedup_store_meta.json"))
    with pytest.raises(ValueError, match="refusing to compact"):
        compact_dedup_store(spark, store)


def test_store_refuses_mismatched_parameters(spark, tmp_path):
    """The store's layout parameters (k, threshold, n_store_buckets) are
    baked into its partition hashing and shingle sets; a later call with
    different values must fail-stop instead of silently pruning the
    wrong partitions and passing duplicates through."""
    store = str(tmp_path / "store")
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_A]), store, batch_id=0, k=1)
    with pytest.raises(ValueError, match="refusing"):
        incremental_minhash_dedup_batch(
            _docs_df(spark, [DOC_D]), store, batch_id=1, k=2
        )
    with pytest.raises(ValueError, match="refusing"):
        incremental_minhash_dedup_batch(
            _docs_df(spark, [DOC_D]), store, batch_id=1, k=1, n_store_buckets=32
        )
    # matching parameters still work after the rejected attempts
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_D]), store, batch_id=1, k=1)
    assert {r.doc_id for r in read_survivors(spark, store).collect()} == {1, 4}


def test_store_with_data_but_no_meta_fails_closed(spark, tmp_path):
    """A pre-meta-layout store (data present, no meta file) must refuse
    to run rather than adopt the caller's parameters as truth."""
    import os

    store = str(tmp_path / "store")
    incremental_minhash_dedup_batch(_docs_df(spark, [DOC_A]), store, batch_id=0, k=1)
    os.remove(os.path.join(store, "_dedup_store_meta.json"))
    with pytest.raises(ValueError, match="no _dedup_store_meta"):
        incremental_minhash_dedup_batch(
            _docs_df(spark, [DOC_D]), store, batch_id=1, k=1
        )


@pytest.mark.slow
def test_pipelined_prepare_commit_equals_sequential(spark, tmp_path):
    """The prepare/commit split exists so delivery N+1's preparation can
    overlap delivery N's commit — pipelined execution must produce the
    byte-identical store state the sequential wrapper produces, with
    batch 1 still deduped against batch 0's survivors."""
    from concurrent.futures import ThreadPoolExecutor

    from outboxx_spark.dataops.incremental import (
        commit_dedup_batch,
        prepare_dedup_batch,
    )

    b0, b1 = [DOC_A, DOC_B], [DOC_C, DOC_D]
    seq = str(tmp_path / "seq")
    incremental_minhash_dedup_batch(_docs_df(spark, b0), seq, batch_id=0, k=1)
    incremental_minhash_dedup_batch(_docs_df(spark, b1), seq, batch_id=1, k=1)

    pipe = str(tmp_path / "pipe")
    with ThreadPoolExecutor(max_workers=1) as pool:
        prep0 = prepare_dedup_batch(_docs_df(spark, b0), k=1)
        fut1 = pool.submit(prepare_dedup_batch, _docs_df(spark, b1), k=1)
        commit_dedup_batch(prep0, pipe, batch_id=0)
        commit_dedup_batch(fut1.result(), pipe, batch_id=1)

    for reader in (read_survivors, read_dedup_pairs):
        a = {tuple(r) for r in reader(spark, seq).collect()}
        b = {tuple(r) for r in reader(spark, pipe).collect()}
        assert a == b, reader.__name__
    # C still dropped-against-B-free: the store held survivors only
    assert {r.doc_id for r in read_survivors(spark, pipe).collect()} == {1, 3, 4}
