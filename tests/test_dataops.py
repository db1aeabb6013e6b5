"""Training-data operators: properties the SQL oracle can't check —
LSH recall vs brute force, multimodal UDF determinism/batch shape,
dedup edge cases, stubbed decoder behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from outboxx_spark.dataops import dedup as dd
from outboxx_spark.dataops import similarity as sim
from outboxx_spark.dataops import text as tx
from outboxx_spark.dataops.multimodal import (
    FEATURE_DIM,
    attach_blobs,
    decode_features,
    frame_sample,
    real_image_decode,
)
from outboxx_spark.sources.tables import read_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_collapses_identical(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "x y z")])
    out = {r["keep_id"]: r["n_docs"] for r in dd.exact_dedup_groups(df).collect()}
    assert out == {1: 2, 3: 1}


def test_shingles_short_doc_guard(spark):
    df = _docs(spark, [(1, "one two")])  # < k tokens -> whole-text shingle
    out = df.select(tx.shingles(F.col("text"), 3).alias("s")).collect()[0]["s"]
    assert out == ["one two"]


def test_ngram_pairs_symmetric_threshold(spark):
    # identical docs -> jaccard 1; disjoint docs -> no pair
    df = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")])
    pairs = dd.ngram_jaccard_pairs(df, k=3, threshold=0.5).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]


def test_minhash_matches_exact_on_testdata(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dd.ngram_jaccard_pairs(docs, 3, 0.5, max_df=None).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]) for r in dd.minhash_dedup_pairs(docs, 3, 0.5).collect()
    }
    assert lsh == exact  # LSH recall 1.0 at this threshold (by construction)


def test_ivf_store_serves_identical_topk(spark, sf_dir, tmp_path):
    """A persisted IVF index must answer exactly what a rebuild-per-call
    ivf_ann_topk answers on the same corpus and query batch — the
    stored centroids reload bit-identically, so assignment, probes and
    re-rank replay the same arithmetic. Rebuilding into a non-empty
    index dir must refuse (serving-index immutability)."""
    import pytest as _pytest

    emb = read_table(spark, sf_dir, "embeddings")
    store = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, store)
    queries = emb.filter(F.col("vec_id") < 10)
    served = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in sim.ivf_ann_topk_from_store(spark, store, queries, k=10).collect()
    )
    rebuilt = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in sim.ivf_ann_topk(emb, n_queries=10, k=10).collect()
    )
    assert served == rebuilt
    with _pytest.raises(ValueError, match="immutable"):
        sim.build_ivf_index(emb, store)
    with _pytest.raises(ValueError, match="no IVF index"):
        sim.ivf_ann_topk_from_store(spark, str(tmp_path / "nope"), queries)
    # an empty serving batch answers empty, not a numpy crash
    none = emb.filter(F.col("vec_id") < 0)
    assert sim.ivf_ann_topk_from_store(spark, store, none).count() == 0


def test_brute_force_near_dup_refuses_large_corpora(spark, sf_dir, monkeypatch):
    # the O(n^2) crossJoin is the declared oracle BASELINE; pointing it
    # at a production-sized corpus must be an explicit decision, not an
    # accident (r6: bounded-by-default)
    emb = read_table(spark, sf_dir, "embeddings")
    monkeypatch.setattr(sim, "BRUTE_FORCE_PAIR_LIMIT", 10)
    with pytest.raises(ValueError, match="oracle baseline"):
        sim.embedding_near_dup_pairs(emb, threshold=0.4)
    # explicit opt-in still works and computes the same pairs
    assert (
        sim.embedding_near_dup_pairs(
            emb.filter(F.col("vec_id") < 30), threshold=0.4, allow_quadratic_above_limit=True
        ).count()
        >= 0
    )


def test_ivf_store_external_batch_keeps_colliding_neighbor(spark, sf_dir, tmp_path):
    # exclude_self assumes query ids are corpus ids (the pinned
    # ivf_ann_topk contract); an external batch must opt out or an id
    # collision silently drops a legitimate neighbor (r6, from the r5
    # advisory). Corpus-member queries make the collision exact: with
    # exclude_self=False the vector's own corpus row (cosine 1) is the
    # rank-1 neighbor; the default drops it.
    emb = read_table(spark, sf_dir, "embeddings")
    store = str(tmp_path / "ivf")
    sim.build_ivf_index(emb, store)
    queries = emb.filter(F.col("vec_id") < 3)
    kept = sim.ivf_ann_topk_from_store(spark, store, queries, k=2, exclude_self=False)
    top1 = {r.query_id: r.neighbor_id for r in kept.collect() if r.rank == 1}
    assert top1 == {0: 0, 1: 1, 2: 2}
    dropped = sim.ivf_ann_topk_from_store(spark, store, queries, k=2)
    assert all(r.query_id != r.neighbor_id for r in dropped.collect())


def test_minhash_signature_formulations_bit_identical(spark, sf_dir):
    # the Arrow/numpy signature path must be bit-identical to the
    # explode+groupBy formulation — the incremental store's replay
    # idempotence and the LSH bucket structure both depend on it
    docs = read_table(spark, sf_dir, "documents").limit(200)
    sets_ = docs.select("doc_id", tx.shingles(F.col("text"), 3).alias("sh"))
    via_arrow = dd.minhash_signatures_from_sets(sets_).orderBy("doc_id").collect()
    via_groupby = (
        dd.minhash_signatures(index=sets_.select("doc_id", F.explode("sh").alias("s")))
        .orderBy("doc_id")
        .collect()
    )
    assert via_arrow == via_groupby


def test_null_text_docs_never_dedup_candidates(spark):
    # Pinned INTENDED semantics (r6, from the r5 advisory): hash-less
    # docs (null text) are dropped from the signature table — they
    # never pair and always survive. The explode+groupBy path this
    # replaced would have verified (10, 11) as jaccard-1 duplicates:
    # all-null signatures band to "" and array_intersect treats NULL
    # elements as equal. Contentless rows are a quality-filter concern,
    # not duplicates of each other.
    df = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f"), (10, None), (11, None)])
    pairs = {(r.doc_a, r.doc_b) for r in dd.minhash_dedup_pairs(df, 3, 0.5).collect()}
    assert pairs == {(1, 2)}
    survivors = {r.doc_id for r in dd.dedup_survivors(df, 3, 0.5).collect()}
    assert survivors == {1, 10, 11}


def test_perm_chunk_budget_admits_only_fitting_docs(monkeypatch):
    # The chunk loop must admit a doc only if the chunk INCLUDING it
    # fits the budget (r6 fix): before, a huge doc rode in behind a
    # small one (the [small, huge] shape) and built an unbounded
    # (shingles x 128) matrix. Chunking is layout-only, so every
    # budget must produce bit-identical minima.
    import numpy as _np
    import pandas as _pd

    rng = _np.random.default_rng(7)
    # shapes: small-then-oversized (the reported OOM shape), oversized
    # runs, exact-budget fits, and trailing smalls
    lens = [3, 40, 1, 37, 90, 32, 2, 31]
    arrs = [rng.integers(0, dd.HASH_P, size=n).tolist() for n in lens]
    s = _pd.Series(arrs)
    expected = dd._perm_min_matrix(s)  # default budget: one chunk
    monkeypatch.setattr(dd, "PERM_CHUNK_BUDGET", 32)
    got = dd._perm_min_matrix(s)
    assert _np.array_equal(expected, got)


@pytest.mark.slow
def test_verify_pairs_arrow_fold_bit_identical(spark, sf_dir):
    # the Arrow sequential-fold cosine kernel must admit EXACTLY the
    # pairs the JVM fold admits — near-dup oracles hash-check the
    # verified set, so a single summation-order drift at a
    # threshold-straddling pair would go red
    from outboxx_spark.dataops.similarity import _verify_pairs, _verify_pairs_jvm

    emb = read_table(spark, sf_dir, "embeddings")
    ids = emb.select(F.col("vec_id").alias("id_a"))
    cand = (
        ids.crossJoin(emb.select(F.col("vec_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    for thr in (0.3, 0.4, 0.56):
        arrow = {
            (r.id_a, r.id_b) for r in _verify_pairs(emb, cand, thr).collect()
        }
        jvm = {
            (r.id_a, r.id_b) for r in _verify_pairs_jvm(emb, cand, thr).collect()
        }
        assert arrow == jvm, thr


def test_simhash_arrow_path_bit_identical(spark, sf_dir):
    # simhash VALUES are oracle-checked (docs_simhash), so the fused
    # Arrow vote pass must never drift from the groupBy formulation
    docs = read_table(spark, sf_dir, "documents").limit(300)
    fused = {(r.doc_id, r.simhash) for r in dd.simhash(docs).collect()}
    grouped = {(r.doc_id, r.simhash) for r in dd.simhash_via_groupby(docs).collect()}
    assert fused == grouped


def test_fused_band_buckets_equal_decomposed(spark, sf_dir):
    # the fused Arrow band-bucket pass must emit exactly the rows of
    # signatures->columns->concat_ws->explode: the incremental store's
    # existing generations join on these (band, sig) values and its
    # pmod(xxhash64(band, sig)) partition pruning depends on them
    docs = read_table(spark, sf_dir, "documents").limit(200)
    sets_ = docs.select("doc_id", tx.shingles(F.col("text"), 3).alias("sh"))
    fused = {
        (r.doc_id, r.band, r.sig)
        for r in dd.lsh_band_buckets_from_sets(sets_).collect()
    }
    decomposed = {
        (r.doc_id, r.band, r.sig)
        for r in dd.lsh_band_buckets(dd.minhash_signatures_from_sets(sets_)).collect()
    }
    assert fused == decomposed
    # ...and the whole-wrapper reference path (lsh_candidate_pairs)
    # yields the same candidate pair set as the fused bucket join —
    # keeps the reference formulation live-tested, not dead code
    fused_pairs = {
        (r.doc_a, r.doc_b)
        for r in dd.lsh_bucket_pairs(dd.lsh_band_buckets_from_sets(sets_)).collect()
    }
    reference_pairs = {
        (r.doc_a, r.doc_b)
        for r in dd.lsh_candidate_pairs(dd.minhash_signatures_from_sets(sets_)).collect()
    }
    assert fused_pairs == reference_pairs


def test_combined_band_arrays_equal_bucket_rows(spark, sf_dir):
    # the one-checkpoint frame the incremental store materializes per
    # batch: posexplode(bands) must reproduce lsh_band_buckets_from_sets
    # exactly (existing store generations join on these values), and
    # hash-less docs must be KEPT with empty bands — the docs tree
    # doubles as the survivor registry, so dropping them there would
    # lose survivors
    docs = read_table(spark, sf_dir, "documents").limit(200)
    sets_ = docs.select("doc_id", tx.shingles(F.col("text"), 3).alias("sh"))
    combined = dd.lsh_band_arrays_from_sets(sets_)
    exploded = {
        (r.doc_id, r.band, r.sig)
        for r in combined.select(
            "doc_id", F.posexplode("bands").alias("band", "sig")
        ).collect()
    }
    reference = {
        (r.doc_id, r.band, r.sig)
        for r in dd.lsh_band_buckets_from_sets(sets_).collect()
    }
    assert exploded == reference
    # every input doc survives into the combined frame, sh intact
    assert combined.count() == sets_.count()
    # a null-text doc: empty bands, present in the frame
    nulls = spark.createDataFrame(
        [(1, None), (2, "real text here for shingles")], "doc_id long, text string"
    )
    nsets = nulls.select("doc_id", tx.shingles(F.col("text"), 3).alias("sh"))
    rows = {r.doc_id: r.bands for r in dd.lsh_band_arrays_from_sets(nsets).collect()}
    assert rows[1] == [] and len(rows[2]) == dd.N_MINHASHES // dd.LSH_BAND_SIZE


def test_minhash_signatures_contract_error():
    with pytest.raises(ValueError, match="pass df or index"):
        dd.minhash_signatures()


def test_simhash_band_join_equals_bruteforce(spark, sf_dir):
    # pigeonhole guarantee: banded join is exact for hamming <= 3
    docs = read_table(spark, sf_dir, "documents").limit(100)
    sigs = dd.simhash(docs)
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dd.simhash_near_pairs(sigs, 3).collect()
    }
    rows = sigs.collect()
    brute = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            d = bin(a["simhash"] ^ b["simhash"]).count("1")
            if d <= 3:
                x, y = sorted((a["doc_id"], b["doc_id"]))
                brute.add((x, y, d))
    assert banded == brute


def test_lsh_ann_recall(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ann_bruteforce_topk(emb, n_queries=5, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.lsh_ann_topk(emb, n_queries=5, k=10).collect()
    }
    # random gaussian corpus = hardest case for LSH; just require real signal
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.15, f"LSH recall collapsed: {recall}"
    # and every approx neighbor must be a genuine corpus member (sanity)
    assert all(q < 5 for q, _ in approx)


def test_ivf_ann_recall(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ann_bruteforce_topk(emb, n_queries=5, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ivf_ann_topk(emb, n_queries=5, k=10, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # probing 4/16 clusters scans ~25% of the corpus; gaussian corpus is
    # the hardest case — require real signal over random (25%)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    # determinism: same call -> same result
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ivf_ann_topk(emb, n_queries=5, k=10, n_probe=4).collect()
    }
    assert approx == again


def test_multimodal_metadata_and_decode_determinism(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(20)
    blobs = attach_blobs(docs)
    meta = blobs.select("doc_id", "media_meta.*").collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in meta:
        assert r["n_bytes"] == len(texts[r["doc_id"]].encode())
        assert r["media_type"] == "text/plain"
    f1 = {r["doc_id"]: r["features"] for r in decode_features(blobs).collect()}
    f2 = {r["doc_id"]: r["features"] for r in decode_features(blobs).collect()}
    assert f1 == f2  # deterministic
    assert all(len(v) == FEATURE_DIM for v in f1.values())


def test_frame_sample_shapes(spark):
    df = _docs(spark, [(1, "x" * 150)])
    frames = frame_sample(attach_blobs(df), every_n_bytes=64).collect()
    assert [r["frame_idx"] for r in frames] == [0, 1, 2]
    assert [len(r["frame"]) for r in frames] == [64, 64, 22]
    assert b"".join(r["frame"] for r in frames) == b"x" * 150


def test_real_decode_gate_covers_only_formats_without_a_codec():
    # r10: PNG (dataops/png.py) and baseline JPEG (dataops/jpeg.py)
    # pixel decode are ALWAYS available; the pillow gate covers only
    # formats with no pure codec. Malformed blobs of a supported format
    # must be loud (PngError / ValueError), never NotImplementedError.
    from outboxx_spark.dataops.multimodal import _pil_available
    from outboxx_spark.dataops.png import PngError

    if _pil_available():
        pytest.skip("pillow present; the gated-raise branch is unreachable")
    with pytest.raises(ValueError):
        real_image_decode(b"\xff\xd8\xff\xe0 truncated jpeg")
    with pytest.raises(PngError):
        real_image_decode(b"\x89PNG\r\n\x1a\n truncated")
    with pytest.raises(NotImplementedError):
        real_image_decode(b"RIFF\x00\x00\x00\x00WEBP no pure codec here")


def test_pixel_decode_features_on_real_png(spark):
    # Real-pixel path, runnable EVERYWHERE since r10 (pure-Python PNG
    # codec): a real gradient PNG decodes to per-band grayscale means,
    # deterministic across runs, with non-image payloads falling back
    # to byte-statistic features.
    from outboxx_spark.dataops.multimodal import _fake_decode

    import numpy as np

    from outboxx_spark.dataops.png import encode_png

    # a REAL 16x8 gradient PNG (the synth blobs carry text payloads,
    # not valid IDAT data — those exercise the corrupt-body fallback)
    px = np.arange(16 * 8, dtype=np.uint8).reshape(8, 16)
    rows = [(1, bytearray(encode_png(px))), (0, bytearray(b"plain payload"))]
    blobs = spark.createDataFrame(rows, "doc_id long, blob binary")
    feats = {
        r["doc_id"]: r["features"]
        for r in decode_features(blobs, decoder="pixel").collect()
    }
    # real pixels: 8 bands over the flattened 8x16 gradient = means of
    # consecutive 16-byte runs of 0..127
    want = [float(np.arange(i * 16, (i + 1) * 16).mean()) for i in range(8)]
    assert feats[1] == want
    # non-image payload fell back to the byte-statistic features
    assert feats[0] == list(_fake_decode(b"plain payload"))


def test_unknown_decoder_rejected():
    with pytest.raises(ValueError):
        decode_features(None, decoder="resnet")


def test_parse_image_dims_handcrafted():
    from outboxx_spark.dataops.multimodal import parse_image_dims

    # a fully valid 1x1 PNG (real encoder output, correct CRCs)
    png_1x1 = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000010000000108020000009077"
        "53de0000000c49444154789c63f8cfc0000000030001"
        "a25ad5ca0000000049454e44ae426082"
    )
    assert parse_image_dims(png_1x1) == ("image/png", 1, 1)
    # JPEG: SOI + APP0 + DQT (skipped via its length) + SOF0 with
    # height 0x0120=288, width 0x00F0=240
    jpeg = (
        bytes.fromhex("FFD8")
        + bytes.fromhex("FFE000104A46494600010100000100010000")
        + bytes.fromhex("FFDB0005" + "00" * 3)  # arbitrary skippable segment
        + bytes.fromhex("FFC00011" + "08" + "0120" + "00F0" + "03011100021101031101")
        + b"entropy-coded payload"
    )
    assert parse_image_dims(jpeg) == ("image/jpeg", 240, 288)
    # JPEG with standalone restart marker + fill bytes before SOF
    jpeg2 = (
        bytes.fromhex("FFD8") + bytes.fromhex("FFD0") + bytes.fromhex("FFFF")
        + bytes.fromhex("FFC1000B" + "08" + "0002" + "0003" + "01011100")
    )
    assert parse_image_dims(jpeg2) == ("image/jpeg", 3, 2)
    # GIF logical screen descriptor (u16 little-endian dims)
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00\x00\x00"
    assert parse_image_dims(gif) == ("image/gif", 320, 200)
    # BMP BITMAPINFOHEADER; negative height = top-down rows, dims are abs
    import struct

    bmp = (
        b"BM"
        + struct.pack("<IHHI", 70, 0, 0, 54)
        + struct.pack("<IiiHH", 40, 320, -240, 1, 24)
    )
    assert parse_image_dims(bmp) == ("image/bmp", 320, 240)
    # non-images and truncated/corrupt headers -> None
    assert parse_image_dims(b"plain text") is None
    assert parse_image_dims(b"\x89PNG\r\n\x1a\n0000IDAT") is None  # no IHDR
    assert parse_image_dims(png_1x1[:20]) is None  # truncated IHDR
    assert parse_image_dims(b"\xff\xd8junk") is None  # marker desync
    assert parse_image_dims(b"GIF89a") is None  # truncated GIF
    assert parse_image_dims(b"BM" + b"\x00" * 10) is None  # truncated BMP
    # SOF whose DECLARED length is too short (< 7) to contain
    # precision+height+width: the dimension bytes belong to the next
    # segment even when enough raw bytes trail — must reject, not read
    # past the declared boundary (r8 advisory fix)
    short_sof = bytes.fromhex("FFD8") + bytes.fromhex(
        "FFC00005" + "08" + "0120" + "00F0" + "03011100"
    )
    assert parse_image_dims(short_sof) is None


def test_synth_blobs_roundtrip_through_parser(spark, sf_dir):
    # the oracle checks this arithmetically; pin it directly too — the
    # parsed dimensions must equal the formulas the blobs were built
    # from, for every media kind
    from outboxx_spark.dataops.multimodal import media_metadata, synth_media_blobs

    docs = read_table(spark, sf_dir, "documents").limit(30)
    meta = media_metadata(synth_media_blobs(docs)).collect()
    assert {r["media_type"] for r in meta} == {
        "application/octet-stream", "image/png", "image/jpeg",
    }
    for r in meta:
        kind = r["doc_id"] % 3
        if kind == 0:
            assert r["width"] is None and r["height"] is None
        else:
            assert r["width"] == 16 + r["doc_id"] % 240
            assert r["height"] == 16 + (r["doc_id"] * 3) % 240
    # output conforms to the declared metadata schema columns
    out_cols = media_metadata(synth_media_blobs(docs)).columns
    from outboxx_spark.dataops.multimodal import MEDIA_META_SCHEMA

    assert [f.name for f in MEDIA_META_SCHEMA] == [c for c in out_cols if c != "doc_id"]


def test_lang_id_deterministic_argmax(spark):
    df = _docs(spark, [(1, "the the der und die la"), (2, "el la y de es si")])
    out = {r["doc_id"]: r["pred_lang"] for r in tx.lang_id(df).collect()}
    # doc 1: de=3 (der,und,die) > en=2 -> de; doc 2: es wins
    assert out[1] == "de"
    assert out[2] == "es"


def test_embedding_near_dup_lsh_matches_exact(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in sim.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in sim.embedding_near_dup_pairs_lsh(emb, threshold=0.4).collect()
    }
    # candidates are exact-verified, so no false positives; seeded planes
    # give recall 1.0 on this corpus
    assert lsh == exact and exact


def test_embedding_near_dup_ivf_prunes_with_bounded_recall(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in sim.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    ivf = {
        (r["id_a"], r["id_b"])
        for r in sim.embedding_near_dup_pairs_ivf(emb, threshold=0.4).collect()
    }
    # exact verification of candidates -> no false positives ever
    assert ivf <= exact
    # blocking recall is corpus-dependent; pin the measured floor so a
    # regression in centroid training or assignment ties shows up
    assert len(ivf) >= 0.9 * len(exact) and exact


def test_embedding_near_dup_ivf_never_crossjoins(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    plan = (
        sim.embedding_near_dup_pairs_ivf(emb, threshold=0.4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_ngram_max_df_drops_hot_shingle_pairs(spark):
    # Two docs that overlap ONLY through one ubiquitous shingle; with the
    # hot shingle present in every doc, df-capping removes it and the
    # spurious pair disappears while the genuine near-dup pair survives.
    hot = "the quick fox"
    docs = [
        (1, "alpha beta gamma delta " + hot),
        (2, "alpha beta gamma delta epsilon " + hot),  # true near-dup of 1
        (3, "zeta eta theta iota " + hot),             # overlaps 1/2 only via hot
        (4, "kappa lambda mu nu " + hot),
    ]
    df = _docs(spark, docs)
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in dd.ngram_jaccard_pairs(df, 3, 0.1, max_df=None).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dd.ngram_jaccard_pairs(df, 3, 0.1, max_df=3).collect()
    }
    # the hot-shingle-only connections are gone, the real pair remains
    assert (1, 2) in capped
    assert capped < uncapped


def test_ngram_max_df_cap_is_broadcast_anti_join(spark, sf_dir):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        # inspect shingle_index directly: ngram_jaccard_pairs now
        # materializes the index once (both self-join sides), so the
        # anti join executes at build and the composed plan shows only
        # the checkpointed scan — the guarded property lives here
        dd.shingle_index(
            read_table(spark, sf_dir, "documents"), max_df=dd.NGRAM_MAX_DF
        ).explain("formatted")
    plan = buf.getvalue()
    # the drop-list side broadcasts; the capped index never shuffles on it
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# curation operators
# ---------------------------------------------------------------------------


def test_pii_redaction_patterns(spark):
    from outboxx_spark.dataops import curation as cu

    df = spark.createDataFrame(
        [(1, "mail a.b-c_9@sub.domain.io and 10.255.0.1 and 555-867-5309 ok 1.2 v2.5.1")],
        "doc_id long, text string",
    )
    out = cu.pii_redact(df).collect()[0]["clean_text"]
    assert "<EMAIL>" in out and "<IP>" in out and "<PHONE>" in out
    # version-ish number and a bare decimal survive (no over-redaction)
    assert "1.2" in out and "v2.5.1" in out


def test_stratified_sample_deterministic_and_stratified(spark, sf_dir):
    from outboxx_spark.dataops import curation as cu

    docs = read_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in cu.stratified_sample(docs, {"en": 0.5}).collect()}
    b = {r["doc_id"] for r in cu.stratified_sample(docs, {"en": 0.5}).collect()}
    assert a == b and a  # same rows every run
    # zero-rate strata vanish entirely
    langs = {r["lang"] for r in cu.stratified_sample(docs, {"en": 0.5}).select("lang").collect()}
    assert langs == {"en"}
    # rate 1.0 keeps the whole stratum
    n_en = docs.filter("lang = 'en'").count()
    assert cu.stratified_sample(docs, {"en": 1.0}).count() == n_en


def test_weighted_mix_copy_semantics(spark, sf_dir):
    from outboxx_spark.dataops import curation as cu

    docs = read_table(spark, sf_dir, "documents")
    out = cu.weighted_mix(docs, {"src0": 3.0, "src1": 1.0})
    per_doc = {
        (r["doc_id"]): r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    for doc_id, n in per_doc.items():
        assert n == (3 if src[doc_id] == "src0" else 1)
    # fractional weight keeps a deterministic strict subset
    part = cu.weighted_mix(docs, {"src0": 0.5}).count()
    full = docs.filter("source = 'src0'").count()
    assert 0 < part < full


@pytest.mark.slow
def test_dup_clusters_transitive(spark):
    from outboxx_spark.dataops import curation as cu

    # chain 1-2-3 plus isolated pair (7,9): min-label must propagate
    # across the chain even though (1,3) is not a pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in cu.dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


@pytest.mark.slow
def test_dup_clusters_deep_chain_contracts(spark):
    # a 40-node chain (diameter 39 > the 25-round propagation budget)
    # must converge via the star-contraction fallback and still match
    # the transitive closure: every node labeled with the chain min
    from outboxx_spark.dataops import curation as cu

    chain = [(i, i + 1) for i in range(100, 140)]
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    out = {r["doc_id"]: r["cluster_id"] for r in cu.dup_clusters(pairs).collect()}
    assert out == {i: 100 for i in range(100, 141)}
    # the pre-r7 fail-stop remains available for shallow-graph
    # invariants. Since the r9 pointer-jumping change, distance covered
    # grows ~2^rounds (this 40-hop chain converges within the default
    # max_iter=25), so the unconverged state needs a deliberately low
    # bound: 3 rounds cover ~14 hops < 40.
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="not certified converged"):
        cu.dup_clusters(pairs, max_iter=3, on_unconverged="raise")


@pytest.mark.slow
def test_star_contraction_matches_union_find(spark):
    # randomized graphs (chains, stars, cliques, forests) against a
    # driver-side union-find: the contraction path must agree exactly
    import random

    from outboxx_spark.dataops import curation as cu

    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(2, 60)
        edges = {
            tuple(sorted(rng.sample(range(1000, 1000 + n), 2)))
            for _ in range(rng.randint(1, 2 * n))
        }
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in parent}
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], "doc_a long, doc_b long"
        )
        both = pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in cu._star_contraction_labels(both).collect()
        }
        assert got == expected, f"trial {trial}"


@pytest.mark.slow
def test_seeded_fallback_on_multi_component_deep_graph(spark):
    # r8: the fallback contracts the LABEL QUOTIENT graph (reusing the
    # propagation rounds) instead of the raw edges. Pin the member ->
    # label -> root mapping across multiple components: two deep
    # chains plus one isolated pair, so quotient edges, the left-join
    # root recovery, AND rootless singleton label groups all occur.
    from outboxx_spark.dataops import curation as cu

    rows = (
        [(i, i + 1) for i in range(0, 40)]          # chain A: 0..40
        + [(i, i + 1) for i in range(100, 140)]     # chain B: 100..140
        + [(500, 501)]                               # isolated pair
    )
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cu.dup_clusters(pairs, max_iter=2, on_unconverged="contract").collect()
    }
    want = (
        {i: 0 for i in range(0, 41)}
        | {i: 100 for i in range(100, 141)}
        | {500: 500, 501: 500}
    )
    assert got == want


def test_star_contraction_labels_self_pair_only_nodes(spark):
    # A node whose only pair is a self-pair has no src<dst edge, but
    # the propagation path and the recursive-CTE oracle both label it
    # as its own singleton cluster — the fallback must agree instead
    # of silently dropping it (r8 advisory fix). Latent for this
    # repo's generators (they enforce doc_a < doc_b); pinned for
    # external callers.
    from outboxx_spark.dataops import curation as cu

    edges = spark.createDataFrame(
        # 7 is self-pair-only; 3 has a self-pair AND a real edge
        [(7, 7), (3, 3), (1, 3), (3, 1)],
        "src long, dst long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cu._star_contraction_labels(edges).collect()
    }
    assert got == {7: 7, 1: 1, 3: 1}


def test_mm_metadata_oracle_agrees_on_negative_doc_ids(spark):
    # Spark's pmod() is sign-safe while DuckDB's % follows the
    # dividend's sign: for a negative doc_id the two engines used to
    # pick DIFFERENT media kinds for the same row (r8 advisory fix —
    # the oracle now mirrors pmod as ((x % k) + k) % k). Latent for
    # the driver corpus (non-negative ids); pinned here with a
    # negative-id frame through BOTH engines.
    import duckdb
    import pandas as pd_

    from outboxx_spark.dataops import multimodal as mm

    rows = [(i, f"doc text number {i}") for i in range(-7, 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["media_type"], r["width"], r["height"], r["digest"])
        for r in mm.media_metadata(mm.synth_media_blobs(docs)).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd_.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        doc_id: (mt, w, h, dg)
        for doc_id, mt, _n, dg, w, h in con.execute(mm.MM_METADATA_SQL).fetchall()
    }
    assert got == want


def test_repetition_counts_hand_checked(spark):
    from outboxx_spark.dataops import curation as cu

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: (r["n_grams"], r["n_distinct"], r["top_count"])
            for r in cu.repetition_features(df, n=2).collect()}
    # bigrams of doc 1: "a b","b a","a b","b c" -> 4 total, 3 distinct, top=2
    assert rows[1] == (4, 3, 2)
    assert rows[2] == (0, 0, 0)  # shorter than n


@pytest.mark.slow
def test_edit_distance_pairs_matches_bruteforce(spark):
    """Prefix-filter completeness: a synthetic corpus with typo'd
    copies, padded variants, and unrelated docs must yield exactly the
    brute-force levenshtein pair set."""
    from outboxx_spark.dataops.editdist import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy dog while counting stars"
    docs = [
        (0, base),
        (1, base.replace("quick", "quack")),          # dist 2
        (2, base.replace("brown fox", "brwn fx") + "!!"),  # few edits
        (3, "completely different content about spark shuffles and joins here"),
        (4, base + " again and again"),               # dist > 8 via suffix
        (5, "a" * 40),
        (6, "a" * 36 + "bbbb"),                        # dist 4 vs doc 5
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b, r.dist)
        for r in edit_distance_pairs(df, d=8).collect()
    }
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(docs, 2)
        if lev(a, b) <= 8
    }
    assert got == want and len(want) >= 2


@pytest.mark.slow
def test_edit_distance_short_doc_bucket(spark):
    """Docs below the count-filter bound (len <= d*q + q - 1) can be
    within distance d WITHOUT sharing any q-gram — the short bucket
    must still pair them."""
    from outboxx_spark.dataops.editdist import edit_distance_pairs

    # len 8 each, ed = 8 (all substitutions), zero shared 3-grams
    df = spark.createDataFrame(
        [(0, "abcdefgh"), (1, "ijklmnop"), (2, "x" * 200)],
        ["doc_id", "text"],
    )
    got = {(r.doc_a, r.doc_b, r.dist) for r in edit_distance_pairs(df, d=8).collect()}
    assert got == {(0, 1, 8)}


def test_positional_grams_empty_for_subgram_docs(spark):
    """Docs shorter than q must emit ZERO grams — Spark's sequence()
    counts DOWN when stop < start, so the unguarded form emitted
    phantom grams that poisoned the global frequency table."""
    from pyspark.sql import functions as F

    from outboxx_spark.dataops.editdist import _positional_grams

    df = spark.createDataFrame([(0, "ab"), (1, ""), (2, "abc")], ["doc_id", "text"])
    docs = df.select("doc_id", "text", F.length("text").alias("len"))
    rows = _positional_grams(docs, 3, "doc_id", "text").collect()
    assert [(r.doc_id, r.g) for r in rows] == [(2, "abc")]

@pytest.mark.slow
def test_edit_distance_salted_path_equals_default(spark):
    """n_salt only changes task placement, never the pair set: the
    salted join must emit exactly the unsalted result (each pair once,
    no duplicates from the S-fold side-B fan-out)."""
    from outboxx_spark.dataops.editdist import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy dog while counting stars"
    docs = [
        (0, base),
        (1, base.replace("quick", "qwick")),
        (2, base + " tonight"),
        (3, "completely unrelated content about parquet row groups"),
        (4, base.replace("lazy", "hazy").replace("fox", "fax")),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    plain = sorted(
        (r.doc_a, r.doc_b, r.dist) for r in edit_distance_pairs(df, d=8).collect()
    )
    salted = sorted(
        (r.doc_a, r.doc_b, r.dist)
        for r in edit_distance_pairs(df, d=8, n_salt=8).collect()
    )
    assert plain == salted and plain  # identical and non-empty


def test_unigram_lm_scores_match_python_model(spark):
    """Hand model: add-one-smoothed unigram log-probs with a min_df=2
    vocab, quantized to micro-nats exactly as the operator does."""
    import math

    rows = [
        (1, "a a b"),        # a: df 2, b: df 2 -> both in vocab
        (2, "a b zz"),       # zz: df 1 -> OOV
        (3, "c"),            # c: df 1 -> OOV, whole doc OOV
    ]
    occ = [(d, t) for d, txt in rows for t in txt.split()]
    from collections import Counter

    n_tok = Counter(t for _, t in occ)
    df_ = {t: len({d for d, tt in occ if tt == t}) for t in n_tok}
    vocab = {t: n for t, n in n_tok.items() if df_[t] >= 2}
    denom = len(occ) + len(vocab) + 1
    def lp_micro(t):
        return round(math.log((vocab.get(t, 0) + 1.0) / denom) * 1e6)
    want = {}
    for d, txt in rows:
        ts = txt.split()
        oov = sum(1 for t in ts if t not in vocab)
        want[d] = (
            len(ts),
            round(oov / len(ts), 6),
            round(sum(lp_micro(t) for t in ts) / len(ts) / 1e6, 6),
        )
    got = {
        r["doc_id"]: (r["n_tokens"], r["oov_rate"], r["avg_logprob"])
        for r in tx.unigram_lm_scores(_docs(spark, rows)).collect()
    }
    assert got == want


def test_unigram_lm_scores_match_duckdb_mirror(spark, sf_dir):
    """The Spark operator and its DuckDB SQL mirror must agree row-for-
    row on the real documents table (the r5 promotion contract)."""
    import duckdb

    sdf = {
        r["doc_id"]: (r["n_tokens"], r["oov_rate"], r["avg_logprob"])
        for r in tx.unigram_lm_scores(
            read_table(spark, sf_dir, "documents")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    odf = {
        int(r[0]): (int(r[1]), float(r[2]), float(r[3]))
        for r in con.execute(tx.unigram_lm_scores_sql()).fetchall()
    }
    assert sdf == odf


def test_diversity_sample_quota_and_determinism(spark, sf_dir):
    """Per-cluster quota is exactly ceil(fraction * cluster_size), the
    selection is closest-to-centroid-first, and two runs agree."""
    import math

    emb = read_table(spark, sf_dir, "embeddings")
    out = sim.diversity_sample(emb, fraction=0.25).collect()
    sizes = {
        r["cluster"]: r["cluster_size"]
        for r in sim.kmeans_assignments(emb).select("cluster", "cluster_size").distinct().collect()
    }
    per_cluster = {}
    for r in out:
        per_cluster.setdefault(r["cluster"], []).append(r["keep_rank"])
    for c, ranks in per_cluster.items():
        quota = math.ceil(0.25 * sizes[c])
        assert sorted(ranks) == list(range(1, quota + 1))
    again = sim.diversity_sample(emb, fraction=0.25).collect()
    assert {(r["vec_id"], r["cluster"], r["keep_rank"]) for r in out} == {
        (r["vec_id"], r["cluster"], r["keep_rank"]) for r in again
    }


def _diversity_mirror_case(spark, sf_dir, fraction):
    import os

    import duckdb

    emb = read_table(spark, sf_dir, "embeddings")
    got = {
        (r["vec_id"], r["cluster"], r["keep_rank"])
        for r in sim.diversity_sample(emb, fraction=fraction).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    try:
        want = {
            (int(a), int(b), int(c))
            for a, b, c in con.execute(sim.diversity_sample_sql(fraction=fraction)).fetchall()
        }
    finally:
        del os.environ["SPARK_GRAFT_ORACLE_SF_DIR"]
    assert got == want, f"fraction={fraction!r}"


def test_diversity_sample_matches_duckdb_mirror(spark, sf_dir):
    """Spark operator vs its SQL mirror, row-for-row on the real
    embeddings table (the r5 promotion contract)."""
    _diversity_mirror_case(spark, sf_dir, 0.25)


def test_diversity_sample_mirror_non_default_fractions(spark, sf_dir):
    """Non-default fractions whose literals are NOT exactly
    representable in binary (0.3) or in any finite decimal (1/3): the
    mirror's quota must come from the same float64 the Spark side
    multiplies by — a decimal-typed fraction literal would ceil a
    different product at quota-boundary cluster sizes (r6, closing the
    r4 advisory)."""
    _diversity_mirror_case(spark, sf_dir, 0.3)
    _diversity_mirror_case(spark, sf_dir, 1 / 3)


def _bpe_python(corpus_texts, n_merges, min_pair_count=2):
    """From-scratch Sennrich-style BPE on word frequencies: overlapping
    pair counts, greedy left-to-right merge, (count desc, a, b) ties."""
    from collections import Counter

    words = Counter(w for t in corpus_texts for w in t.split() if w)
    vocab = {tuple(w): n for w, n in words.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference(spark):
    from outboxx_spark.dataops import bpe

    texts = [
        "low lower lowest low low",
        "new newer newest new news",
        "wide wider widest low new",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = bpe.bpe_train(_docs(spark, rows), n_merges=8)
    want = _bpe_python(texts, n_merges=8)
    assert got == want


def test_bpe_train_and_segment_on_corpus(spark, sf_dir):
    """Real documents table: rules reproduce across runs, and segment
    pieces always reconstruct the original token."""
    from outboxx_spark.dataops import bpe

    docs = read_table(spark, sf_dir, "documents").limit(200)
    merges = bpe.bpe_train(docs, n_merges=5)
    assert merges == bpe.bpe_train(docs, n_merges=5)
    # the driver-local merge rounds (auto on this vocab) and the
    # distributed per-round loop must agree on real corpus text
    assert merges == bpe.bpe_train(docs, n_merges=5, mode="distributed")
    assert len(merges) == 5
    # the fault-tolerant tier (vocab DISK_ONLY-persisted with lineage
    # intact, the 1000-executor profile) must train identical rules on
    # both paths (r6: vocab routed through dedup.CORPUS_MATERIALIZE)
    prev = dd.CORPUS_MATERIALIZE
    dd.CORPUS_MATERIALIZE = "persist"
    try:
        assert merges == bpe.bpe_train(docs, n_merges=5, mode="driver")
        assert merges == bpe.bpe_train(docs, n_merges=5, mode="distributed")
    finally:
        dd.CORPUS_MATERIALIZE = prev
    seg = bpe.bpe_segment(docs, merges).limit(500)
    bad = seg.filter(
        F.concat_ws("", F.col("pieces")) != F.col("token")
    ).count()
    assert bad == 0
    # at least one rule actually fires on the corpus
    merged_tok = "".join(merges[0])
    assert seg.filter(F.array_contains("pieces", merged_tok)).count() > 0


def test_bpe_persist_tier_plan_depth_bounded(spark, monkeypatch):
    """Persist-tier regression (r7 ADVICE): DISK_ONLY persist keeps
    lineage, so without the periodic hard cut each merge round nested
    another fold and 10^4-merge runs would grow Catalyst analysis cost
    per round (eventually a driver StackOverflow). Pin the mechanism
    (hard_cut truncates the plan; plain persist does not) and run a
    training crossing several hard cuts with the constants shrunk."""
    from outboxx_spark.dataops import bpe

    prev = dd.CORPUS_MATERIALIZE
    dd.CORPUS_MATERIALIZE = "persist"
    try:
        base = spark.createDataFrame(
            [(["a", "b"], 3)], "syms array<string>, n long"
        )
        deep = bpe._materialize_vocab(base)
        for _ in range(10):
            deep = deep.select(F.col("syms"), (F.col("n") + 0).alias("n"))
        depth_before = deep._jdf.queryExecution().logical().toString().count("\n")
        kept = bpe._materialize_vocab(deep)
        assert (
            kept._jdf.queryExecution().logical().toString().count("\n")
            >= depth_before
        ), "plain persist should keep lineage (recompute-from-scan tier)"
        cut = bpe._materialize_vocab(deep, hard_cut=True)
        assert (
            cut._jdf.queryExecution().logical().toString().count("\n") < 3
        ), "hard cut must truncate the logical plan"
        # end-to-end: shrink the cadence so 8 rounds cross 4 hard cuts;
        # rules must match the driver-local reference exactly
        monkeypatch.setattr(bpe, "_LINEAGE_CUT", 1)
        monkeypatch.setattr(bpe, "_PERSIST_CUT_FACTOR", 2)
        texts = ["low lower lowest low low", "new newer newest new news"]
        docs = _docs(spark, [(i, t) for i, t in enumerate(texts)])
        got = bpe.bpe_train(docs, n_merges=8, mode="distributed")
        assert got == _bpe_python(texts, n_merges=8)
    finally:
        dd.CORPUS_MATERIALIZE = prev


@pytest.mark.parametrize(
    "texts",
    [
        ["aaaa aaa aa a"],                      # overlapping self-pair (a,a)
        ["ab ab ba ba"],                        # exact tie -> (a,b) < (b,a)
        ["abc abc ab bc c"],                    # chained rules share symbols
        ["x"],                                  # single 1-char word: no pairs
        ["aa aa bb bb"],                        # two pairs, count tie
    ],
)
def test_bpe_edge_cases_match_python_reference(spark, texts):
    from outboxx_spark.dataops import bpe

    rows = [(i, t) for i, t in enumerate(texts)]
    got = bpe.bpe_train(_docs(spark, rows), n_merges=4, min_pair_count=1)
    want = _bpe_python(texts, n_merges=4, min_pair_count=1)
    assert got == want


def test_ngram_pairs_apply_default_df_cap(spark):
    """The production default max_df=NGRAM_MAX_DF must actually reach
    the index: two docs connected ONLY through a shingle present in
    more than NGRAM_MAX_DF documents pair under max_df=None but not
    under the default (the pair exists solely via the capped shingle)."""
    hot = "h1 h2 h3"  # one shingle at k=3
    filler = [(100 + i, f"{hot} f{i}a f{i}b f{i}c") for i in range(dd.NGRAM_MAX_DF)]
    # doc 1/2: share ONLY the hot shingle; their other shingles disjoint
    probe = [(1, f"{hot} x1 x2 x3 x1 x2"), (2, f"{hot} y1 y2 y3 y1 y2")]
    df = _docs(spark, probe + filler)
    lo_thresh = 0.01  # any shared shingle qualifies the pair
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in dd.ngram_jaccard_pairs(df, threshold=lo_thresh, max_df=None).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in dd.ngram_jaccard_pairs(df, threshold=lo_thresh).collect()
    }
    assert (1, 2) in uncapped
    assert (1, 2) not in capped


def test_conf_override_restores_on_exception(spark):
    from outboxx_spark.dataops.util import conf_override

    key = "spark.sql.adaptive.enabled"
    before = spark.conf.get(key)
    with pytest.raises(RuntimeError, match="boom"):
        with conf_override(spark, key, "false"):
            assert spark.conf.get(key) == "false"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before
    # unknown-before keys are unset again, not left behind
    k2 = "spark.outboxx.test.ephemeral"
    with conf_override(spark, k2, "1"):
        assert spark.conf.get(k2) == "1"
    with pytest.raises(Exception):
        spark.conf.get(k2)


def test_media_metadata_null_blob_is_unknown_not_crash(spark):
    from outboxx_spark.dataops.multimodal import media_metadata

    df = spark.createDataFrame(
        [(1, None), (2, bytearray(b"hello"))], "doc_id long, blob binary"
    )
    rows = {r.doc_id: r for r in media_metadata(df).collect()}
    assert rows[1].media_type == "application/octet-stream"
    assert rows[1].width is None and rows[1].n_bytes is None
    assert rows[2].media_type == "application/octet-stream"
    assert rows[2].n_bytes == 5


def test_per_source_cap_exact_and_deterministic(spark):
    import outboxx_spark.dataops.curation as cu

    rows = [(i, f"s{i % 4}" if i < 80 else "hot") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # hot: 120 docs, s0-s3: 20 each; cap 30 -> only hot is capped
    out = cu.per_source_cap(df, cap=30)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"s0": 20, "s1": 20, "s2": 20, "s3": 20, "hot": 30}
    # deterministic + partition-invariant survivor SET
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in cu.per_source_cap(df.repartition(13), cap=30).collect()}
    assert a == b


def test_per_source_cap_survivors_stable_as_corpus_grows(spark):
    # re-capping a grown corpus keeps prior survivors whose hash rank
    # still clears the cap window — the property that makes incremental
    # re-runs append-mostly instead of reshuffling the whole mix
    import outboxx_spark.dataops.curation as cu

    small = spark.createDataFrame(
        [(i, "hot") for i in range(40)], "doc_id long, source string"
    )
    grown = spark.createDataFrame(
        [(i, "hot") for i in range(80)], "doc_id long, source string"
    )
    keep_small = {r["doc_id"] for r in cu.per_source_cap(small, cap=25).collect()}
    keep_grown = {r["doc_id"] for r in cu.per_source_cap(grown, cap=25).collect()}
    # survivors of the grown run that existed in the small corpus must
    # be survivors of the small run too (hash order is global, so the
    # grown top-25 among ids 0..79 restricted to 0..39 is a PREFIX of
    # the small top-25 in hash order)
    assert (keep_grown & set(range(40))) <= keep_small


def test_per_source_cap_plan_windows_only_overcap_sources(spark):
    # the under-cap majority must bypass the sort: the plan's window
    # sits behind a semi join, and the anti/semi sides broadcast
    import outboxx_spark.dataops.curation as cu

    df = spark.createDataFrame(
        [(i, f"s{i % 50}" if i < 500 else "hot") for i in range(700)],
        "doc_id long, source string",
    )
    plan = cu.per_source_cap(df, cap=50)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # exactly one Window operator (over the semi-joined minority), and
    # Spark's rank-limit pushdown (WindowGroupLimit, partial+final)
    # engaged — the map side already drops rows past the cap, so the
    # per-source sort shuffles at most ~cap rows per source
    assert plan.count("Window [") == 1
    assert "WindowGroupLimit" in plan and ", Partial" in plan
