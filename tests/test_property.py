"""Property-based tests (hypothesis): pgoutput encode/decode round-trips
over arbitrary values, envelope JSON parse-back fidelity, LSN text-form
inverse. The reference has no randomized layer (SURVEY §5 notes the
gap); these pin the decode/serialize contracts over the full value
space, not just the fixtures."""

from __future__ import annotations

import pytest

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from outboxx_spark.config import TOAST_PLACEHOLDER
from outboxx_spark.sources.pgoutput import (
    OID_TEXT,
    PgOutputDecoder,
    encode_begin,
    encode_insert,
    encode_relation,
    encode_tuple,
    encode_update,
)

# text values that survive the text protocol (no NUL, no lone surrogates —
# not representable in UTF-8, and Postgres text can't hold them either;
# pgoutput values are length-prefixed so everything else is fair game,
# incl. newlines/unicode)
pg_text = st.text(
    alphabet=st.characters(
        blacklist_characters="\x00",
        blacklist_categories=("Cs",),
        max_codepoint=0x10FFFF,
    ),
    max_size=200,
)
col_value = st.one_of(st.none(), pg_text, st.just(...))  # null / text / TOAST
ident = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127),
    min_size=1,
    max_size=30,
).filter(lambda s: not s[0].isdigit())


@settings(max_examples=200, deadline=None)
@given(values=st.lists(col_value, min_size=1, max_size=12), rid=st.integers(1, 2**31 - 1))
def test_insert_roundtrip_any_values(values, rid):
    cols = [(f"c{i}", OID_TEXT) for i in range(len(values))]
    d = PgOutputDecoder()
    d.decode(1, encode_relation(rid, "public", "t", cols))
    d.decode(2, encode_begin(2, 0, 1))
    ev = d.decode(3, encode_insert(rid, values))
    for i, v in enumerate(values):
        got = ev["data"][f"c{i}"]
        if v is None:
            assert got is None
        elif v is ...:
            assert got == TOAST_PLACEHOLDER
        else:
            assert got == v


@settings(max_examples=100, deadline=None)
@given(
    new=st.lists(pg_text, min_size=1, max_size=6),
    ns=ident,
    rel=ident,
)
def test_update_roundtrip_with_old(new, ns, rel):
    cols = [(f"c{i}", OID_TEXT) for i in range(len(new))]
    old = [v + "_old" for v in new]
    d = PgOutputDecoder()
    d.decode(1, encode_relation(7, ns, rel, cols))
    d.decode(2, encode_begin(2, 0, 1))
    ev = d.decode(3, encode_update(7, new, old=old))
    assert ev["resource"] == f"{ns}.{rel}"
    assert list(ev["data"].values()) == new
    assert list(ev["old"].values()) == old


@settings(max_examples=200, deadline=None)
@given(values=st.lists(col_value, min_size=0, max_size=10))
def test_tuple_never_misparses_prefix(values):
    """Any truncation of a valid tuple either parses fewer columns or
    raises — never silently yields wrong values."""
    from outboxx_spark.sources.pgoutput import PgOutputError, _Reader, _decode_tuple

    full = encode_tuple(values)
    r = _Reader(full)
    decoded = _decode_tuple(r)
    assert len(decoded) == len(values)
    for cut in range(len(full) - 1, max(len(full) - 6, 1), -1):
        try:
            _decode_tuple(_Reader(full[:cut]))
        except PgOutputError:
            pass  # raising is the contract


@settings(max_examples=100, deadline=None)
@given(lsn=st.integers(0, 2**63 - 1))
def test_lsn_text_form_is_invertible(lsn):
    hi, lo = lsn >> 32, lsn & 0xFFFFFFFF
    text = f"{hi:X}/{lo:X}"
    assert (int(text.split("/")[0], 16) << 32) + int(text.split("/")[1], 16) == lsn


def test_envelope_escaping_over_generated_corpus(spark):
    """Spark-side property check in one job: envelope JSON parses back
    identically for a hypothesis-style adversarial string corpus
    (quotes, backslashes, control chars, unicode, emoji, newlines)."""
    corpus = [
        'plain', 'with "quotes"', "back\\slash", "new\nline", "tab\there",
        "ctrl\x01\x02\x1f", "unicode ünïcødé", "emoji 🎉🔥", "</script>",
        "{\"nested\": \"json\"}", " spaces  ", "0/1", "", "'single'",
    ]
    from outboxx_spark.functions.envelope import serialize_feed

    df = spark.createDataFrame(
        [("INSERT", "public.t", i, 100, s) for i, s in enumerate(corpus)],
        "op string, resource string, lsn long, commit_ts long, name string",
    )
    out = serialize_feed(df, ["name"]).collect()
    for r in out:
        parsed = json.loads(r["value"])  # every envelope is valid RFC 8259
        assert parsed["data"]["name"] == corpus[r["lsn"]]


@settings(max_examples=4, deadline=None)
@given(
    texts=st.lists(st.text(alphabet="ab ", max_size=60), min_size=2, max_size=12),
    d=st.sampled_from([2, 4, 8]),
)
@pytest.mark.slow
def test_edit_distance_blocking_is_complete(spark, texts, d):
    """The q-gram count/prefix blocking must emit EXACTLY the brute-force
    pair set for arbitrary corpora — a tiny alphabet forces gram
    collisions, lengths 0..60 straddle the short-doc boundary
    (d*q+q-1), and duplicate texts exercise dist=0 pairs. This is the
    randomized counterpart of the fixed-corpus test in test_dataops."""
    from outboxx_spark.dataops.editdist import edit_distance_pairs

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    expected = {
        (i, j, lev(texts[i], texts[j]))
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if lev(texts[i], texts[j]) <= d
    }
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, r.dist)
        for r in edit_distance_pairs(df, d=d).collect()
    }
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from([None, "r1", "r2"]),   # resource (first key col, nullable)
            st.integers(0, 15),                     # user_id
            st.booleans(),                          # present in old
            st.booleans(),                          # present in new
            st.integers(0, 2),                      # old value
            st.integers(0, 2),                      # new value
        ),
        min_size=1,
        max_size=25,
    )
)
def test_snapshot_diff_matches_dict_model(spark, rows):
    """snapshot_diff must equal the obvious dict-diff model for ANY
    membership/value pattern, including NULL first-key rows."""
    from outboxx_spark.operators.materialize import snapshot_diff

    old_map, new_map = {}, {}
    for res, uid, in_old, in_new, vo, vn in rows:
        key = (res, uid)
        if key in old_map or key in new_map:
            continue  # first writer wins; keys must be unique per side
        if in_old:
            old_map[key] = float(vo)
        if in_new:
            new_map[key] = float(vn)
    expected = {}
    for key in set(old_map) | set(new_map):
        if key not in old_map:
            expected[key] = "INSERT"
        elif key not in new_map:
            expected[key] = "DELETE"
        elif old_map[key] != new_map[key]:
            expected[key] = "UPDATE"
    cols = "resource string, user_id long, value double"
    old_df = spark.createDataFrame(
        [(r, u, v) for (r, u), v in old_map.items()] or [(None, -1, 0.0)], cols
    )
    new_df = spark.createDataFrame(
        [(r, u, v) for (r, u), v in new_map.items()] or [(None, -1, 0.0)], cols
    )
    if not old_map:
        old_df = old_df.filter("user_id >= 0")
    if not new_map:
        new_df = new_df.filter("user_id >= 0")
    got = {
        (r["resource"], r["user_id"]): r["change_op"]
        for r in snapshot_diff(old_df, new_df, compare_cols=("value",)).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(st.text(alphabet="ab ", min_size=1, max_size=40), min_size=1, max_size=10),
    n_merges=st.sampled_from([3, 6]),
)
@pytest.mark.slow
def test_bpe_train_matches_model_on_arbitrary_corpora(spark, texts, n_merges):
    """Spark BPE training must equal the from-scratch Python model on
    arbitrary tiny-alphabet corpora: 'ab '-only text forces heavy pair
    collisions, repeated merges of self-pairs (a,a), and count ties —
    the adversarial surface of the greedy algorithm."""
    from outboxx_spark.dataops.bpe import bpe_train

    from tests.test_dataops import _bpe_python

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # force the distributed per-round loop: auto mode would take the
    # driver path on these tiny vocabs and leave the loop untested
    got = bpe_train(df, n_merges=n_merges, min_pair_count=1, mode="distributed")
    want = _bpe_python(texts, n_merges=n_merges, min_pair_count=1)
    assert got == want
    assert bpe_train(df, n_merges=n_merges, min_pair_count=1, mode="driver") == want


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(st.text(alphabet="abc ", min_size=1, max_size=40), min_size=1, max_size=10),
)
def test_unigram_lm_matches_model_on_arbitrary_corpora(spark, texts):
    """unigram_lm_scores must equal the pure-Python add-one-smoothed
    model (micro-nat quantization included) on arbitrary corpora —
    empty-token edge cases, whole-doc OOV, and min_df boundary hits.

    The model must replicate Spark's ROUND semantics exactly: F.round
    is HALF_UP over the double's shortest decimal repr (BigDecimal),
    while Python's round() is half-even — they disagree at exact .5
    boundaries (hypothesis found mean micro-nat sums ending in .5)."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from outboxx_spark.dataops.text import unigram_lm_scores

    def r(x: float, nd: int) -> float:
        return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))

    def r0(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))

    occ = [(i, t) for i, txt in enumerate(texts) for t in txt.split(" ") if t]
    want = {}
    if occ:
        n_tok = Counter(t for _, t in occ)
        df_ = {t: len({d for d, tt in occ if tt == t}) for t in n_tok}
        vocab = {t: n for t, n in n_tok.items() if df_[t] >= 2}
        denom = len(occ) + len(vocab) + 1
        for d in {d for d, _ in occ}:
            ts = [t for dd, t in occ if dd == d]
            lps = [r0(math.log((vocab.get(t, 0) + 1.0) / denom) * 1e6) for t in ts]
            oov = sum(1 for t in ts if t not in vocab)
            want[d] = (
                len(ts),
                r(oov / len(ts), 6),
                r(sum(lps) / len(ts) / 1e6, 6),
            )
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["oov_rate"], r["avg_logprob"])
        for r in unigram_lm_scores(df).collect()
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="\x00", blacklist_categories=("Cs",)),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@pytest.mark.slow
def test_fused_minhash_buckets_match_decomposed_on_arbitrary_text(spark, texts):
    """The fused Arrow band-bucket pass must equal the decomposed
    signatures->columns->concat->explode formulation on ARBITRARY
    unicode text (empty strings, newlines, multi-space runs), not just
    the corpus — the incremental store's generations join on these
    values across engine versions."""
    from pyspark.sql import functions as F

    from outboxx_spark.dataops import dedup as dd
    from outboxx_spark.dataops import text as tx

    rows = [(i, t) for i, t in enumerate(texts)]
    sets_ = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", tx.shingles(F.col("text"), 3).alias("sh")
    )
    fused = {
        (r.doc_id, r.band, r.sig)
        for r in dd.lsh_band_buckets_from_sets(sets_).collect()
    }
    decomposed = {
        (r.doc_id, r.band, r.sig)
        for r in dd.lsh_band_buckets(dd.minhash_signatures_from_sets(sets_)).collect()
    }
    assert fused == decomposed


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="\x00", blacklist_categories=("Cs",)),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@pytest.mark.slow
def test_simhash_arrow_matches_groupby_on_arbitrary_text(spark, texts):
    """Fused SimHash (Arrow votes) vs the explode+groupBy reference on
    arbitrary unicode — the signature values are oracle-checked, so the
    two formulations must agree everywhere, not just on corpus text."""
    from outboxx_spark.dataops import dedup as dd

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fused = {(r.doc_id, r.simhash) for r in dd.simhash(df).collect()}
    grouped = {(r.doc_id, r.simhash) for r in dd.simhash_via_groupby(df).collect()}
    assert fused == grouped


@settings(max_examples=300, deadline=None)
@given(
    lens=st.lists(st.integers(1, 90), min_size=0, max_size=12),
    budget=st.integers(1, 128),
)
def test_perm_min_matrix_invariant_under_any_chunk_budget(lens, budget):
    """The fused minhash kernel's chunking is layout-only: for ANY doc
    shape sequence and ANY budget (including budgets smaller than every
    doc, which force the oversized-doc slicing branch, and the
    small-then-huge shapes the r6 admit fix targets), the permuted
    minima must be bit-identical to a brute-force per-doc reference."""
    import numpy as np
    import pandas as pd

    from outboxx_spark.dataops import dedup as dd
    from outboxx_spark.dataops.hashing import HASH_P, MINHASH_A, MINHASH_B

    rng = np.random.default_rng(sum(lens) * 1000003 + budget)
    arrs = [rng.integers(0, HASH_P, size=n, dtype=np.int64).tolist() for n in lens]
    a = np.array(MINHASH_A, dtype=np.int64)
    b = np.array(MINHASH_B, dtype=np.int64)
    expected = np.array(
        [((np.asarray(arr, dtype=np.int64)[:, None] * a + b) % HASH_P).min(axis=0) for arr in arrs]
    ).reshape(len(arrs), len(a)) if arrs else np.empty((0, len(a)), dtype=np.int64)
    prev = dd.PERM_CHUNK_BUDGET
    dd.PERM_CHUNK_BUDGET = budget
    try:
        got = dd._perm_min_matrix(pd.Series(arrs, dtype=object))
    finally:
        dd.PERM_CHUNK_BUDGET = prev
    assert np.array_equal(got, expected)


@given(st.binary(max_size=256))
@settings(max_examples=300, deadline=None)
def test_parse_image_dims_total_on_arbitrary_bytes(blob):
    # the sniffer ingests untrusted blob bytes inside an executor UDF:
    # it must be TOTAL — any input returns None or a well-formed triple,
    # never raises, never loops
    from outboxx_spark.dataops.multimodal import parse_image_dims

    out = parse_image_dims(blob)
    if out is not None:
        mt, w, h = out
        assert mt in ("image/png", "image/jpeg", "image/gif", "image/bmp")
        assert isinstance(w, int) and isinstance(h, int)
        assert 0 <= w <= 0xFFFFFFFF and 0 <= h <= 0x100000000


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_parse_image_dims_total_on_jpeg_prefixed_bytes(tail):
    # bias the fuzz into the marker-walk branch: SOI + arbitrary tail
    from outboxx_spark.dataops.multimodal import parse_image_dims

    out = parse_image_dims(b"\xff\xd8" + tail)
    if out is not None:
        assert out[0] == "image/jpeg"
