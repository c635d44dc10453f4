"""TopSig: kernel parity, an independent brute-force oracle, and the
Spark build/search end-to-end (reference semantics:
index_document_topsig_signature.c add_term,
index_document_topsig.c:183-238 bit encoding,
atire_api.c:1038-1092 + ranking_function_topsig_*.c query scoring)."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from atire_spark.kernels.topsig import (
    accumulate,
    agreement_scores,
    fill_bits,
    md5_u64,
    num_positive,
    pack_bits,
    popcount_rows,
    query_vector,
    signature_bits,
    splitmix64,
    term_weights,
    unpack_bits,
)

WIDTH = 256
DENSITY = 12.0


# --------------------------------------------------------------- oracle
def _splitmix_one(x: int) -> int:
    """Scalar splitmix64 written independently of the numpy kernel."""
    z = (x + 0x9E3779B97F4A7C15) % 2**64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % 2**64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % 2**64
    return z ^ (z >> 31)


def _brute_signature(doc_terms, width=WIDTH, density=DENSITY):
    """Per-doc signature via plain dict/loops: doc_terms is a list of
    (term, wq) pairs; returns the bool bit row for docid given."""

    def inner(docid, pairs):
        vec = [0] * width
        for term, wq in pairs:
            seed = int.from_bytes(
                hashlib.md5(term.encode()).digest()[8:16], "little"
            )
            for j in range(2 * int(width * density / 200.0)):
                pos = _splitmix_one((seed + j) % 2**64) % width
                vec[pos] += wq if j % 2 == 0 else -wq
        dseed = int.from_bytes(
            hashlib.md5(f"doc:{docid}".encode()).digest()[8:16], "little"
        )
        bits = []
        for b in range(width):
            if vec[b] > 0:
                bits.append(True)
            elif vec[b] == 0:
                bits.append(bool(_splitmix_one((dseed + b) % 2**64) & 1))
            else:
                bits.append(False)
        return bits

    return inner


def test_splitmix64_matches_scalar():
    xs = np.array([0, 1, 2**63, 2**64 - 1, 123456789], dtype=np.uint64)
    got = splitmix64(xs)
    for x, g in zip(xs.tolist(), got.tolist()):
        assert g == _splitmix_one(int(x))


def test_num_positive_truncates_like_c():
    # index_document_topsig_signature.c:124 — (long) cast truncation
    assert num_positive(4096, 12.0) == 245
    assert num_positive(1024, 12.0) == 61
    assert num_positive(100, 3.0) == 1


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(7)
    bits = rng.random((5, WIDTH)) < 0.5
    words = pack_bits(bits)
    assert words.shape == (5, WIDTH // 64)
    assert np.array_equal(unpack_bits(words, WIDTH), bits)
    assert np.array_equal(popcount_rows(words), bits.sum(axis=1))


def test_accumulate_matches_brute_force():
    docs = {
        0: [("alpha", 3000), ("beta", 4500)],
        1: [("beta", 4500), ("gamma", 7000), ("alpha", 3000)],
        2: [],  # all terms stopped → pure fill bits
    }
    terms_flat, wq, didx = [], [], []
    for d, pairs in docs.items():
        for t, w in pairs:
            terms_flat.append(t)
            wq.append(w)
            didx.append(d)
    seeds = np.array([md5_u64(t) for t in terms_flat], dtype=np.uint64)
    acc = accumulate(
        seeds,
        np.array(wq, dtype=np.int64),
        np.array(didx, dtype=np.int64),
        3,
        WIDTH,
        DENSITY,
    )
    got = signature_bits(acc, np.array([0, 1, 2]))
    brute = _brute_signature(docs)
    for d, pairs in docs.items():
        assert got[d].tolist() == brute(d, pairs), f"doc {d}"


def test_term_weight_stop_rule():
    # tf·ln((tf/len)·(L/cf)) < e → stopped (add_term's M_E gate)
    w = term_weights(
        np.array([1.0]), np.array([100.0]), np.array([5000.0]), 10000.0
    )
    assert w[0] < math.e  # ln(0.02) < 0 → stopped
    w2 = term_weights(
        np.array([3.0]), np.array([10.0]), np.array([3.0]), 10000.0
    )
    assert w2[0] >= math.e  # 3·ln(1000) — rare term survives


def test_query_vector_missing_term_defaults_cf_1():
    # index_document_topsig_signature.c:78-84: unknown term → cf = tf
    qv = query_vector(["zzz"], [1], {}, 10000.0, WIDTH, DENSITY)
    assert np.any(qv != 0)
    # present common term is stopped: ln(L/cf) < e
    qv2 = query_vector(
        ["the"], [1], {"the": 5000}, 10000.0, WIDTH, DENSITY
    )
    assert not np.any(qv2 != 0)


def test_agreement_scores_brute():
    rng = np.random.default_rng(11)
    bits = rng.random((8, WIDTH)) < 0.5
    words = pack_bits(bits)
    qv = rng.integers(-3, 4, WIDTH).astype(np.int64)
    got = agreement_scores(words, qv)
    for i in range(8):
        want = sum(
            1
            for b in range(WIDTH)
            if (qv[b] > 0 and bits[i, b]) or (qv[b] < 0 and not bits[i, b])
        )
        assert got[i] == want


def test_query_weight_multiplies_after_quantization():
    # repeated query term = the same addition run weight times
    # (process_topsig_query calls add_term once per occurrence; ±k·w
    # draws at identical positions)
    cfs = {"rare": 2}
    q1 = query_vector(["rare"], [1], cfs, 10000.0, WIDTH, DENSITY)
    q3 = query_vector(["rare"], [3], cfs, 10000.0, WIDTH, DENSITY)
    assert np.array_equal(q3, 3 * q1)


# ------------------------------------------------------------ end-to-end
@pytest.fixture(scope="module")
def topsig_setup(spark):
    from atire_spark.build import build_index
    from atire_spark.topsig import build_topsig

    rows = [
        ("c0", 0, "alpha beta gamma delta epsilon"),
        ("c0", 1, "alpha alpha alpha rare1"),
        ("c1", 0, "beta gamma rare2 rare2"),
        ("c1", 1, ""),  # empty turn → no docid
        ("c2", 0, "delta epsilon zeta eta theta iota kappa"),
        ("c2", 1, "rare1 rare2 rare3"),
    ]
    tr = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    )
    idx = build_index(spark, tr)
    sigs = build_topsig(spark, tr, idx, width=WIDTH, density=DENSITY)
    return tr, idx, sigs


def test_build_topsig_one_row_per_doc(topsig_setup):
    _, idx, sigs = topsig_setup
    pdf = sigs.toPandas()
    n_docs = idx.docmap.count()
    assert len(pdf) == n_docs == 5
    assert all(len(s) == WIDTH // 64 for s in pdf.sig)


def test_build_topsig_matches_brute(topsig_setup, spark):
    from pyspark.sql import functions as F

    tr, idx, sigs = topsig_setup
    got = {
        int(r["docid"]): np.asarray(r["sig"], dtype=np.int64)
        for r in sigs.collect()
    }
    # independent reconstruction from first principles
    docmap = idx.docmap.toPandas().set_index(["conv_id", "turn_idx"])
    texts = {(r[0], r[1]): r[2] for r in tr.collect()}
    toks = {k: v.split() for k, v in texts.items() if v}
    cf: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            cf[t] = cf.get(t, 0) + 1
    L = sum(len(ts) for ts in toks.values())
    brute = _brute_signature({})
    for key, ts in toks.items():
        docid = int(docmap.loc[key, "docid"])
        counts: dict[str, int] = {}
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
        pairs = []
        for t, tf in counts.items():
            w = tf * math.log((tf / len(ts)) * (L / cf[t]))
            if w >= math.e:
                pairs.append((t, int(math.floor(1000.0 * w + 0.5))))
        want = brute(docid, pairs)
        assert unpack_bits(got[docid][None, :], WIDTH)[0].tolist() == want


def test_search_topsig_scores_are_agreement_counts(topsig_setup, spark):
    from atire_spark.topsig import search_topsig

    _, idx, sigs = topsig_setup
    res = search_topsig(
        spark,
        sigs,
        idx,
        [(1, "rare1"), (2, "rare2 rare3"), (3, "zzzzz")],
        k=5,
        width=WIDTH,
        density=DENSITY,
    ).toPandas()
    assert set(res.columns) == {
        "query_id", "rank", "docid", "rsv_fixed", "rsv"
    }
    # every score is a positive agreement count bounded by the number
    # of nonzero query dims (≤ width)
    assert (res.rsv_fixed > 0).all() and (res.rsv_fixed <= WIDTH).all()
    assert (res.rsv == res.rsv_fixed).all()
    # tie-break larger docid first within equal rsv
    for _, grp in res.groupby("query_id"):
        g = grp.sort_values("rank")
        key = list(zip(-g.rsv_fixed, -g.docid))
        assert key == sorted(key)


def test_search_topsig_empty_when_all_terms_stopped(topsig_setup, spark):
    from atire_spark.topsig import search_topsig

    _, idx, sigs = topsig_setup
    # "alpha" ln(L/cf) with cf=4, L=22: ln(5.5) ≈ 1.7 < e → stopped →
    # zero query vector → no results for that query
    res = search_topsig(
        spark, sigs, idx, [(1, "alpha")], k=5, width=WIDTH, density=DENSITY
    )
    assert res.count() == 0


def test_signature_stats_counts_bits(topsig_setup, spark):
    from atire_spark.topsig import signature_stats

    _, _, sigs = topsig_setup
    st = signature_stats(sigs).toPandas()
    raw = sigs.toPandas()
    want = {
        int(d): int(popcount_rows(np.asarray(s, dtype=np.int64)[None, :])[0])
        for d, s in zip(raw.docid, raw.sig)
    }
    assert {int(d): int(b) for d, b in zip(st.docid, st.bits_set)} == want


def test_topsig_feedback_scores_shared_bits(topsig_setup, spark):
    from atire_spark.topsig import search_topsig, search_topsig_feedback

    _, idx, sigs = topsig_setup
    qs = [(1, "rare1"), (2, "rare2")]
    fb = search_topsig_feedback(
        spark, sigs, idx, qs, k=5, feedback_docs=2,
        width=WIDTH, density=DENSITY,
    ).toPandas()
    assert (fb.rsv_fixed > 0).all()
    # positive-only re-query: every fed-back doc shares all of its own
    # set bits with the feedback mask, so the pass-1 top docs score at
    # least their own bit count overlap — reproduce pass 2 by hand
    first = search_topsig(
        spark, sigs, idx, qs, k=2, width=WIDTH, density=DENSITY
    ).toPandas()
    raw = {int(r["docid"]): np.asarray(r["sig"], dtype=np.int64)
           for r in sigs.collect()}
    for qid, grp in first.groupby("query_id"):
        mask = np.zeros(WIDTH, dtype=np.int64)
        for d in grp.docid:
            mask += unpack_bits(raw[int(d)][None, :], WIDTH)[0]
        want = {}
        for d, words in raw.items():
            bits = unpack_bits(words[None, :], WIDTH)[0]
            s = int(((mask > 0) & bits).sum())
            if s > 0:
                want[d] = s
        got = {
            int(r.docid): int(r.rsv_fixed)
            for r in fb[fb.query_id == qid].itertuples()
        }
        for d, s in got.items():
            assert want[d] == s


def test_fill_bits_deterministic_per_doc():
    a = fill_bits(np.array([7, 8]), WIDTH)
    b = fill_bits(np.array([7]), WIDTH)
    assert np.array_equal(a[0], b[0])
    assert not np.array_equal(a[0], a[1])


def test_topsig_follows_index_stemmer(spark):
    """A stemmed index stems TopSig query terms automatically
    (atire_api.c:1057-1061 stems with the engine's stemmer): plural
    query forms hit the singular stemmed vocabulary."""
    from atire_spark.build import build_index
    from atire_spark.topsig import build_topsig, search_topsig

    # collection length must exceed e^e (~15.2) tokens or the query
    # weight ln(L/cf) stops even a cf=1 term
    rows = [
        ("c0", 0, "rareword banana cherry peach pear"),
        ("c0", 1, "banana cherry apple grape melon lime"),
        ("c1", 0, "cherry apple grape melon kiwi plum fig date"),
    ]
    tr = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    )
    idx = build_index(spark, tr, stemmer="s")
    sigs = build_topsig(spark, tr, idx, width=WIDTH, density=DENSITY)
    plural = search_topsig(
        spark, sigs, idx, [(1, "rarewords")], k=3,
        width=WIDTH, density=DENSITY,
    ).toPandas()
    singular = search_topsig(
        spark, sigs, idx, [(1, "rareword")], k=3,
        width=WIDTH, density=DENSITY,
    ).toPandas()
    assert len(plural) > 0
    assert plural[["docid", "rsv_fixed"]].values.tolist() == \
        singular[["docid", "rsv_fixed"]].values.tolist()


def test_build_topsig_rejects_unaligned_width(topsig_setup, spark):
    from atire_spark.topsig import build_topsig

    tr, idx, _ = topsig_setup
    with pytest.raises(ValueError, match="multiple of 64"):
        build_topsig(spark, tr, idx, width=100, density=12.0)


# ------------------------------------------------------- property tests
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 9),  # doc index
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            st.integers(2719, 50000),  # wq (post-stop weights)
        ),
        min_size=1,
        max_size=40,
    ),
    st.randoms(),
)
def test_accumulate_is_order_invariant(pairs, rnd):
    """Integer quantization makes the signature accumulation an exact
    sum — any contribution order (i.e. any partitioning / Arrow batch
    boundary) yields identical vectors. This is the invariant that
    lets the distributed build equal the oracle bit-for-bit."""
    seeds = np.array([md5_u64(t) for _, t, _ in pairs], dtype=np.uint64)
    wq = np.array([w for _, _, w in pairs], dtype=np.int64)
    didx = np.array([d for d, _, _ in pairs], dtype=np.int64)
    a1 = accumulate(seeds, wq, didx, 10, 128, DENSITY)
    perm = list(range(len(pairs)))
    rnd.shuffle(perm)
    perm = np.array(perm)
    a2 = accumulate(seeds[perm], wq[perm], didx[perm], 10, 128, DENSITY)
    assert np.array_equal(a1, a2)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 6).map(lambda k: k * 64),  # width, word-aligned
    st.integers(0, 2**32),
)
def test_pack_agreement_roundtrip_any_width(width, seed):
    rng = np.random.default_rng(seed)
    bits = rng.random((4, width)) < 0.5
    words = pack_bits(bits)
    assert np.array_equal(unpack_bits(words, width), bits)
    qv = rng.integers(-2, 3, width).astype(np.int64)
    got = agreement_scores(words, qv)
    want = ((qv > 0) & bits).sum(axis=1) + ((qv < 0) & ~bits).sum(axis=1)
    assert np.array_equal(got, want)


def test_preloaded_global_stats_identical(topsig_setup, spark):
    """The reference loads topsig global stats once at startup
    (load_topsig); the preloaded-cfs path must rank identically to the
    per-batch lookup."""
    from atire_spark.topsig import search_topsig, topsig_global_stats

    _, idx, sigs = topsig_setup
    qs = [(1, "rare1"), (2, "rare2 rare3")]
    base = search_topsig(
        spark, sigs, idx, qs, k=5, width=WIDTH, density=DENSITY
    ).toPandas()
    cfs, coll_len = topsig_global_stats(idx)
    pre = search_topsig(
        spark, sigs, idx, qs, k=5, width=WIDTH, density=DENSITY,
        cfs=cfs, coll_len=coll_len,
    ).toPandas()
    assert base.values.tolist() == pre.values.tolist()
