"""Kernel unit tests (no Spark) — vectors per FIXTURES.md §5, mirroring
the reference's tests/test_compression.c and parser semantics."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from atire_spark.kernels.bm25 import doc_priors, group_contrib, idf
from atire_spark.kernels.impact import decode_segment, impact_order
from atire_spark.kernels.tokenizer import (
    MAX_TERM_BYTES,
    term_counts,
    tokenize,
    tokenize_batch,
)
from atire_spark.kernels.vbyte import vbyte_decode, vbyte_encode


# ---------------------------------------------------------------- vbyte
class TestVbyte:
    def test_known_boundaries(self):
        # reference scheme: 7-bit groups, stop bit 0x80 on the LAST byte
        # (compress_variable_byte.h:57-96)
        vals = [0, 1, 127, 128, 2**14 - 1, 2**14, 2**14 + 1, 2**28 - 1, 2**28, 2**40, 2**62]
        enc = vbyte_encode(np.array(vals, dtype=np.uint64))
        dec = vbyte_decode(enc)
        assert list(dec) == vals

    def test_wire_format(self):
        assert vbyte_encode(np.array([0])) == b"\x80"
        assert vbyte_encode(np.array([127])) == b"\xff"
        # 128 = 0b1_0000000 → high group 0x01 then low group 0x00|0x80
        assert vbyte_encode(np.array([128])) == b"\x01\x80"
        assert vbyte_encode(np.array([300])) == bytes([300 >> 7, (300 & 0x7F) | 0x80])

    def test_empty(self):
        assert vbyte_encode(np.array([], dtype=np.uint64)) == b""
        assert vbyte_decode(b"").size == 0

    def test_count_validation(self):
        enc = vbyte_encode(np.array([5, 6, 7]))
        with pytest.raises(ValueError):
            vbyte_decode(enc, count=2)

    def test_truncated(self):
        with pytest.raises(ValueError):
            vbyte_decode(b"\x01\x01")  # no stop bit at end

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
    def test_roundtrip_property(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        assert list(vbyte_decode(vbyte_encode(arr), count=len(vals))) == vals


# ------------------------------------------------------------ tokenizer
class TestTokenizer:
    def test_basic_rules(self):
        # letter runs lowercased, digit runs raw, punctuation dropped
        # (parser.c:151-233)
        assert tokenize("Hello, World!") == ["hello", "world"]
        assert tokenize("abc123def") == ["abc", "123", "def"]
        assert tokenize("e-mail isn't x2") == ["e", "mail", "isn", "t", "x", "2"]
        assert tokenize("") == []
        assert tokenize(None) == []
        assert tokenize("...!!!") == []
        assert tokenize("MiXeD CaSe") == ["mixed", "case"]

    def test_long_token_dropped(self):
        long_tok = "x" * (MAX_TERM_BYTES + 1)
        assert tokenize(f"ok {long_tok} fine") == ["ok", "fine"]
        # exactly at the cap is kept (strict > in index_document.c:55)
        at_cap = "y" * MAX_TERM_BYTES
        assert tokenize(at_cap) == [at_cap]

    def test_unicode(self):
        # reference normalize (unicode.c:213-257): decompose, drop
        # combining marks, lowercase — not a plain str.lower
        assert tokenize("café Über") == ["cafe", "uber"]
        # no-decomposition letters pass through lowercased
        assert tokenize("straße ŁÓDŹ") == ["straße", "łodz"]
        # numbers are indexed raw; CJK chars raw (single-char default)
        assert tokenize("123 中文") == ["123", "中", "文"]

    def test_unicode_batch_matches_scalar(self):
        texts = pd.Series(
            ["Café Ünïcödé 123 中文 test", "straße ŁÓDŹ!", "ascii only", ""]
        )
        toks, _ = tokenize_batch(texts)
        assert [tokenize(t) for t in texts] == list(toks)

    def test_batch_matches_scalar(self):
        texts = pd.Series(
            ["Hello, World!", "", None, "abc123", "x " + "q" * (MAX_TERM_BYTES + 5), "A A a"]
        )
        toks, lens = tokenize_batch(texts)
        expected = [tokenize(t) for t in texts]
        assert list(toks) == expected
        assert list(lens) == [len(e) for e in expected]

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    codec="utf-8", categories=("L", "N", "P", "Z", "S")
                ),
                max_size=80,
            ),
            max_size=20,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_flat_stream_matches_scalar_fuzz(self, texts):
        # the ASCII whole-row fast path must be indistinguishable from
        # the per-string reference-parity tokenize() on ANY input mix
        from atire_spark.kernels.tokenizer import tokenize_flat

        s = pd.Series(texts, dtype=object)
        row_idx, flat, lens = tokenize_flat(s)
        expected = [tokenize(t) for t in texts]
        bounds = np.cumsum(lens)[:-1]
        got = (
            [list(a) for a in np.split(flat, bounds)] if len(texts) else []
        )
        assert got == expected
        assert list(lens) == [len(e) for e in expected]
        assert list(row_idx) == [
            i for i, e in enumerate(expected) for _ in e
        ]

    def test_term_counts_cap(self):
        toks = ["a"] * 300 + ["b"]
        terms, tfs = term_counts(toks)
        d = dict(zip(terms, tfs))
        assert d == {"a": 255, "b": 1}  # tf saturates at 255


# ------------------------------------------------------------- impact
class TestImpactOrder:
    def test_known_vector(self):
        # docids ascending, tfs: groups must come out impact-desc with
        # per-group delta-from(-1) encoding (memory_index.c:476-580)
        docids = np.array([3, 7, 9, 12, 20])
        tfs = np.array([2, 5, 2, 5, 1])
        lens = np.array([10, 20, 30, 40, 50])
        seg = impact_order(docids, tfs, lens)
        assert list(seg.impacts) == [5, 2, 1]
        assert list(seg.doc_counts) == [2, 2, 1]
        assert list(seg.offsets) == [0, 2, 4]
        assert seg.max_impact == 5
        assert seg.n_postings == 5
        # group tf=5: docids 7,12 → deltas 8,5 ; group tf=2: 3,9 → 4,6 ; tf=1: 20 → 21
        assert list(vbyte_decode(seg.postings)) == [8, 5, 4, 6, 21]
        d, t, l = decode_segment(seg.impacts, seg.doc_counts, seg.postings, seg.doc_lens)
        assert list(d) == [7, 12, 3, 9, 20]
        assert list(t) == [5, 5, 2, 2, 1]
        assert list(l) == [20, 40, 10, 30, 50]

    def test_df1_fast_path(self):
        seg = impact_order(np.array([42]), np.array([7]), np.array([99]))
        assert list(seg.impacts) == [7]
        assert list(vbyte_decode(seg.postings)) == [43]
        d, t, l = decode_segment(seg.impacts, seg.doc_counts, seg.postings, seg.doc_lens)
        assert list(d) == [42] and list(t) == [7] and list(l) == [99]

    def test_static_prune(self):
        # exact cut at the prune point: the containing group truncates
        # mid-quantum, keeping its lowest docids (memory_index.c:
        # 545-546 pruned_point = pointer[bucket] + (K - sum))
        docids = np.arange(10)
        tfs = np.array([9, 9, 9, 5, 5, 5, 5, 2, 2, 2])
        lens = np.ones(10, dtype=np.int64)
        seg = impact_order(docids, tfs, lens, static_prune=4)
        assert list(seg.impacts) == [9, 5]
        assert list(seg.doc_counts) == [3, 1]
        assert seg.n_postings == 4
        d, t, _ = decode_segment(
            seg.impacts, seg.doc_counts, seg.postings, seg.doc_lens
        )
        assert list(d) == [0, 1, 2, 3] and list(t) == [9, 9, 9, 5]

    def test_partial_decode(self):
        docids = np.arange(20)
        tfs = np.concatenate([np.full(10, 8), np.full(10, 3)])
        seg = impact_order(docids, tfs, np.ones(20, dtype=np.int64))
        d, t, _ = decode_segment(seg.impacts, seg.doc_counts, seg.postings, max_groups=1)
        assert list(d) == list(range(10))
        assert set(t) == {8}

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 10**6), st.integers(1, 255), st.integers(1, 500)),
            min_size=1,
            max_size=300,
            unique_by=lambda x: x[0],
        )
    )
    def test_roundtrip_property(self, items):
        items.sort()
        docids = np.array([i[0] for i in items])
        tfs = np.array([i[1] for i in items])
        lens = np.array([i[2] for i in items])
        seg = impact_order(docids, tfs, lens)
        d, t, l = decode_segment(seg.impacts, seg.doc_counts, seg.postings, seg.doc_lens)
        got = sorted(zip(d.tolist(), t.tolist(), l.tolist()))
        assert got == items


# --------------------------------------------------------------- bm25
class TestBM25:
    def test_hand_computed(self):
        # N=4 docs, df=2, tf=3, len=10, mean=8.25
        n, df_t = 4, 2
        i = idf(n, df_t)
        assert i == pytest.approx(np.log(2.0))
        prior = doc_priors(np.array([10]), 8.25)
        assert prior.dtype == np.float32
        expected_prior = np.float32(0.9 * (0.6 + 0.4 * (10 / 8.25)))
        assert prior[0] == expected_prior
        contrib = group_contrib(3, i, prior)
        rsv = i * (3.0 * 1.9) / (3.0 + float(expected_prior))
        assert contrib[0] == 1 + int(rsv * 100.0)

    def test_idf_zero_is_exact(self):
        assert idf(7, 7) == 0.0

    def test_weight_multiplies(self):
        prior = doc_priors(np.array([5, 9]), 7.0)
        c1 = group_contrib(2, 0.5, prior, weight=1)
        c3 = group_contrib(2, 0.5, prior, weight=3)
        assert list(c3) == [3 * x for x in c1]


class TestBatchSegmentBuilder:
    """The vectorized multi-segment builder must be byte-identical to
    the per-segment impact_order kernel on every layout field."""

    def test_matches_impact_order(self):
        import numpy as np
        import pandas as pd

        from atire_spark.kernels.impact import impact_order
        from atire_spark.kernels.segment import build_segments_batch

        rng = np.random.default_rng(7)
        rows = []
        for term in ["aa", "bb", "cc"]:
            for block in range(4):
                n = int(rng.integers(1, 30))
                docs = np.sort(
                    rng.choice(
                        np.arange(block * 1000, block * 1000 + 999),
                        size=n,
                        replace=False,
                    )
                )
                rows.append(
                    {
                        "term": term,
                        "seg_group": block // 2,
                        "block": block,
                        "docids": docs.astype(np.int64),
                        "tfs": rng.integers(1, 6, size=n).astype(np.int32),
                        "lens": rng.integers(5, 100, size=n).astype(np.int64),
                        "df_b": n,
                        "cf_b": int(rng.integers(n, 3 * n)),
                    }
                )
        pdf = pd.DataFrame(rows)
        out = build_segments_batch(pdf)

        for (term, sg), g in pdf.groupby(["term", "seg_group"]):
            g = g.sort_values("block")
            docids = np.concatenate(list(g["docids"]))
            tfs = np.concatenate(list(g["tfs"])).astype(np.int64)
            lens = np.concatenate(list(g["lens"]))
            seg = impact_order(docids, tfs, lens)
            row = out[(out.term == term) & (out.seg_group == sg)].iloc[0]
            assert row["postings"] == seg.postings
            assert row["doc_lens"] == seg.doc_lens
            assert list(row["impacts"]) == list(seg.impacts)
            assert list(row["doc_counts"]) == list(seg.doc_counts)
            assert list(row["offsets"]) == list(seg.offsets)
            assert list(row["byte_offsets"]) == list(seg.byte_offsets)
            assert row["max_impact"] == seg.max_impact
            assert row["n_postings"] == seg.n_postings
            assert row["first_docid"] == int(docids[0])
            assert row["seg_cf"] == int(g["cf_b"].sum())


class TestAdaptiveK1:
    """Solvers for BM25T / BM25-adpt per-term k1
    (ranking_function_bm25t.c:85-123, bm25adpt.c:47-196)."""

    def test_secant_solves_bm25t_equation(self):
        import math

        from atire_spark.kernels.adaptive_k1 import bm25t_k1

        # g(k1) = k1/(k1-1)·ln(k1) is increasing; the solved k1 must
        # put g within the secant tolerance of the target mean
        for s in (1.05, 1.3, 2.0, 3.7):
            k1 = bm25t_k1(s * 17, 17)
            g = (k1 / (k1 - 1.0)) * math.log(k1)
            assert abs(g - s) < 1e-2, (s, k1, g)

    def test_range_search_finds_parabola_min(self):
        from atire_spark.kernels.adaptive_k1 import range_search

        # the reference's jump-halving walk converges to the argmin
        # within the err step size for a smooth bowl inside (0, end)
        for target in (0.7, 2.5, 6.0):
            got = range_search(10.0, 0.001, lambda x: (x - target) ** 2)
            assert abs(got - target) < 5e-3, (target, got)

    def test_adpt_histogram_pins_and_truncation(self):
        import numpy as np

        from atire_spark.kernels.adaptive_k1 import bm25adpt_k1

        hist = np.zeros(256, dtype=np.int64)
        hist[1] = 40
        hist[2] = 10
        hist[3] = 3
        k1, ig1 = bm25adpt_k1(hist, n_docs=1000, df=53)
        # IG[1] uses the pinned counts[1]=df and the suffix-cumulated
        # counts[2] = 13:  log2((1000+1)/(53+0.5)) + log2((13+0.5)/(53+1))
        import math

        want = (
            -(math.log((53 + 0.5) / (1000 + 1.0)) / math.log(2.0))
            + math.log((13 + 0.5) / (53 + 1.0)) / math.log(2.0)
        )
        assert abs(ig1 - want) < 1e-12
        assert 0.0 < k1 <= 11.0  # range search stays inside (0, end+jump]


class TestCJK:
    """CJK segmentation parity (parser.c:251-283, unicode.c:596-634):
    default = one token per CJK char (never swallowed by letter runs);
    bigram mode = overlapping 2-char windows with a trailing
    single-char token."""

    def test_single_char_default(self):
        from atire_spark.kernels.tokenizer import tokenize

        assert tokenize("中文测试") == ["中", "文", "测", "试"]
        # mixed ASCII + CJK: letter runs stop at the CJK boundary
        assert tokenize("spark引擎test") == ["spark", "引", "擎", "test"]
        # Korean syllables and Japanese kana are CJK too
        assert tokenize("한국어") == ["한", "국", "어"]
        assert tokenize("ひらがなとカタカナ") == list("ひらがなとカタカナ")
        # digits stay runs
        assert tokenize("数42字") == ["数", "42", "字"]

    def test_bigram_mode(self):
        from atire_spark.kernels.tokenizer import tokenize

        # run "abc" → ab, bc, c (parser.c:259-283: the scan steps back
        # one char after each bigram, the trailing char stands alone)
        assert tokenize("中文测", cjk_bigrams=True) == ["中文", "文测", "测"]
        assert tokenize("中", cjk_bigrams=True) == ["中"]
        assert tokenize("a中文b", cjk_bigrams=True) == ["a", "中文", "文", "b"]

    def test_batch_matches_scalar(self):
        import pandas as pd

        from atire_spark.kernels.tokenizer import tokenize, tokenize_batch

        texts = pd.Series(
            ["中文测试 hello", "spark引擎", "", "한국어 42", "plain ascii"]
        )
        for bg in (False, True):
            toks, lens = tokenize_batch(texts, cjk_bigrams=bg)
            for i, t in texts.items():
                want = tokenize(t, cjk_bigrams=bg)
                assert sorted(toks.iloc[i]) == sorted(want), (bg, t)
                assert lens[i] == len(want)

    def test_nexi_query_splits_cjk(self):
        from atire_spark.query import parse_query

        assert [t for t, _ in parse_query("中文 search")] == ["中", "文", "search"]


class TestSimple9:
    """Simple-9 posting codec (compress_simple9.c wire format):
    4-bit selector in the low bits, low-to-high packing, greedy
    densest-selector choice, zero-padded tails; batch builder output
    byte-identical to per-segment impact_order at every quantum."""

    def test_batch_matches_impact_order(self):
        import numpy as np
        import pandas as pd

        from atire_spark.kernels.impact import impact_order
        from atire_spark.kernels.segment import build_segments_batch

        rng = np.random.default_rng(11)
        rows = []
        for term in ("alpha", "beta", "gamma"):
            for block in range(4):
                n = int(rng.integers(1, 60))
                docs = np.sort(
                    rng.choice(2000, size=n, replace=False) + block * 4096
                )
                rows.append(
                    {
                        "term": term,
                        "seg_group": block // 2,
                        "block": block,
                        "docids": docs.astype(np.int64),
                        "tfs": rng.integers(1, 6, size=n).astype(np.int32),
                        "lens": rng.integers(5, 100, size=n).astype(np.int64),
                        "df_b": n,
                        "cf_b": int(rng.integers(n, 3 * n)),
                    }
                )
        pdf = pd.DataFrame(rows)
        out = build_segments_batch(pdf, codec="simple9")
        for (term, sg), g in pdf.groupby(["term", "seg_group"]):
            g = g.sort_values("block")
            docids = np.concatenate(list(g["docids"]))
            tfs = np.concatenate(list(g["tfs"])).astype(np.int64)
            lens = np.concatenate(list(g["lens"]))
            seg = impact_order(docids, tfs, lens, codec="simple9")
            row = out[(out.term == term) & (out.seg_group == sg)].iloc[0]
            assert row["postings"] == seg.postings
            assert list(row["byte_offsets"]) == list(seg.byte_offsets)
            assert list(row["impacts"]) == list(seg.impacts)

    def test_decode_equals_vbyte_decode(self):
        import numpy as np

        from atire_spark.kernels.impact import decode_segment, impact_order

        rng = np.random.default_rng(12)
        for _ in range(30):
            n = int(rng.integers(1, 400))
            docs = np.sort(rng.choice(1 << 20, size=n, replace=False))
            tfs = rng.integers(1, 9, size=n)
            lens = rng.integers(1, 400, size=n)
            a = impact_order(docs, tfs, lens, codec="vbyte")
            b = impact_order(docs, tfs, lens, codec="simple9")
            da = decode_segment(
                np.asarray(a.impacts), np.asarray(a.doc_counts),
                a.postings, a.doc_lens, codec="vbyte",
            )
            db = decode_segment(
                np.asarray(b.impacts), np.asarray(b.doc_counts),
                b.postings, b.doc_lens, codec="simple9",
            )
            for x, y in zip(da, db):
                assert np.array_equal(x, y)


class TestCodecFamily:
    """The full compression factory (compression_factory.c:59-77):
    every codec must (a) round-trip through impact_order /
    decode_segment identically to vbyte, (b) batch-build identically
    to per-segment impact_order, (c) support per-quantum partial
    reads at the stored byte offsets."""

    NAMES = None  # filled lazily from the registry

    @staticmethod
    def _names():
        from atire_spark.kernels.codecs import CODEC_NAMES

        return [n for n in CODEC_NAMES if n != "vbyte"]

    def test_registry_covers_reference_factory(self):
        from atire_spark.kernels.codecs import CODEC_NAMES

        # 15 schemes in compression_factory.c:59-77 (incl. NONE)
        assert len(CODEC_NAMES) == 15

    def test_decode_equals_vbyte_decode(self):
        import numpy as np

        from atire_spark.kernels.impact import decode_segment, impact_order

        rng = np.random.default_rng(21)
        for trial in range(12):
            n = int(rng.integers(1, 400))
            docs = np.sort(rng.choice(1 << 20, size=n, replace=False))
            tfs = rng.integers(1, 9, size=n)
            lens = rng.integers(1, 400, size=n)
            a = impact_order(docs, tfs, lens, codec="vbyte")
            da = decode_segment(
                np.asarray(a.impacts), np.asarray(a.doc_counts),
                a.postings, a.doc_lens, codec="vbyte",
            )
            for name in self._names():
                b = impact_order(docs, tfs, lens, codec=name)
                db = decode_segment(
                    np.asarray(b.impacts), np.asarray(b.doc_counts),
                    b.postings, b.doc_lens, codec=name,
                    byte_offsets=np.asarray(b.byte_offsets),
                )
                for x, y in zip(da, db):
                    assert np.array_equal(x, y), (name, trial)

    def test_batch_matches_impact_order(self):
        import numpy as np
        import pandas as pd

        from atire_spark.kernels.impact import impact_order
        from atire_spark.kernels.segment import build_segments_batch

        rng = np.random.default_rng(22)
        rows = []
        for term in ("alpha", "beta"):
            for block in range(4):
                n = int(rng.integers(1, 60))
                docs = np.sort(
                    rng.choice(2000, size=n, replace=False) + block * 4096
                )
                rows.append(
                    {
                        "term": term,
                        "seg_group": block // 2,
                        "block": block,
                        "docids": docs.astype(np.int64),
                        "tfs": rng.integers(1, 6, size=n).astype(np.int32),
                        "lens": rng.integers(5, 100, size=n).astype(np.int64),
                        "df_b": n,
                        "cf_b": int(rng.integers(n, 3 * n)),
                    }
                )
        pdf = pd.DataFrame(rows)
        for name in self._names():
            out = build_segments_batch(pdf, codec=name)
            for (term, sg), g in pdf.groupby(["term", "seg_group"]):
                g = g.sort_values("block")
                docids = np.concatenate(list(g["docids"]))
                tfs = np.concatenate(list(g["tfs"])).astype(np.int64)
                lens = np.concatenate(list(g["lens"]))
                seg = impact_order(docids, tfs, lens, codec=name)
                row = out[(out.term == term) & (out.seg_group == sg)].iloc[0]
                assert row["postings"] == seg.postings, name
                assert list(row["byte_offsets"]) == list(seg.byte_offsets), name

    def test_partial_group_reads(self):
        import numpy as np

        from atire_spark.kernels.codecs import get_codec
        from atire_spark.kernels.impact import (
            decode_group,
            decode_segment,
            impact_order,
        )

        rng = np.random.default_rng(23)
        n = 300
        docs = np.sort(rng.choice(1 << 16, size=n, replace=False))
        tfs = rng.integers(1, 6, size=n)
        lens = rng.integers(1, 100, size=n)
        ref = impact_order(docs, tfs, lens, codec="vbyte")
        want = decode_segment(
            np.asarray(ref.impacts), np.asarray(ref.doc_counts),
            ref.postings, ref.doc_lens, codec="vbyte", max_groups=2,
        )
        for name in self._names():
            seg = impact_order(docs, tfs, lens, codec=name)
            got = decode_segment(
                np.asarray(seg.impacts), np.asarray(seg.doc_counts),
                seg.postings, seg.doc_lens, codec=name, max_groups=2,
                byte_offsets=np.asarray(seg.byte_offsets),
            )
            assert np.array_equal(want[0], got[0]), name
            assert np.array_equal(want[1], got[1]), name
            # per-quantum decode_group at the stored byte offsets —
            # the QaaT read path
            bo = np.asarray(seg.byte_offsets, dtype=np.int64)
            ends = np.concatenate((bo[1:], [len(seg.postings)]))
            cum = np.concatenate(([0], np.cumsum(seg.doc_counts)))
            full = decode_segment(
                np.asarray(seg.impacts), np.asarray(seg.doc_counts),
                seg.postings, seg.doc_lens, codec=name,
                byte_offsets=bo,
            )[0]
            for gi in range(len(seg.impacts)):
                deltas = decode_group(
                    seg.postings[int(bo[gi]): int(ends[gi])],
                    int(seg.doc_counts[gi]),
                    codec=name,
                )
                got_docs = np.cumsum(deltas) - 1
                assert np.array_equal(
                    got_docs, full[cum[gi]: cum[gi + 1]]
                ), (name, gi)

    def test_none_codec_wire_format(self):
        import numpy as np

        from atire_spark.kernels.codecs import get_codec

        # compress_none.c: raw little-endian uint32, 4 bytes/value
        c = get_codec("none")
        vals = np.asarray([1, 7, 300, 70000], dtype=np.int64)
        blob, offs = c.encode_groups(vals, np.asarray([0, 2]))
        assert blob == np.asarray(vals, dtype="<u4").tobytes()
        assert list(offs) == [0, 8]

    def test_group_varint_wire_format(self):
        import numpy as np

        from atire_spark.kernels.codecs import get_codec

        # compress_four_integer_variable_byte: one header byte (2
        # bits per value = byte length - 1, FIRST value in the high
        # bits) then the 4 values big-endian
        c = get_codec("group_varint")
        vals = np.asarray([1, 256, 65536, 16777216], dtype=np.int64)
        blob, _ = c.encode_groups(vals, np.zeros(1, dtype=np.int64))
        sel = blob[0]
        assert ((sel >> 6) & 3, (sel >> 4) & 3, (sel >> 2) & 3, sel & 3) == (
            0, 1, 2, 3,
        )
        assert np.array_equal(c.decode_group(blob, 4), vals)


class TestBooleanDegenerateGroups:
    """Regression: empty/degenerate bracket groups must parse to the
    surviving operand, never to a Node with a None child (which
    crashed eval_tree / tree_to_sql_predicate)."""

    def _eval(self, q):
        import numpy as np

        from atire_spark.boolean import (
            assign_leaf_indexes,
            eval_tree,
            parse_boolean,
            tree_to_sql_predicate,
        )

        t = parse_boolean(q)
        if t is None:
            return None, None
        leaves = assign_leaf_indexes(t)
        pres = [np.array([True, False]) for _ in leaves]
        return eval_tree(t, pres), tree_to_sql_predicate(t, lambda i: f"f{i}")

    def test_empty_group_then_operand(self):
        r, sql = self._eval("() alpha")
        assert list(r) == [True, False] and sql == "f0"

    def test_operand_then_empty_group(self):
        r, sql = self._eval("alpha AND ()")
        assert list(r) == [True, False] and sql == "f0"

    def test_nested_empty_groups_parse_to_none(self):
        r, sql = self._eval("(())")
        assert r is None and sql is None

    def test_empty_group_inside_expression(self):
        r, sql = self._eval("((alpha) OR ()) AND beta")
        assert sql == "(f0 AND f1)"

    def test_leading_operator_after_empty_group_is_a_term(self):
        # with no left operand, an operator token is in leading
        # position and is a term (query_boolean.c operator-position
        # rule)
        _, sql = self._eval("( ) AND alpha")
        assert sql == "(f0 OR f1)"


class TestDictSegmenter:
    """ONFLY_SEGMENTATION plugin slot (parser.c:27-29,53-60): a
    dictionary-driven segmenter over whole CJK runs."""

    def test_greedy_longest_match(self):
        from atire_spark.kernels.tokenizer import dict_segmenter

        seg = dict_segmenter({"北京", "大学", "北京大学"})
        assert seg("北京大学") == ["北京大学"]
        seg2 = dict_segmenter({"北京", "大学"})
        assert seg2("北京大学生") == ["北京", "大学", "生"]

    def test_fallback_is_single_chars(self):
        from atire_spark.kernels.tokenizer import dict_segmenter

        seg = dict_segmenter(set())
        assert seg("日本語") == ["日", "本", "語"]

    def test_tokenize_mixes_ascii_and_segmented_runs(self):
        from atire_spark.kernels.tokenizer import dict_segmenter, tokenize

        seg = dict_segmenter({"東京"})
        assert tokenize("Hello 東京都 123", cjk_segmenter=seg) == [
            "hello", "東京", "都", "123",
        ]

    def test_exclusive_with_bigrams(self):
        import pytest

        from atire_spark.kernels.tokenizer import dict_segmenter, tokenize

        with pytest.raises(ValueError, match="exclusive"):
            tokenize("x", cjk_bigrams=True, cjk_segmenter=dict_segmenter(set()))

    def test_batch_matches_scalar(self):
        import pandas as pd

        from atire_spark.kernels.tokenizer import (
            dict_segmenter,
            tokenize,
            tokenize_batch,
        )

        seg = dict_segmenter({"北京", "大学"})
        texts = ["北京大学 rocks", "", "plain text", "学大 北京北京"]
        toks, lens = tokenize_batch(pd.Series(texts), cjk_segmenter=seg)
        for i, t in enumerate(texts):
            want = tokenize(t, cjk_segmenter=seg)
            assert sorted(toks.iloc[i]) == sorted(want), t
            assert lens[i] == len(want)


class TestScrubber:
    """directory_iterator_scrub.c:33-127 byte vectors."""

    def test_nul_mode(self):
        from atire_spark.kernels.scrub import NUL, scrub

        assert scrub(b"a\x00b", NUL) == b"a b"
        assert scrub(b"a\x00b", 0) == b"a\x00b"

    def test_non_ascii_mode(self):
        from atire_spark.kernels.scrub import NON_ASCII, scrub

        assert scrub("aé".encode(), NON_ASCII) == b"a  "

    def test_utf8_wild_continuation(self):
        from atire_spark.kernels.scrub import UTF8, scrub

        assert scrub(b"a\x80b", UTF8) == b"a b"

    def test_utf8_valid_passthrough(self):
        from atire_spark.kernels.scrub import UTF8, scrub

        s = "héllo 世界".encode()
        assert scrub(s, UTF8) == s

    def test_utf8_surrogate_lead_spaced(self):
        from atire_spark.kernels.scrub import UTF8, scrub

        # 0xD8-0xDF leads spaced; their continuation chomped after
        assert scrub(b"a\xd8\xb0b", UTF8) == b"a  b"

    def test_utf8_overlong_ascii_decoded(self):
        from atire_spark.kernels.scrub import UTF8, scrub

        # 0xC1 0xA1 is overlong for 'a' (0x61); second byte chomped
        assert scrub(b"\xc1\xa1x", UTF8) == b"a x"
        # overlong NUL becomes space
        assert scrub(b"\xc0\x80x", UTF8) == b"  x"

    def test_utf8_overlong_multibyte_reencoded(self):
        from atire_spark.kernels.scrub import UTF8, scrub

        # 0xE0 0x81 0xA1 is an overlong 3-byte 'a': re-encoded to a
        # single 'a' at the lead, BOTH leftover continuation bytes
        # chomped on the following iterations
        assert scrub(b"\xe0\x81\xa1x", UTF8) == b"a  x"

    def test_utf8_truncated_sequence_spaced(self):
        from atire_spark.kernels.scrub import UTF8, scrub

        # 3-byte lead with only one continuation then ASCII
        assert scrub(b"\xe4\xb8x", UTF8) == b"  x"
        # truncated at end of buffer
        assert scrub(b"x\xe4\xb8", UTF8) == b"x  "

    def test_utf8_beyond_max_codepoint(self):
        from atire_spark.kernels.scrub import UTF8, scrub

        # 0xF5.. leads are beyond U+10FFFF
        assert scrub(b"\xf5\x80\x80\x80", UTF8) == b"    "

    def test_spark_column_wrapper(self, spark):
        import pandas as pd

        from atire_spark.kernels.scrub import UTF8, scrub_column

        df = spark.createDataFrame(
            pd.DataFrame({"text": ["ok", "a\udc80b"]})
        )
        got = [
            r["text"] for r in scrub_column(df, "text", UTF8).collect()
        ]
        assert got[0] == "ok" and "a" in got[1] and "b" in got[1]


class TestCombiningMarks:
    """Standalone combining marks (NFD text): the DOCUMENT parser
    treats a mark as neither letter nor number — it ends the run and
    is skipped — while the QUERY lexer keeps it inside an XML-name
    token (XML NameChar includes CombiningChar), where it survives
    normalization and misses the vocabulary. Both behaviors verified
    against the compiled reference binary (reference_ab.py unicode
    fuzz, 220/220 strict)."""

    def test_document_tokenizer_splits_at_marks(self):
        from atire_spark.kernels.tokenizer import tokenize

        assert tokenize("cégurei") == ["ce", "gurei"]
        # precomposed form is one letter run, normalized
        assert tokenize("cégurei") == ["cegurei"]
        assert tokenize("12́34") == ["12", "34"]

    def test_query_lexer_keeps_marks_in_name_tokens(self):
        from atire_spark.query import _fold_term, _nexi_lex

        assert _nexi_lex("cégurei") == ["cégurei"]
        # the mark survives normalize (no decomposition to strip) so
        # the folded term cannot match the normalized vocabulary
        assert _fold_term("cégurei") == "cégurei"
        assert _fold_term("cégurei") == "cegurei"
        # a LEADING mark is skipped like whitespace
        assert _nexi_lex("́abc") == ["abc"]

    def test_fold_term_cyrillic_case(self):
        from atire_spark.query import _fold_term

        assert _fold_term("Пона") == (
            "пона"
        )  # mixed case normalizes
        # ALL-uppercase is a tag name, kept verbatim (misses vocab)
        assert _fold_term("ПОНА") == (
            "ПОНА"
        )
