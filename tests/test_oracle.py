"""Oracle + fixture generator tests (no Spark)."""

import numpy as np
import pandas as pd

from atire_spark.oracle import OracleIndex
from atire_spark.synth import make_queries, make_transcripts


def _tiny_corpus() -> pd.DataFrame:
    rows = [
        ("c0", 0, "user", "the cat sat on the mat", None),
        ("c0", 1, "assistant", "a cat and a dog", None),
        ("c1", 0, "user", "   ", None),  # empty → skipped, no docid
        ("c1", 1, "assistant", "dog dog dog bites 42", None),
        ("c2", 0, "user", "the the the the", None),
    ]
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool"]
    )


class TestOracleBuild:
    def test_docids_skip_empty(self):
        idx = OracleIndex.build(_tiny_corpus())
        assert idx.n_docs == 4
        dm = idx.docmap.set_index(["conv_id", "turn_idx"])["docid"].to_dict()
        # ("c1", 0) consumed no docid
        assert dm == {("c0", 0): 0, ("c0", 1): 1, ("c1", 1): 2, ("c2", 0): 3}

    def test_doc_lens_and_stats(self):
        idx = OracleIndex.build(_tiny_corpus())
        assert list(idx.doc_lens) == [6, 5, 5, 4]
        assert idx.collection_len == 20
        assert idx.mean_doc_len == 5.0

    def test_postings(self):
        idx = OracleIndex.build(_tiny_corpus())
        d, f = idx.postings["dog"]
        assert list(d) == [1, 2]
        assert list(f) == [1, 3]
        d, f = idx.postings["42"]
        assert list(d) == [2]


class TestOracleSearch:
    def test_tf_and_length_effects(self):
        idx = OracleIndex.build(_tiny_corpus())
        res = idx.search("dog", k=10)
        # doc 2 has tf=3 → higher rsv than doc 1 (tf=1)
        assert list(res["docid"]) == [2, 1]
        assert res["rsv_fixed"].iloc[0] > res["rsv_fixed"].iloc[1]

    def test_df_equals_n_contributes_nothing(self):
        rows = [
            ("c0", 0, "u", "common alpha", None),
            ("c0", 1, "u", "common beta", None),
        ]
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
        idx = OracleIndex.build(df)
        res = idx.search("common", k=10)  # df == N → idf == 0 → nothing
        assert len(res) == 0
        res = idx.search("common alpha", k=10)
        assert list(res["docid"]) == [0]

    def test_tie_break_larger_docid_first(self):
        rows = [
            ("c0", 0, "u", "tie word pad", None),
            ("c0", 1, "u", "tie word pad", None),
            ("c0", 2, "u", "other text here", None),
        ]
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
        idx = OracleIndex.build(df)
        res = idx.search("tie", k=10)
        assert list(res["docid"]) == [1, 0]  # identical rsv → larger docid first

    def test_absent_term(self):
        idx = OracleIndex.build(_tiny_corpus())
        assert len(idx.search("zzzmissing", k=5)) == 0

    def test_case_folding_follows_reference(self):
        """Binary-verified (reference_ab setup): a mixed-case term
        lowercases whole ('Dog'/'DoG' → 'dog'), but an ALL-uppercase
        term is a tag-name lookup kept verbatim
        (atire_api.c string_pair_to_term) — on an untagged corpus it
        matches nothing ('ALPHA' → <numhits>0</numhits> from the
        compiled reference vs 1677 for 'alpha'/'Alpha'/'AlPhA')."""
        idx = OracleIndex.build(_tiny_corpus())
        want = list(idx.search("dog", k=5)["docid"])
        assert want  # the corpus really contains the term
        assert list(idx.search("Dog", k=5)["docid"]) == want
        assert list(idx.search("DoG", k=5)["docid"]) == want
        assert len(idx.search("DOG", k=5)) == 0


class TestSynth:
    def test_deterministic(self):
        a = make_transcripts("tiny")
        b = make_transcripts("tiny")
        pd.testing.assert_frame_equal(a, b)

    def test_schema_and_contract(self):
        df = make_transcripts("tiny")
        assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        # contiguous turn_idx per conv
        g = df.groupby("conv_id")["turn_idx"]
        assert (g.min() == 0).all()
        assert (g.max() + 1 == g.count()).all()
        # stable ordering: already sorted by (conv_id, turn_idx)
        assert df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(
            df.reset_index(drop=True)
        )

    def test_small_has_skew_and_empties(self):
        df = make_transcripts("small")
        texts = df["text"]
        assert (texts.str.strip() == "").sum() > 10  # empties present
        assert texts.str.contains("omegaterm").mean() > 0.05  # adversarial term
        assert texts.str.contains("alpha").mean() > 0.08  # stop-terms

    def test_queries_fixture(self):
        q = make_queries()
        assert len(q) == 30
        assert q["query_id"].tolist() == list(range(1, 31))


class TestOracleOnSynth:
    def test_small_scale_end_to_end(self):
        idx = OracleIndex.build(make_transcripts("tiny"))
        assert idx.n_docs > 100
        res = idx.search("alpha", k=10)
        assert len(res) == 10
        assert (np.diff(res["rsv_fixed"].to_numpy()) <= 0).all()
