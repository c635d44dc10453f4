"""Thesaurus (WordNet) query-expansion tests.

Binary-format parity was verified against the COMPILED REFERENCE C:
thesaurus_wordnet.c's reader (built with g++ from
/root/reference/source plus its file/critical-section deps) was run
over files written by Thesaurus.to_ant_file and returned identical
synsets, relationship masks, and filter behavior for every probed
headword (synonym-only and ALL-relationships modes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from atire_spark.thesaurus import Thesaurus


# ------------------------------------------------------------- pure model
def test_from_pairs_normalization():
    t = Thesaurus.from_pairs(
        [
            ("car", Thesaurus.SYNONYM, "auto"),
            ("car", Thesaurus.HYPERNYM, "auto"),  # OR-merged
            ("car", Thesaurus.SYNONYM, "car"),  # self dropped
            ("car", Thesaurus.NONE, "junk"),  # zero mask dropped
            ("car", Thesaurus.SYNONYM, "automobile"),
        ]
    )
    assert t.entries == {
        "car": [
            (Thesaurus.SYNONYM | Thesaurus.HYPERNYM, "auto"),
            (Thesaurus.SYNONYM, "automobile"),
        ]
    }


def test_relationship_filtering():
    t = Thesaurus.from_pairs(
        [
            ("fast", Thesaurus.SYNONYM, "quick"),
            ("fast", Thesaurus.ANTONYM, "slow"),
            ("fast", Thesaurus.HYPERNYM, "speedy"),
        ]
    )
    assert t.get_synset("fast") == ["quick"]  # default SYNONYM only
    t.set_allowable_relationships(Thesaurus.ALL)
    assert t.get_synset("fast") == ["quick", "slow", "speedy"]
    t.set_allowable_relationships(Thesaurus.ANTONYM)
    assert t.get_synset("fast") == ["slow"]
    assert t.get_synset("missing") == []


def test_synonym_rings():
    t = Thesaurus.synonyms([["a", "b", "c"], ["x", "y"]])
    assert t.get_synset("a") == ["b", "c"]
    assert t.get_synset("y") == ["x"]


def test_ant_file_round_trip(tmp_path):
    t = Thesaurus.from_pairs(
        [
            ("car", Thesaurus.SYNONYM, "auto"),
            ("car", Thesaurus.HYPERNYM, "vehicle"),
            ("query", Thesaurus.SYNONYM, "question"),
            ("zebra", Thesaurus.MERONYM, "stripe"),
        ]
    )
    path = str(tmp_path / "test.aspt")
    t.to_ant_file(path)
    t2 = Thesaurus.from_ant_file(path)
    assert t2.entries == t.entries


def test_ant_file_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.aspt")
    with open(path, "wb") as f:
        f.write(b"not a thesaurus file, much too short to be one" * 4)
    with pytest.raises(ValueError, match="WORDNET"):
        Thesaurus.from_ant_file(path)


# ------------------------------------------------------------- end-to-end
# cars/autos share docs so conflation genuinely changes df and ranks
SYN_TRANSCRIPTS = pd.DataFrame(
    {
        "conv_id": ["c0"] * 4 + ["c1"] * 4,
        "turn_idx": [0, 1, 2, 3] * 2,
        "text": [
            "red car parked outside",
            "blue auto in the garage",
            "the automobile needs fuel",
            "bicycle lane is busy",
            "car and auto and automobile",
            "just one car here",
            "fuel prices keep rising",
            "auto auto auto repair shop",
        ],
    }
)

THES = Thesaurus.synonyms([["car", "auto", "automobile"]])


@pytest.fixture(scope="module")
def syn_engine(spark):
    from atire_spark.build import build_index
    from atire_spark.query import SearchEngine

    idx = build_index(spark, spark.createDataFrame(SYN_TRANSCRIPTS))
    return SearchEngine(spark, idx)


def test_expanded_search_matches_oracle(spark, syn_engine):
    from atire_spark.oracle import OracleIndex

    oi = OracleIndex.build(SYN_TRANSCRIPTS)
    for q in ["car", "fuel car", "automobile bicycle"]:
        got = syn_engine.search_expanded([(1, q)], THES, k=10).toPandas()
        want = oi.search_expanded(q, THES, k=10)
        assert list(got["docid"]) == list(want["docid"]), q
        assert list(got["rsv_fixed"]) == list(want["rsv_fixed"]), q


def test_expanded_equals_manual_term_bag(spark, syn_engine):
    """Expansion is literally extra query terms at the same weight
    (nexi.c:487-494) — 'car' expanded == 'car auto automobile'."""
    got = syn_engine.search_expanded([(1, "car")], THES, k=10).toPandas()
    manual = syn_engine.search_batch(
        [(1, "car auto automobile")], k=10
    ).toPandas()
    assert list(got["docid"]) == list(manual["docid"])
    assert list(got["rsv_fixed"]) == list(manual["rsv_fixed"])


def test_conflated_search_matches_oracle(spark, syn_engine):
    from atire_spark.oracle import OracleIndex

    oi = OracleIndex.build(SYN_TRANSCRIPTS)
    for q in ["car", "fuel car", "automobile bicycle", "car car"]:
        got = syn_engine.search_conflated([(1, q)], THES, k=10).toPandas()
        want = oi.search_conflated(q, THES, k=10)
        assert list(got["docid"]) == list(want["docid"]), q
        assert list(got["rsv_fixed"]) == list(want["rsv_fixed"]), q


def test_conflated_differs_from_expanded(spark, syn_engine):
    """Conflation merges postings into ONE term (df from the union,
    per-doc tf summed before the BM25 saturation) — scores must differ
    from scoring each synonym independently."""
    exp = syn_engine.search_expanded([(1, "car")], THES, k=10).toPandas()
    con = syn_engine.search_conflated([(1, "car")], THES, k=10).toPandas()
    assert list(exp["rsv_fixed"]) != list(con["rsv_fixed"])


def test_conflated_no_synset_equals_plain(spark, syn_engine):
    """Empty synset falls back to the regular per-term search path
    (search_engine.c:1399-1409)."""
    plain = syn_engine.search_one("fuel", k=10).toPandas()
    con = syn_engine.search_conflated([(1, "fuel")], THES, k=10).toPandas()
    assert list(plain["docid"]) == list(con["docid"])
    assert list(plain["rsv_fixed"]) == list(con["rsv_fixed"])


def test_conflated_rejects_quantized(spark):
    from atire_spark.build import build_index
    from atire_spark.query import SearchEngine

    idx = build_index(
        spark, spark.createDataFrame(SYN_TRANSCRIPTS), quantize_bits=8
    )
    eng = SearchEngine(spark, idx)
    with pytest.raises(ValueError, match="quantized"):
        eng.search_conflated([(1, "car")], THES, k=10)


def test_tf_cap_binds_in_conflation(spark):
    """A doc whose summed synonym tf exceeds 255 is scored at 255
    (ranking_function.c:149-150)."""
    from atire_spark.build import build_index
    from atire_spark.oracle import OracleIndex
    from atire_spark.query import SearchEngine

    heavy = pd.DataFrame(
        {
            "conv_id": ["c0", "c0", "c1"],
            "turn_idx": [0, 1, 0],
            "text": [
                " ".join(["car"] * 200 + ["auto"] * 200),
                "car auto",
                "vehicle only here",
            ],
        }
    )
    idx = build_index(spark, spark.createDataFrame(heavy))
    eng = SearchEngine(spark, idx)
    got = eng.search_conflated([(1, "car")], THES, k=10).toPandas()
    oi = OracleIndex.build(heavy)
    want = oi.search_conflated("car", THES, k=10)
    assert list(got["docid"]) == list(want["docid"])
    assert list(got["rsv_fixed"]) == list(want["rsv_fixed"])
    # and the capped doc's tf really was saturated: its fixed-point
    # score equals the tf=255 closed form
    from atire_spark.kernels.bm25 import BM25_B, BM25_K1

    n_docs, mean_len = oi.n_docs, oi.mean_doc_len
    dl = float(oi.doc_lens[0])
    prior = np.float64(
        np.float32(BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl / mean_len)))
    )
    idf = float(np.log(np.float64(n_docs) / np.float64(2)))  # df=2 docs
    rsv = idf * ((255.0 * (BM25_K1 + 1.0)) / (255.0 + prior))
    expected = 1 + int(rsv * 100.0)
    row0 = got[got["docid"] == 0]
    assert int(row0["rsv_fixed"].iloc[0]) == expected


class TestWordnetSourceCompiler:
    """tools/wordnet_to_ant_thesaurus.c parity on a synthetic WordNet
    data-file fixture (no external data): synset lemmas conflate as
    SYNONYM, pointer symbols fold through the tool's relationship
    table (hyponym kinds -> HYPONYM, holonym kinds -> HOLONYM, ...),
    unmapped WordNet pointers drop, collocations normalize to quoted
    phrases, and the result round-trips the .aspt binary format."""

    def test_compile_and_roundtrip(self, tmp_path):
        from atire_spark.thesaurus import Thesaurus

        # two-pass fixture build so pointers carry real byte offsets
        header = "  1 license header\n"
        bodies = [
            # off0: animal (target of hypernym pointers)
            "{o0} 03 n 01 animal 0 0 | living thing",
            # off1: cat/feline, hypernym -> animal, skipped -c pointer
            "{o1} 03 n 02 cat 0 feline 0 2 @ {o0} n 0000 -c {o0} n 0000 | a cat",
            # off2: big_cat (collocation), hyponym-instance -> cat synset,
            # antonym -> animal (nonsense semantically, exercises the bit)
            "{o2} 03 n 01 big_cat 0 2 ~i {o1} n 0000 ! {o0} n 0000 | big",
        ]
        # pass 1 computes each line's byte offset (offsets appear in
        # the line bodies with a fixed 8-digit width, so lengths are
        # stable); pass 2 renders with the final values
        offs = {}
        pos = len(header)
        zero = {f"o{j}": "00000000" for j in range(len(bodies))}
        for i, b in enumerate(bodies):
            offs[f"o{i}"] = f"{pos:08d}"
            pos += len(b.format(**zero)) + 1
        text = header + "".join(b.format(**offs) + "\n" for b in bodies)

        th = Thesaurus.from_wordnet_source(noun=text)
        # cat's leaf: feline SYNONYM(32), animal HYPERNYM(16)
        assert sorted(th.entries["cat"]) == [(16, "animal"), (32, "feline")]
        assert sorted(th.entries["feline"]) == [(16, "animal"), (32, "cat")]
        # the collocation normalizes to a quoted phrase headword
        assert '"big cat"' in th.entries
        # hyponym-instance folds to HYPONYM(1), antonym to ANTONYM(2):
        # big_cat's leaf points at cat/feline (1) and animal (2)
        assert sorted(th.entries['"big cat"']) == [
            (1, "cat"), (1, "feline"), (2, "animal")
        ]
        # animal has no pointers and is alone in its synset -> no leaf
        assert "animal" not in th.entries

        # round-trip through the reference's .aspt binary format
        p = str(tmp_path / "wn.aspt")
        th.to_ant_file(p)
        back = Thesaurus.from_ant_file(p)
        assert back.entries == th.entries

        # expansion semantics: default filter is SYNONYM only
        assert back.get_synset("cat") == ["feline"]
        back.set_allowable_relationships(Thesaurus.SYNONYM | Thesaurus.HYPERNYM)
        assert back.get_synset("cat") == ["animal", "feline"]

    def test_unknown_pointer_symbol_raises(self):
        from atire_spark.thesaurus import Thesaurus

        bad = "00000000 03 n 01 dog 0 1 ?? 00000000 n 0000 | x\n"
        import pytest

        with pytest.raises(ValueError, match="unknown WordNet pointer"):
            Thesaurus.from_wordnet_source(noun=bad)

    def test_cli_compiler(self, tmp_path):
        """cli_thesaurus.py mirrors the tool's argv surface: four data
        files in, one .aspt out, loadable by the reader."""
        from atire_spark.thesaurus import Thesaurus
        import cli_thesaurus

        header = "  1 license header\n"
        body = "{o0} 03 n 02 cat 0 feline 0 0 | a cat"
        o0 = f"{len(header):08d}"
        noun = header + body.format(o0=o0) + "\n"
        empty = header  # a pos file with only the license block
        paths = {}
        for name, text in (
            ("data.noun", noun), ("data.verb", empty),
            ("data.adj", empty), ("data.adv", empty),
        ):
            p = tmp_path / name
            p.write_text(text)
            paths[name] = str(p)
        out = str(tmp_path / "wn.aspt")
        rc = cli_thesaurus.main(
            [paths["data.noun"], paths["data.verb"],
             paths["data.adj"], paths["data.adv"], "-o", out]
        )
        assert rc == 0
        th = Thesaurus.from_ant_file(out)
        assert th.entries == {
            "cat": [(32, "feline")], "feline": [(32, "cat")]
        }
