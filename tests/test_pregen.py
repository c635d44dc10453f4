"""Pregen writer family — kernel vectors (pregen_writer_normal.c,
encode_char_*.h, maths.h digit-budget arithmetic) and the Spark
exact-rank writers."""

import pandas as pd
import pytest

from atire_spark.kernels.pregen import (
    _digit_budget,
    encode_bintrunc,
    encode_field,
    encode_integer,
    encode_radix,
    encode_recentdate,
)


class TestDigitBudget:
    def test_reference_compile_time_values_at_64_bits(self):
        # maths.h:410-452 instantiated at T = unsigned long long
        assert _digit_budget(256, 64) == (8, 1)
        assert _digit_budget(32, 64) == (12, 15)
        assert _digit_budget(36, 64) == (12, 3)
        assert _digit_budget(37, 64) == (12, 2)
        assert _digit_budget(40, 64) == (12, 1)
        assert _digit_budget(70, 64) == (10, 6)


class TestRadixVectors:
    # 16-bit instantiations keep the expected values hand-derivable
    def test_base36_pads_short_strings(self):
        # digits=3, final=1: "ab" -> (10*36+11) * 36
        assert encode_radix("ab", "base36", bits=16) == 371 * 36

    def test_base36_final_digit_scale_one_is_a_noop(self):
        # 4th char lands on the final digit with radix 1
        assert encode_radix("abcd", "base36", bits=16) == 371 * 36 + 12

    def test_strtrunc_raw_bytes(self):
        assert encode_radix("ab", "strtrunc", bits=16) == 0x6162

    def test_base37_space_handling(self):
        # leading spaces insignificant, inner space = symbol 0
        assert (
            encode_radix("  a b", "base37", bits=16)
            == (11 * 37 + 0) * 37 + 12
        )
        # repeated inner spaces collapse
        assert encode_radix("a   b", "base37", bits=16) == encode_radix(
            "a b", "base37", bits=16
        )

    def test_printable_ascii_final_scale(self):
        # digits=2, final=13: "a" -> 39 * 70 * 13
        assert encode_radix("a", "asciiprintables", bits=16) == 39 * 70 * 13

    def test_unencodable_chars_skipped_and_lowercased(self):
        # base36 has no space/punct mapping; uppercase folds first
        assert encode_radix("A.b", "base36", bits=16) == encode_radix(
            "ab", "base36", bits=16
        )

    def test_zero_encoding_becomes_one(self):
        # all-symbol-0 strings must not produce rsv 0
        assert encode_radix("0", "base36", bits=16) == 1
        assert encode_radix("", "base36", bits=16) == 1

    def test_64_bit_default_spot_value(self):
        # "ab" at the reference width: pad 10 digits then final 3
        assert (
            encode_radix("ab", "base36")
            == (10 * 36 + 11) * 36**10 * 3
        )


class TestScalarGenerators:
    def test_integer_clamps(self):
        assert encode_integer("42") == 42
        assert encode_integer("-5") == 1
        assert encode_integer("0") == 1
        assert encode_integer("junk") == 1
        assert encode_integer(str(1 << 70)) == (1 << 64) - 1

    def test_bintrunc_left_aligned_big_endian(self):
        assert encode_bintrunc("ab", bits=32) == 0x61620000
        assert encode_bintrunc("abcdefgh", bits=32) == 0x61626364
        assert encode_bintrunc("", bits=32) == 0

    def test_recentdate_is_atol(self):
        assert encode_recentdate("1700000000") == 1700000000
        assert encode_recentdate("x") == 0

    def test_dispatch(self):
        assert encode_field("7", "integer") == 7
        assert encode_field("ab", "base37", 16) == (
            encode_radix("ab", "base37", 16)
        )
        with pytest.raises(KeyError):
            encode_radix("x", "nosuch")


class TestExactWriters:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "docid": [0, 1, 2, 3, 4],
                    "name": ["beta", "alpha", "beta", "gamma", "alpha"],
                    "num": ["30", "7", "30", "100", "-2"],
                }
            )
        )

    def test_strexact_dense_ranks_with_ties(self, spark, docs):
        from atire_spark.pregen import pregen_scores

        got = {
            r["docid"]: r["score"]
            for r in pregen_scores(docs, "name", "strexact").collect()
        }
        # sorted distinct: alpha(1) beta(2) gamma(3); ties share
        assert got == {1: 1, 4: 1, 0: 2, 2: 2, 3: 3}

    def test_integerexact_ordinal_ranks(self, spark, docs):
        from atire_spark.pregen import pregen_scores

        got = {
            r["docid"]: r["score"]
            for r in pregen_scores(docs, "num", "integerexact").collect()
        }
        # values -2 < 7 < 30 == 30 < 100; equal values by docid
        assert got == {4: 1, 1: 2, 0: 3, 2: 4, 3: 5}

    def test_normal_writer_vectorized(self, spark, docs):
        from atire_spark.kernels.pregen import encode_radix
        from atire_spark.pregen import pregen_scores

        got = {
            r["docid"]: r["score"]
            for r in pregen_scores(docs, "name", "base37").collect()
        }
        assert got[1] == encode_radix("alpha", "base37", bits=63)

    def test_search_pregen_integration(self, spark):
        from atire_spark.build import build_index
        from atire_spark.pregen import pregen_scores
        from atire_spark.query import SearchEngine
        from atire_spark.synth import make_transcripts

        pdf = make_transcripts(60)
        eng = SearchEngine(spark, build_index(spark, spark.createDataFrame(pdf)))
        # rank matching docs by the strexact order of their external id
        docs = eng.index.docmap.select(
            "docid",
            F_concat_external(eng),
        )
        scores = pregen_scores(docs, "name", "strexact_restricted")
        res = eng.search_pregen([(1, "alpha")], scores, k=5).toPandas()
        assert len(res) == 5
        joined = res.merge(
            scores.toPandas(), on="docid"
        )
        assert list(joined.rsv_fixed) == list(joined.score)
        assert list(res.rsv_fixed) == sorted(res.rsv_fixed, reverse=True)


def F_concat_external(eng):
    from pyspark.sql import functions as F

    return F.concat_ws(
        ":", F.col("conv_id"), F.col("turn_idx")
    ).alias("name")


# ----------------------------------------------------------------------
# arithmetic-coded packings (kernels/arith.py)
# ----------------------------------------------------------------------
ARITH_TYPES = (
    "base32arith",
    "base37arith",
    "asciiprintablesarith",
    "asciiprintablesarithbigram",
)

#: strings exercising the writer walk: case fold, space collapse,
#: unencodable skip, buffer overflow, Unicode decomposition
AB_STRINGS = [
    "Hello World",
    "the quick brown fox",
    "  leading spaces",
    "multiple   spaces   inside",
    "punct!@# marks, kept? (printables)",
    "MiXeD CaSe 123 numbers",
    "a",
    "",
    "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz",
    "the the the the the the the the",
    "Ünïcödé çhårs überall",
    "short",
    "a b c d e f g h i j k l m n o p",
    "supercalifragilisticexpialidocious and more text to overflow",
    "0123456789 9876543210",
    "~tilde `backtick {braces} |pipe",
    "café résumé naïve Ångström",
    "straße Łódź Česká",
]


class TestArithVectors:
    def test_spot_values_cross_checked_vs_compiled_reference(self):
        # pinned from a pregen_create A/B run (same strings, uint64)
        from atire_spark.kernels.arith import encode_arith

        assert encode_arith("Hello World", "base32arith", bits=64) == 8521175544503285760
        assert encode_arith("Hello World", "base37arith", bits=64) == 8529686658437182048
        assert (
            encode_arith("Hello World", "asciiprintablesarith", bits=64)
            == 9280824717906687168
        )
        assert (
            encode_arith("Hello World", "asciiprintablesarithbigram", bits=64)
            == 8836938819437615616
        )

    def test_63_bit_codes_fit_bigint(self):
        from atire_spark.kernels.arith import encode_arith

        for t in ARITH_TYPES:
            for s in AB_STRINGS:
                v = encode_arith(s, t, bits=63)
                assert 1 <= v < (1 << 63)

    def test_all_zero_code_becomes_one(self):
        # the all-space / empty field hits the reference's zero bump
        from atire_spark.kernels.arith import encode_arith

        for t in ARITH_TYPES:
            assert encode_arith("", t) == 1
            assert encode_arith("    ", t) == 1

    def test_space_collapse_and_case_fold_match_radix_walk(self):
        from atire_spark.kernels.arith import encode_arith

        for t in ARITH_TYPES:
            assert encode_arith("a   b", t) == encode_arith("A b", t)
            assert encode_arith("  hello", t) == encode_arith("hello", t)

    def test_long_input_stops_at_full_buffer(self):
        from atire_spark.kernels.arith import encode_arith

        a = encode_arith("x" * 500, "base37arith")
        b = encode_arith("x" * 5000, "base37arith")
        assert a == b  # both overflowed at the same prefix

    def test_model_validation(self):
        from atire_spark.kernels.arith import MAX_FREQUENCY, ArithModel

        with pytest.raises(ValueError):
            ArithModel(3, [1, 0, 1])  # zero-mass symbol stalls the coder
        with pytest.raises(ValueError):
            ArithModel(2, [MAX_FREQUENCY, 1])  # cap exceeded
        with pytest.raises(ValueError):
            ArithModel(3, [1, 1])  # wrong arity

    def test_unicode_normalize_decomposes_and_drops_marks(self):
        # unicode.c:198-257: base form kept, combining marks dropped
        from atire_spark.kernels.pregen import normalize_lowercase

        assert normalize_lowercase("Ü") == "u"  # U-umlaut
        assert normalize_lowercase("é") == "e"  # e-acute
        assert normalize_lowercase("A") == "a"
        assert normalize_lowercase("中") == "中"  # no decomposition


_PREGEN_CREATE = "/tmp/atire_build_st/bin/pregen_create"


@pytest.mark.skipif(
    not __import__("os").access(_PREGEN_CREATE, 1),
    reason="no compiled reference pregen_create (make pregen_create in the A/B tree)",
)
class TestArithVsReferenceBinary:
    """Value-identity against the compiled reference's own pregen
    writer, covering all four arith types AND the radix/normalize
    walk (the Unicode vectors certify normalize_lowercase)."""

    @pytest.fixture(scope="class")
    def ref_scores(self, tmp_path_factory):
        import os
        import struct
        import subprocess

        work = tmp_path_factory.mktemp("pregen_ab")
        doclist = work / "doclist.txt"
        with open(doclist, "w") as fh:
            for i, s in enumerate(AB_STRINGS):
                fh.write(f"doc{i:04d} <title>{s}</title>\n")
        types = list(ARITH_TYPES) + ["base32", "base37", "asciiprintables"]
        out = {}
        for t in types:
            subprocess.run(
                [_PREGEN_CREATE, str(doclist), "title", t],
                cwd=work,
                check=True,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            data = open(work / f"pregen.title.{t}", "rb").read()
            n = len(AB_STRINGS)
            out[t] = struct.unpack(f"<{n}Q", data[-20 - 8 * n : -20])
        return out

    @pytest.mark.parametrize("field_type", ARITH_TYPES)
    def test_arith_value_identity(self, ref_scores, field_type):
        from atire_spark.kernels.arith import encode_arith

        ours = [encode_arith(s, field_type, bits=64) for s in AB_STRINGS]
        assert ours == list(ref_scores[field_type])

    @pytest.mark.parametrize("field_type", ["base32", "base37", "asciiprintables"])
    def test_radix_value_identity_incl_unicode(self, ref_scores, field_type):
        from atire_spark.kernels.pregen import encode_radix

        ours = [encode_radix(s, field_type, bits=64) for s in AB_STRINGS]
        assert ours == list(ref_scores[field_type])


class TestArithModelTrainer:
    def test_counts_to_freqs_floor_and_cap(self):
        from atire_spark.kernels.arith import MAX_FREQUENCY, counts_to_freqs

        f = counts_to_freqs({0: 5, 2: 1}, 3)
        assert f == (6, 1, 2)  # count + the all-ones prior
        # cap: halve with the reference's (f+1)/2 until it fits
        f = counts_to_freqs({0: 40000}, 2)
        assert sum(f) <= MAX_FREQUENCY and f[1] >= 1

    def test_counts_to_freqs_bigram_caps_per_context(self):
        from atire_spark.kernels.arith import MAX_FREQUENCY, counts_to_freqs

        nsym = 3
        f = counts_to_freqs({0 * nsym + 1: 50000, 2 * nsym + 0: 7}, nsym, bigram=True)
        assert len(f) == (nsym + 1) * nsym
        for c in range(nsym + 1):
            assert sum(f[c * nsym : (c + 1) * nsym]) <= MAX_FREQUENCY
        assert f[2 * nsym + 0] == 8

    def test_trained_model_encodes_and_orders(self, spark):
        from atire_spark.kernels.arith import ArithModel, encode_arith
        from atire_spark.pregen import train_arith_model

        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "docid": range(4),
                    "name": ["aaa bbb", "abc", "  CAPS  ", "zzz"],
                }
            )
        )
        table = train_arith_model(docs, "name", "base37arith")
        model = ArithModel(37, table)
        codes = [
            encode_arith(s, "base37arith", model=ArithModel(37, table))
            for s in ["aaa", "abc", "zzz"]
        ]
        assert all(1 <= c < (1 << 63) for c in codes)
        assert len(set(codes)) == 3

    def test_trainer_matches_local_counts(self, spark):
        from atire_spark.kernels.arith import counts_to_freqs, symbol_stream
        from atire_spark.pregen import train_arith_model

        names = ["Hello  World", "abc", "", "a  b"]
        docs = spark.createDataFrame(
            pd.DataFrame({"docid": range(len(names)), "name": names})
        )
        got = train_arith_model(docs, "name", "base37arith")
        from collections import Counter

        counts = Counter()
        for s in names:
            # the model-gen tool does NOT collapse spaces
            counts.update(symbol_stream(s, "base37", collapse_spaces=False))
        assert got == counts_to_freqs(counts, 37)

    def test_trainer_bigram_context_resets_per_document(self, spark):
        from atire_spark.kernels.arith import counts_to_freqs
        from atire_spark.pregen import train_arith_model

        docs = spark.createDataFrame(
            pd.DataFrame({"docid": [0, 1], "name": ["ab", "ba"]})
        )
        got = train_arith_model(docs, "name", "asciiprintablesarithbigram")
        # printable-ascii: 'a' -> 39, 'b' -> 40; ctx = sym+1, start ctx 0
        nsym = 70
        counts = {
            0 * nsym + 39: 1,  # start -> a   (doc 0)
            40 * nsym + 40: 1,  # a -> b
            0 * nsym + 40: 1,  # start -> b   (doc 1: context reset)
            41 * nsym + 39: 1,  # b -> a
        }
        assert got == counts_to_freqs(counts, nsym, bigram=True)


class TestArithSpark:
    def test_pregen_scores_arith_matches_kernel(self, spark):
        from atire_spark.kernels.arith import encode_arith
        from atire_spark.pregen import pregen_scores

        names = ["alpha bravo", "Charlie", "  delta  ", ""]
        docs = spark.createDataFrame(
            pd.DataFrame({"docid": range(len(names)), "name": names})
        )
        for t in ARITH_TYPES:
            got = {
                r["docid"]: r["score"]
                for r in pregen_scores(docs, "name", t).collect()
            }
            want = {i: encode_arith(s, t, bits=63) for i, s in enumerate(names)}
            assert got == want

    def test_pregen_scores_arith_with_trained_model(self, spark):
        from atire_spark.kernels.arith import ArithModel, encode_arith
        from atire_spark.pregen import pregen_scores, train_arith_model

        names = ["alpha bravo", "charlie", "delta echo", "foxtrot"]
        docs = spark.createDataFrame(
            pd.DataFrame({"docid": range(len(names)), "name": names})
        )
        table = train_arith_model(docs, "name", "base32arith")
        got = {
            r["docid"]: r["score"]
            for r in pregen_scores(
                docs, "name", "base32arith", arith_model=table
            ).collect()
        }
        want = {
            i: encode_arith(s, "base32arith", model=ArithModel(32, table), bits=63)
            for i, s in enumerate(names)
        }
        assert got == want
