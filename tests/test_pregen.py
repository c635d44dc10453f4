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
