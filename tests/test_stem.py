"""Stemmer kernels: rule tables hand-derived from the reference C
(stem_s.c, stem_porter.c) + gates + end-to-end stemmed index parity."""

import pandas as pd
import pytest

from atire_spark.kernels.stem import (
    index_stem,
    query_stem,
    stem_porter,
    stem_s,
    stem_unique,
)

# --------------------------------------------------------------- s-stripper
S_CASES = [
    ("queries", "query"),  # ies → y
    ("ponies", "pony"),
    ("hashes", "hash"),  # es strip
    ("merges", "merg"),  # crude es strip — reference behavior
    ("tables", "tabl"),
    ("joins", "join"),  # s strip
    ("rows", "row"),
    ("mass", "mas"),  # final s stripped even after s
    ("window", "window"),  # no suffix
    ("dies", "dy"),  # ies on a 4-letter word
]


@pytest.mark.parametrize("word,want", S_CASES)
def test_stem_s(word, want):
    assert stem_s(word) == want


# -------------------------------------------------------------------- porter
# full-pipeline outputs (all steps cascade, like the C stem() does);
# cases cover every step of stem_porter.c
PORTER_CASES = [
    ("caresses", "caress"),  # 1a sses→ss
    ("ponies", "poni"),  # 1a ies→i
    ("caress", "caress"),  # 1a ss stays
    ("cats", "cat"),  # 1a s strip
    # ATIRE deviation (stem_porter.c:99-106): when "eed" fails its
    # m>0 gate the else-if chain FALLS THROUGH to the "ed" rule —
    # canonical Porter stops at the longest matched suffix, ATIRE
    # doesn't, so feed → fe (has_vowel("fe") holds)
    ("feed", "fe"),
    ("agreed", "agre"),  # 1b eed m>0 → agree; 5a then drops the e
    ("plastered", "plaster"),  # 1b ed + vowel
    ("bled", "bled"),  # 1b ed, no vowel before
    ("motoring", "motor"),  # 1b ing
    ("sing", "sing"),  # 1b ing, no vowel before
    ("conflated", "conflat"),  # 1b at→ate; 5a drops the e
    ("troubled", "troubl"),  # 1b bl→ble; 5a drops the e
    ("sized", "size"),  # 1b cleanup iz→ize
    ("hopping", "hop"),  # 1b cleanup double consonant
    ("tanned", "tan"),
    ("falling", "fall"),  # double l NOT collapsed
    ("hissing", "hiss"),  # double s NOT collapsed
    ("failing", "fail"),
    ("filing", "file"),  # 1b cleanup m==1 cvc → +e
    ("happy", "happi"),  # 1c y→i
    ("sky", "sky"),  # 1c no earlier vowel
    ("relational", "relat"),  # 2 ational→ate; 5a drops the e
    ("conditional", "condit"),  # 2 tional→tion; 4 strips ion
    ("rational", "ration"),  # 2 gate m==0 leaves it; 4 strips al
    ("valenci", "valenc"),  # 2 enci→ence; 5a drops the e
    ("digitizer", "digit"),  # 2 izer→ize; 4 strips ize
    ("radicalli", "radic"),  # 2 alli→al; 4 strips al
    ("differentli", "differ"),  # 2 entli→ent; 4 strips ent
    ("vileli", "vile"),  # 2 eli→e
    ("analogousli", "analog"),  # 2 ousli→ous, 4 ous
    ("vietnamization", "vietnam"),  # 2 ization→ize, 4 ize
    ("predication", "predic"),  # 2 ation→ate, 4 ate
    ("operator", "oper"),  # 2 ator→ate, 4 ate
    ("feudalism", "feudal"),  # 2 alism→al
    ("decisiveness", "decis"),  # 2 iveness→ive, 4 ive
    ("hopefulness", "hope"),  # 2 fulness→ful, 3 ful
    ("callousness", "callous"),  # 2 ousness→ous
    ("formaliti", "formal"),  # 2 aliti→al
    ("sensitiviti", "sensit"),  # 2 iviti→ive, 4 ive
    ("sensibiliti", "sensibl"),  # 2 biliti→ble
    ("triplicate", "triplic"),  # 3 icate→ic
    ("formative", "form"),  # 3 ative→''
    ("formalize", "formal"),  # 3 alize→al
    ("electrical", "electr"),  # 3 ical→ic, 4 ic
    ("hopeful", "hope"),  # 3 ful
    ("goodness", "good"),  # 3 ness
    ("revival", "reviv"),  # 4 al
    ("allowance", "allow"),  # 4 ance
    ("inference", "infer"),  # 4 ence
    ("airliner", "airlin"),  # 4 er
    ("gyroscopic", "gyroscop"),  # 4 ic
    ("adjustable", "adjust"),  # 4 able
    ("defensible", "defens"),  # 4 ible
    ("irritant", "irrit"),  # 4 ant
    ("replacement", "replac"),  # 4 ement
    ("adjustment", "adjust"),  # 4 ment
    ("dependent", "depend"),  # 4 ent
    ("adoption", "adopt"),  # 4 ion with t
    ("homologous", "homolog"),  # 4 ous
    ("communism", "commun"),  # 4 ism
    ("activate", "activ"),  # 4 ate
    ("angulariti", "angular"),  # 4 iti... via step2 aliti
    ("effective", "effect"),  # 4 ive
    ("bowdlerize", "bowdler"),  # 4 ize
    ("probate", "probat"),  # 5a m==1, not cvc... e dropped
    ("rate", "rate"),  # 5a m==1 cvc(at) keeps e
    ("cease", "ceas"),  # 5a
    ("controll", "control"),  # 5b double l, m>1
    ("roll", "roll"),  # 5b m==1 keeps ll
]


@pytest.mark.parametrize("word,want", PORTER_CASES)
def test_stem_porter(word, want):
    assert stem_porter(word) == want


def test_porter_first_two_chars_stable():
    # stem_porter.c:292-299: the stem never changes the first chars we
    # rely on for dictionary-range scans
    for w, _ in PORTER_CASES:
        assert stem_porter(w)[:1] == w[:1]


# --------------------------------------------------------------------- gates
def test_index_gate_length_and_numbers():
    # index side: <=3 chars unstemmed (index_document.c:103),
    # digit runs never stemmed
    assert index_stem("ies", "s") == "ies"
    assert index_stem("dies", "s") == "dy"
    assert index_stem("1234s", "s") == "1234s"  # not a word token shape
    assert index_stem("abs", "porter") == "abs"


def test_query_gate_length():
    # query side stems length >= 3 (search_engine.c:777) — asymmetric
    # with the index side for length-3 terms, like the reference
    assert query_stem("ies", "s") == "y"
    assert query_stem("ab", "s") == "ab"
    assert query_stem("234", "s") == "234"  # first char not lowercase letter
    assert query_stem("abc", None) == "abc"


def test_stem_unique_vectorized():
    import numpy as np

    uniq = np.array(["joins", "the", "queries", "99s"], dtype=object)
    out = stem_unique(uniq, "s")
    assert list(out) == ["join", "the", "query", "99s"]


# ------------------------------------------------------------- end-to-end
PLURAL_TRANSCRIPTS = pd.DataFrame(
    {
        "conv_id": ["c0"] * 4 + ["c1"] * 4,
        "turn_idx": [0, 1, 2, 3] * 2,
        "text": [
            "queries and tables with hashes",
            "the query joins rows",
            "windows sorts streams merges",
            "window sort stream merge",
            "ponies ponies pony",
            "relational operators motoring",
            "relate operate motor",
            "caresses caress cats cat",
        ],
    }
)


@pytest.mark.parametrize(
    "stemmer",
    [
        "s",
        "porter",
        "krovetz",
        "paice_husk",
        "otago",
        "otago_v2",
        "soundex",
        "double_metaphone",
        "snowball_english",
        "snowball_lovins",
    ],
)
def test_stemmed_index_matches_oracle(spark, stemmer):
    """Spark stemmed build + query == numpy oracle with the same
    stemmer, on a plural-rich corpus where stemming changes ranks."""
    from atire_spark.build import build_index
    from atire_spark.oracle import OracleIndex
    from atire_spark.query import SearchEngine

    tdf = spark.createDataFrame(PLURAL_TRANSCRIPTS)
    idx = build_index(spark, tdf, stemmer=stemmer)
    eng = SearchEngine(spark, idx)
    oi = OracleIndex.build(PLURAL_TRANSCRIPTS, stemmer=stemmer)
    for q in ["query", "queries", "pony", "relational", "caresses", "motoring"]:
        got = eng.search_one(q, k=10).toPandas()
        want = oi.search(q, k=10)
        assert list(got["docid"]) == list(want["docid"]), (stemmer, q)
        assert list(got["rsv_fixed"]) == list(want["rsv_fixed"]), (stemmer, q)


def test_stemmer_mismatch_rejected(spark):
    from atire_spark.build import build_index
    from atire_spark.query import SearchEngine

    tdf = spark.createDataFrame(PLURAL_TRANSCRIPTS)
    idx = build_index(spark, tdf, stemmer="s")
    with pytest.raises(ValueError, match="~stemmer"):
        SearchEngine(spark, idx, stemmer="porter")
    with pytest.raises(ValueError, match="~stemmer"):
        SearchEngine(spark, idx, stemmer=None)
    # auto picks up the recorded stemmer
    assert SearchEngine(spark, idx).stemmer == "s"


# ------------------------------------------- Paice-Husk / Otago v1 / v2
# Expected stems VERIFIED AGAINST THE COMPILED REFERENCE C: each table
# below was produced by running stem_paice_husk.c / stem_otago.c /
# stem_otago_v2.c (built with g++ from /root/reference/source) over a
# 6,091-word vocabulary (corpus terms + suffix-rich synthetics + random
# strings) and freezing 40 rule-exercising cases per stemmer; the full
# sweep matched 6,091/6,091 for all three.
_PAICE_HUSK_CASES = [
    ('agueist', 'agu'),
    ('alure', 'al'),
    ('alurice', 'al'),
    ('apse', 'ap'),
    ('apsesion', 'apses'),
    ('aqgjyyba', 'aqgjyyb'),
    ('computej', 'computes'),
    ('connectous', 'connect'),
    ('djmgthkgpaj', 'djmgthkgpas'),
    ('ehfs', 'ehf'),
    ('generalive', 'gener'),
    ('itoncy', 'itont'),
    ('jkkni', 'jkkn'),
    ('magnetary', 'magnet'),
    ('magnetent', 'magnet'),
    ('maximical', 'maxim'),
    ('nckhtybjcs', 'nckhtybjc'),
    ('noncii', 'nonci'),
    ('noncory', 'nont'),
    ('organncy', 'organnt'),
    ('pcrnoizxxj', 'pcrnoizxxs'),
    ('programic', 'program'),
    ('pvunc', 'pvunt'),
    ('queics', 'queic'),
    ('querical', 'quer'),
    ('rderce', 'rderc'),
    ('rderxion', 'rderct'),
    ('realant', 'real'),
    ('shirs', 'shir'),
    ('sqgvbfblj', 'sqgvbfbls'),
    ('srevubuisa', 'srevubuis'),
    ('stdlsuuxbwna', 'stdlsuuxbwn'),
    ('tablia', 'tabl'),
    ('troublers', 'troubl'),
    ('troublist', 'troubl'),
    ('troublment', 'troubl'),
    ('uelers', 'ueler'),
    ('uelrian', 'uelr'),
    ('uervjkfe', 'uervjkf'),
    ('weltale', 'welt'),
]

_OTAGO_CASES = [
    ('aguef', 'agueuow'),
    ('classics', 'classe'),
    ('connectale', 'connectal'),
    ('eanable', 'eanabl'),
    ('ebxlovsq', 'ebxlov'),
    ('egciwyxyvti', 'egciwyxyvtdop'),
    ('electrce', 'electrc'),
    ('generalic', 'general'),
    ('hkhdbnf', 'hkhdbnuow'),
    ('ifhcvypq', 'ifhcvyp'),
    ('indexce', 'indexc'),
    ('indexic', 'index'),
    ('indexii', 'indexidop'),
    ('indexness', 'indexnes'),
    ('iocoable', 'iocoabl'),
    ('itoive', 'itoiv'),
    ('kewls', 'kewl'),
    ('kiers', 'kier'),
    ('lvbgvuhnq', 'lvbgvuhn'),
    ('magnetable', 'magnetabl'),
    ('magnetness', 'magnetnes'),
    ('miyes', 'miye'),
    ('nationin', 'nationar'),
    ('nationq', 'nation'),
    ('noncq', 'nonc'),
    ('querrs', 'querr'),
    ('rationalq', 'rational'),
    ('roxhlgkq', 'roxhlgk'),
    ('runnes', 'runne'),
    ('stemnes', 'stemne'),
    ('tablale', 'tablal'),
    ('tbeas', 'tbea'),
    ('troublics', 'trouble'),
    ('twpellhoaje', 'twpellhoaj'),
    ('uelible', 'uelibl'),
    ('uelii', 'uelidop'),
    ('uelnes', 'uelne'),
    ('vyjqrtocf', 'vyjqrtocuow'),
    ('weltrs', 'weltr'),
    ('zuxljphs', 'zuxljph'),
]

_OTAGO_V2_CASES = [
    ('agueization', 'agueizatio'),
    ('agueness', 'aguen'),
    ('alurenet', 'alurr'),
    ('alurous', 'alurou'),
    ('bbvjatwzda', 'bbvjatwzdor'),
    ('computale', 'computal'),
    ('connectly', 'connectli'),
    ('darna', 'darnor'),
    ('eanible', 'eanibl'),
    ('electrenet', 'electrr'),
    ('fhzuspcxxdyy', 'fhzuspcxxdyi'),
    ('fmelhmfqojs', 'fmelhmfqoj'),
    ('generalist', 'generaliish'),
    ('generals', 'general'),
    ('iocones', 'iocon'),
    ('magnetics', 'magneti'),
    ('magnetin', 'magneti'),
    ('magnetna', 'magnetnor'),
    ('maximacy', 'maximaci'),
    ('miyecci', 'miyk'),
    ('miyics', 'miyi'),
    ('nationw', 'nationgia'),
    ('ngenary', 'ngenari'),
    ('nxqgmiky', 'nxqgmigby'),
    ('organxion', 'organxio'),
    ('qmlezofry', 'qmlezofri'),
    ('queria', 'querior'),
    ('querible', 'queribl'),
    ('rationalenet', 'rationalr'),
    ('realia', 'realior'),
    ('runnes', 'runne'),
    ('shirian', 'shin'),
    ('speciales', 'special'),
    ('suvjighmeks', 'suvjighmek'),
    ('tablory', 'tablori'),
    ('troublsk', 'troubl'),
    ('uelna', 'uelnor'),
    ('yaies', 'yaie'),
    ('yazhuipwmuy', 'yazhuipwmui'),
    ('yhszkw', 'yhszkgia'),
]



@pytest.mark.parametrize("word,want", _PAICE_HUSK_CASES)
def test_stem_paice_husk(word, want):
    from atire_spark.kernels.stem import stem_paice_husk

    assert stem_paice_husk(word) == want


@pytest.mark.parametrize("word,want", _OTAGO_CASES)
def test_stem_otago(word, want):
    from atire_spark.kernels.stem import stem_otago

    assert stem_otago(word) == want


@pytest.mark.parametrize("word,want", _OTAGO_V2_CASES)
def test_stem_otago_v2(word, want):
    from atire_spark.kernels.stem import stem_otago_v2

    assert stem_otago_v2(word) == want


def test_paice_husk_acceptability_rollback():
    """The reference's acceptable() quirk: consonant-initial stems of
    <= 3 chars are never acceptable (the parenthesization bug in
    stem_paice_husk.c:452), so the stemmer rolls back to the last
    acceptable intermediate ("running" stays "runn", not "run")."""
    from atire_spark.kernels.stem import stem_paice_husk

    assert stem_paice_husk("running") == "runn"
    assert stem_paice_husk("nationally") == "nation"
    # vowel-initial 2-letter stems with consonant second letter are fine
    assert stem_paice_husk("ended") == "end"
