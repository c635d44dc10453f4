"""Snowball Danish, Norwegian and Swedish stemmers.

Independent Python implementations of the published Snowball
algorithms (snowballstem.org: "Danish stemming algorithm" etc.),
matching the reference's `-tsnowball:<lang>` slots
(source/stemmer_factory.c:42,53,59 via libstemmer).  Parity with the
compiled libstemmer the reference ships is certified by a
full-wordlist sweep; frozen cases live in
tests/test_snowball_langs.py.

All three share the Scandinavian R1 (never before the third char),
a main-suffix step, a consonant-pair undoubling step constrained to
R1, and an other-suffix step; Danish adds a final undouble step.
"""

from __future__ import annotations

from atire_spark.kernels.snowball_langs._runtime import (
    longest_suffix,
    mark_r1_scand,
    sort_by_len,
)

# ------------------------------------------------------------------ Danish
_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")

_DA_STEP1 = sort_by_len(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
     "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
     "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
     "hedens", "erens", "ers", "ets", "erets", "et", "eret"]
)
_DA_PAIRS = ("gd", "dt", "gt", "kt")
_DA_STEP3 = sort_by_len(["ig", "lig", "elig", "els", "løst"])


def _da_consonant_pair(word: str, p1: int) -> str:
    if len(word) >= 2 and word[-2:] in _DA_PAIRS and len(word) - 2 >= p1:
        return word[:-1]
    return word


def stem_snowball_danish(word: str) -> str:
    p1 = mark_r1_scand(word, _DA_VOWELS)
    # step 1: main suffix in R1; bare "s" only after a valid s-ending
    s = longest_suffix(word, _DA_STEP1, p1)
    if s is not None:
        word = word[: -len(s)]
    elif word.endswith("s") and len(word) - 1 >= p1 and len(word) >= 2 \
            and word[-2] in _DA_S_ENDING:
        word = word[:-1]
    # step 2: undouble gd/dt/gt/kt inside R1 to a single consonant
    word = _da_consonant_pair(word, p1)
    # step 3: "igst" drops "st" unconditionally, then R1 suffixes
    if word.endswith("igst"):
        word = word[:-2]
    s = longest_suffix(word, _DA_STEP3, p1)
    if s == "løst":
        word = word[:-1]
    elif s is not None:
        word = word[: -len(s)]
        word = _da_consonant_pair(word, p1)
    # step 4: undouble a final doubled non-vowel whose tail is in R1
    if (
        len(word) >= 2
        and word[-1] not in _DA_VOWELS
        and len(word) - 1 >= p1
        and word[-2] == word[-1]
    ):
        word = word[:-1]
    return word


# --------------------------------------------------------------- Norwegian
_NO_VOWELS = frozenset("aeiouyæåø")
_NO_S_ENDING = frozenset("bcdfghjlmnoprtvyz")

_NO_STEP1 = sort_by_len(
    ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
     "heten", "ar", "er", "heter", "as", "es", "edes", "endes",
     "enes", "hetenes", "ens", "hetens", "ers", "ets", "et", "het",
     "ast"]
)
_NO_STEP1_ERT = sort_by_len(["erte", "ert"])
_NO_PAIRS = ("dt", "vt")
_NO_STEP3 = sort_by_len(
    ["leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
     "slov", "hetslov"]
)


def stem_snowball_norwegian(word: str) -> str:
    p1 = mark_r1_scand(word, _NO_VOWELS)
    # step 1: erte/ert -> er beats the plain suffixes of equal length
    s = longest_suffix(word, _NO_STEP1_ERT, p1)
    plain = longest_suffix(word, _NO_STEP1, p1)
    if s is not None and (plain is None or len(s) >= len(plain)):
        word = word[: -len(s)] + "er"
    elif plain is not None:
        word = word[: -len(plain)]
    elif word.endswith("s") and len(word) - 1 >= p1 and len(word) >= 2 and (
        word[-2] in _NO_S_ENDING
        or (word[-2] == "k" and len(word) >= 3 and word[-3] not in _NO_VOWELS)
    ):
        word = word[:-1]
    # step 2: dt/vt inside R1 lose the final t
    if len(word) >= 2 and word[-2:] in _NO_PAIRS and len(word) - 2 >= p1:
        word = word[:-1]
    # step 3: derivational suffixes inside R1
    s = longest_suffix(word, _NO_STEP3, p1)
    if s is not None:
        word = word[: -len(s)]
    return word


# ----------------------------------------------------------------- Swedish
_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")

_SV_STEP1 = sort_by_len(
    ["a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
     "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
     "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
     "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
     "het", "ast"]
)
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = sort_by_len(["ig", "lig", "els", "fullt", "löst"])


def stem_snowball_swedish(word: str) -> str:
    p1 = mark_r1_scand(word, _SV_VOWELS)
    s = longest_suffix(word, _SV_STEP1, p1)
    if s is not None:
        word = word[: -len(s)]
    elif word.endswith("s") and len(word) - 1 >= p1 and len(word) >= 2 \
            and word[-2] in _SV_S_ENDING:
        word = word[:-1]
    if len(word) >= 2 and word[-2:] in _SV_PAIRS and len(word) - 2 >= p1:
        word = word[:-1]
    s = longest_suffix(word, _SV_STEP3, p1)
    if s == "fullt":
        word = word[:-1]
    elif s == "löst":
        word = word[:-1]
    elif s is not None:
        word = word[: -len(s)]
    return word
