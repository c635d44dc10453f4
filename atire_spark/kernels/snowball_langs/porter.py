"""Snowball Porter stemmer (the classic 1980 algorithm as published
in Snowball form).

The reference's `-tsnowball:porter` slot (source/stemmer_factory.c:54
via libstemmer) runs Snowball's rendering of the original Porter
algorithm — distinct from both ATIRE's own reversed-string Porter
(source/stem_porter.c, our kernels/stem.py) and from Porter2
(kernels/snowball.py).  Independent implementation of the published
algorithm (snowballstem.org "The Porter stemming algorithm");
compiled-libstemmer parity frozen in tests/test_snowball_langs.py.
"""

from __future__ import annotations

from atire_spark.kernels.snowball_langs._runtime import mark_r1r2, sort_by_len

_VOWELS = frozenset("aeiouy")
_V_WXY = frozenset("aeiouywxY")

_DOUBLES = frozenset(("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"))

_STEP2 = sort_by_len(
    ["anci", "enci", "abli", "eli", "alli", "ousli", "entli", "aliti",
     "biliti", "iviti", "tional", "ational", "alism", "ation",
     "ization", "izer", "ator", "iveness", "fulness", "ousness"]
)
_STEP2_REPL = {
    "tional": "tion", "enci": "ence", "anci": "ance", "abli": "able",
    "entli": "ent", "eli": "e", "izer": "ize", "ization": "ize",
    "ational": "ate", "ation": "ate", "ator": "ate", "alli": "al",
    "aliti": "al", "alism": "al", "fulness": "ful", "ousli": "ous",
    "ousness": "ous", "iviti": "ive", "iveness": "ive", "biliti": "ble",
}

_STEP3 = sort_by_len(["icate", "ative", "alize", "iciti", "ical", "ful", "ness"])
_STEP3_REPL = {
    "alize": "al", "icate": "ic", "iciti": "ic", "ical": "ic",
    "ative": "", "ful": "", "ness": "",
}

_STEP4 = sort_by_len(
    ["ic", "ance", "ence", "able", "ible", "ate", "ive", "ize", "iti",
     "al", "ism", "ion", "er", "ous", "ant", "ent", "ment", "ement",
     "ou"]
)


def _shortv(word: str, end: int) -> bool:
    """Backwards non-v_WXY, v, non-v test ending at ``end``."""
    if end < 3:
        return False
    return (
        word[end - 1] not in _V_WXY
        and word[end - 2] in _VOWELS
        and word[end - 3] not in _VOWELS
    )


def _has_vowel_before(word: str, end: int) -> bool:
    return any(c in _VOWELS for c in word[:end])


def stem_snowball_porter(word: str) -> str:
    # prelude: mark consonant-y as Y (word-initial y, or y after a vowel)
    y_found = False
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
            y_found = True
    word = "".join(chars)

    p1, p2 = mark_r1r2(word, _VOWELS)

    # step 1a
    if word.endswith("sses"):
        word = word[:-4] + "ss"
    elif word.endswith("ies"):
        word = word[:-3] + "i"
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        word = word[:-1]

    # step 1b
    if word.endswith("eed"):
        if len(word) - 3 >= p1:
            word = word[:-1]
    elif word.endswith("ed") or word.endswith("ing"):
        cut = 2 if word.endswith("ed") else 3
        if _has_vowel_before(word, len(word) - cut):
            word = word[:-cut]
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word[-2:] in _DOUBLES:
                word = word[:-1]
            elif len(word) == p1 and _shortv(word, len(word)):
                word += "e"

    # step 1c: y after some vowel -> i
    if word and word[-1] in ("y", "Y") and _has_vowel_before(word, len(word) - 1):
        word = word[:-1] + "i"

    # step 2 (R1)
    for s in _STEP2:
        if word.endswith(s):
            if len(word) - len(s) >= p1:
                word = word[: -len(s)] + _STEP2_REPL[s]
            break

    # step 3 (R1)
    for s in _STEP3:
        if word.endswith(s):
            if len(word) - len(s) >= p1:
                word = word[: -len(s)] + _STEP3_REPL[s]
            break

    # step 4 (R2); "ion" additionally requires a preceding s or t
    for s in _STEP4:
        if word.endswith(s):
            if len(word) - len(s) >= p2:
                if s == "ion":
                    if len(word) >= 4 and word[-4] in ("s", "t"):
                        word = word[:-3]
                else:
                    word = word[: -len(s)]
            break

    # step 5a: drop final e in R2, or in R1 when not preceded by shortv
    if word.endswith("e"):
        if len(word) - 1 >= p2:
            word = word[:-1]
        elif len(word) - 1 >= p1 and not _shortv(word, len(word) - 1):
            word = word[:-1]

    # step 5b: undouble final ll in R2
    if word.endswith("ll") and len(word) - 1 >= p2:
        word = word[:-1]

    # postlude
    if y_found:
        word = word.replace("Y", "y")
    return word
