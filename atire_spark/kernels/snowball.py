"""Snowball English (Porter2) stemmer.

The reference's `-tsnowball:english` slot (stemmer_factory.c:44,
stem_snowball.c) calls the Snowball-generated libstemmer English
stemmer, the algorithm Martin Porter published at snowballstem.org as
"The English (Porter2) stemming algorithm".  This module implements
that published algorithm in Python; parity with the compiled
libstemmer shipped in the reference tree
(external/unencumbered/snowball/libstemmer_c) is frozen in
tests/test_snowball.py (full-vocabulary sweep).

ASCII-only input is assumed (the tokenizer's output domain).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed",
     "exceed", "succeed")
)

_STEP2 = [
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
]

_STEP3 = [
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ful", ""),
    ("ness", ""),
]

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic",
)


def _is_vowel(w: str, i: int) -> bool:
    return w[i] in _VOWELS  # Y (capital) marks a consonant y


def _r1_start(w: str) -> int:
    """R1: after the first vowel→non-vowel transition, except the
    special prefixes gener-, commun-, arsen-."""
    for p in ("gener", "commun", "arsen"):
        if w.startswith(p):
            return len(p)
    for i in range(1, len(w)):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            return i + 1
    return len(w)


def _r_start_from(w: str, start: int) -> int:
    for i in range(start + 1, len(w)):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            return i + 1
    return len(w)


def _ends_short_syllable(w: str) -> bool:
    """A short syllable at the end: either (c, v, non-vowel other than
    w/x/Y) or a word of exactly (v, c) shape at the start."""
    n = len(w)
    if n == 2:
        return _is_vowel(w, 0) and not _is_vowel(w, 1)
    if n >= 3:
        return (
            not _is_vowel(w, n - 3)
            and _is_vowel(w, n - 2)
            and (not _is_vowel(w, n - 1))
            and w[n - 1] not in "wxY"
        )
    return False


def stem_snowball_english(term: str) -> str:
    w = term
    if len(w) <= 2:
        return w
    if w.startswith("'"):
        w = w[1:]
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    # mark consonant y's as Y
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = list(w)
    for i in range(1, len(w)):
        if w[i] == "y" and w[i - 1] in _VOWELS:
            w[i] = "Y"
    w = "".join(w)

    r1 = _r1_start(w)
    r2 = _r_start_from(w, r1) if r1 < len(w) else len(w)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # Step 0: longest of ' 's 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        if any(c in _VOWELS for c in w[:-2]):
            w = w[:-1]

    if w in _EXCEPTIONS_1A:
        return w

    # Step 1b
    step1b_delete = False
    if w.endswith("eedly"):
        if in_r1(len(w) - 5):
            w = w[:-3]
    elif w.endswith("eed"):
        if in_r1(len(w) - 3):
            w = w[:-1]
    elif w.endswith("edly"):
        if any(c in _VOWELS for c in w[:-4]):
            w = w[:-4]
            step1b_delete = True
    elif w.endswith("ingly"):
        if any(c in _VOWELS for c in w[:-5]):
            w = w[:-5]
            step1b_delete = True
    elif w.endswith("ed"):
        if any(c in _VOWELS for c in w[:-2]):
            w = w[:-2]
            step1b_delete = True
    elif w.endswith("ing"):
        if any(c in _VOWELS for c in w[:-3]):
            w = w[:-3]
            step1b_delete = True
    if step1b_delete:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif w.endswith(_DOUBLES):
            w = w[:-1]
        elif _ends_short_syllable(w) and r1 >= len(w):
            # "short word": ends in a short syllable and R1 is null —
            # R1 is the prelude's fixed offset, not recomputed
            w = w + "e"

    # Step 1c: y/Y → i after a non-vowel that is not word-initial
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in _VOWELS
    ):
        w = w[:-1] + "i"

    # Step 2 (longest suffix, in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if in_r1(len(w) - 3) and len(w) >= 4 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if in_r1(len(w) - 2) and len(w) >= 3 and w[-3] in _LI_ENDING:
                w = w[:-2]

    # Step 3 (longest suffix, in R1; ative needs R2)
    if w.endswith("ative"):
        if in_r1(len(w) - 5) and in_r2(len(w) - 5):
            w = w[:-5]
    else:
        for suf, rep in _STEP3:
            if w.endswith(suf):
                if in_r1(len(w) - len(suf)):
                    w = w[: -len(suf)] + rep
                break

    # Step 4 (longest suffix, in R2; ion needs s/t before)
    if w.endswith("ion"):
        if in_r2(len(w) - 3) and len(w) >= 4 and w[-4] in "st":
            w = w[:-3]
    else:
        for suf in _STEP4:
            if w.endswith(suf):
                if in_r2(len(w) - len(suf)):
                    w = w[: -len(suf)]
                break

    # Step 5
    if w.endswith("e"):
        pos = len(w) - 1
        if in_r2(pos) or (
            in_r1(pos) and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l"):
        if in_r2(len(w) - 1) and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")
