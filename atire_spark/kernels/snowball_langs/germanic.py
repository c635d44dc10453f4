"""Snowball German, German2 and Dutch stemmers.

Independent Python implementations of the published Snowball
algorithms (snowballstem.org: "German stemming algorithm", its
german2 variant, "Dutch stemming algorithm"), matching the
reference's `-tsnowball:german/german2/dutch` slots
(source/stemmer_factory.c:47-48,43 via libstemmer).  Parity with the
compiled libstemmer the reference ships is certified by full-wordlist
sweeps; frozen cases live in tests/test_snowball_langs.py.
"""

from __future__ import annotations

from atire_spark.kernels.snowball_langs._runtime import (
    gopast_in,
    gopast_out,
    mark_r1r2,
    sort_by_len,
)

# ------------------------------------------------------------------ German
_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_ENDING = frozenset("bdfghklmnrt")
_DE_ST_ENDING = frozenset("bdfghklmnt")

_DE_STEP1 = sort_by_len(["e", "em", "en", "ern", "er", "es", "s"])
_DE_STEP2 = sort_by_len(["en", "er", "est", "st"])
_DE_STEP3 = sort_by_len(["end", "ung", "ig", "isch", "ik", "lich", "heit", "keit"])


def _de_mark(word: str) -> tuple[int, int]:
    """German R1 (clamped to position 3 when the word has 3+ chars,
    danish-style: the clamp only applies when a 3rd char exists) and
    standard R2."""
    p1, p2 = mark_r1r2(word, _DE_VOWELS)
    if len(word) >= 3 and p1 < len(word):
        p1 = max(p1, 3)
    return p1, p2


def _de_mark_uy(word: str) -> str:
    """u and y between vowels become U/Y (consonants)."""
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in ("u", "y")
            and chars[i - 1] in _DE_VOWELS
            and chars[i + 1] in _DE_VOWELS
        ):
            chars[i] = chars[i].upper()
    return "".join(chars)


def _de_standard_suffix(word: str, p1: int, p2: int) -> str:
    # part 1 — longest among match first, then the R1 test (a failed
    # region test means no action at all, never a shorter fallback)
    s = _match(word, _DE_STEP1)
    if s is not None and len(word) - len(s) >= p1:
        if s in ("em", "ern", "er"):
            word = word[: -len(s)]
        elif s in ("e", "en", "es"):
            word = word[: -len(s)]
            if word.endswith("niss"):
                word = word[:-1]
        elif s == "s" and len(word) >= 2 and word[-2] in _DE_S_ENDING:
            word = word[:-1]
    # part 2
    s = _match(word, _DE_STEP2)
    if s is not None and len(word) - len(s) >= p1:
        if s in ("en", "er", "est"):
            word = word[: -len(s)]
        elif s == "st" and len(word) >= 3 and word[-3] in _DE_ST_ENDING \
                and len(word) - 3 >= 3:
            word = word[:-2]
    # part 3 (R2)
    s = _match(word, _DE_STEP3)
    if s in ("end", "ung"):
        if len(word) - len(s) >= p2:
            word = word[: -len(s)]
            if word.endswith("ig") and not word.endswith("eig") \
                    and len(word) - 2 >= p2:
                word = word[:-2]
    elif s in ("ig", "ik", "isch"):
        if len(word) - len(s) >= p2 and word[: -len(s)][-1:] != "e":
            word = word[: -len(s)]
    elif s in ("lich", "heit"):
        if len(word) - len(s) >= p2:
            word = word[: -len(s)]
            for t in ("er", "en"):
                if word.endswith(t) and len(word) - 2 >= p1:
                    word = word[:-2]
                    break
    elif s == "keit":
        if len(word) - len(s) >= p2:
            word = word[: -len(s)]
            for t in ("lich", "ig"):
                if word.endswith(t) and len(word) - len(t) >= p2:
                    word = word[: -len(t)]
                    break
    return word


_DE_POST = {"U": "u", "Y": "y", "ä": "a", "ö": "o", "ü": "u"}


def _de_postlude(word: str) -> str:
    return "".join(_DE_POST.get(c, c) for c in word)


def stem_snowball_german(word: str) -> str:
    word = word.replace("ß", "ss")
    word = _de_mark_uy(word)
    p1, p2 = _de_mark(word)
    word = _de_standard_suffix(word, p1, p2)
    return _de_postlude(word)


def stem_snowball_german2(word: str) -> str:
    """german2 variant: ae/oe/ue fold to umlauts in the prelude (after
    u/y marking; 'qu' shields its u), ß -> ss in the same scan."""
    word = _de_mark_uy(word)
    out = []
    i = 0
    while i < len(word):
        pair = word[i : i + 2]
        if pair == "qu":
            # libstemmer's 'qu' action is `hop 2` from the END of the
            # match: the two chars AFTER qu are skipped unexamined,
            # and if fewer than two remain the whole scan stops
            if i + 4 > len(word):
                out.append(word[i:])
                break
            out.append(word[i : i + 4])
            i += 4
        elif pair == "ae":
            out.append("ä")
            i += 2
        elif pair == "oe":
            out.append("ö")
            i += 2
        elif pair == "ue":
            out.append("ü")
            i += 2
        elif word[i] == "ß":
            out.append("ss")
            i += 1
        else:
            out.append(word[i])
            i += 1
    word = "".join(out)
    p1, p2 = _de_mark(word)
    word = _de_standard_suffix(word, p1, p2)
    return _de_postlude(word)


def _match(word: str, table: list):
    """Longest pure-text suffix match (Snowball's plain ``among``);
    region tests are the caller's responsibility and never fall back
    to a shorter entry."""
    for s in table:
        if word.endswith(s):
            return s
    return None


# ------------------------------------------------------------------- Dutch
_NL_VOWELS = frozenset("aeiouyè")
_NL_V_J = frozenset("aeiouyèj")
_NL_V_I = frozenset("aeiouyèI")

_NL_ACCENTS = {
    "á": "a", "ä": "a", "é": "e", "ë": "e", "í": "i", "ï": "i",
    "ó": "o", "ö": "o", "ú": "u", "ü": "u",
}


def _nl_mark(word: str) -> tuple[int, int]:
    """Standard (unclamped) R1/R2 char positions; the Dutch clamp is
    applied per-check by _nl_r1_ok in byte space."""
    return mark_r1r2(word, _NL_VOWELS)


def _nl_r1_ok(word: str, start: int, p1: int) -> bool:
    """Dutch R1 test for a suffix starting at char ``start``.
    libstemmer clamps p1 with `if (p1 < 3) p1 = 3` on the raw UTF-8
    BYTE buffer, so the constant-3 part of the test is a byte-offset
    comparison (visible with the Dutch vowel è)."""
    return start >= p1 and len(word[:start].encode("utf-8")) >= 3


def _nl_undouble(word: str) -> str:
    if word[-2:] in ("kk", "dd", "tt"):
        return word[:-1]
    return word


def _nl_en_ending(word: str, p1: int, n: int) -> str | None:
    """Delete a matched en/ene suffix of length ``n``: start in R1,
    preceded by a non-vowel, and not by 'gem'."""
    stem = word[:-n]
    if (
        _nl_r1_ok(word, len(word) - n, p1)
        and stem
        and stem[-1] not in _NL_VOWELS
        and not stem.endswith("gem")
    ):
        return _nl_undouble(stem)
    return None


def _nl_e_ending(word: str, p1: int) -> tuple[str, bool]:
    """Delete a final e in R1 preceded by a non-vowel; returns
    (word, e_found)."""
    if (
        word.endswith("e")
        and _nl_r1_ok(word, len(word) - 1, p1)
        and len(word) >= 2
        and word[-2] not in _NL_VOWELS
    ):
        return _nl_undouble(word[:-1]), True
    return word, False


def stem_snowball_dutch(word: str) -> str:
    # prelude: accent folding, then consonant-marking of y and
    # intervocalic i
    word = "".join(_NL_ACCENTS.get(c, c) for c in word)
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i - 1] not in _NL_VOWELS:
            continue
        if chars[i] == "i" and i + 1 < len(chars) and chars[i + 1] in _NL_VOWELS:
            chars[i] = "I"
        elif chars[i] == "y":
            chars[i] = "Y"
    word = "".join(chars)

    p1, p2 = _nl_mark(word)
    e_found = False

    # step 1
    s = _match(word, _NL_STEP1)
    if s == "heden":
        if _nl_r1_ok(word, len(word) - 5, p1):
            word = word[:-5] + "heid"
    elif s in ("ene", "en"):
        t = _nl_en_ending(word, p1, len(s))
        if t is not None:
            word = t
    elif s in ("se", "s"):
        stem = word[: -len(s)]
        if _nl_r1_ok(word, len(word) - len(s), p1) and stem \
                and stem[-1] not in _NL_V_J:
            word = stem
    # step 2
    word, e_found = _nl_e_ending(word, p1)
    # step 3a: heid
    if word.endswith("heid") and len(word) - 4 >= p2 and word[-5:-4] != "c":
        word = word[:-4]
        if word.endswith("en"):
            t = _nl_en_ending(word, p1, 2)
            if t is not None:
                word = t
    # step 3b: d-suffixes
    s = _match(word, _NL_STEP3B)
    if s in ("end", "ing"):
        if len(word) - len(s) >= p2:
            word = word[: -len(s)]
            if word.endswith("ig") and len(word) - 2 >= p2 \
                    and word[-3:-2] != "e":
                word = word[:-2]
            else:
                word = _nl_undouble(word)
    elif s == "ig":
        if len(word) - 2 >= p2 and word[-3:-2] != "e":
            word = word[:-2]
    elif s == "lijk":
        if len(word) - 4 >= p2:
            word = word[:-4]
            word, _ = _nl_e_ending(word, p1)
    elif s == "baar":
        if len(word) - 4 >= p2:
            word = word[:-4]
    elif s == "bar":
        if len(word) - 3 >= p2 and e_found:
            word = word[:-3]
    # step 4: undouble vowel in C-VV-C endings (final non-vowel not I)
    if (
        len(word) >= 4
        and word[-1] not in _NL_V_I
        and word[-3:-1] in ("aa", "ee", "oo", "uu")
        and word[-4] not in _NL_VOWELS
    ):
        word = word[:-2] + word[-1]
    # postlude
    return word.replace("I", "i").replace("Y", "y")


_NL_STEP1 = sort_by_len(["heden", "ene", "en", "se", "s"])
_NL_STEP3B = sort_by_len(["end", "ing", "ig", "lijk", "baar", "bar"])
