"""Stemmers with reference-ATIRE semantics.

Reference (/root/reference/source/stemmer_factory.h:23-46 registry):
this module implements the two stemmers a default ATIRE deployment
actually reaches for — the S-stripper (stem_s.c) and Porter
(stem_porter.c, ATIRE's own reversed-string implementation of Porter
1980, which deviates from the canonical algorithm in documented ways;
we reproduce ATIRE's rule order exactly, not the textbook's).

Application gates (they differ between sides, faithfully reproduced):

- index side (index_document.c:103-111): only TT_WORD tokens with
  ``string_length > 3`` are stemmed; numbers are never stemmed
  (index_document.c:114-120 adds them raw);
- query side (search_engine.c:775-779): a term is stemmed when the
  index is stemmed AND its first character is a lowercase letter AND
  its length is ≥ 3 (the ``*(term+1) && *(term+2)`` check) — note the
  asymmetry with the index side for length-3 terms, which is the
  reference's behavior, not ours;
- the stemmer name is recorded in the index (the ``~stemmer`` index
  variable, memory_index.c:1487-1521); querying with a different
  stemmer than the index was built with is rejected
  (ANT_search_engine reads ~stemmer at open, search_engine.c:270-306).

Stemming happens on the *unique* terms of each Arrow batch (a Python
loop over the batch vocabulary, not over tokens) — the per-token work
stays vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

STEMMERS = (
    "s",
    "porter",
    "krovetz",
    "paice_husk",
    "otago",
    "otago_v2",
    # phonetic matchers — the reference registers them in the same
    # stemmer factory slots (stemmer_factory.c:62-63), so they flow
    # through identical index/query gates and ~stemmer recording
    "soundex",
    "double_metaphone",
    # snowball family (stemmer_factory.c:39-60 via libstemmer):
    # every language is an independent implementation of the published
    # Snowball algorithm, compiled-reference parity verified
    "snowball_english",
    "snowball_lovins",
    "snowball_porter",
    "snowball_danish",
    "snowball_norwegian",
    "snowball_swedish",
    "snowball_german",
    "snowball_german2",
    "snowball_dutch",
    "snowball_french",
    "snowball_spanish",
    "snowball_italian",
    "snowball_portuguese",
    "snowball_romanian",
    "snowball_catalan",
    "snowball_russian",
    "snowball_finnish",
    "snowball_hungarian",
    "snowball_armenian",
    "snowball_basque",
    "snowball_turkish",
    "snowball_kraaij_pohlmann",
)

_VOWELS = "aeiou"


# ---------------------------------------------------------------- S-stripper
def stem_s(term: str) -> str:
    """stem_s.c: ies→y, else strip es, else strip s (first match wins)."""
    if term.endswith("ies"):
        return term[:-3] + "y"
    if term.endswith("es"):
        return term[:-2]
    if term.endswith("s"):
        return term[:-1]
    return term


# ------------------------------------------------------------------- Porter
# ATIRE's Porter works on the REVERSED word (stem_porter.c:76
# ``strnrev``); every helper below operates on a list of chars of the
# reversed word with an index cursor, transliterating the C exactly.
# "\0" semantics (one-past-end reads) are emulated by _ch.


def _ch(r: list, i: int) -> str:
    return r[i] if 0 <= i < len(r) else "\0"


def _isvowely(r: list, i: int) -> bool:
    """isvowely (stem_porter.h:22): at end-of-string → false; y counts
    as a vowel when the NEXT reversed char (the preceding char of the
    forward word) is not a plain vowel."""
    c = _ch(r, i)
    if c == "\0":
        return False
    if c in _VOWELS:
        return True
    return c == "y" and _ch(r, i + 1) not in _VOWELS


def _length(r: list, i: int) -> int:
    """The measure m of the (reversed) suffix starting at i
    (stem_porter.c:12-42): skip the vowely prefix, then count
    consonant/vowel alternations walking back from the end."""
    if i >= len(r):
        return 0
    while _isvowely(r, i):
        i += 1
    end = len(r) - 1
    while end >= i and not _isvowely(r, end):
        end -= 1
    was = "v"
    size = 0
    while end >= i:
        if was == "c" and _isvowely(r, end):
            was = "v"
            size += 1
        elif was == "v" and not _isvowely(r, end):
            was = "c"
            size += 1
        end -= 1
    return size


def _has_vowel(r: list, i: int) -> bool:
    """has_vowel (stem_porter.c:44-58): any aeiou, or a y whose next
    char is not a plain vowel (a trailing y counts)."""
    for j in range(i, len(r)):
        if r[j] in _VOWELS:
            return True
    for j in range(i, len(r)):
        if r[j] == "y" and _ch(r, j + 1) not in _VOWELS:
            return True
    return False


def _cvc(r: list, i: int) -> bool:
    """cvc (stem_porter.h:23): consonant (not w/x/y) then vowely then
    non-vowely, reading the reversed string; at end-of-string the C
    strchr finds the terminator → false."""
    c = _ch(r, i)
    if c == "\0" or c in "aeiouwxy":
        return False
    return _isvowely(r, i + 1) and not _isvowely(r, i + 2)


def _starts(r: list, i: int, pat: str) -> bool:
    """strncmp(at, pat, len(pat)) == 0 on the reversed string."""
    if i + len(pat) > len(r):
        return False
    for k, ch in enumerate(pat):
        if r[i + k] != ch:
            return False
    return True


def stem_porter(term: str) -> str:
    """ATIRE's Porter (stem_porter.c:70-300), rule order preserved.

    Patterns below are the C literals — already reversed (the C works
    on the reversed word): e.g. ``"sess"`` is forward ``"sses"``.
    """
    r = list(reversed(term))
    at = 0

    # Step 1a (stem_porter.c:82-95)
    if _ch(r, at) == "s":
        if _starts(r, at, "sess"):
            at += 2
        elif _starts(r, at, "sei"):
            at += 2
        elif _starts(r, at, "ss"):
            pass
        else:
            at += 1

    # Step 1b (stem_porter.c:97-131)
    if _ch(r, at) in "dg":
        kill_dups = False
        if _starts(r, at, "dee") and _length(r, at + 3) > 0:
            at += 1
        elif _starts(r, at, "de") and _has_vowel(r, at + 2):
            kill_dups = True
            at += 2
        elif _starts(r, at, "gni") and _has_vowel(r, at + 3):
            kill_dups = True
            at += 3
        if kill_dups:
            if _ch(r, at) == "t" and _ch(r, at + 1) == "a":
                at -= 1
                r[at] = "e"
            elif _ch(r, at) == "l" and _ch(r, at + 1) == "b":
                at -= 1
                r[at] = "e"
            elif _ch(r, at) == "z" and _ch(r, at + 1) == "i":
                at -= 1
                r[at] = "e"
            elif _ch(r, at) == _ch(r, at + 1):
                if _ch(r, at) not in "aeiouylsz":
                    at += 1
            elif _length(r, at) == 1 and _cvc(r, at):
                at -= 1
                r[at] = "e"

    # Step 1c (stem_porter.c:133-137)
    if _ch(r, at) == "y" and _has_vowel(r, at + 1):
        r[at] = "i"

    # Step 2 (stem_porter.c:139-202); first-char dispatch via strchr —
    # an empty string matches the C terminator and falls through
    if _ch(r, at) in "lirnms" or _ch(r, at) == "\0":
        if _starts(r, at, "lanoita") and _length(r, at + 7) > 0:
            at += 4
            r[at] = "e"
        elif _starts(r, at, "lanoit") and _length(r, at + 6) > 0:
            at += 2
        elif _starts(r, at, "icne") and _length(r, at + 4) > 0:
            r[at] = "e"
        elif _starts(r, at, "icna") and _length(r, at + 4) > 0:
            r[at] = "e"
        elif _starts(r, at, "rezi") and _length(r, at + 4) > 0:
            at += 1
        elif _starts(r, at, "ilba") and _length(r, at + 4) > 0:
            r[at] = "e"
        elif _starts(r, at, "illa") and _length(r, at + 4) > 0:
            at += 2
        elif _starts(r, at, "iltne") and _length(r, at + 5) > 0:
            at += 2
        elif _starts(r, at, "ile") and _length(r, at + 3) > 0:
            at += 2
        elif _starts(r, at, "ilsuo") and _length(r, at + 5) > 0:
            at += 2
        elif _starts(r, at, "noitazi") and _length(r, at + 7) > 0:
            at += 4
            r[at] = "e"
        elif _starts(r, at, "noita") and _length(r, at + 5) > 0:
            at += 2
            r[at] = "e"
        elif _starts(r, at, "rota") and _length(r, at + 4) > 0:
            at += 1
            r[at] = "e"
        elif _starts(r, at, "msila") and _length(r, at + 5) > 0:
            at += 3
        elif _starts(r, at, "ssenevi") and _length(r, at + 7) > 0:
            at += 4
        elif _starts(r, at, "ssenluf") and _length(r, at + 7) > 0:
            at += 4
        elif _starts(r, at, "ssensuo") and _length(r, at + 7) > 0:
            at += 4
        elif _starts(r, at, "itila") and _length(r, at + 5) > 0:
            at += 3
        elif _starts(r, at, "itivi") and _length(r, at + 5) > 0:
            at += 2
            r[at] = "e"
        elif _starts(r, at, "itilib") and _length(r, at + 6) > 0:
            at += 4
            r[at] = "l"
            at -= 1
            r[at] = "e"

    # Step 3 (stem_porter.c:204-223)
    if _ch(r, at) in "eils" or _ch(r, at) == "\0":
        if _starts(r, at, "etaci") and _length(r, at + 5) > 0:
            at += 3
        elif _starts(r, at, "evita") and _length(r, at + 5) > 0:
            at += 5
        elif _starts(r, at, "ezila") and _length(r, at + 5) > 0:
            at += 3
        elif _starts(r, at, "itici") and _length(r, at + 5) > 0:
            at += 3
        elif _starts(r, at, "laci") and _length(r, at + 4) > 0:
            at += 2
        elif _starts(r, at, "luf") and _length(r, at + 3) > 0:
            at += 3
        elif _starts(r, at, "ssen") and _length(r, at + 4) > 0:
            at += 4

    # Step 4 (stem_porter.c:225-270)
    if _ch(r, at) in "lerctumisn" or _ch(r, at) == "\0":
        if _starts(r, at, "la") and _length(r, at + 2) > 1:
            at += 2
        elif _starts(r, at, "ecna") and _length(r, at + 4) > 1:
            at += 4
        elif _starts(r, at, "ecne") and _length(r, at + 4) > 1:
            at += 4
        elif _starts(r, at, "re") and _length(r, at + 2) > 1:
            at += 2
        elif _starts(r, at, "ci") and _length(r, at + 2) > 1:
            at += 2
        elif _starts(r, at, "elba") and _length(r, at + 4) > 1:
            at += 4
        elif _starts(r, at, "elbi") and _length(r, at + 4) > 1:
            at += 4
        elif _starts(r, at, "tna") and _length(r, at + 3) > 1:
            at += 3
        elif _starts(r, at, "tneme") and _length(r, at + 5) > 1:
            at += 5
        elif _starts(r, at, "tnem") and _length(r, at + 4) > 1:
            at += 4
        elif _starts(r, at, "tne") and _length(r, at + 3) > 1:
            at += 3
        elif _starts(r, at, "uo") and _length(r, at + 2) > 1:
            at += 2
        elif _starts(r, at, "msi") and _length(r, at + 3) > 1:
            at += 3
        elif _starts(r, at, "eta") and _length(r, at + 3) > 1:
            at += 3
        elif _starts(r, at, "iti") and _length(r, at + 3) > 1:
            at += 3
        elif _starts(r, at, "suo") and _length(r, at + 3) > 1:
            at += 3
        elif _starts(r, at, "evi") and _length(r, at + 3) > 1:
            at += 3
        elif _starts(r, at, "ezi") and _length(r, at + 3) > 1:
            at += 3
        elif _starts(r, at, "nois") and _length(r, at + 3) > 1:
            at += 3  # special case: keeps the s (C comment, :264)
        elif _starts(r, at, "noit") and _length(r, at + 3) > 1:
            at += 3  # special case: keeps the t (:266)

    # Step 5a (stem_porter.c:272-281)
    if _ch(r, at) == "e":
        if _length(r, at + 1) == 1 and not _cvc(r, at + 1):
            at += 1
        elif _length(r, at + 1) > 1:
            at += 1
    # Step 5b (stem_porter.c:282-285)
    if _ch(r, at) == "l" and _ch(r, at + 1) == "l" and _length(r, at + 1) > 1:
        at += 1

    return "".join(reversed(r[at:]))


# ------------------------------------------------------------ Paice-Husk
# The published Lancaster (Paice/Husk) rule set — DATA, not code: the
# same rule file the reference inlines (stem_paice_husk.c:460-577,
# from the official Lancaster stemming site), attributed per its
# BSD-like terms. Tuple = (key, replacement, intact, protect, cont).
_PAICE_HUSK_RULES: list[tuple[str, str, bool, bool, bool]] = [
    ('ia', '', True, False, False),
    ('a', '', True, False, False),
    ('bb', 'b', False, False, False),
    ('ytic', 'ys', False, False, False),
    ('ic', '', False, False, True),
    ('nc', 'nt', False, False, True),
    ('dd', 'd', False, False, False),
    ('ied', 'y', False, False, True),
    ('ceed', 'cess', False, False, False),
    ('eed', 'ee', False, False, False),
    ('ed', '', False, False, True),
    ('hood', '', False, False, True),
    ('e', '', False, False, True),
    ('lief', 'liev', False, False, False),
    ('if', '', False, False, True),
    ('ing', '', False, False, True),
    ('iag', 'y', False, False, False),
    ('ag', '', False, False, True),
    ('gg', 'g', False, False, False),
    ('th', '', True, False, False),
    ('guish', 'ct', False, False, False),
    ('ish', '', False, False, True),
    ('i', '', True, False, False),
    ('i', 'y', False, False, True),
    ('ij', 'id', False, False, False),
    ('fuj', 'fus', False, False, False),
    ('uj', 'ud', False, False, False),
    ('oj', 'od', False, False, False),
    ('hej', 'her', False, False, False),
    ('verj', 'vert', False, False, False),
    ('misj', 'mit', False, False, False),
    ('nj', 'nd', False, False, False),
    ('j', 's', False, False, False),
    ('ifiabl', '', False, False, False),
    ('iabl', 'y', False, False, False),
    ('abl', '', False, False, True),
    ('ibl', '', False, False, False),
    ('bil', 'bl', False, False, True),
    ('cl', 'c', False, False, False),
    ('iful', 'y', False, False, False),
    ('ful', '', False, False, True),
    ('ul', '', False, False, False),
    ('ial', '', False, False, True),
    ('ual', '', False, False, True),
    ('al', '', False, False, True),
    ('ll', 'l', False, False, False),
    ('ium', '', False, False, False),
    ('um', '', True, False, False),
    ('ism', '', False, False, True),
    ('mm', 'm', False, False, False),
    ('sion', 'j', False, False, True),
    ('xion', 'ct', False, False, False),
    ('ion', '', False, False, True),
    ('ian', '', False, False, True),
    ('an', '', False, False, True),
    ('een', '', False, True, False),
    ('en', '', False, False, True),
    ('nn', 'n', False, False, False),
    ('ship', '', False, False, True),
    ('pp', 'p', False, False, False),
    ('er', '', False, False, True),
    ('ear', '', False, True, False),
    ('ar', '', False, False, False),
    ('or', '', False, False, True),
    ('ur', '', False, False, True),
    ('rr', 'r', False, False, False),
    ('tr', 't', False, False, True),
    ('ier', 'y', False, False, True),
    ('ies', 'y', False, False, True),
    ('sis', 's', False, False, False),
    ('is', '', False, False, True),
    ('ness', '', False, False, True),
    ('ss', '', False, True, False),
    ('ous', '', False, False, True),
    ('us', '', True, False, False),
    ('s', '', True, False, True),
    ('s', '', False, False, False),
    ('plicat', 'ply', False, False, False),
    ('at', '', False, False, True),
    ('ment', '', False, False, True),
    ('ent', '', False, False, True),
    ('ant', '', False, False, True),
    ('ript', 'rib', False, False, False),
    ('orpt', 'orb', False, False, False),
    ('duct', 'duc', False, False, False),
    ('sumpt', 'sum', False, False, False),
    ('cept', 'ceiv', False, False, False),
    ('olut', 'olv', False, False, False),
    ('sist', '', False, True, False),
    ('ist', '', False, False, True),
    ('tt', 't', False, False, False),
    ('iqu', '', False, False, False),
    ('ogu', 'og', False, False, False),
    ('siv', 'j', False, False, True),
    ('eiv', '', False, True, False),
    ('iv', '', False, False, True),
    ('bly', 'bl', False, False, True),
    ('ily', 'y', False, False, True),
    ('ply', '', False, True, False),
    ('ly', '', False, False, True),
    ('ogy', 'og', False, False, False),
    ('phy', 'ph', False, False, False),
    ('omy', 'om', False, False, False),
    ('opy', 'op', False, False, False),
    ('ity', '', False, False, True),
    ('ety', '', False, False, True),
    ('lty', 'l', False, False, False),
    ('istry', '', False, False, False),
    ('ary', '', False, False, True),
    ('ory', '', False, False, True),
    ('ify', '', False, False, False),
    ('ncy', 'nt', False, False, True),
    ('acy', '', False, False, True),
    ('iz', '', False, False, True),
    ('yz', 'ys', False, False, False),
]

# bucketed by last letter of the key, file order preserved
# (stem_paice_husk.c tblindex/addrule)
_PH_BUCKETS: dict[str, list] = {}
for _r in _PAICE_HUSK_RULES:
    _PH_BUCKETS.setdefault(_r[0][-1], []).append(_r)


def _ph_acceptable(s: str) -> bool:
    """acceptable() (stem_paice_husk.c:433-453) with its quirks kept:
    only a-z stems qualify; length > 3 always accepted; vowel-initial
    (y counts as vowel) needs a consonant second letter; and the
    consonant-initial short branch is ALWAYS false — the reference's
    ``isvowel((*(s+1)) || isvowel(*(s+2))) && (x > 3)`` parenthesizes
    the vowel test around the boolean OR (so it tests chr(1)) and the
    x>3 arm is unreachable in the x<=3 branch. Faithfully reproduced:
    consonant-initial stems must be longer than 3 chars."""
    if not s or any(not ("a" <= c <= "z") for c in s):
        return False
    if len(s) > 3:
        return True
    if s[0] in "aeiouy":
        return len(s) >= 2 and s[1] not in "aeiouy"
    return False


def stem_paice_husk(term: str) -> str:
    """Lancaster/Paice-Husk stemmer with the reference's control flow
    (stem_paice_husk.c raw_stem/rulewalk/applyrule): iterate rule
    lookups bucketed by the current last letter; first matching rule
    applies (intact rules only while the word is unmodified, protect
    rules stop without change); continue-flagged rules loop; an
    unacceptable intermediate stem rolls back to the last acceptable
    one. Words >= 250 chars pass through (maxwdsz guard)."""
    if len(term) >= 250:
        return term
    word = term
    if not _ph_acceptable(word):
        return word  # early return skips the apostrophe strip, like C
    intact = True
    trail = word
    while True:
        # rulewalk over the last-letter bucket
        outcome = "stop"
        new_word = word
        for key, rep, r_intact, r_protect, r_cont in _PH_BUCKETS.get(
            word[-1], ()
        ):
            if r_intact and not intact:
                continue
            if len(key) > len(word) or not word.endswith(key):
                continue
            if r_protect:
                outcome = "stop"
            else:
                new_word = word[: len(word) - len(key)] + rep
                outcome = "cont" if r_cont else "stop"
            break
        word = new_word
        if outcome == "stop":
            break
        intact = False
        if not _ph_acceptable(word):
            return trail.split("'", 1)[0]
        trail = word
    final = word if _ph_acceptable(word) else trail
    return final.split("'", 1)[0]


# ------------------------------------------------------------ Otago v1/v2
def _otago_m(s: str) -> int:
    """The Porter measure m() as both Otago stemmers compute it
    (stem_otago.c:38-74: forward word, y is a consonant at position 0,
    else the complement of its predecessor)."""
    n = len(s)
    cons = [False] * n
    for i, c in enumerate(s):
        if c in "aeiou":
            cons[i] = False
        elif c == "y":
            cons[i] = True if i == 0 else not cons[i - 1]
        else:
            cons[i] = True
    i, m = 0, 0
    while i < n and cons[i]:
        i += 1
    i += 1
    while True:
        while True:
            if i >= n:
                return m
            if cons[i]:
                break
            i += 1
        i += 1
        m += 1
        while True:
            if i >= n:
                return m
            if not cons[i]:
                break
            i += 1
        i += 1


# GP-learned rule cascades (Vaughn Wood, learned for the INEX
# Wikipedia collection) — rule DATA transcribed from the reference's
# condition/replacement constants. Tuple = (m_min | None, suffix,
# replacement, length_bound); result = word[:-len(suffix)] + repl.
# v1 (stem_otago.c:80-238): three first-match blocks, strict
# ``length > bound`` guards, m() on the current buffer.
_OTAGO_V1_BLOCKS: list[list[tuple[int | None, str, str, int]]] = [
    [
        (None, "shi", "f", 6),
        (2, "ej", "", 5),
        (4, "ngen", "", 7),
        (1, "i", "dops", 4),
        (4, "nes", "sy", 6),
        (None, "ics", "e", 6),
        (None, "ii", "sr", 5),
        (None, "ito", "ng", 6),
        (4, "rs", "tie", 5),
        (None, "q", "", 4),
        (4, "al", "", 5),
        (3, "in", "ar", 5),
        (None, "ice", "s", 6),
        (3, "ic", "", 5),
    ],
    [
        (4, "rs", "tie", 5),
        (1, "s", "", 4),
        (1, "f", "uow", 4),
        (None, "f", "uow", 4),
        (None, "q", "", 4),
        (1, "s", "", 4),
    ],
    [
        (2, "que", "sy", 6),
        (None, "sl", "anu", 5),
        (2, "e", "", 4),
        (1, "f", "", 4),
        (3, "ague", "dz", 7),
        (None, "ean", "", 6),
    ],
]

# v2 (stem_otago_v2.c:81-426): if/else-if groups applied in sequence,
# ``length >= bound`` guards, m() recomputed after every applied rule.
_OTAGO_V2_GROUPS: list[list[tuple[int | None, str, str, int]]] = [
    [(1, "s", "", 3), (None, "dar", "ater", 5)],
    [
        (4, "enet", "r", 6),
        (None, "ya", "ros", 4),
        (4, "y", "itsk", 3),
        (1, "ce", "ing", 4),
        (None, "c", "", 3),
        (1, "apse", "z", 6),
        (3, "n", "", 3),
    ],
    [(None, "ki", "gby", 4), (1, "s", "", 3)],
    [
        (4, "na", "koto", 4),
        (None, "bco", "", 5),
        (None, "alur", "s", 6),
        (2, "nonc", "eris", 6),
        (3, "rd", "ller", 4),
        (4, "al", "", 4),
        (3, "welt", "n", 6),
        (None, "w", "gia", 3),
        (4, "ness", "man", 6),
        (3, "ri", "n", 4),
        (None, "ioco", "", 6),
        (4, "mer", "", 5),
        (None, "uk", "ia", 4),
        (1, "a", "or", 3),
        (2, "ecci", "ks", 6),
        (1, "sk", "", 4),
        (4, "ongo", "", 6),
    ],
    [(None, "ya", "kas", 4), (None, "y", "i", 3), (1, "ce", "yaka", 4)],
    [(3, "n", "", 3)],
    [(None, "ki", "gby", 4), (1, "rder", "pia", 6)],
    [
        (4, "na", "koto", 4),
        (None, "miy", "", 5),
        (None, "alur", "s", 6),
        (2, "ovo", "ozor", 4),
        (None, "wahj", "nes", 6),
        (4, "i", "ssig", 3),
        (3, "hner", "", 6),
        (3, "st", "ish", 4),
        (4, "k", "idae", 3),
        (None, "s", "", 3),
    ],
    [
        (1, "uel", "r", 5),
        (2, "ry", "g", 4),
        (None, "rian", "n", 6),
        (2, "e", "", 3),
    ],
    [(None, "lit", "ns", 5)],
]


def stem_otago(term: str) -> str:
    """Otago v1 (stem_otago.c:80-238): three first-match rule blocks,
    applied cumulatively; guards are strict length >."""
    word = term
    for block in _OTAGO_V1_BLOCKS:
        m = _otago_m(word)
        for m_min, suf, rep, bound in block:
            if (
                (m_min is None or m >= m_min)
                and len(word) > bound
                and word.endswith(suf)
            ):
                word = word[: len(word) - len(suf)] + rep
                break
    return word


def stem_otago_v2(term: str) -> str:
    """Otago v2 (stem_otago_v2.c:81-426): first-match groups applied
    in sequence; guards are length >=; the measure is recomputed after
    every applied rule."""
    word = term
    m = _otago_m(word)
    for group in _OTAGO_V2_GROUPS:
        for m_min, suf, rep, bound in group:
            if (
                (m_min is None or m >= m_min)
                and len(word) >= bound
                and word.endswith(suf)
            ):
                word = word[: len(word) - len(suf)] + rep
                m = _otago_m(word)
                break
    return word


def _phonetic_soundex(term: str) -> str:
    from atire_spark.kernels.phonetic import phonetic_soundex

    return phonetic_soundex(term)


def _phonetic_double_metaphone(term: str) -> str:
    from atire_spark.kernels.phonetic import phonetic_double_metaphone

    return phonetic_double_metaphone(term)


def _snowball_english(term: str) -> str:
    from atire_spark.kernels.snowball import stem_snowball_english

    return stem_snowball_english(term)


def _krovetz(term: str) -> str:
    from atire_spark.kernels.kstem import stem_krovetz

    return stem_krovetz(term)


def _snowball_lovins(term: str) -> str:
    from atire_spark.kernels.lovins import stem_snowball_lovins

    return stem_snowball_lovins(term)


def _snowball_lang(name: str):
    def fn(term: str) -> str:
        import atire_spark.kernels.snowball_langs as sl

        return getattr(sl, f"stem_snowball_{name}")(term)

    return fn


_STEM_FN = {
    "s": stem_s,
    "porter": stem_porter,
    "krovetz": _krovetz,
    "paice_husk": stem_paice_husk,
    "otago": stem_otago,
    "otago_v2": stem_otago_v2,
    "soundex": _phonetic_soundex,
    "double_metaphone": _phonetic_double_metaphone,
    "snowball_english": _snowball_english,
    "snowball_lovins": _snowball_lovins,
    "snowball_porter": _snowball_lang("porter"),
    "snowball_danish": _snowball_lang("danish"),
    "snowball_norwegian": _snowball_lang("norwegian"),
    "snowball_swedish": _snowball_lang("swedish"),
    "snowball_german": _snowball_lang("german"),
    "snowball_german2": _snowball_lang("german2"),
    "snowball_dutch": _snowball_lang("dutch"),
    "snowball_french": _snowball_lang("french"),
    "snowball_spanish": _snowball_lang("spanish"),
    "snowball_italian": _snowball_lang("italian"),
    "snowball_portuguese": _snowball_lang("portuguese"),
    "snowball_romanian": _snowball_lang("romanian"),
    "snowball_catalan": _snowball_lang("catalan"),
    "snowball_russian": _snowball_lang("russian"),
    "snowball_finnish": _snowball_lang("finnish"),
    "snowball_hungarian": _snowball_lang("hungarian"),
    "snowball_armenian": _snowball_lang("armenian"),
    "snowball_basque": _snowball_lang("basque"),
    "snowball_turkish": _snowball_lang("turkish"),
    "snowball_kraaij_pohlmann": _snowball_lang("kraaij_pohlmann"),
}


# The search-time stemmer iterator scans the vocabulary b-tree from
# ``stem[:L]`` and stops at the first term not sharing that prefix,
# where L is each ATIRE stem()'s RETURN VALUE — deliberately SHORTER
# than the stem for most families so near-miss surface forms are
# reachable (stemmer.c:14-48 get_next/first):
#   porter returns 2 (stem_porter.c:293-297 "OK to return 2"),
#   every snowball wrapper returns 2 (stem_snowball.c:25),
#   otago_v2 returns SACROSANCT_CHARS=2 (stem_otago_v2.c:11,425),
#   paice_husk returns 3 (stem_paice_husk.c), otago 3 (stem_otago.c:14),
#   soundex/double_metaphone return 1 (phonetic_soundex.h:57,
#   phonetic_double_metaphone.h:47 — the class is every term sharing
#   the FIRST LETTER whose code matches),
#   s-stripper and krovetz return the full stem length.
# None = full stem.
CLASS_PREFIX_LEN: dict[str, int | None] = {
    "s": None,
    "krovetz": None,
    "porter": 2,
    "paice_husk": 3,
    "otago": 3,
    "otago_v2": 2,
    "soundex": 1,
    "double_metaphone": 1,
    **{name: 2 for name in _STEM_FN if name.startswith("snowball_")},
}


def class_prefix(stemmer: str, stem: str) -> str:
    """The b-tree scan prefix for a stem class (see CLASS_PREFIX_LEN)."""
    n = CLASS_PREFIX_LEN[stemmer]
    return stem if n is None else stem[:n]


def index_stem(term: str, stemmer: str) -> str:
    """Index-side gate (index_document.c:103-111): words longer than 3
    chars only; digit-run (NUMBER) tokens pass through."""
    if len(term) <= 3 or term[0].isdigit():
        return term
    return _STEM_FN[stemmer](term)


def query_stem(term: str, stemmer: str | None) -> str:
    """Query-side gate (search_engine.c:775-779): first char a
    lowercase letter and length ≥ 3."""
    if stemmer is None:
        return term
    if len(term) < 3 or not ("a" <= term[0] <= "z"):
        return term
    return _STEM_FN[stemmer](term)


def stem_unique(uniq: np.ndarray, stemmer: str) -> np.ndarray:
    """Index-stem an array of unique terms (batch vocabulary)."""
    fn = _STEM_FN[stemmer]
    out = np.empty(uniq.size, dtype=object)
    for i, t in enumerate(uniq):
        out[i] = t if (len(t) <= 3 or t[0].isdigit()) else fn(t)
    return out


def stem_tokens_series(tokens: pd.Series, stemmer: str | None) -> pd.Series:
    """Index-stem a Series of token lists via its unique vocabulary —
    one Python call per distinct term per batch, vectorized remap."""
    if stemmer is None:
        return tokens
    flat = tokens.explode().dropna()
    if flat.empty:
        return tokens
    codes, uniq = pd.factorize(flat.to_numpy())
    stemmed = stem_unique(np.asarray(uniq, dtype=object), stemmer)
    remapped = pd.Series(stemmed[codes], index=flat.index)
    grouped = remapped.groupby(level=0).agg(list)
    out = grouped.reindex(tokens.index)
    return out.apply(lambda v: v if isinstance(v, list) else [])
