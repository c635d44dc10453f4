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

STEMMERS = ("s", "porter")

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


_STEM_FN = {"s": stem_s, "porter": stem_porter}


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
