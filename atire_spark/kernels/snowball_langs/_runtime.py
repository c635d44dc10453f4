"""Shared helpers for the Snowball language stemmers.

The reference reaches these algorithms through libstemmer
(source/stem_snowball.c -> external/unencumbered/snowball); each
language module in this package is an independent Python
implementation of the published Snowball algorithm for that language
(snowballstem.org), verified word-for-word against the compiled
libstemmer the reference ships (see tests/test_snowball_langs.py).

Every algorithm shares a handful of primitives:

* R1/R2 regions — R1 is the region after the first non-vowel that
  follows a vowel; R2 is the same definition applied inside R1.
* the Scandinavian variant of R1 which additionally clamps p1 so the
  region never starts before the third character.
* longest-suffix matching over a rule table, optionally constrained
  so the whole suffix lies inside a region (Snowball's
  ``setlimit tomark p1 for ([substring])`` idiom).
"""

from __future__ import annotations


def gopast_in(word: str, i: int, group) -> int:
    """Position just past the first char at-or-after ``i`` in ``group``
    (-1 when none)."""
    for j in range(i, len(word)):
        if word[j] in group:
            return j + 1
    return -1


def gopast_out(word: str, i: int, group) -> int:
    """Position just past the first char at-or-after ``i`` NOT in
    ``group`` (-1 when none)."""
    for j in range(i, len(word)):
        if word[j] not in group:
            return j + 1
    return -1


def mark_r1r2(word: str, vowels) -> tuple[int, int]:
    """Standard Snowball R1/R2 start positions (len(word) = empty)."""
    l = len(word)
    p1 = p2 = l
    i = gopast_in(word, 0, vowels)
    if i >= 0:
        j = gopast_out(word, i, vowels)
        if j >= 0:
            p1 = j
            k = gopast_in(word, j, vowels)
            if k >= 0:
                m = gopast_out(word, k, vowels)
                if m >= 0:
                    p2 = m
    return p1, p2


def mark_r1_scand(word: str, vowels) -> int:
    """Scandinavian R1: standard p1, but never before position 3, and
    empty for words shorter than 3 characters."""
    l = len(word)
    if l < 3:
        return l
    i = gopast_in(word, 0, vowels)
    if i < 0:
        return l
    j = gopast_out(word, i, vowels)
    if j < 0:
        return l
    return max(j, 3)


def sort_by_len(suffixes) -> list:
    """Rule table pre-sort: longest suffix first (Snowball ``among``
    always takes the longest match)."""
    return sorted(suffixes, key=len, reverse=True)


def longest_suffix(word: str, table: list, p1: int | None = None):
    """Longest suffix in ``table`` (pre-sorted longest-first) matching
    ``word``; with ``p1`` the whole suffix must lie inside word[p1:].
    Returns the suffix or None."""
    for s in table:
        if word.endswith(s) and (p1 is None or len(word) - len(s) >= p1):
            return s
    return None
