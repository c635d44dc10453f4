"""Snowball Russian stemmer.

Independent Python implementation of the published Snowball Russian
algorithm (snowballstem.org), matching the reference's
``-tsnowball:russian`` slot (source/stemmer_factory.c:57 via
libstemmer, UTF-8 variant).  Parity with the compiled libstemmer the
reference ships is certified by a full-wordlist sweep; frozen cases
live in tests/test_snowball_langs.py.

All suffix removal happens inside RV (after the first vowel); the
derivational step additionally requires R2.
"""

from __future__ import annotations

from atire_spark.kernels.snowball_langs._runtime import (
    gopast_in,
    mark_r1r2,
    sort_by_len,
)

_RU_VOWELS = frozenset("аеиоуыэюя")

# code 1 suffixes need а/я immediately before (inside RV); code 2 not
_RU_PERFECTIVE = sorted(
    [("вшись", 1), ("ывшись", 2), ("ившись", 2), ("в", 1), ("ыв", 2),
     ("ив", 2), ("вши", 1), ("ывши", 2), ("ивши", 2)],
    key=lambda e: len(e[0]), reverse=True,
)
_RU_ADJECTIVE = sort_by_len(
    ["ему", "ому", "ых", "их", "ую", "юю", "ею", "ою", "яя", "ая",
     "ые", "ее", "ие", "ое", "ыми", "ими", "ый", "ей", "ий", "ой",
     "ым", "ем", "им", "ом", "его", "ого"]
)
_RU_PARTICIPLE = sorted(
    [("вш", 1), ("ывш", 2), ("ивш", 2), ("щ", 1), ("ющ", 1),
     ("ующ", 2), ("ем", 1), ("нн", 1)],
    key=lambda e: len(e[0]), reverse=True,
)
_RU_VERB = sorted(
    [("ыт", 2), ("ют", 1), ("уют", 2), ("ят", 2), ("ет", 1),
     ("ует", 2), ("ит", 2), ("ны", 1), ("ены", 2), ("ть", 1),
     ("ыть", 2), ("ить", 2), ("ешь", 1), ("ишь", 2), ("ю", 2),
     ("ую", 2), ("ла", 1), ("ыла", 2), ("ила", 2), ("на", 1),
     ("ена", 2), ("ете", 1), ("ите", 2), ("йте", 1), ("уйте", 2),
     ("ейте", 2), ("ли", 1), ("ыли", 2), ("или", 2), ("й", 1),
     ("уй", 2), ("ей", 2), ("л", 1), ("ыл", 2), ("ил", 2),
     ("ым", 2), ("ем", 1), ("им", 2), ("н", 1), ("ен", 2),
     ("ло", 1), ("ыло", 2), ("ило", 2), ("но", 1), ("ено", 2),
     ("нно", 1)],
    key=lambda e: len(e[0]), reverse=True,
)
_RU_NOUN = sort_by_len(
    ["у", "ях", "иях", "ах", "ы", "ь", "ю", "ью", "ию", "я", "ья",
     "ия", "а", "ев", "ов", "е", "ье", "ие", "и", "еи", "ии", "ями",
     "иями", "ами", "й", "ей", "ией", "ий", "ой", "ям", "иям", "ам",
     "ем", "ием", "ом", "о"]
)


def _ru_coded_suffix(w: str, rv: int, table) -> tuple[str, bool]:
    """Longest match inside RV; code-1 rules additionally require а/я
    just before the suffix (also inside RV) and keep that letter."""
    for s, code in table:
        pos = len(w) - len(s)
        if pos >= rv and w.endswith(s):
            if code == 1:
                if pos - 1 >= rv and w[pos - 1] in "ая":
                    return w[:pos], True
                return w, False
            return w[:pos], True
    return w, False


def _ru_plain_suffix(w: str, rv: int, table) -> tuple[str, bool]:
    for s in table:
        pos = len(w) - len(s)
        if pos >= rv and w.endswith(s):
            return w[:pos], True
    return w, False


def stem_snowball_russian(word: str) -> str:
    w = word
    rv = gopast_in(w, 0, _RU_VOWELS)
    if rv < 0:
        return w
    _, p2 = mark_r1r2(w, _RU_VOWELS)

    w2, ok = _ru_coded_suffix(w, rv, _RU_PERFECTIVE)
    if not ok:
        w2, _ = _ru_plain_suffix(w2, rv, ["сь", "ся"])  # reflexive
        adj, ok = _ru_plain_suffix(w2, rv, _RU_ADJECTIVE)
        if ok:
            w2 = adj
            w2, _ = _ru_coded_suffix(w2, rv, _RU_PARTICIPLE)
        else:
            w2, ok = _ru_coded_suffix(w2, rv, _RU_VERB)
            if not ok:
                w2, _ = _ru_plain_suffix(w2, rv, _RU_NOUN)
    w = w2

    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # derivational: ост/ость in R2 (and inside RV)
    for s in ("ость", "ост"):
        pos = len(w) - len(s)
        if pos >= rv and pos >= p2 and w.endswith(s):
            w = w[:pos]
            break

    # tidy up: superlative, undoubled н, soft sign
    for s in ("ейше", "ейш"):
        pos = len(w) - len(s)
        if pos >= rv and w.endswith(s):
            w = w[:pos]
            if w.endswith("нн") and len(w) - 2 >= rv:
                w = w[:-1]
            return w
    if w.endswith("нн") and len(w) - 1 >= rv and len(w) - 2 >= rv:
        return w[:-1]
    if w.endswith("ь") and len(w) - 1 >= rv:
        return w[:-1]
    return w
