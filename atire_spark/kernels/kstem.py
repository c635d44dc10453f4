"""Krovetz (kstem) stemmer — inflectional + light derivational morphology.

The reference ships kstem as source/stem_krovetz.c (the Lemur/INQUERY
implementation, registered at stemmer_factory.c:36 KROVETZ).  The
algorithm: look the word up in a ~21.8k-entry lexicon and leave it
alone if found; otherwise normalize plurals / past tense / -ing, then
try ~15 derivational ending families, checking the lexicon after
every stage; finally apply a direct variant->root conflation if the
landed entry carries one.  This module re-expresses that pipeline
over immutable Python strings; the lexicon lives in
kernels/kstem_data.py (data extracted from the reference's arrays).

Parity is certified against a compiled harness around the reference C
(see tests/test_kstem.py).

Stage-order contract (stem_krovetz.c:1232-1296): plural, past tense,
aspect, -ity, -ness, -ion, -er/-or, -ly, -al, -ive, -ize, -ment,
-ble, -ism, -ic, -ncy, -nce — with a dictionary check between every
pair, so 'longings' -> 'longing' rather than 'long'.
"""

from __future__ import annotations

from atire_spark.kernels.kstem_data import build_dictionary

_DICT: dict[str, tuple[bool, str]] = build_dictionary()

_MAX_WORD_LENGTH = 25  # stem_krovetz.h:81
_ASCII = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_VOWELS = "aeiou"


def _getdep(w: str) -> tuple[bool, str] | None:
    # getdep() skips words of length <= 1 (stem_krovetz.c:141-143)
    if len(w) <= 1:
        return None
    return _DICT.get(w)


def _lookup(w: str) -> bool:
    return _getdep(w) is not None


def _cons(w: str, i: int) -> bool:
    ch = w[i]
    if ch in _VOWELS:
        return False
    if ch != "y" or i == 0:
        return True
    return w[i - 1] in _VOWELS


def _vowel_in(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _doublec(w: str, i: int) -> bool:
    return i >= 1 and w[i] == w[i - 1] and _cons(w, i)


# Each stage takes the current word and returns the (possibly
# unchanged) word.  `j` mirrors the C's last-stem-char index after an
# ends_in() match: j = len(w) - len(suffix) - 1.


def _plural(w: str) -> str:
    n = len(w)
    if not w.endswith("s"):
        return w
    if n >= 4 and w.endswith("ies"):
        t = w[:-1]  # calories -> calorie
        if _lookup(t):
            return t
        return w[:-3] + "y"
    if n >= 3 and w.endswith("es"):
        j = n - 3
        t = w[:-1]  # aides -> aide, but not crosses -> crosse
        if _lookup(t) and j > 0 and not (w[j] == "s" and w[j - 1] == "s"):
            return t
        t = w[:-2]
        if _lookup(t):
            return t
        return w[:-1]  # default retains the e
    if n > 3 and w[-2] != "s" and not w.endswith("ous"):
        return w[:-1]
    return w


def _past_tense(w: str) -> str:
    n = len(w)
    if n <= 4:  # direct mapping prevents fled -> fl
        return w
    if w.endswith("ied"):
        t = w[:-1]
        if _lookup(t):
            return t
        return w[:-3] + "y"
    if w.endswith("ed") and _vowel_in(w[:-2]):
        t = w[:-1]  # root ends in e?
        dep = _getdep(t)
        if dep is not None and not dep[0]:  # found and not an exception
            return t
        t = w[:-2]
        if _lookup(t):
            return t
        if _doublec(t, len(t) - 1):
            t2 = t[:-1]
            if _lookup(t2):
                return t2
            return t  # default leaves the consonant doubled
        if w.startswith("un"):
            return w  # leave un- words alone
        return w[:-2] + "e"  # microcoded -> microcode
    return w


def _aspect(w: str) -> str:
    n = len(w)
    if n <= 5:  # direct mapping prevents thing -> the
        return w
    if w.endswith("ing") and _vowel_in(w[:-3]):
        j = n - 4
        t = w[:-3] + "e"
        dep = _getdep(t)
        if dep is not None and not dep[0]:
            return t
        t = w[:-3]
        if _lookup(t):
            return t
        if _doublec(t, len(t) - 1):
            t2 = t[:-1]
            if _lookup(t2):
                return t2
            return t  # fingerspelling -> fingerspell
        if j > 0 and _cons(w, j) and _cons(w, j - 1):
            return t  # footstamping -> footstamp
        return t + "e"  # microcoding -> microcode
    return w


def _ity_endings(w: str) -> str:
    n = len(w)
    if n >= 4 and w.endswith("ity"):
        j = n - 4
        t = w[:-3]
        if _lookup(t):
            return t
        t = w[:-3] + "e"
        if _lookup(t):
            return t
        if j > 0 and w[j - 1] == "i" and w[j] == "l":
            return w[:-5] + "le"  # -ility -> -ble (ability -> able)
        if j > 0 and w[j - 1] == "i" and w[j] == "v":
            return w[:-3] + "e"  # -ivity -> -ive
        if j > 0 and w[j - 1] == "a" and w[j] == "l":
            return w[:-3]  # -ality -> -al
        if _lookup(w):  # immunity -> immune, but capacity stays
            return w
        return w[:-3]
    return w


def _ness_endings(w: str) -> str:
    n = len(w)
    if n >= 5 and w.endswith("ness"):
        t = w[:-4]
        if t[-1] == "i":
            t = t[:-1] + "y"
        return t
    return w


def _ion_endings(w: str) -> str:
    n = len(w)
    if n >= 8 and w.endswith("ization"):
        return w[:-7] + "ize"  # -ize is productive; accept it
    if n >= 6 and w.endswith("ition"):
        t = w[:-5] + "e"  # definition -> define
        if _lookup(t):
            return t
    if n >= 6 and w.endswith("ation"):
        t = w[:-3] + "e"  # elimination -> eliminate
        if _lookup(t):
            return t
        t = w[:-5] + "e"  # allegation -> allege
        if _lookup(t):
            return t
        t = w[:-5]  # resignation -> resign
        if _lookup(t):
            return t
    # -ication tested after -ation (complication -> complicate)
    if n >= 8 and w.endswith("ication"):
        t = w[:-7] + "y"  # amplification -> amplify
        if _lookup(t):
            return t
    if n >= 4 and w.endswith("ion"):
        t = w[:-3] + "e"
        if _lookup(t):
            return t
        t = w[:-3]
        if _lookup(t):
            return t
    return w


def _er_and_or_endings(w: str) -> str:
    n = len(w)
    if n >= 5 and w.endswith("izer"):
        return w[:-1]  # -ize is productive; accept it
    if n >= 3 and (w.endswith("er") or w.endswith("or")):
        j = n - 3
        if _doublec(w, j):
            t = w[:j]
            if _lookup(t):
                return t
        if w[j] == "i":  # -ier (flier -> fly)
            t = w[:j] + "y"
            if _lookup(t):
                return t
        if w[j] == "e":  # -eer
            t = w[:j]
            if _lookup(t):
                return t
        t = w[:-1]  # remove the -r
        if _lookup(t):
            return t
        t = w[: j + 1]  # remove -er / -or
        if _lookup(t):
            return t
        t = w[: j + 1] + "e"  # -or -> -e
        if _lookup(t):
            return t
    return w


def _ly_endings(w: str) -> str:
    n = len(w)
    if n >= 3 and w.endswith("ly"):
        j = n - 3
        t = w[:-1] + "e"  # -ly -> -le
        if _lookup(t):
            return t
        t = w[: j + 1]  # remove -ly
        if _lookup(t):
            return t
        if j > 0 and w[j - 1] == "a" and w[j] == "l":
            return w[: j + 1]  # -ally always -> -al
        if j > 0 and w[j - 1] == "a" and w[j] == "b":
            return w[:-1] + "e"  # -ably always -> -able
        if w[j] == "i":  # militarily -> military
            t = w[:j] + "y"
            if _lookup(t):
                return t
        return w[: j + 1]  # default removes -ly
    return w


def _al_endings(w: str) -> str:
    n = len(w)
    if n >= 3 and w.endswith("al"):
        j = n - 3
        t = w[: j + 1]
        if _lookup(t):
            return t
        if _doublec(w, j):
            t = w[:j]
            if _lookup(t):
                return t
        t = w[: j + 1] + "e"
        if _lookup(t):
            return t
        t = w[: j + 1] + "um"  # optimal -> optimum
        if _lookup(t):
            return t
        if j > 0 and w[j - 1] == "i" and w[j] == "c":
            t = w[: j - 1]  # remove -ical
            if _lookup(t):
                return t
            t = w[: j - 1] + "y"  # bibliographical -> bibliography
            if _lookup(t):
                return t
            return w[: j + 1]  # default -ical -> -ic
        if w[j] == "i":  # remove -ial
            t = w[:j]
            if _lookup(t):
                return t
    return w


def _ive_endings(w: str) -> str:
    n = len(w)
    if n >= 4 and w.endswith("ive"):
        j = n - 4
        t = w[: j + 1]
        if _lookup(t):
            return t
        t = w[: j + 1] + "e"
        if _lookup(t):
            return t
        if j > 0 and w[j - 1] == "a" and w[j] == "t":
            t = w[: j - 1] + "e"  # determinative -> determine
            if _lookup(t):
                return t
            t = w[: j - 1]  # remove -ative
            if _lookup(t):
                return t
        t = w[:-2] + "on"  # injunctive -> injunction
        if _lookup(t):
            return t
    return w


def _ize_endings(w: str) -> str:
    n = len(w)
    if n >= 4 and w.endswith("ize"):
        j = n - 4
        t = w[: j + 1]
        if _lookup(t):
            return t
        if _doublec(w, j):
            t = w[:j]
            if _lookup(t):
                return t
        t = w[: j + 1] + "e"
        if _lookup(t):
            return t
    return w


def _ment_endings(w: str) -> str:
    n = len(w)
    if n >= 5 and w.endswith("ment"):
        t = w[:-4]
        if _lookup(t):
            return t
    return w


def _ble_endings(w: str) -> str:
    n = len(w)
    if n >= 4 and w.endswith("ble"):
        j = n - 4
        if w[j] not in "ai":
            return w
        t = w[:j]
        if _lookup(t):
            return t
        if _doublec(t, len(t) - 1):
            t2 = t[:-1]
            if _lookup(t2):
                return t2
        t = w[:j] + "e"
        if _lookup(t):
            return t
        t = w[:j] + "ate"  # compensable -> compensate
        if _lookup(t):
            return t
    return w


def _ism_endings(w: str) -> str:
    n = len(w)
    if n >= 4 and w.endswith("ism"):
        return w[:-3]  # productive; always accept
    return w


def _ic_endings(w: str) -> str:
    n = len(w)
    if n >= 3 and w.endswith("ic"):
        t = w + "al"  # canonic -> canonical (the one expansion)
        if _lookup(t):
            return t
        t = w[:-2] + "y"
        if _lookup(t):
            return t
        t = w[:-2] + "e"
        if _lookup(t):
            return t
        t = w[:-2]
        if _lookup(t):
            return t
    return w


def _ncy_endings(w: str) -> str:
    n = len(w)
    if n >= 4 and w.endswith("ncy"):
        if w[n - 4] not in "ea":
            return w
        t = w[:-2] + "t"  # constituency -> constituent
        if _lookup(t):
            return t
        return w[:-1] + "e"  # default -ncy -> -nce
    return w


def _nce_endings(w: str) -> str:
    n = len(w)
    if n >= 4 and w.endswith("nce"):
        j = n - 4
        if w[j] not in "ea":
            return w
        t = w[:j] + "e"  # adherance -> adhere
        if _lookup(t):
            return t
        t = w[:j]  # disappearance -> disappear
        if _lookup(t):
            return t
    return w


_STAGES = (
    _plural,
    _past_tense,
    _aspect,
    _ity_endings,
    _ness_endings,
    _ion_endings,
    _er_and_or_endings,
    _ly_endings,
    _al_endings,
    _ive_endings,
    _ize_endings,
    _ment_endings,
    _ble_endings,
    _ism_endings,
    _ic_endings,
    _ncy_endings,
    _nce_endings,
)


def stem_krovetz(term: str) -> str:
    """Stem one word (kstem_stem_tobuffer, stem_krovetz.c:1156-1320)."""
    n = len(term)
    if n < 3 or n >= _MAX_WORD_LENGTH or any(c not in _ASCII for c in term):
        return term.lower()
    w = term.lower()
    dep = _getdep(w)
    if dep is None:
        for stage in _STAGES:
            w = stage(w)
            dep = _getdep(w)
            if dep is not None:
                break
    # direct conflation mapping (italian -> italy)
    if dep is not None and dep[1]:
        return dep[1]
    return w
