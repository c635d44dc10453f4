"""Snowball Kraaij-Pohlmann stemmer (Dutch).

Independent Python implementation of the published Snowball
Kraaij-Pohlmann algorithm (snowballstem.org, after Kraaij & Pohlmann
1994), matching the reference's ``-tsnowball:kraaij_pohlmann`` slot
(source/stemmer_factory.c:51 via libstemmer).  Parity with the
compiled libstemmer the reference ships is certified by a
full-wordlist sweep; frozen cases live in
tests/test_snowball_langs.py.

Distinctive machinery: a measure() that re-marks R1/R2 after the
ge- prefix/infix removals, a vowel-lengthening insert (boom/bomen
conflation), and ij treated as a unit vowel.
"""

from __future__ import annotations

_KP_V = frozenset("aeiouy")
_KP_V_WX = frozenset("aeiouywx")
_KP_AOU = frozenset("aou")
_KP_AIOU = frozenset("aiou")


def _kp_v_at(w: str, i: int) -> bool:
    """Snowball V: a vowel or the pair ij just before position i."""
    return (i >= 1 and w[i - 1] in _KP_V) or (i >= 2 and w[i - 2:i] == "ij")


def _kp_vx_at(w: str, i: int) -> bool:
    """V one character further back."""
    return i >= 1 and _kp_v_at(w, i - 1)


def _kp_c_at(w: str, i: int) -> bool:
    """A consonant just before position i (and not the pair ij)."""
    return not (i >= 2 and w[i - 2:i] == "ij") \
        and i >= 1 and w[i - 1] not in _KP_V


def _kp_lengthen_v(w: str) -> str:
    """Double a short a/o/u/e before a final consonant (boom/bomen)."""
    n = len(w)
    if n < 2 or w[-1] in _KP_V_WX:
        return w
    v = w[-2]
    if v in _KP_AOU:
        if n == 2 or w[-3] not in _KP_V:
            return w[:-1] + v + w[-1]
        return w
    if v != "e":
        return w
    if n > 2 and w[-3] in _KP_V:
        return w
    # cursor sits before the consonant preceding the e (if any)
    if n > 2:
        if n >= 4 and w[-4] in _KP_AIOU:
            return w
        if n >= 6 and w[-5] in _KP_AIOU and w[-6] not in _KP_V:
            return w
    return w[:-1] + "e" + w[-1]


def _kp_measure(w: str) -> tuple[int, int]:
    """p1/p2: after [C*] vowel-run (ij = one unit) [one C], twice."""
    n = len(w)
    p1 = p2 = n
    i = 0
    for k in range(2):
        while i < n and w[i] not in _KP_V and not w.startswith("ij", i):
            i += 1
        runs = 0
        while i < n:
            if w.startswith("ij", i):
                i += 2
            elif w[i] in _KP_V:
                i += 1
            else:
                break
            runs += 1
        if runs < 1 or i >= n or w[i] in _KP_V:
            return p1, p2
        i += 1
        if k == 0:
            p1 = i
        else:
            p2 = i
    return p1, p2


def _kp_step1(w: str, p1: int):
    n = len(w)
    if w.endswith("'s"):
        return w[:-2], True
    if w.endswith("ies"):
        pos = n - 3
        if pos >= p1:
            return w[:pos] + "ie", True
        return w, False
    if w.endswith("aus"):
        pos = n - 3
        if pos >= p1 and _kp_v_at(w, pos):
            return w[:pos] + "au", True
        return w, False
    if w.endswith("nde"):
        return w[:-3] + "nd", True
    if w.endswith("es"):
        pos = n - 2
        if w[:pos].endswith("ar") and pos - 2 >= p1 and _kp_c_at(w, pos - 2):
            return _kp_lengthen_v(w[:pos - 2]), True
        if w[:pos].endswith("er") and pos - 2 >= p1 and _kp_c_at(w, pos - 2):
            return w[:pos - 2], True
        if pos >= p1 and _kp_c_at(w, pos):
            return w[:pos] + "e", True
        return w, False
    if w.endswith("en"):
        pos = n - 2
        if w[:pos].endswith("hed") and pos - 3 >= p1:
            return w[:pos - 3] + "heid", True
        if w[:pos].endswith("nd"):
            return w[:pos], True
        if w[:pos].endswith("d") and pos - 1 >= p1 and _kp_c_at(w, pos - 1):
            return w[:pos - 1], True
        if pos >= 1 and w[pos - 1] in "ij" and _kp_v_at(w, pos - 1):
            return w[:pos], True
        if pos >= p1 and _kp_c_at(w, pos):
            return _kp_lengthen_v(w[:pos]), True
        return w, False
    if w.endswith("s"):
        pos = n - 1
        if pos >= p1 and not (pos >= 1 and w[pos - 1] == "t"
                              and pos - 1 >= p1) and _kp_c_at(w, pos):
            return w[:pos], True
        return w, False
    return w, False


_KP_STEP2_SIMPLE = (
    ("lijke", "lijk", "R1"), ("ische", "isch", "R1"), ("ge", "g", "R1"),
    ("te", "t", "R1"), ("se", "s", "R1"), ("re", "r", "R1"),
)


def _kp_step2(w: str, p1: int):
    n = len(w)
    if not w.endswith("e"):
        return w, False
    if w.endswith("je"):
        # or-chain: a failed condition falls through to the next form
        pos = n - 2
        head = w[:pos]
        if head.endswith("'t"):
            return w[:pos - 2], True
        if head.endswith("et") and pos - 2 >= p1 and _kp_c_at(w, pos - 2):
            return w[:pos - 2], True
        if head.endswith("rnt"):
            return w[:pos - 3] + "rn", True
        if head.endswith("t") and pos - 1 >= p1 and _kp_vx_at(w, pos - 1):
            return w[:pos - 1], True
        if head.endswith("ink"):
            return w[:pos - 3] + "ing", True
        if head.endswith("mp"):
            return w[:pos - 2] + "m", True
        if head.endswith("'") and pos - 1 >= p1:
            return w[:pos - 1], True
        if pos >= p1 and _kp_c_at(w, pos):
            return w[:pos], True
        return w, False
    for s, repl, _ in _KP_STEP2_SIMPLE:
        if w.endswith(s):
            pos = n - len(s)
            if pos >= p1:
                return w[:pos] + repl, True
            return w, False
    if w.endswith("ieve"):
        pos = n - 4
        if pos >= p1 and _kp_c_at(w, pos):
            return w[:pos] + "ief", True
        return w, False
    if w.endswith("ene"):
        pos = n - 3
        if pos >= p1 and _kp_c_at(w, pos):
            return _kp_lengthen_v(w[:pos] + "en"), True
        return w, False
    if w.endswith("le"):
        pos = n - 2
        if pos >= p1:
            return _kp_lengthen_v(w[:pos] + "l"), True
        return w, False
    if w.endswith("de"):
        pos = n - 2
        if pos >= p1 and _kp_c_at(w, pos):
            return w[:pos], True
        return w, False
    return w, False


_KP_STEP3 = (
    ("iteit", 2), ("atie", 1), ("heid", 3), ("rder", 4), ("ster", 3),
    ("isme", 5), ("arij", 6), ("erij", 5), ("sel", 3), ("ing", 5),
    ("fie", 7), ("gie", 8), ("dst", 10), ("tst", 9),
)


def _kp_step3(w: str, p1: int, p2: int):
    for s, code in sorted(_KP_STEP3, key=lambda e: len(e[0]), reverse=True):
        if w.endswith(s):
            pos = len(w) - len(s)
            if code == 1:
                if pos >= p1:
                    return w[:pos] + "eer", True
            elif code == 2:
                if pos >= p1:
                    return _kp_lengthen_v(w[:pos]), True
            elif code == 3:
                if pos >= p1:
                    return w[:pos], True
            elif code == 4:
                return w[:pos] + "r", True
            elif code == 5:
                if pos >= p1:
                    return _kp_lengthen_v(w[:pos]), True
            elif code == 6:
                if pos >= p1 and _kp_c_at(w, pos):
                    return w[:pos] + "aar", True
            elif code == 7:
                if pos >= p2:
                    return _kp_lengthen_v(w[:pos] + "f"), True
            elif code == 8:
                if pos >= p2:
                    return _kp_lengthen_v(w[:pos] + "g"), True
            elif code == 9:
                if pos >= p1 and _kp_c_at(w, pos):
                    return w[:pos] + "t", True
            elif code == 10:
                if pos >= p1 and _kp_c_at(w, pos):
                    return w[:pos] + "d", True
            return w, False
    return w, False


_KP_STEP4A = (
    ("achtigst", 9), ("achtiger", 9), ("eriger", 10), ("erigst", 10),
    ("lijker", 8), ("lijkst", 8), ("ioneel", 1), ("achtig", 9),
    ("atief", 2), ("baar", 3), ("naar", 4), ("laar", 5), ("raar", 6),
    ("tant", 7), ("erig", 10), ("end", 10),
)


def _kp_step4(w: str, p1: int):
    for s, code in sorted(_KP_STEP4A, key=lambda e: len(e[0]), reverse=True):
        if w.endswith(s):
            pos = len(w) - len(s)
            if pos >= p1:
                if code == 1:
                    return w[:pos] + "ie", True
                if code == 2:
                    return w[:pos] + "eer", True
                if code == 3:
                    return w[:pos], True
                if code == 4 and _kp_v_at(w, pos):
                    return w[:pos] + "n", True
                if code == 5 and _kp_v_at(w, pos):
                    return w[:pos] + "l", True
                if code == 6 and _kp_v_at(w, pos):
                    return w[:pos] + "r", True
                if code == 7:
                    return w[:pos] + "teer", True
                if code == 8:
                    return w[:pos] + "lijk", True
                if code == 9:
                    return w[:pos], True
                if code == 10 and _kp_c_at(w, pos):
                    return _kp_lengthen_v(w[:pos]), True
            break
    # second alternative: bare ig forms
    for s in ("iger", "igst", "ig"):
        if w.endswith(s):
            pos = len(w) - len(s)
            if pos >= p1 and _kp_c_at(w, pos):
                return _kp_lengthen_v(w[:pos]), True
            return w, False
    return w, False


def _kp_step1c(w: str, p1: int):
    if w.endswith("d"):
        pos = len(w) - 1
        if pos >= p1 and _kp_c_at(w, pos) and not (
            pos >= 1 and w[pos - 1] == "n" and pos - 1 >= p1
        ):
            return w[:pos], True
        return w, False
    if w.endswith("t"):
        pos = len(w) - 1
        if pos >= p1 and _kp_c_at(w, pos) and not (
            pos >= 1 and w[pos - 1] == "h" and pos - 1 >= p1
        ):
            return w[:pos], True
    return w, False


def _kp_step7(w: str):
    for s, repl in (("kt", "k"), ("ft", "f"), ("pt", "p")):
        if w.endswith(s):
            return w[:-2] + repl, True
    return w, False


_KP_DOUBLES = ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll",
               "mm", "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww",
               "xx", "zz")


def _kp_step6(w: str):
    for s in _KP_DOUBLES:
        if w.endswith(s):
            return w[:-1], True
    if w.endswith("v"):
        return w[:-1] + "f", True
    if w.endswith("z"):
        return w[:-1] + "s", True
    return w, False


def _kp_has_ge_shape(w: str, start: int) -> bool:
    """From ``start``: a vowel is found and a non-vowel follows it."""
    n = len(w)
    i = start
    while i < n and w[i] not in _KP_V:
        i += 1
    if i >= n:
        return False
    while i < n and w[i] in _KP_V:
        i += 1
    return i < n


def stem_snowball_kraaij_pohlmann(word: str) -> str:
    w = word
    y_found = False
    if w.startswith("y"):
        w = "Y" + w[1:]
        y_found = True
    out = list(w)
    for i in range(len(out) - 1):
        if out[i] in _KP_V and out[i + 1] == "y":
            out[i + 1] = "Y"
            y_found = True
    w = "".join(out)

    p1, p2 = _kp_measure(w)

    stemmed = False
    for step in (_kp_step1, _kp_step2):
        w, ok = step(w, p1)
        stemmed = stemmed or ok
    w, ok = _kp_step3(w, p1, p2)
    stemmed = stemmed or ok
    w, ok = _kp_step4(w, p1)
    stemmed = stemmed or ok

    # ge- prefix removal, then re-measure and tidy a revealed d/t
    if w.startswith("ge") and len(w) >= 5 and _kp_has_ge_shape(w, 2):
        w = w[2:]
        p1, p2 = _kp_measure(w)
        w, _ = _kp_step1c(w, p1)

    # ge infix removal (first ge at position >= 1)
    ge_removed = False
    i = w.find("ge", 1)
    if i >= 0 and i + 2 + 3 <= len(w) and _kp_has_ge_shape(w, i + 2):
        w = w[:i] + w[i + 2:]
        ge_removed = True
        p1, p2 = _kp_measure(w)
        w, _ = _kp_step1c(w, p1)

    w, ok = _kp_step7(w)
    stemmed = stemmed or ok
    if stemmed or ge_removed:
        w, _ = _kp_step6(w)

    if y_found:
        w = w.replace("Y", "y")
    return w
