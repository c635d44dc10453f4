"""Snowball Finnish (and Hungarian, below) stemmers.

Independent Python implementations of the published Snowball
algorithms (snowballstem.org), matching the reference's
``-tsnowball:finnish`` / ``-tsnowball:hungarian`` slots
(source/stemmer_factory.c:45,49 via libstemmer).  Parity with the
compiled libstemmer the reference ships is certified by a
full-wordlist sweep; frozen cases live in
tests/test_snowball_langs.py.

Finnish peculiarities worth naming: the case-ending table carries
*conditional* entries (den/tten/siin require a V2+i before them,
seen a long vowel) that fall back to the bare ``n`` entry when the
condition fails — Snowball's among-function backtracking — and the
final tidy step undoubles the last non-vowel pair.
"""

from __future__ import annotations

from atire_spark.kernels.snowball_langs._runtime import mark_r1r2

_FI_V1 = frozenset("aeiouyäö")
_FI_V2 = frozenset("aeiouäö")
_FI_AEI = frozenset("aeiä")
_FI_PARTICLE_END = _FI_V1 | frozenset("nt")
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FI_PARTICLES = sorted(
    [("kaan", 1), ("kään", 1), ("sti", 2), ("han", 1), ("hän", 1),
     ("kin", 1), ("ko", 1), ("kö", 1), ("pa", 1), ("pä", 1)],
    key=lambda e: len(e[0]), reverse=True,
)
_FI_POSS = sorted(
    [("nsa", 3), ("nsä", 3), ("mme", 3), ("nne", 3), ("ni", 2),
     ("si", 1), ("an", 4), ("än", 5), ("en", 6)],
    key=lambda e: len(e[0]), reverse=True,
)
_FI_AN_PRE = ("lla", "ssa", "sta", "lta", "na", "ta")
_FI_AEN_PRE = ("llä", "ssä", "stä", "ltä", "nä", "tä")

# (suffix, code); "VI"/"LONG" are matching-time conditions with
# fallback, numeric codes are hard post-match conditions
_FI_CASE = sorted(
    [("a", 8), ("ä", 8), ("lla", None), ("llä", None), ("na", None),
     ("nä", None), ("ssa", None), ("ssä", None), ("ta", None),
     ("tä", None), ("lta", None), ("ltä", None), ("sta", None),
     ("stä", None), ("tta", 9), ("ttä", 9), ("lle", None),
     ("ine", None), ("ksi", None), ("n", 7), ("han", 1), ("hen", 2),
     ("hin", 3), ("hon", 4), ("hän", 5), ("hön", 6), ("den", "VI"),
     ("tten", "VI"), ("siin", "VI"), ("seen", "LONG")],
    key=lambda e: len(e[0]), reverse=True,
)
_FI_H_VOWEL = {1: "a", 2: "e", 3: "i", 4: "o", 5: "ä", 6: "ö"}

_FI_OTHER = sorted(
    [("imma", 0), ("impa", 0), ("immi", 0), ("impi", 0), ("immä", 0),
     ("impä", 0), ("eja", 0), ("ejä", 0), ("mma", 1), ("mpa", 1),
     ("mmi", 1), ("mpi", 1), ("mmä", 1), ("mpä", 1)],
    key=lambda e: len(e[0]), reverse=True,
)


def _fi_particle(w: str, p1: int, p2: int) -> str:
    for s, code in _FI_PARTICLES:
        pos = len(w) - len(s)
        if pos >= p1 and w.endswith(s):
            if code == 1:
                if pos >= 1 and w[pos - 1] in _FI_PARTICLE_END:
                    return w[:pos]
            elif pos >= p2:
                return w[:pos]
            return w
    return w


def _fi_possessive(w: str, p1: int) -> str:
    for s, code in _FI_POSS:
        pos = len(w) - len(s)
        if pos >= p1 and w.endswith(s):
            if code == 1:  # si, not after k
                if not (pos >= 1 and w[pos - 1] == "k"):
                    return w[:pos]
            elif code == 2:  # ni; kse -> ksi
                w = w[:pos]
                if w.endswith("kse"):
                    w = w[:-1] + "i"
                return w
            elif code == 3:
                return w[:pos]
            elif code == 4:
                if any(w[:pos].endswith(t) for t in _FI_AN_PRE):
                    return w[:pos]
            elif code == 5:
                if any(w[:pos].endswith(t) for t in _FI_AEN_PRE):
                    return w[:pos]
            else:  # en after lle/ine
                if w[:pos].endswith("lle") or w[:pos].endswith("ine"):
                    return w[:pos]
            return w
    return w


def _fi_case_ending(w: str, p1: int):
    for s, code in _FI_CASE:
        pos = len(w) - len(s)
        if pos < p1 or not w.endswith(s):
            continue
        if code == "VI":  # i after a V2 vowel, inside R1; else fall back
            if not (pos - 2 >= p1 and w[pos - 1] == "i"
                    and w[pos - 2] in _FI_V2):
                continue
        elif code == "LONG":  # long vowel before, inside R1
            if not (pos - 2 >= p1 and w[pos - 2:pos] in _FI_LONG):
                continue
        if code in _FI_H_VOWEL:  # hXn needs matching X before
            if not (pos >= 1 and w[pos - 1] == _FI_H_VOWEL[code]):
                return w, False
        elif code == 9:  # tta/ttä after e
            if not (pos >= 1 and w[pos - 1] == "e"):
                return w, False
        elif code == 8:  # a/ä after consonant+vowel
            if not (pos >= 2 and w[pos - 1] in _FI_V1
                    and w[pos - 2] not in _FI_V1):
                return w, False
        elif code == 7:  # n; a long vowel or ie before loses a char too
            if pos >= 2 and (w[pos - 2:pos] in _FI_LONG
                             or w[pos - 2:pos] == "ie"):
                pos -= 1
        return w[:pos], True
    return w, False


def _fi_other_endings(w: str, p2: int) -> str:
    for s, code in _FI_OTHER:
        pos = len(w) - len(s)
        if pos >= p2 and w.endswith(s):
            if code == 1 and w[:pos].endswith("po"):
                return w
            return w[:pos]
    return w


def _fi_tidy(w: str, p1: int) -> str:
    n = len(w)
    if n >= p1 + 2 and w[n - 2:] in _FI_LONG:
        w = w[:-1]
    n = len(w)
    if n - 1 >= p1 and w[n - 1] in _FI_AEI and n - 1 > p1 \
            and w[n - 2] not in _FI_V1:
        w = w[:-1]
    n = len(w)
    if w.endswith("j") and n - 2 >= p1 and w[n - 2] in "ou":
        w = w[:-1]
    n = len(w)
    if w.endswith("o") and n - 2 >= p1 and w[n - 2] == "j":
        w = w[:-1]
    # undouble the final non-vowel pair (limit-free)
    k = len(w) - 1
    while k >= 0 and w[k] in _FI_V1:
        k -= 1
    if k >= 1 and w[k - 1] == w[k]:
        w = w[:k] + w[k + 1:]
    return w


def stem_snowball_finnish(word: str) -> str:
    w = word
    p1, p2 = mark_r1r2(w, _FI_V1)
    w = _fi_particle(w, p1, p2)
    w = _fi_possessive(w, p1)
    w, removed = _fi_case_ending(w, p1)
    w = _fi_other_endings(w, p2)
    if removed:
        # i_plural: final i/j inside R1
        if w and w[-1] in "ij" and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        # t_plural: t after a vowel (both inside R1), then mma in R2
        if w.endswith("t") and len(w) - 2 >= p1 and w[-2] in _FI_V1:
            w = w[:-1]
            for s, code in (("imma", 0), ("mma", 1)):
                pos = len(w) - len(s)
                if pos >= p2 and w.endswith(s):
                    if code == 1 and w[:pos].endswith("po"):
                        break
                    w = w[:pos]
                    break
    return _fi_tidy(w, p1)


# --------------------------------------------------------------- Hungarian
# this libstemmer snapshot spells ő/ű as õ/û; vowels and tables follow it
_HU_VOWELS = frozenset("aeiouáéíóöõúûü")
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs", "bb",
               "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
               "pp", "rr", "ss", "tt", "vv", "zz")

_HU_CASE = sorted(
    ["ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
     "nál", "nél", "ból", "ról", "tól", "bõl", "rõl", "tõl", "ül",
     "n", "an", "ban", "en", "ben", "képpen", "on", "ön", "képp",
     "kor", "t", "at", "et", "ként", "anként", "enként", "onként",
     "ot", "ért", "öt", "hez", "hoz", "höz", "vá", "vé"],
    key=len, reverse=True,
)
_HU_CASE_SPECIAL = (("ánként", "a"), ("án", "a"), ("én", "e"))
_HU_CASE_OTHER = (("astul", ""), ("estül", ""), ("ástul", "a"),
                  ("éstül", "e"), ("stul", ""), ("stül", ""))
_HU_OWNED = (("ééi", "e"), ("áéi", "a"), ("éké", "e"), ("áké", "a"),
             ("aké", ""), ("eké", ""), ("oké", ""), ("öké", ""),
             ("éi", ""), ("ké", ""), ("éé", "e"), ("é", ""))
_HU_SING_OWNER = sorted(
    [("unk", ""), ("ünk", ""), ("ánk", "a"), ("énk", "e"), ("nk", ""),
     ("ájuk", "a"), ("éjük", "e"), ("juk", ""), ("jük", ""),
     ("uk", ""), ("ük", ""), ("am", ""), ("em", ""), ("om", ""),
     ("ám", "a"), ("ém", "e"), ("m", ""), ("ad", ""), ("ed", ""),
     ("od", ""), ("öd", ""), ("ád", "a"), ("éd", "e"), ("d", ""),
     ("ja", ""), ("je", ""), ("a", ""), ("e", ""), ("o", ""),
     ("á", "a"), ("é", "e")],
    key=lambda e: len(e[0]), reverse=True,
)
_HU_PLUR_OWNER = sorted(
    [("jaim", ""), ("jeim", ""), ("áim", "a"), ("éim", "e"),
     ("aim", ""), ("eim", ""), ("im", ""), ("jaid", ""), ("jeid", ""),
     ("áid", "a"), ("éid", "e"), ("aid", ""), ("eid", ""), ("id", ""),
     ("jai", ""), ("jei", ""), ("ái", "a"), ("éi", "e"), ("ai", ""),
     ("ei", ""), ("i", ""), ("jaink", ""), ("jeink", ""),
     ("áink", "a"), ("éink", "e"), ("aink", ""), ("eink", ""),
     ("ink", ""), ("jaitok", ""), ("jeitek", ""), ("áitok", "a"),
     ("éitek", "e"), ("aitok", ""), ("eitek", ""), ("itek", ""),
     ("jaik", ""), ("jeik", ""), ("áik", "a"), ("éik", "e"),
     ("aik", ""), ("eik", ""), ("ik", "")],
    key=lambda e: len(e[0]), reverse=True,
)
_HU_PLURAL = (("ák", "a"), ("ék", "e"), ("ak", ""), ("ok", ""),
              ("ek", ""), ("ök", ""), ("k", ""))


def _hu_r1(w: str) -> int:
    n = len(w)
    if not w:
        return 0
    if w[0] in _HU_VOWELS:
        i = 0
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i == n:
            return n
        for d in _HU_DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return i + 1 if i < n else n


def _hu_double_before(w: str, pos: int) -> bool:
    return any(w[:pos].endswith(d) for d in _HU_DOUBLES)


def _hu_undouble(w: str) -> str:
    # drop the second-to-last char (one of the final double pair)
    return w[:-2] + w[-1] if len(w) >= 2 else w


def _hu_table(w: str, p1: int, table) -> str:
    """Longest match in R1; replacement '' deletes, else appended."""
    for s, repl in table:
        pos = len(w) - len(s)
        if w.endswith(s):
            if pos >= p1:
                return w[:pos] + repl
            return w
    return w


def stem_snowball_hungarian(word: str) -> str:
    w = word
    p1 = _hu_r1(w)

    # instrum: al/el after a double consonant, R1; delete + undouble
    for s in ("al", "el"):
        pos = len(w) - 2
        if w.endswith(s):
            if pos >= p1 and _hu_double_before(w, pos):
                w = _hu_undouble(w[:pos])
            break

    # case endings, then a revealed final á/é reverts (R1)
    for s in _HU_CASE:
        pos = len(w) - len(s)
        if w.endswith(s):
            if pos >= p1:
                w = w[:pos]
                if w.endswith("á") and len(w) - 1 >= p1:
                    w = w[:-1] + "a"
                elif w.endswith("é") and len(w) - 1 >= p1:
                    w = w[:-1] + "e"
            break

    w = _hu_table(w, p1, _HU_CASE_SPECIAL)
    w = _hu_table(w, p1, _HU_CASE_OTHER)

    # factive: á/é after a double consonant, R1; delete + undouble
    for s in ("á", "é"):
        pos = len(w) - 1
        if w.endswith(s):
            if pos >= p1 and _hu_double_before(w, pos):
                w = _hu_undouble(w[:pos])
            break

    w = _hu_table(w, p1, _HU_OWNED)
    w = _hu_table(w, p1, _HU_SING_OWNER)
    w = _hu_table(w, p1, _HU_PLUR_OWNER)
    w = _hu_table(w, p1, _HU_PLURAL)
    return w
