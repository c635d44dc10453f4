"""Snowball Turkish stemmer.

Independent Python implementation of the published Snowball Turkish
algorithm (snowballstem.org, Evren Kapusuz Cilden), matching the
reference's ``-tsnowball:turkish`` slot (source/stemmer_factory.c:60
via libstemmer).  Parity with the compiled libstemmer the reference
ships is certified by a full-wordlist sweep; frozen cases live in
tests/test_snowball_langs.py.

Structure: suffix *marks* consume characters from a cursor without
deleting (vowel harmony + optional y/n/s consonants and U vowels),
and two driver passes (nominal-verb, then noun) splice out the
marked spans; the ki-chain recurses and may run mid-word with the
tail preserved.  The postlude restores a final voiced consonant and
appends a harmony vowel after final d/g.
"""

from __future__ import annotations

_TR_VOWELS = frozenset("aeıioöuü")
_TR_U = frozenset("ıiuü")
# harmony classes: last suffix vowel -> set of agreeable stem chars
_TR_HARMONY = {"a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei",
               "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}


def _harmony(w: str, c: int) -> bool:
    i = c - 1
    while i >= 0 and w[i] not in _TR_VOWELS:
        i -= 1
    if i < 0:
        return False
    allowed = _TR_HARMONY[w[i]]
    j = i - 1
    while j >= 0 and w[j] not in allowed:
        j -= 1
    return j >= 0


def _opt_U(w: str, pos: int):
    """Optional U vowel before the suffix: consume it when doubled
    with a consonant; else require consonant-at-2-back."""
    if pos >= 2 and w[pos - 1] in _TR_U and w[pos - 2] not in _TR_VOWELS:
        return pos - 1
    if pos >= 2 and w[pos - 1] not in _TR_U \
            and w[pos - 2] not in _TR_VOWELS:
        return pos
    return None


def _opt_cons(w: str, pos: int, ch: str):
    """Optional y/n/s consonant before the suffix."""
    if pos >= 2 and w[pos - 1] == ch and w[pos - 2] in _TR_VOWELS:
        return pos - 1
    if pos >= 2 and w[pos - 1] != ch and w[pos - 2] in _TR_VOWELS:
        return pos
    return None


def _among(w: str, c: int, suffixes):
    for s in suffixes:
        if w[:c].endswith(s):
            return c - len(s)
    return None


_BY_LEN = lambda xs: sorted(xs, key=len, reverse=True)

_TR_POSS = _BY_LEN(["m", "n", "miz", "niz", "muz", "nuz",
                    "mız", "nız", "müz", "nüz"])
_TR_YDU = _BY_LEN(["di", "ti", "dik", "tik", "duk", "tuk", "dık",
                   "tık", "dük", "tük", "dim", "tim", "dum", "tum",
                   "dım", "tım", "düm", "tüm", "din", "tin", "dun",
                   "tun", "dın", "tın", "dün", "tün", "du", "tu",
                   "dı", "tı", "dü", "tü"])
_TR_YSA = _BY_LEN(["sa", "se", "sak", "sek", "sam", "sem", "san", "sen"])


def _m_possessives(w, c):
    pos = _among(w, c, _TR_POSS)
    return None if pos is None else _opt_U(w, pos)


def _m_sU(w, c):
    if not _harmony(w, c):
        return None
    if c < 1 or w[c - 1] not in _TR_U:
        return None
    return _opt_cons(w, c - 1, "s")


def _m_lArI(w, c):
    return _among(w, c, ["ları", "leri"])


def _m_yU(w, c):
    if not _harmony(w, c):
        return None
    if c < 1 or w[c - 1] not in _TR_U:
        return None
    return _opt_cons(w, c - 1, "y")


def _m_nU(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ["ni", "nu", "nı", "nü"])


def _m_nUn(w, c):
    if not _harmony(w, c):
        return None
    pos = _among(w, c, ["in", "un", "ın", "ün"])
    return None if pos is None else _opt_cons(w, pos, "n")


def _m_yA(w, c):
    if not _harmony(w, c):
        return None
    pos = _among(w, c, ["a", "e"])
    return None if pos is None else _opt_cons(w, pos, "y")


def _m_nA(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ["na", "ne"])


def _m_DA(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ["da", "ta", "de", "te"])


def _m_ndA(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ["nda", "nde"])


def _m_DAn(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ["dan", "tan", "den", "ten"])


def _m_ndAn(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ["ndan", "nden"])


def _m_ylA(w, c):
    if not _harmony(w, c):
        return None
    pos = _among(w, c, ["la", "le"])
    return None if pos is None else _opt_cons(w, pos, "y")


def _m_ki(w, c):
    return c - 2 if w[:c].endswith("ki") else None


def _m_ncA(w, c):
    if not _harmony(w, c):
        return None
    pos = _among(w, c, ["ca", "ce"])
    return None if pos is None else _opt_cons(w, pos, "n")


def _m_yUm(w, c):
    if not _harmony(w, c):
        return None
    pos = _among(w, c, ["im", "um", "ım", "üm"])
    return None if pos is None else _opt_cons(w, pos, "y")


def _m_sUn(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ["sin", "sun", "sın", "sün"])


def _m_yUz(w, c):
    if not _harmony(w, c):
        return None
    pos = _among(w, c, ["iz", "uz", "ız", "üz"])
    return None if pos is None else _opt_cons(w, pos, "y")


def _m_sUnUz(w, c):
    return _among(w, c, ["siniz", "sunuz", "sınız", "sünüz"])


def _m_lAr(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ["lar", "ler"])


def _m_nUz(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ["niz", "nuz", "nız", "nüz"])


def _m_DUr(w, c):
    if not _harmony(w, c):
        return None
    return _among(w, c, ["dir", "tir", "dur", "tur",
                         "dır", "tır", "dür", "tür"])


def _m_cAsInA(w, c):
    return _among(w, c, ["casına", "cesine"])


def _m_yDU(w, c):
    if not _harmony(w, c):
        return None
    pos = _among(w, c, _TR_YDU)
    return None if pos is None else _opt_cons(w, pos, "y")


def _m_ysA(w, c):
    pos = _among(w, c, _TR_YSA)
    return None if pos is None else _opt_cons(w, pos, "y")


def _m_ymUs(w, c):
    if not _harmony(w, c):
        return None
    pos = _among(w, c, ["miş", "muş", "mış", "müş"])
    return None if pos is None else _opt_cons(w, pos, "y")


def _m_yken(w, c):
    if not w[:c].endswith("ken"):
        return None
    return _opt_cons(w, c - 3, "y")


def _tr_nominal_verb(w: str):
    """Strip nominal verb suffixes; returns (word, continue_flag)."""
    c = len(w)
    for m in (_m_ymUs, _m_yDU, _m_ysA, _m_yken):
        r = m(w, c)
        if r is not None:
            return w[:r], True
    r = _m_cAsInA(w, c)
    if r is not None:
        r2 = r
        for m in (_m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz):
            t = m(w, r)
            if t is not None:
                r2 = t
                break
        r3 = _m_ymUs(w, r2)
        if r3 is not None:
            return w[:r3], True
    r = _m_lAr(w, c)
    if r is not None:
        w = w[:r]
        for m in (_m_DUr, _m_yDU, _m_ysA, _m_ymUs):
            t = m(w, len(w))
            if t is not None:
                w = w[:t]
                break
        return w, False
    r = _m_nUz(w, c)
    if r is not None:
        t = _m_yDU(w, r)
        if t is None:
            t = _m_ysA(w, r)
        if t is not None:
            return w[:t], True
    hit = None
    for m in (_m_sUnUz, _m_yUz, _m_sUn, _m_yUm):
        t = m(w, c)
        if t is not None:
            hit = t
            break
    if hit is not None:
        w = w[:hit]
        t = _m_ymUs(w, len(w))
        if t is not None:
            w = w[:t]
        return w, True
    r = _m_DUr(w, c)
    if r is not None:
        w = w[:r]
        c2 = len(w)
        r2 = c2
        for m in (_m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz):
            t = m(w, c2)
            if t is not None:
                r2 = t
                break
        t2 = _m_ymUs(w, r2)
        if t2 is not None:
            w = w[:t2]
        return w, True
    return w, True


def _tr_ki_chain(head: str):
    """stem_suffix_chain_before_ki on the text ending at ``head``'s
    end; returns (head', success)."""
    c = len(head)
    pos = _m_ki(head, c)
    if pos is None:
        return head, False
    r = _m_DA(head, pos)
    if r is not None:
        head = head[:r]
        t = _m_lAr(head, len(head))
        if t is not None:
            head = head[:t]
            h2, ok = _tr_ki_chain(head)
            if ok:
                head = h2
        else:
            t = _m_possessives(head, len(head))
            if t is not None:
                head = head[:t]
                t2 = _m_lAr(head, len(head))
                if t2 is not None:
                    head = head[:t2]
                    h2, ok = _tr_ki_chain(head)
                    if ok:
                        head = h2
        return head, True
    r = _m_nUn(head, pos)
    if r is not None:
        head = head[:r]
        t = _m_lArI(head, len(head))
        if t is not None:
            return head[:t], True
        t = _m_possessives(head, len(head))
        if t is None:
            t = _m_sU(head, len(head))
        if t is not None:
            head = head[:t]
            t2 = _m_lAr(head, len(head))
            if t2 is not None:
                head = head[:t2]
                h2, ok = _tr_ki_chain(head)
                if ok:
                    head = h2
            return head, True
        h2, ok = _tr_ki_chain(head)
        if ok:
            head = h2
        return head, True
    r = _m_ndA(head, pos)
    if r is not None:
        t = _m_lArI(head, r)
        if t is not None:
            return head[:t] + head[r:], True
        t = _m_sU(head, r)
        if t is not None:
            tail = head[r:]
            h = head[:t]
            t2 = _m_lAr(h, len(h))
            if t2 is not None:
                h = h[:t2]
                h2, ok = _tr_ki_chain(h)
                if ok:
                    h = h2
            return h + tail, True
        h2, ok = _tr_ki_chain(head[:r])
        if not ok:
            return head, False
        return h2 + head[r:], True
    return head, False


def _try_lAr_ki(w: str) -> str:
    """try([mark_lAr] delete; chain-before-ki required)."""
    t = _m_lAr(w, len(w))
    if t is None:
        return w
    w = w[:t]
    h2, _ = _tr_ki_chain(w)
    return h2


def _tr_noun_suffixes(w: str) -> str:
    c = len(w)
    r = _m_lAr(w, c)
    if r is not None:
        w = w[:r]
        h2, ok = _tr_ki_chain(w)
        return h2 if ok else w
    r = _m_ncA(w, c)
    if r is not None:
        w = w[:r]
        t = _m_lArI(w, len(w))
        if t is not None:
            return w[:t]
        t = _m_possessives(w, len(w))
        if t is None:
            t = _m_sU(w, len(w))
        if t is not None:
            return _try_lAr_ki(w[:t])
        t = _m_lAr(w, len(w))
        if t is not None:
            h = w[:t]
            h2, ok = _tr_ki_chain(h)
            return h2 if ok else h
        return w
    r = _m_ndA(w, c)
    if r is None:
        r = _m_nA(w, c)
    if r is not None:
        t = _m_lArI(w, r)
        if t is not None:
            return w[:t]
        t = _m_sU(w, r)
        if t is not None:
            return _try_lAr_ki(w[:t])
        h2, ok = _tr_ki_chain(w[:r])
        if ok:
            return h2 + w[r:]
        # fall through to the next alternative on failure
    r = _m_ndAn(w, c)
    if r is None:
        r = _m_nU(w, c)
    if r is not None:
        t = _m_sU(w, r)
        if t is not None:
            return _try_lAr_ki(w[:t])
        t = _m_lArI(w, r)
        if t is not None:
            return w  # marked but not deleted (faithful quirk)
    r = _m_DAn(w, c)
    if r is not None:
        w = w[:r]
        t = _m_possessives(w, len(w))
        if t is not None:
            return _try_lAr_ki(w[:t])
        t = _m_lAr(w, len(w))
        if t is not None:
            h = w[:t]
            h2, ok = _tr_ki_chain(h)
            return h2 if ok else h
        h2, ok = _tr_ki_chain(w)
        return h2 if ok else w
    r = _m_nUn(w, c)
    if r is None:
        r = _m_ylA(w, c)
    if r is not None:
        w = w[:r]
        t = _m_lAr(w, len(w))
        if t is not None:
            h = w[:t]
            h2, ok = _tr_ki_chain(h)
            if ok:
                return h2
            w = h  # lAr deleted; ki failed: continue with alternatives
        t = _m_possessives(w, len(w))
        if t is None:
            t = _m_sU(w, len(w))
        if t is not None:
            return _try_lAr_ki(w[:t])
        h2, ok = _tr_ki_chain(w)
        return h2 if ok else w
    r = _m_lArI(w, c)
    if r is not None:
        return w[:r]
    h2, ok = _tr_ki_chain(w)
    if ok:
        return h2
    hit = None
    for m in (_m_DA, _m_yU, _m_yA):
        t = m(w, c)
        if t is not None:
            hit = t
            break
    if hit is not None:
        w = w[:hit]
        mark = None
        t = _m_possessives(w, len(w))
        if t is not None:
            w = w[:t]
            mark = _m_lAr(w, len(w))
        else:
            mark = _m_lAr(w, len(w))
            if mark is None:
                return w
        if mark is not None:
            w = w[:mark]
        h2, _ = _tr_ki_chain(w)
        return h2
    t = _m_possessives(w, c)
    if t is None:
        t = _m_sU(w, c)
    if t is not None:
        return _try_lAr_ki(w[:t])
    return w


def _tr_postlude(w: str) -> str:
    if w in ("ad", "soyad"):
        return w
    if w and w[-1] in "dg":
        i = len(w) - 2
        while i >= 0 and w[i] not in _TR_VOWELS:
            i -= 1
        if i >= 0:
            v = w[i]
            if v in "aı":
                w += "ı"
            elif v in "ei":
                w += "i"
            elif v in "ou":
                w += "u"
            else:
                w += "ü"
    if w.endswith("b"):
        w = w[:-1] + "p"
    elif w.endswith("c"):
        w = w[:-1] + "ç"
    elif w.endswith("d"):
        w = w[:-1] + "t"
    elif w.endswith("ğ"):
        w = w[:-1] + "k"
    return w


def stem_snowball_turkish(word: str) -> str:
    w = word
    if sum(1 for ch in w if ch in _TR_VOWELS) < 2:
        return w
    w, cont = _tr_nominal_verb(w)
    if not cont:
        return w
    w = _tr_noun_suffixes(w)
    return _tr_postlude(w)
