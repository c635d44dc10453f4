"""Snowball Lovins stemmer (pure Python, reference parity).

The reference registers Lovins through its snowball family
(source/stemmer_factory.c:53 SNOWBALL_LOVINS -> libstemmer "lovins");
the shipped implementation is the Snowball-compiled
external/unencumbered/snowball/libstemmer_c/src_c/stem_UTF_8_lovins.c.
This module re-implements the algorithm (Lovins 1968 as codified by
the Snowball project): one longest-match conditioned ending removal,
one undoubling step, one respell step.  The 294-ending table and the
29 context conditions below were extracted from the generated C's
data tables (data, not code — same adjudication as the Dale-Chall
word list); semantics were hand-derived from the published algorithm
and cross-checked against a compiled-reference sweep (see
tests/test_lovins.py).

Semantics notes (stem_UTF_8_lovins.c):
- endings: backwards `among` with per-entry conditions — the longest
  table suffix whose condition accepts the remaining stem is deleted;
  a failing condition falls back to the next-shorter matching suffix.
- undouble: if the stemmed word now ends in bb/dd/gg/ll/mm/nn/pp/rr/
  ss/tt, one letter is dropped.
- respell: the longest matching transformation pattern is applied
  once; a failing pattern-local condition aborts the step entirely
  (no fallback — r_respell returns after the switch).
"""

from __future__ import annotations

# ---------------------------------------------------------------- conditions
# Conditions run against the candidate stem (word minus ending).  The
# generated C encodes the global minimum-stem-length-2 rule as a
# `hop 2` inside condition A; B/C/D raise the floor to 3/4/5.


def _cond_a(s: str) -> bool:
    return len(s) >= 2


def _cond_b(s: str) -> bool:
    return len(s) >= 3


def _cond_c(s: str) -> bool:
    return len(s) >= 4


def _cond_d(s: str) -> bool:
    return len(s) >= 5


def _cond_e(s: str) -> bool:  # not after e
    return len(s) >= 2 and s[-1] != "e"


def _cond_f(s: str) -> bool:  # min 3, not after e
    return len(s) >= 3 and s[-1] != "e"


def _cond_g(s: str) -> bool:  # min 3, only after f
    return len(s) >= 3 and s[-1] == "f"


def _cond_h(s: str) -> bool:  # after t or ll
    return len(s) >= 2 and (s[-1] == "t" or s.endswith("ll"))


def _cond_i(s: str) -> bool:  # not after o or e
    return len(s) >= 2 and s[-1] not in "oe"


def _cond_j(s: str) -> bool:  # not after a or e
    return len(s) >= 2 and s[-1] not in "ae"


def _cond_k(s: str) -> bool:  # min 3, after l, i or u<any>e
    return len(s) >= 3 and (
        s[-1] in "li" or (s[-1] == "e" and s[-3] == "u")
    )


def _cond_l(s: str) -> bool:  # not after u, x or s-unless-os
    return (
        len(s) >= 2
        and s[-1] not in "ux"
        and (s[-1] != "s" or s.endswith("os"))
    )


def _cond_m(s: str) -> bool:  # not after a, c, e or m
    return len(s) >= 2 and s[-1] not in "acem"


def _cond_n(s: str) -> bool:  # min 4 when s is third-last, else min 3
    return len(s) >= 3 and (len(s) >= 4 or s[-3] != "s")


def _cond_o(s: str) -> bool:  # after l or i
    return len(s) >= 2 and s[-1] in "li"


def _cond_p(s: str) -> bool:  # not after c
    return len(s) >= 2 and s[-1] != "c"


def _cond_q(s: str) -> bool:  # min 3, not after l or n
    return len(s) >= 3 and s[-1] not in "ln"


def _cond_r(s: str) -> bool:  # after n or r
    return len(s) >= 2 and s[-1] in "nr"


def _cond_s(s: str) -> bool:  # after dr, or t not following t
    return len(s) >= 2 and (
        s.endswith("dr") or (s[-1] == "t" and not s.endswith("tt"))
    )


def _cond_t(s: str) -> bool:  # after s, or t not following o
    return len(s) >= 2 and (
        s[-1] == "s" or (s[-1] == "t" and not s.endswith("ot"))
    )


def _cond_u(s: str) -> bool:  # after l, m, n or r
    return len(s) >= 2 and s[-1] in "lmnr"


def _cond_v(s: str) -> bool:  # after c
    return len(s) >= 2 and s[-1] == "c"


def _cond_w(s: str) -> bool:  # not after s or u
    return len(s) >= 2 and s[-1] not in "su"


def _cond_x(s: str) -> bool:  # after l, i or u<any>e
    return len(s) >= 2 and (
        s[-1] in "li" or (len(s) >= 3 and s[-1] == "e" and s[-3] == "u")
    )


def _cond_y(s: str) -> bool:  # after in
    return s.endswith("in")


def _cond_z(s: str) -> bool:  # not after f
    return len(s) >= 2 and s[-1] != "f"


_AA_SET = ("ph", "th", "er", "or", "es")


def _cond_aa(s: str) -> bool:  # after d, f, ph, th, l, er, or, es, t
    return len(s) >= 2 and (s[-1] in "dflt" or s[-2:] in _AA_SET)


def _cond_bb(s: str) -> bool:  # min 3, not after met or ryst
    return len(s) >= 3 and not s.endswith("met") and not s.endswith("ryst")


def _cond_cc(s: str) -> bool:  # after l
    return len(s) >= 2 and s[-1] == "l"


_COND = {
    "A": _cond_a, "B": _cond_b, "C": _cond_c, "D": _cond_d,
    "E": _cond_e, "F": _cond_f, "G": _cond_g, "H": _cond_h,
    "I": _cond_i, "J": _cond_j, "K": _cond_k, "L": _cond_l,
    "M": _cond_m, "N": _cond_n, "O": _cond_o, "P": _cond_p,
    "Q": _cond_q, "R": _cond_r, "S": _cond_s, "T": _cond_t,
    "U": _cond_u, "V": _cond_v, "W": _cond_w, "X": _cond_x,
    "Y": _cond_y, "Z": _cond_z, "AA": _cond_aa, "BB": _cond_bb,
    "CC": _cond_cc,
}

# ------------------------------------------------------------------- endings
# ending -> condition letter; extracted from stem_UTF_8_lovins.c a_1
# (294 entries, verified against the compiled reference).
_ENDINGS_BY_COND: dict[str, tuple[str, ...]] = {
    "A": (
        'a', 'e', 'i', 'o', "'s", 'ae', 'ia', 'ic', 'is', "s'", 'acy',
        'aic', 'ata', 'ate', 'ese', 'ful', 'ial', 'ian', 'ics', 'ied',
        'ier', 'ily', 'ist', 'ity', 'ium', 'ive', 'oid', 'ous', 'able',
        'ably', 'aric', 'ates', 'ator', 'eful', 'eity', 'ence', 'ency',
        'eous', 'hood', 'ials', 'ians', 'ible', 'ibly', 'ical', 'iers',
        'iful', 'ious', 'ists', 'less', 'lily', 'ness', 'ogen', 'ward',
        'wise', 'yish', 'acies', 'acity', 'aical', 'alist', 'ality',
        'alize', 'arial', 'aries', 'arily', 'arize', 'aroid', 'ately',
        'ative', 'ators', 'atory', 'ehood', 'eless', 'elity', 'ement',
        'enced', 'ences', 'ental', 'ently', 'fully', 'ially', 'icant',
        'ician', 'icide', 'icism', 'icist', 'icity', 'iedly', 'ihood',
        'inate', 'iness', 'ional', 'ioned', 'ished', 'istic', 'ities',
        'itous', 'ively', 'ivity', 'oidal', 'oides', 'otide', 'ously',
        'aceous', 'alness', 'ancial', 'ancies', 'ariser', 'arized',
        'arizer', 'atable', 'atives', 'efully', 'encies', 'encing',
        'ential', 'entist', 'eously', 'ialist', 'iality', 'ialize',
        'ically', 'icance', 'icians', 'icists', 'ifully', 'ionals',
        'ioning', 'ionist', 'iously', 'istics', 'lessly', 'nesses',
        'oidism', 'ability', 'aically', 'alities', 'aristic', 'arizing',
        'ateness', 'atingly', 'atively', 'ativism', 'encible', 'entally',
        'entials', 'entiate', 'entness', 'fulness', 'ibility', 'icalism',
        'icalist', 'icality', 'icalize', 'icianry', 'ination', 'ingness',
        'ionally', 'isation', 'ishness', 'istical', 'iteness', 'iveness',
        'ivistic', 'ivities', 'izement', 'oidally', 'ousness', 'ableness',
        'arizable', 'entation', 'entially', 'eousness', 'ibleness',
        'icalness', 'ionalism', 'ionality', 'ionalize', 'iousness',
        'izations', 'lessness', 'antaneous', 'antiality', 'arisation',
        'arization', 'ativeness', 'entations', 'entiality', 'entialize',
        'entiation', 'ionalness', 'istically', 'itousness', 'izability',
        'izational', 'antialness', 'arisations', 'arizations',
        'entialness', 'arizability'
    ),
    "AA": ('ite',),
    "B": (
        'y', 'as', 'ly', 'age', 'ant', 'ism', 'ages', 'ally', 'ance',
        'ancy', 'ants', 'atic', 'ions', 'isms', 'ying', 'aging', 'alism',
        'anced', 'ances', 'arity', 'ation', 'ingly', 'acious', 'ancing',
        'ations', 'alistic', 'ational', 'ationally', 'alistically',
        'izationally'
    ),
    "BB": (
        'al', 'als', 'allic'
    ),
    "C": (
        'ent', 'ish', 'antic', 'ented', 'enting', 'allically'
    ),
    "CC": ('inity',),
    "D": ('ionate',),
    "E": (
        'ed', 'es', 'ely', 'ene', 'ery', 'edly', 'ened', 'enly', 'ature',
        'eness', 'ening', 'izable', 'ariness', 'elihood', 'eableness'
    ),
    "F": (
        'en', 'ary', 'ize', 'ized', 'izer', 'izers', 'izing', 'ization'
    ),
    "G": (
        'action', 'ication'
    ),
    "H": ('itic',),
    "I": (
        'ated', 'ating', 'idine'
    ),
    "J": ('inism',),
    "K": ('arly',),
    "L": (
        'ide', 'ides'
    ),
    "M": (
        'ine', 'ines'
    ),
    "N": (
        'ing', 'ings'
    ),
    "O": ('ars',),
    "P": ('ies',),
    "Q": ('ion',),
    "R": (
        'yl', 'one'
    ),
    "S": ('on',),
    "T": ('or',),
    "U": ('um',),
    "V": ('us',),
    "W": ('s',),
    "X": ('ar',),
    "Y": (
        'eal', 'ear', 'ealy', 'early'
    ),
    "Z": ('eature',),
}

_ENDING_COND: dict[str, str] = {
    e: cond for cond, endings in _ENDINGS_BY_COND.items() for e in endings
}
_MAX_ENDING = 11


def stem_snowball_lovins(term: str) -> str:
    """Stem one lowercase word with the Snowball Lovins algorithm."""
    w = term
    n = len(w)
    # 1. conditioned longest-match ending removal
    top = min(_MAX_ENDING, n - 1)
    for length in range(top, 0, -1):
        ending = w[n - length:]
        cond = _ENDING_COND.get(ending)
        if cond is not None and _COND[cond](w[: n - length]):
            w = w[: n - length]
            break
    # 2. undouble
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] in "bdglmnprst":
        w = w[:-1]
    # 3. respell (longest pattern; a failing local condition aborts)
    for length in (4, 3, 2):
        if len(w) < length:
            continue
        rule = _RESPELL.get(w[-length:])
        if rule is None:
            continue
        repl, banned = rule
        if banned and len(w) > length and w[-length - 1] in banned:
            break
        w = w[: len(w) - length] + repl
        break
    return w


# pattern -> (replacement, letters that must NOT precede the pattern)
_RESPELL: dict[str, tuple[str, str]] = {
    "uad": ("uas", ""), "vad": ("vas", ""), "cid": ("cis", ""),
    "lid": ("lis", ""), "erid": ("eris", ""), "pand": ("pans", ""),
    "end": ("ens", "s"), "ond": ("ons", ""), "lud": ("lus", ""),
    "rud": ("rus", ""), "ul": ("l", "aio"), "her": ("hes", "pt"),
    "metr": ("meter", ""), "istr": ("ister", ""), "urs": ("ur", ""),
    "uct": ("uc", ""), "et": ("es", "n"), "mit": ("mis", ""),
    "ent": ("ens", "m"), "umpt": ("um", ""), "rpt": ("rb", ""),
    "ert": ("ers", ""), "yt": ("ys", ""), "iev": ("ief", ""),
    "olv": ("olut", ""), "ax": ("ac", ""), "ex": ("ec", ""),
    "bex": ("bic", ""), "dex": ("dic", ""), "pex": ("pic", ""),
    "tex": ("tic", ""), "ix": ("ic", ""), "lux": ("luc", ""),
    "yz": ("ys", ""),
}
