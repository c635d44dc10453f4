"""Snowball French, Spanish, Italian and Portuguese stemmers.

Independent Python implementations of the published Snowball
algorithms (snowballstem.org: "French stemming algorithm" etc.) at
the algorithm revision the reference ships, matching the reference's
``-tsnowball:<lang>`` slots (source/stemmer_factory.c:46,58,50,55 via
libstemmer).  Parity with the compiled libstemmer the reference
ships is certified by a full-wordlist sweep; frozen cases live in
tests/test_snowball_langs.py.

All four share the Romance RV/R1/R2 region scheme: R1/R2 are the
standard Snowball regions; RV is a language-specific "verb region"
that guards verb-suffix removal.
"""

from __future__ import annotations

from atire_spark.kernels.snowball_langs._runtime import (
    gopast_in,
    mark_r1r2,
    sort_by_len,
)


def _bylen(rules):
    """(suffix, code) rule table sorted longest-suffix-first."""
    return sorted(rules, key=lambda e: len(e[0]), reverse=True)

# ------------------------------------------------------------------ French
_FR_VOWELS = frozenset("aeiouyàâèéêëîïôùû")
_FR_KEEP_S = frozenset("aiosuè")

# standard-suffix table: (suffix, rule-code); longest match wins
_FR_STD = _bylen(
    [
        ("iqUe", 1), ("iqUes", 1), ("ance", 1), ("ances", 1),
        ("isme", 1), ("ismes", 1), ("able", 1), ("ables", 1),
        ("iste", 1), ("istes", 1), ("eux", 1),
        ("atrice", 2), ("atrices", 2), ("ation", 2), ("ations", 2),
        ("ateur", 2), ("ateurs", 2),
        ("logie", 3), ("logies", 3),
        ("usion", 4), ("usions", 4), ("ution", 4), ("utions", 4),
        ("ence", 5), ("ences", 5),
        ("ement", 6), ("ements", 6),
        ("ité", 7), ("ités", 7),
        ("if", 8), ("ifs", 8), ("ive", 8), ("ives", 8),
        ("eaux", 9), ("aux", 10),
        ("euse", 11), ("euses", 11),
        ("issement", 12), ("issements", 12),
        ("amment", 13), ("emment", 14),
        ("ment", 15), ("ments", 15),
    ],
)

_FR_I_VERB = sort_by_len(
    ["îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira",
     "irai", "iraIent", "irais", "irait", "iras", "irent", "irez",
     "iriez", "irions", "irons", "iront", "is", "issaIent", "issais",
     "issait", "issant", "issante", "issantes", "issants", "isse",
     "issent", "isses", "issez", "issiez", "issions", "issons", "it"]
)

_FR_VERB = _bylen(
    [
        ("ions", 1),
        ("é", 2), ("ée", 2), ("ées", 2), ("és", 2),
        ("èrent", 2), ("er", 2), ("era", 2), ("erai", 2),
        ("eraIent", 2), ("erais", 2), ("erait", 2), ("eras", 2),
        ("erez", 2), ("eriez", 2), ("erions", 2), ("erons", 2),
        ("eront", 2), ("ez", 2), ("iez", 2), ("eriez", 2),
        ("a", 3), ("ai", 3), ("aIent", 3), ("ais", 3), ("ait", 3),
        ("ant", 3), ("ante", 3), ("antes", 3), ("ants", 3), ("as", 3),
        ("asse", 3), ("assent", 3), ("asses", 3), ("assiez", 3),
        ("assions", 3), ("âmes", 3), ("ât", 3), ("âtes", 3),
    ],
)

_FR_RESIDUAL = _bylen(
    [("ion", 1), ("ier", 2), ("Ier", 2), ("ière", 2), ("Ière", 2),
     ("e", 3), ("ë", 4)],
)

_FR_DOUBLES = ("eill", "ell", "enn", "onn", "ett")


def _fr_prelude(word: str) -> str:
    # u/i between vowels and y next to a vowel go upper (consonant
    # markers); u after q likewise
    out = list(word)
    i = 0
    while i < len(out):
        c = out[i]
        if c in _FR_VOWELS and i + 1 < len(out):
            n = out[i + 1]
            if n == "u" and i + 2 < len(out) and out[i + 2] in _FR_VOWELS:
                out[i + 1] = "U"
                continue
            if n == "i" and i + 2 < len(out) and out[i + 2] in _FR_VOWELS:
                out[i + 1] = "I"
                continue
            if n == "y":
                out[i + 1] = "Y"
                continue
        if c == "y" and i + 1 < len(out) and out[i + 1] in _FR_VOWELS:
            out[i] = "Y"
            continue
        if c == "q" and i + 1 < len(out) and out[i + 1] == "u":
            out[i + 1] = "U"
            continue
        i += 1
    return "".join(out)


def _fr_rv(w: str) -> int:
    """French RV: after the 3rd letter when the word starts with two
    vowels or with par/col/tap; else after the first vowel not at the
    start; else end of word."""
    if len(w) >= 3 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return 3
    if w[:3] in ("col", "par", "tap"):
        return 3
    i = gopast_in(w, 1, _FR_VOWELS)
    return i if i >= 0 else len(w)


def _fr_standard_suffix(w: str, rv: int, p1: int, p2: int):
    """Returns (word, success).  amment/emment/ment(s) replace-then-
    fail so the verb steps still run (the published 'in this case the
    failure is not final')."""
    hit = None
    for s, code in _FR_STD:
        if w.endswith(s):
            hit = (s, code)
            break
    if hit is None:
        return w, False
    s, code = hit
    pos = len(w) - len(s)
    if code == 1:
        if pos < p2:
            return w, False
        return w[:pos], True
    if code == 2:
        if pos < p2:
            return w, False
        w = w[:pos]
        if w.endswith("ic"):
            q = len(w) - 2
            w = w[:q] if q >= p2 else w[:q] + "iqU"
        return w, True
    if code == 3:
        if pos < p2:
            return w, False
        return w[:pos] + "log", True
    if code == 4:
        if pos < p2:
            return w, False
        return w[:pos] + "u", True
    if code == 5:
        if pos < p2:
            return w, False
        return w[:pos] + "ent", True
    if code == 6:
        if pos < rv:
            return w, False
        w = w[:pos]
        if w.endswith("iv") and len(w) - 2 >= p2:
            w = w[:-2]
            if w.endswith("at") and len(w) - 2 >= p2:
                w = w[:-2]
        elif w.endswith("eus"):
            q = len(w) - 3
            if q >= p2:
                w = w[:q]
            elif q >= p1:
                w = w[:q] + "eux"
        elif (w.endswith("abl") or w.endswith("iqU")) and len(w) - 3 >= p2:
            w = w[:-3]
        elif (w.endswith("ièr") or w.endswith("Ièr")) and len(w) - 3 >= rv:
            w = w[:-3] + "i"
        return w, True
    if code == 7:
        if pos < p2:
            return w, False
        w = w[:pos]
        if w.endswith("abil"):
            q = len(w) - 4
            w = w[:q] if q >= p2 else w[:q] + "abl"
        elif w.endswith("ic"):
            q = len(w) - 2
            w = w[:q] if q >= p2 else w[:q] + "iqU"
        elif w.endswith("iv") and len(w) - 2 >= p2:
            w = w[:-2]
        return w, True
    if code == 8:
        if pos < p2:
            return w, False
        w = w[:pos]
        if w.endswith("at") and len(w) - 2 >= p2:
            w = w[:-2]
            if w.endswith("ic"):
                q = len(w) - 2
                w = w[:q] if q >= p2 else w[:q] + "iqU"
        return w, True
    if code == 9:
        return w[:pos] + "eau", True
    if code == 10:
        if pos < p1:
            return w, False
        return w[:pos] + "al", True
    if code == 11:
        if pos >= p2:
            return w[:pos], True
        if pos >= p1:
            return w[:pos] + "eux", True
        return w, False
    if code == 12:
        if pos >= p1 and pos >= 1 and w[pos - 1] not in _FR_VOWELS:
            return w[:pos], True
        return w, False
    if code == 13:  # amment -> ant, then fail into the verb steps
        if pos >= rv:
            return w[:pos] + "ant", False
        return w, False
    if code == 14:  # emment -> ent, then fail
        if pos >= rv:
            return w[:pos] + "ent", False
        return w, False
    # code 15: ment(s) deleted when preceded by a vowel in RV, then fail
    if pos >= 1 and w[pos - 1] in _FR_VOWELS and pos - 1 >= rv:
        return w[:pos], False
    return w, False


def _fr_i_verb_suffix(w: str, rv: int):
    for s in _FR_I_VERB:
        pos = len(w) - len(s)
        if pos >= rv and w.endswith(s):
            # preceding non-vowel, itself inside RV
            if pos - 1 >= rv and w[pos - 1] not in _FR_VOWELS:
                return w[:pos], True
            return w, False
    return w, False


def _fr_verb_suffix(w: str, rv: int, p2: int):
    for s, code in _FR_VERB:
        pos = len(w) - len(s)
        if pos >= rv and w.endswith(s):
            if code == 1:
                if pos < p2:
                    return w, False
                return w[:pos], True
            if code == 2:
                return w[:pos], True
            # code 3: delete; then a preceding e inside RV goes too
            w = w[:pos]
            if w.endswith("e") and len(w) - 1 >= rv:
                w = w[:-1]
            return w, True
    return w, False


def _fr_residual_suffix(w: str, rv: int, p2: int) -> str:
    if w.endswith("s") and len(w) >= 2 and w[-2] not in _FR_KEEP_S:
        w = w[:-1]
    for s, code in _FR_RESIDUAL:
        pos = len(w) - len(s)
        if pos >= rv and w.endswith(s):
            if code == 1:
                if pos >= p2 and pos - 1 >= rv and w[pos - 1] in "st":
                    return w[:pos]
                return w
            if code == 2:
                return w[:pos] + "i"
            if code == 3:
                return w[:pos]
            # code 4: ë after gu (gu inside RV)
            if pos - 2 >= rv and w[pos - 2:pos] == "gu":
                return w[:pos]
            return w
    return w


def stem_snowball_french(word: str) -> str:
    w = _fr_prelude(word)
    rv = _fr_rv(w)
    p1, p2 = mark_r1r2(w, _FR_VOWELS)

    w2, ok = _fr_standard_suffix(w, rv, p1, p2)
    if not ok:
        w2, ok = _fr_i_verb_suffix(w2, rv)
    if not ok:
        w2, ok = _fr_verb_suffix(w2, rv, p2)
    if ok:
        # a trailing consonant-marker Y reverts to i; soft ç to c
        if w2.endswith("Y"):
            w2 = w2[:-1] + "i"
        elif w2.endswith("ç"):
            w2 = w2[:-1] + "c"
    else:
        w2 = _fr_residual_suffix(w2, rv, p2)
    w = w2

    # un_double: final enn/onn/ett/ell/eill lose a letter
    for d in _FR_DOUBLES:
        if w.endswith(d):
            w = w[:-1]
            break

    # un_accent: é/è + trailing non-vowels -> e
    j = len(w)
    while j > 0 and w[j - 1] not in _FR_VOWELS:
        j -= 1
    if j < len(w) and j > 0 and w[j - 1] in "éè":
        w = w[: j - 1] + "e" + w[j:]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# ----------------------------------------------------------------- Spanish
_ES_VOWELS = frozenset("aeiouáéíóúü")

_ES_PRONOUNS = sort_by_len(
    ["me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
     "las", "les", "los", "nos"]
)
# gerund/infinitive carriers before a pronoun: code = replacement
_ES_CARRIERS = _bylen(
    [("iéndo", "iendo"), ("ándo", "ando"), ("ár", "ar"), ("ér", "er"),
     ("ír", "ir"), ("ando", None), ("iendo", None), ("ar", None),
     ("er", None), ("ir", None), ("yendo", "u-del")]
)

_ES_STD = _bylen(
    [
        ("ica", 1), ("icas", 1), ("ico", 1), ("icos", 1),
        ("osa", 1), ("osas", 1), ("oso", 1), ("osos", 1),
        ("ista", 1), ("istas", 1), ("ismo", 1), ("ismos", 1),
        ("anza", 1), ("anzas", 1), ("able", 1), ("ables", 1),
        ("ible", 1), ("ibles", 1),
        ("amiento", 1), ("amientos", 1), ("imiento", 1), ("imientos", 1),
        ("ancia", 2), ("ancias", 2), ("adora", 2), ("adoras", 2),
        ("ador", 2), ("adores", 2), ("ante", 2), ("antes", 2),
        ("ación", 2), ("aciones", 2),
        ("logía", 3), ("logías", 3),
        ("ución", 4), ("uciones", 4),
        ("encia", 5), ("encias", 5),
        ("amente", 6), ("mente", 7),
        ("idad", 8), ("idades", 8),
        ("iva", 9), ("ivas", 9), ("ivo", 9), ("ivos", 9),
    ],
)

_ES_Y_VERB = sort_by_len(
    ["ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yas", "yes",
     "yais", "yamos", "yó"]
)

_ES_VERB_EN = ("éis", "emos", "en", "es")  # gu-aware deletions
_ES_VERB = sort_by_len(
    ["aba", "ada", "ida", "ara", "iera", "ía", "aría", "ería", "iría",
     "ad", "ed", "id", "ase", "iese", "aste", "iste", "an", "aban",
     "aran", "ieran", "ían", "arían", "erían", "irían", "en", "asen",
     "iesen", "aron", "ieron", "arán", "erán", "irán", "ado", "ido",
     "ando", "iendo", "ar", "er", "ir", "as", "abas", "adas", "idas",
     "aras", "ieras", "ías", "arías", "erías", "irías", "es", "ases",
     "ieses", "abais", "arais", "ierais", "íais", "aríais", "eríais",
     "iríais", "aseis", "ieseis", "asteis", "isteis", "áis", "éis",
     "aréis", "eréis", "iréis", "ados", "idos", "amos", "ábamos",
     "áramos", "iéramos", "íamos", "aríamos", "eríamos", "iríamos",
     "emos", "aremos", "eremos", "iremos", "ásemos", "iésemos",
     "imos", "arás", "erás", "irás", "ís", "ará", "erá", "irá",
     "aré", "eré", "iré", "ió"]
)

_ES_RESIDUAL = _bylen(
    [("a", 1), ("o", 1), ("os", 1), ("á", 1), ("í", 1), ("ó", 1),
     ("e", 2), ("é", 2)],
)

_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def _romance_rv(w: str, vowels) -> int:
    """Spanish/Italian/Portuguese RV: second letter a consonant ->
    after the next vowel; word starts with two vowels -> after the
    next consonant; else after the third letter; else end."""
    n = len(w)
    if n < 2:
        return n
    if w[1] not in vowels:
        i = gopast_in(w, 2, vowels)
        return i if i >= 0 else n
    if w[0] in vowels:
        i = _gopast_out(w, 2, vowels)
        return i if i >= 0 else n
    return 3 if n >= 3 else n


def _gopast_out(w: str, i: int, vowels) -> int:
    for j in range(i, len(w)):
        if w[j] not in vowels:
            return j + 1
    return -1


def _es_attached_pronoun(w: str, rv: int) -> str:
    for p in _ES_PRONOUNS:
        if w.endswith(p):
            base = len(w) - len(p)
            for s, repl in _ES_CARRIERS:
                pos = base - len(s)
                if pos >= rv and w[:base].endswith(s):
                    if repl is None:
                        return w[:base]
                    if repl == "u-del":  # yendo after u
                        if pos >= 1 and w[pos - 1] == "u":
                            return w[:base]
                        return w
                    return w[:pos] + repl
            return w
    return w


def _es_standard_suffix(w: str, p1: int, p2: int):
    hit = None
    for s, code in _ES_STD:
        if w.endswith(s):
            hit = (s, code)
            break
    if hit is None:
        return w, False
    s, code = hit
    pos = len(w) - len(s)
    if code == 1:
        if pos < p2:
            return w, False
        return w[:pos], True
    if code == 2:
        if pos < p2:
            return w, False
        w = w[:pos]
        if w.endswith("ic") and len(w) - 2 >= p2:
            w = w[:-2]
        return w, True
    if code == 3:
        if pos < p2:
            return w, False
        return w[:pos] + "log", True
    if code == 4:
        if pos < p2:
            return w, False
        return w[:pos] + "u", True
    if code == 5:
        if pos < p2:
            return w, False
        return w[:pos] + "ente", True
    if code == 6:  # amente, in R1
        if pos < p1:
            return w, False
        w = w[:pos]
        for t in ("ic", "ad", "os", "iv"):
            if w.endswith(t) and len(w) - len(t) >= p2:
                w = w[: -len(t)]
                if t == "iv" and w.endswith("at") and len(w) - 2 >= p2:
                    w = w[:-2]
                break
        return w, True
    if code == 7:  # mente, in R2
        if pos < p2:
            return w, False
        w = w[:pos]
        for t in ("able", "ible", "ante"):
            if w.endswith(t) and len(w) - len(t) >= p2:
                w = w[: -len(t)]
                break
        return w, True
    if code == 8:  # idad(es), in R2
        if pos < p2:
            return w, False
        w = w[:pos]
        for t in ("abil", "ic", "iv"):
            if w.endswith(t) and len(w) - len(t) >= p2:
                w = w[: -len(t)]
                break
        return w, True
    # code 9: iva/ivo(s), in R2; then at in R2
    if pos < p2:
        return w, False
    w = w[:pos]
    if w.endswith("at") and len(w) - 2 >= p2:
        w = w[:-2]
    return w, True


def _es_y_verb_suffix(w: str, rv: int):
    for s in _ES_Y_VERB:
        pos = len(w) - len(s)
        if pos >= rv and w.endswith(s):
            if pos >= 1 and w[pos - 1] == "u":
                return w[:pos], True
            return w, False
    return w, False


def _es_verb_suffix(w: str, rv: int):
    for s in _ES_VERB:
        pos = len(w) - len(s)
        if pos >= rv and w.endswith(s):
            if s in _ES_VERB_EN and pos >= 2 and w[pos - 2:pos] == "gu":
                return w[: pos - 1], True
            return w[:pos], True
    return w, False


def _es_residual_suffix(w: str, rv: int) -> str:
    for s, code in _ES_RESIDUAL:
        pos = len(w) - len(s)
        if w.endswith(s):
            if pos < rv:
                return w
            w = w[:pos]
            if code == 2 and w.endswith("u") and len(w) >= 2 \
                    and w[-2] == "g" and len(w) - 1 >= rv:
                w = w[:-1]
            return w
    return w


def stem_snowball_spanish(word: str) -> str:
    w = word
    rv = _romance_rv(w, _ES_VOWELS)
    p1, p2 = mark_r1r2(w, _ES_VOWELS)
    w = _es_attached_pronoun(w, rv)
    w2, ok = _es_standard_suffix(w, p1, p2)
    if not ok:
        w2, ok = _es_y_verb_suffix(w2, rv)
    if not ok:
        w2, ok = _es_verb_suffix(w2, rv)
    w = _es_residual_suffix(w2, rv)
    return w.translate(_ES_UNACCENT)


# ----------------------------------------------------------------- Italian
_IT_VOWELS = frozenset("aeiouàèìòù")
_IT_AEIO = frozenset("aeioàèìò")
_IT_ACUTE = {"á": "à", "é": "è", "í": "ì", "ó": "ò", "ú": "ù"}

_IT_PRONOUNS = sort_by_len(
    ["ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
     "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
     "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
     "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
     "veli", "velo", "vene"]
)
_IT_CARRIERS = _bylen(
    [("ando", 1), ("endo", 1), ("ar", 2), ("er", 2), ("ir", 2)]
)

_IT_STD = _bylen(
    [
        ("ica", 1), ("iche", 1), ("ici", 1), ("ichi", 1), ("ico", 1),
        ("osa", 1), ("ose", 1), ("osi", 1), ("oso", 1),
        ("ista", 1), ("iste", 1), ("isti", 1),
        ("istà", 1), ("istè", 1), ("istì", 1),
        ("anza", 1), ("anze", 1), ("ice", 1), ("ici", 1),
        ("atrice", 1), ("atrici", 1),
        ("abile", 1), ("abili", 1), ("ibile", 1), ("ibili", 1),
        ("ismo", 1), ("ismi", 1), ("ante", 1), ("anti", 1),
        ("mente", 1),
        ("azione", 2), ("azioni", 2), ("atore", 2), ("atori", 2),
        ("logia", 3), ("logie", 3),
        ("usione", 4), ("usioni", 4), ("uzione", 4), ("uzioni", 4),
        ("enza", 5), ("enze", 5),
        ("amento", 6), ("amenti", 6), ("imento", 6), ("imenti", 6),
        ("amente", 7),
        ("ità", 8),
        ("iva", 9), ("ive", 9), ("ivi", 9), ("ivo", 9),
    ],
)

_IT_VERB = sort_by_len(
    ["isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva",
     "erebbe", "irebbe", "isce", "ende", "are", "ere", "ire", "asse",
     "ate", "avate", "evate", "ivate", "ete", "erete", "irete", "ite",
     "ereste", "ireste", "ute", "erai", "irai", "isci", "endi",
     "erei", "irei", "assi", "ati", "iti", "eresti", "iresti", "uti",
     "avi", "evi", "ivi", "isco", "ando", "endo", "Yamo", "iamo",
     "avamo", "evamo", "ivamo", "eremo", "iremo", "assimo", "ammo",
     "emmo", "eremmo", "iremmo", "immo", "ano", "iscano", "avano",
     "evano", "ivano", "eranno", "iranno", "ono", "iscono", "arono",
     "erono", "irono", "erebbero", "irebbero", "assero", "essero",
     "issero", "ato", "ito", "uto", "avo", "evo", "ivo", "ar", "ir",
     "erà", "irà", "erò", "irò"]
)


def _it_prelude(word: str) -> str:
    # acute accents go grave; u after q and u/i between vowels go upper
    out = []
    i = 0
    while i < len(word):
        c = word[i]
        if c in _IT_ACUTE:
            out.append(_IT_ACUTE[c])
            i += 1
        elif c == "q" and i + 1 < len(word) and word[i + 1] == "u":
            out.append("qU")
            i += 2
        else:
            out.append(c)
            i += 1
    w = list("".join(out))
    i = 0
    while i < len(w):
        if w[i] in _IT_VOWELS and i + 1 < len(w):
            n = w[i + 1]
            if n in "ui" and i + 2 < len(w) and w[i + 2] in _IT_VOWELS:
                w[i + 1] = n.upper()
                continue
        i += 1
    return "".join(w)


def _it_attached_pronoun(w: str, rv: int) -> str:
    for p in _IT_PRONOUNS:
        if w.endswith(p):
            base = len(w) - len(p)
            for s, code in _IT_CARRIERS:
                pos = base - len(s)
                if pos >= rv and w[:base].endswith(s):
                    return w[:base] if code == 1 else w[:base] + "e"
            return w
    return w


def _it_standard_suffix(w: str, rv: int, p1: int, p2: int):
    hit = None
    for s, code in _IT_STD:
        if w.endswith(s):
            hit = (s, code)
            break
    if hit is None:
        return w, False
    s, code = hit
    pos = len(w) - len(s)
    if code == 1:
        if pos < p2:
            return w, False
        return w[:pos], True
    if code == 2:
        if pos < p2:
            return w, False
        w = w[:pos]
        if w.endswith("ic") and len(w) - 2 >= p2:
            w = w[:-2]
        return w, True
    if code == 3:
        if pos < p2:
            return w, False
        return w[:pos] + "log", True
    if code == 4:
        if pos < p2:
            return w, False
        return w[:pos] + "u", True
    if code == 5:
        if pos < p2:
            return w, False
        return w[:pos] + "ente", True
    if code == 6:  # amento/imento(-i), in RV
        if pos < rv:
            return w, False
        return w[:pos], True
    if code == 7:  # amente, in R1
        if pos < p1:
            return w, False
        w = w[:pos]
        for t in ("ic", "abil", "os", "iv"):
            if w.endswith(t) and len(w) - len(t) >= p2:
                w = w[: -len(t)]
                if t == "iv" and w.endswith("at") and len(w) - 2 >= p2:
                    w = w[:-2]
                break
        return w, True
    if code == 8:  # ità
        if pos < p2:
            return w, False
        w = w[:pos]
        for t in ("abil", "ic", "iv"):
            if w.endswith(t) and len(w) - len(t) >= p2:
                w = w[: -len(t)]
                break
        return w, True
    # code 9: iva/ive/ivi/ivo; then at (R2), then ic (R2)
    if pos < p2:
        return w, False
    w = w[:pos]
    if w.endswith("at") and len(w) - 2 >= p2:
        w = w[:-2]
        if w.endswith("ic") and len(w) - 2 >= p2:
            w = w[:-2]
    return w, True


def stem_snowball_italian(word: str) -> str:
    w = _it_prelude(word)
    rv = _romance_rv(w, _IT_VOWELS)
    p1, p2 = mark_r1r2(w, _IT_VOWELS)
    w = _it_attached_pronoun(w, rv)
    w2, ok = _it_standard_suffix(w, rv, p1, p2)
    if not ok:
        for s in _IT_VERB:
            pos = len(w2) - len(s)
            if pos >= rv and w2.endswith(s):
                w2 = w2[:pos]
                break
    w = w2
    # vowel_suffix: final a/e/i/o (grave forms too) in RV, then i in RV
    if w and w[-1] in _IT_AEIO and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    if w.endswith("h") and len(w) >= 2 and w[-2] in "cg" and len(w) - 2 >= rv:
        w = w[:-1]
    return w.replace("I", "i").replace("U", "u")



# -------------------------------------------------------------- Portuguese
# ã/õ are carried through the algorithm as the two-char markers a~/o~
# (so they count as vowel + non-vowel for the regions), then restored.
_PT_VOWELS = frozenset("aeiouáâéêíóôú")

_PT_STD = _bylen(
    [
        ("ica", 1), ("icas", 1), ("ico", 1), ("icos", 1),
        ("ância", 1), ("adora", 1), ("adoras", 1), ("ador", 1),
        ("adores", 1), ("osa", 1), ("osas", 1), ("oso", 1), ("osos", 1),
        ("ista", 1), ("istas", 1), ("ismo", 1), ("ismos", 1),
        ("eza", 1), ("ezas", 1), ("ante", 1), ("antes", 1),
        ("ável", 1), ("ível", 1),
        ("amento", 1), ("amentos", 1), ("imento", 1), ("imentos", 1),
        ("aça~o", 1), ("aço~es", 1),
        ("logía", 2), ("logías", 2),
        ("ución", 3), ("uciones", 3),
        ("ência", 4), ("ências", 4),
        ("amente", 5), ("mente", 6),
        ("idade", 7), ("idades", 7),
        ("iva", 8), ("ivas", 8), ("ivo", 8), ("ivos", 8),
        ("ira", 9), ("iras", 9),
    ],
)

_PT_VERB = sort_by_len(
    ["ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira",
     "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
     "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
     "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
     "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
     "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas",
     "idas", "ias", "arias", "erias", "irias", "aras", "eras",
     "iras", "avas", "es", "ardes", "erdes", "irdes", "ares", "eres",
     "ires", "asses", "esses", "isses", "astes", "estes", "istes",
     "is", "ais", "eis", "areis", "ereis", "ireis", "áreis",
     "éreis", "íreis", "ásseis", "ésseis", "ísseis", "áveis",
     "íeis", "aríeis", "eríeis", "iríeis", "ados", "idos", "amos",
     "áramos", "éramos", "íramos", "ávamos", "íamos", "aríamos",
     "eríamos", "iríamos", "emos", "aremos", "eremos", "iremos",
     "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos",
     "irmos", "ámos", "arás", "erás", "irás", "eu", "iu", "ou",
     "ará", "erá", "irá"]
)

_PT_RESIDUAL = sort_by_len(["a", "i", "o", "os", "á", "í", "ó"])


def _pt_standard_suffix(w: str, rv: int, p1: int, p2: int):
    hit = None
    for s, code in _PT_STD:
        if w.endswith(s):
            hit = (s, code)
            break
    if hit is None:
        return w, False
    s, code = hit
    pos = len(w) - len(s)
    if code == 1:
        if pos < p2:
            return w, False
        return w[:pos], True
    if code == 2:
        if pos < p2:
            return w, False
        return w[:pos] + "log", True
    if code == 3:
        if pos < p2:
            return w, False
        return w[:pos] + "u", True
    if code == 4:
        if pos < p2:
            return w, False
        return w[:pos] + "ente", True
    if code == 5:  # amente, R1; then ic/ad/os/iv (iv -> at) in R2
        if pos < p1:
            return w, False
        w = w[:pos]
        for t in ("ic", "ad", "os", "iv"):
            if w.endswith(t) and len(w) - len(t) >= p2:
                w = w[: -len(t)]
                if t == "iv" and w.endswith("at") and len(w) - 2 >= p2:
                    w = w[:-2]
                break
        return w, True
    if code == 6:  # mente, R2; then ante/avel/ível in R2
        if pos < p2:
            return w, False
        w = w[:pos]
        for t in ("ante", "avel", "ível"):
            if w.endswith(t) and len(w) - len(t) >= p2:
                w = w[: -len(t)]
                break
        return w, True
    if code == 7:  # idade(s), R2; then abil/ic/iv in R2
        if pos < p2:
            return w, False
        w = w[:pos]
        for t in ("abil", "ic", "iv"):
            if w.endswith(t) and len(w) - len(t) >= p2:
                w = w[: -len(t)]
                break
        return w, True
    if code == 8:  # iva(s)/ivo(s), R2; then at in R2
        if pos < p2:
            return w, False
        w = w[:pos]
        if w.endswith("at") and len(w) - 2 >= p2:
            w = w[:-2]
        return w, True
    # code 9: ira(s) -> ir when in RV and preceded by e
    if pos >= rv and pos >= 1 and w[pos - 1] == "e":
        return w[:pos] + "ir", True
    return w, False


def stem_snowball_portuguese(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _romance_rv(w, _PT_VOWELS)
    p1, p2 = mark_r1r2(w, _PT_VOWELS)

    w2, ok = _pt_standard_suffix(w, rv, p1, p2)
    if not ok:
        for s in _PT_VERB:
            pos = len(w2) - len(s)
            if pos >= rv and w2.endswith(s):
                w2 = w2[:pos]
                ok = True
                break
    if ok:
        # a final i after c, the i in RV, drops
        if w2.endswith("i") and len(w2) >= 2 and w2[-2] == "c" \
                and len(w2) - 1 >= rv:
            w2 = w2[:-1]
    else:
        for s in _PT_RESIDUAL:
            pos = len(w2) - len(s)
            if pos >= rv and w2.endswith(s):
                w2 = w2[:pos]
                break
    w = w2

    # residual_form: final e/é/ê in RV drops, then gu/ci lose u/i in RV
    if w and w[-1] in "eéê" and len(w) - 1 >= rv:
        w = w[:-1]
        if len(w) >= 2 and len(w) - 1 >= rv and (
            (w[-1] == "u" and w[-2] == "g") or (w[-1] == "i" and w[-2] == "c")
        ):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------- Romanian
# ş/ţ are the cedilla forms the reference's libstemmer snapshot uses
_RO_VOWELS = frozenset("aeiouâîă")

_RO_STEP0 = _bylen(
    [("ul", 1), ("ului", 1), ("aua", 2), ("ea", 3), ("ele", 3),
     ("elor", 3), ("ii", 4), ("iua", 4), ("iei", 4), ("iile", 4),
     ("iilor", 4), ("ilor", 4), ("ile", 5), ("atei", 6),
     ("aţia", 7), ("aţie", 7)],
)

_RO_COMBO = _bylen(
    [("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
     ("abilităţi", "abil"),
     ("ibilitate", "ibil"),
     ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
     ("ivităţi", "iv"),
     ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
     ("icităţi", "ic"), ("icator", "ic"), ("icatori", "ic"),
     ("icala", "ic"), ("icale", "ic"), ("icali", "ic"), ("icală", "ic"),
     ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"), ("icivă", "ic"),
     ("ical", "ic"), ("iciv", "ic"),
     ("ativa", "at"), ("ative", "at"), ("ativi", "at"), ("ativă", "at"),
     ("aţiune", "at"), ("atoare", "at"), ("ator", "at"), ("atori", "at"),
     ("ătoare", "at"), ("ător", "at"), ("ători", "at"), ("ativ", "at"),
     ("itiva", "it"), ("itive", "it"), ("itivi", "it"), ("itivă", "it"),
     ("iţiune", "it"), ("itoare", "it"), ("itor", "it"), ("itori", "it"),
     ("itiv", "it")],
)

_RO_STD = _bylen(
    [("ica", 1), ("abila", 1), ("ibila", 1), ("oasa", 1), ("ata", 1),
     ("ita", 1), ("anta", 1), ("uta", 1), ("iva", 1), ("ic", 1),
     ("ice", 1), ("abile", 1), ("ibile", 1), ("oase", 1), ("ate", 1),
     ("itate", 1), ("ite", 1), ("ante", 1), ("ute", 1), ("ive", 1),
     ("ici", 1), ("abili", 1), ("ibili", 1), ("atori", 1), ("osi", 1),
     ("ati", 1), ("itati", 1), ("iti", 1), ("anti", 1), ("uti", 1),
     ("ivi", 1), ("ităi", 1), ("oşi", 1), ("ităţi", 1), ("abil", 1),
     ("ibil", 1), ("ator", 1), ("os", 1), ("at", 1), ("it", 1),
     ("ant", 1), ("ut", 1), ("iv", 1), ("ică", 1), ("abilă", 1),
     ("ibilă", 1), ("oasă", 1), ("ată", 1), ("ită", 1), ("antă", 1),
     ("ută", 1), ("ivă", 1),
     ("iune", 2), ("iuni", 2),
     ("ista", 3), ("isme", 3), ("iste", 3), ("isti", 3), ("işti", 3),
     ("ism", 3), ("ist", 3), ("istă", 3)],
)

# verb table: code 1 needs a non-vowel (or u) before, inside RV
_RO_VERB = _bylen(
    [("ea", 1), ("ia", 1), ("esc", 1), ("ăsc", 1), ("ind", 1),
     ("ând", 1), ("are", 1), ("ere", 1), ("ire", 1), ("âre", 1),
     ("se", 2), ("ase", 1), ("sese", 2), ("ise", 1), ("use", 1),
     ("âse", 1), ("eşte", 1), ("ăşte", 1), ("eze", 1), ("ai", 1),
     ("eai", 1), ("iai", 1), ("sei", 2), ("eşti", 1), ("ăşti", 1),
     ("ui", 1), ("ezi", 1), ("aşi", 1), ("seşi", 2), ("aseşi", 1),
     ("seseşi", 2), ("iseşi", 1), ("useşi", 1), ("âseşi", 1),
     ("işi", 1), ("uşi", 1), ("âşi", 1), ("âi", 1), ("aţi", 2),
     ("eaţi", 1), ("iaţi", 1), ("eţi", 2), ("iţi", 2), ("arăţi", 1),
     ("serăţi", 2), ("aserăţi", 1), ("seserăţi", 2), ("iserăţi", 1),
     ("userăţi", 1), ("âserăţi", 1), ("irăţi", 1), ("urăţi", 1),
     ("ârăţi", 1), ("âţi", 2), ("am", 1), ("eam", 1), ("iam", 1),
     ("em", 2), ("asem", 1), ("sesem", 2), ("isem", 1), ("usem", 1),
     ("âsem", 1), ("im", 2), ("ăm", 2), ("arăm", 1), ("serăm", 2),
     ("aserăm", 1), ("seserăm", 2), ("iserăm", 1), ("userăm", 1),
     ("âserăm", 1), ("irăm", 1), ("urăm", 1), ("ârăm", 1), ("âm", 2),
     ("au", 1), ("eau", 1), ("iau", 1), ("indu", 1), ("ându", 1),
     ("ez", 1), ("ească", 1), ("ară", 1), ("seră", 2), ("aseră", 1),
     ("seseră", 2), ("iseră", 1), ("useră", 1), ("âseră", 1),
     ("iră", 1), ("ură", 1), ("âră", 1), ("ează", 1)],
)

_RO_RESIDUAL = sort_by_len(["a", "e", "ie", "i", "ă"])


def _ro_prelude(word: str) -> str:
    w = list(word)
    i = 0
    while i < len(w):
        if w[i] in _RO_VOWELS and i + 1 < len(w):
            n = w[i + 1]
            if n in "ui" and i + 2 < len(w) and w[i + 2] in _RO_VOWELS:
                w[i + 1] = "U" if n == "u" else "I"
                continue
        i += 1
    return "".join(w)


def _ro_step0(w: str, p1: int) -> str:
    for s, code in _RO_STEP0:
        pos = len(w) - len(s)
        if w.endswith(s):
            if pos < p1:  # among picks the longest match; no fallback
                return w
            if code == 1:
                return w[:pos]
            if code == 2:
                return w[:pos] + "a"
            if code == 3:
                return w[:pos] + "e"
            if code == 4:
                return w[:pos] + "i"
            if code == 5:  # ile -> i, but not after ab
                if w[:pos].endswith("ab"):
                    return w
                return w[:pos] + "i"
            if code == 6:
                return w[:pos] + "at"
            return w[:pos] + "aţi"
    return w


def _ro_standard_suffix(w: str, p1: int, p2: int):
    """Repeat the combining-suffix reductions, then one a_3 pass;
    returns (word, standard_suffix_removed)."""
    removed = False
    while True:
        hit = False
        for s, repl in _RO_COMBO:
            pos = len(w) - len(s)
            if w.endswith(s):
                if pos >= p1:
                    w = w[:pos] + repl
                    removed = True
                    hit = True
                break  # longest match only; R1 failure ends the repeat
        if not hit:
            break
    for s, code in _RO_STD:
        pos = len(w) - len(s)
        if w.endswith(s):
            if pos < p2:
                return w, removed
            if code == 1:
                return w[:pos], True
            if code == 2:  # ţiune/ţiuni -> ţ -> t
                if pos >= 1 and w[pos - 1] == "ţ":
                    return w[: pos - 1] + "t", True
                return w, removed
            return w[:pos] + "ist", True
    return w, removed


def stem_snowball_romanian(word: str) -> str:
    w = _ro_prelude(word)
    rv = _romance_rv(w, _RO_VOWELS)
    p1, p2 = mark_r1r2(w, _RO_VOWELS)
    w = _ro_step0(w, p1)
    w, removed = _ro_standard_suffix(w, p1, p2)
    if not removed:
        for s, code in _RO_VERB:
            pos = len(w) - len(s)
            if pos >= rv and w.endswith(s):
                if code == 1:
                    # preceded (within RV) by a non-vowel or by u;
                    # a failed condition fails the whole step
                    if pos - 1 >= rv and (
                        w[pos - 1] not in _RO_VOWELS or w[pos - 1] == "u"
                    ):
                        w = w[:pos]
                else:
                    w = w[:pos]
                break
    for s in _RO_RESIDUAL:
        pos = len(w) - len(s)
        if w.endswith(s):
            if pos >= rv:
                w = w[:pos]
            break
    return w.replace("I", "i").replace("U", "u")


# ----------------------------------------------------------------- Catalan
# (contributed Snowball algorithm; R1/R2 only, accents cleaned last)
_CA_VOWELS = frozenset("aeiou\u00e0\u00e1\u00e8\u00e9\u00ed\u00ef\u00f2\u00f3\u00fa\u00fc")
_CA_CLEAN = str.maketrans({"\u00e1": "a", "\u00e0": "a", "\u00e9": "e",
                           "\u00e8": "e", "\u00ed": "i", "\u00ec": "i",
                           "\u00ef": "i", "\u00f3": "o", "\u00f2": "o",
                           "\u00fa": "u", "\u00fc": "u", "\u00b7": "."})

_CA_PRONOUNS = sort_by_len([
    'la', '-la', 'sela', 'le', 'me', '-me', 'se', '-te', 'hi', "'hi",
    'li', '-li', "'l", "'m", '-m', "'n", '-n', 'ho', "'ho", 'lo', 'selo',
    "'s", 'las', 'selas', 'les', '-les', "'ls", '-ls', "'ns", '-ns',
    'ens', 'los', 'selos', 'nos', '-nos', 'vos', 'us', '-us', "'t"
])

_CA_STD = _bylen([
    ('ica', 4), ('lógica', 3), ('enca', 1), ('ada', 2), ('ancia', 1),
    ('encia', 1), ('ència', 1), ('ícia', 1), ('logia', 3), ('inia', 1),
    ('íinia', 1), ('eria', 1), ('ària', 1), ('atòria', 1), ('alla', 1),
    ('ella', 1), ('ívola', 1), ('ima', 1), ('íssima', 1),
    ('quíssima', 5), ('ana', 1), ('ina', 1), ('era', 1), ('sfera', 1),
    ('ora', 1), ('dora', 1), ('adora', 1), ('adura', 1), ('esa', 1),
    ('osa', 1), ('assa', 1), ('essa', 1), ('issa', 1), ('eta', 1),
    ('ita', 1), ('ota', 1), ('ista', 1), ('ialista', 1), ('ionista', 1),
    ('iva', 1), ('ativa', 1), ('nça', 1), ('logía', 3), ('ic', 4),
    ('ístic', 1), ('enc', 1), ('esc', 1), ('ud', 1), ('atge', 1),
    ('ble', 1), ('able', 1), ('ible', 1), ('isme', 1), ('ialisme', 1),
    ('ionisme', 1), ('ivisme', 1), ('aire', 1), ('icte', 1), ('iste', 1),
    ('ici', 1), ('íci', 1), ('logi', 3), ('ari', 1), ('tori', 1),
    ('al', 1), ('il', 1), ('all', 1), ('ell', 1), ('ívol', 1),
    ('isam', 1), ('issem', 1), ('ìssem', 1), ('íssem', 1), ('íssim', 1),
    ('quíssim', 5), ('amen', 1), ('ìssin', 1), ('ar', 1), ('ificar', 1),
    ('egar', 1), ('ejar', 1), ('itar', 1), ('itzar', 1), ('fer', 1),
    ('or', 1), ('dor', 1), ('dur', 1), ('doras', 1), ('ics', 4),
    ('lógics', 3), ('uds', 1), ('nces', 1), ('ades', 2), ('ancies', 1),
    ('encies', 1), ('ències', 1), ('ícies', 1), ('logies', 3),
    ('inies', 1), ('ínies', 1), ('eries', 1), ('àries', 1),
    ('atòries', 1), ('bles', 1), ('ables', 1), ('ibles', 1), ('imes', 1),
    ('íssimes', 1), ('quíssimes', 5), ('formes', 1), ('ismes', 1),
    ('ialismes', 1), ('ines', 1), ('eres', 1), ('ores', 1), ('dores', 1),
    ('idores', 1), ('dures', 1), ('eses', 1), ('oses', 1), ('asses', 1),
    ('ictes', 1), ('ites', 1), ('otes', 1), ('istes', 1),
    ('ialistes', 1), ('ionistes', 1), ('iques', 4), ('lógiques', 3),
    ('ives', 1), ('atives', 1), ('logíes', 3), ('allengües', 1),
    ('icis', 1), ('ícis', 1), ('logis', 3), ('aris', 1), ('toris', 1),
    ('ls', 1), ('als', 1), ('ells', 1), ('ims', 1), ('íssims', 1),
    ('quíssims', 5), ('ions', 1), ('cions', 1), ('acions', 2),
    ('esos', 1), ('osos', 1), ('assos', 1), ('issos', 1), ('ers', 1),
    ('ors', 1), ('dors', 1), ('adors', 1), ('idors', 1), ('ats', 1),
    ('itats', 1), ('bilitats', 1), ('ivitats', 1), ('ativitats', 1),
    ('ïtats', 1), ('ets', 1), ('ants', 1), ('ents', 1), ('ments', 1),
    ('aments', 1), ('ots', 1), ('uts', 1), ('ius', 1), ('trius', 1),
    ('atius', 1), ('ès', 1), ('és', 1), ('ís', 1), ('dís', 1), ('ós', 1),
    ('itat', 1), ('bilitat', 1), ('ivitat', 1), ('ativitat', 1),
    ('ïtat', 1), ('et', 1), ('ant', 1), ('ent', 1), ('ient', 1),
    ('ment', 1), ('ament', 1), ('isament', 1), ('ot', 1), ('isseu', 1),
    ('ìsseu', 1), ('ísseu', 1), ('triu', 1), ('íssiu', 1), ('atiu', 1),
    ('ó', 1), ('ió', 1), ('ció', 1), ('ació', 1)
])

_CA_VERB = _bylen([
    ('aba', 1), ('esca', 1), ('isca', 1), ('ïsca', 1), ('ada', 1),
    ('ida', 1), ('uda', 1), ('ïda', 1), ('ia', 1), ('aria', 1),
    ('iria', 1), ('ara', 1), ('iera', 1), ('ira', 1), ('adora', 1),
    ('ïra', 1), ('ava', 1), ('ixa', 1), ('itza', 1), ('ía', 1),
    ('aría', 1), ('ería', 1), ('iría', 1), ('ïa', 1), ('isc', 1),
    ('ïsc', 1), ('ad', 1), ('ed', 1), ('id', 1), ('ie', 1), ('re', 1),
    ('dre', 1), ('ase', 1), ('iese', 1), ('aste', 1), ('iste', 1),
    ('ii', 1), ('ini', 1), ('esqui', 1), ('eixi', 1), ('itzi', 1),
    ('am', 1), ('em', 1), ('arem', 1), ('irem', 1), ('àrem', 1),
    ('írem', 1), ('àssem', 1), ('éssem', 1), ('iguem', 1), ('ïguem', 1),
    ('avem', 1), ('àvem', 1), ('ávem', 1), ('irìem', 1), ('íem', 1),
    ('aríem', 1), ('iríem', 1), ('assim', 1), ('essim', 1), ('issim', 1),
    ('àssim', 1), ('èssim', 1), ('éssim', 1), ('íssim', 1), ('ïm', 1),
    ('an', 1), ('aban', 1), ('arian', 1), ('aran', 1), ('ieran', 1),
    ('iran', 1), ('ían', 1), ('arían', 1), ('erían', 1), ('irían', 1),
    ('en', 1), ('ien', 1), ('arien', 1), ('irien', 1), ('aren', 1),
    ('eren', 1), ('iren', 1), ('àren', 1), ('ïren', 1), ('asen', 1),
    ('iesen', 1), ('assen', 1), ('essen', 1), ('issen', 1), ('éssen', 1),
    ('ïssen', 1), ('esquen', 1), ('isquen', 1), ('ïsquen', 1),
    ('aven', 1), ('ixen', 1), ('eixen', 1), ('ïxen', 1), ('ïen', 1),
    ('in', 1), ('inin', 1), ('sin', 1), ('isin', 1), ('assin', 1),
    ('essin', 1), ('issin', 1), ('ïssin', 1), ('esquin', 1),
    ('eixin', 1), ('aron', 1), ('ieron', 1), ('arán', 1), ('erán', 1),
    ('irán', 1), ('iïn', 1), ('ado', 1), ('ido', 1), ('ando', 2),
    ('iendo', 1), ('io', 1), ('ixo', 1), ('eixo', 1), ('ïxo', 1),
    ('itzo', 1), ('ar', 1), ('tzar', 1), ('er', 1), ('eixer', 1),
    ('ir', 1), ('ador', 1), ('as', 1), ('abas', 1), ('adas', 1),
    ('idas', 1), ('aras', 1), ('ieras', 1), ('ías', 1), ('arías', 1),
    ('erías', 1), ('irías', 1), ('ids', 1), ('es', 1), ('ades', 1),
    ('ides', 1), ('udes', 1), ('ïdes', 1), ('atges', 1), ('ies', 1),
    ('aries', 1), ('iries', 1), ('ares', 1), ('ires', 1), ('adores', 1),
    ('ïres', 1), ('ases', 1), ('ieses', 1), ('asses', 1), ('esses', 1),
    ('isses', 1), ('ïsses', 1), ('ques', 1), ('esques', 1),
    ('ïsques', 1), ('aves', 1), ('ixes', 1), ('eixes', 1), ('ïxes', 1),
    ('ïes', 1), ('abais', 1), ('arais', 1), ('ierais', 1), ('íais', 1),
    ('aríais', 1), ('eríais', 1), ('iríais', 1), ('aseis', 1),
    ('ieseis', 1), ('asteis', 1), ('isteis', 1), ('inis', 1), ('sis', 1),
    ('isis', 1), ('assis', 1), ('essis', 1), ('issis', 1), ('ïssis', 1),
    ('esquis', 1), ('eixis', 1), ('itzis', 1), ('áis', 1), ('aréis', 1),
    ('eréis', 1), ('iréis', 1), ('ams', 1), ('ados', 1), ('idos', 1),
    ('amos', 1), ('ábamos', 1), ('áramos', 1), ('iéramos', 1),
    ('íamos', 1), ('aríamos', 1), ('eríamos', 1), ('iríamos', 1),
    ('aremos', 1), ('eremos', 1), ('iremos', 1), ('ásemos', 1),
    ('iésemos', 1), ('imos', 1), ('adors', 1), ('ass', 1), ('erass', 1),
    ('ess', 1), ('ats', 1), ('its', 1), ('ents', 1), ('às', 1),
    ('aràs', 1), ('iràs', 1), ('arás', 1), ('erás', 1), ('irás', 1),
    ('és', 1), ('arés', 1), ('ís', 1), ('iïs', 1), ('at', 1), ('it', 1),
    ('ant', 1), ('ent', 1), ('int', 1), ('ut', 1), ('ït', 1), ('au', 1),
    ('erau', 1), ('ieu', 1), ('ineu', 1), ('areu', 1), ('ireu', 1),
    ('àreu', 1), ('íreu', 1), ('asseu', 1), ('esseu', 1), ('eresseu', 1),
    ('àsseu', 1), ('ésseu', 1), ('igueu', 1), ('ïgueu', 1), ('àveu', 1),
    ('áveu', 1), ('itzeu', 1), ('ìeu', 1), ('irìeu', 1), ('íeu', 1),
    ('aríeu', 1), ('iríeu', 1), ('assiu', 1), ('issiu', 1), ('àssiu', 1),
    ('èssiu', 1), ('éssiu', 1), ('íssiu', 1), ('ïu', 1), ('ix', 1),
    ('eix', 1), ('ïx', 1), ('itz', 1), ('ià', 1), ('arà', 1), ('irà', 1),
    ('itzà', 1), ('ará', 1), ('erá', 1), ('irá', 1), ('irè', 1),
    ('aré', 1), ('eré', 1), ('iré', 1), ('í', 1), ('iï', 1), ('ió', 1)
])

_CA_RESIDUAL = _bylen([
    ('a', 1), ('e', 1), ('i', 1), ('ïn', 1), ('o', 1), ('ir', 1),
    ('s', 1), ('is', 1), ('os', 1), ('ïs', 1), ('it', 1), ('eu', 1),
    ('iu', 1), ('iqu', 2), ('itz', 1), ('à', 1), ('á', 1), ('é', 1),
    ('ì', 1), ('í', 1), ('ï', 1), ('ó', 1)
])


def stem_snowball_catalan(word: str) -> str:
    w = word
    p1, p2 = mark_r1r2(w, _CA_VOWELS)

    for s in _CA_PRONOUNS:
        pos = len(w) - len(s)
        if w.endswith(s):
            if pos >= p1:
                w = w[:pos]
            break

    done = False
    for s, code in _CA_STD:
        pos = len(w) - len(s)
        if w.endswith(s):
            if code == 1 and pos >= p1:
                w, done = w[:pos], True
            elif code == 2 and pos >= p2:
                w, done = w[:pos], True
            elif code == 3 and pos >= p2:
                w, done = w[:pos] + "log", True
            elif code == 4 and pos >= p2:
                w, done = w[:pos] + "ic", True
            elif code == 5 and pos >= p1:
                w, done = w[:pos] + "c", True
            break
    if not done:
        for s, code in _CA_VERB:
            pos = len(w) - len(s)
            if w.endswith(s):
                if (code == 1 and pos >= p1) or (code == 2 and pos >= p2):
                    w = w[:pos]
                break

    for s, code in _CA_RESIDUAL:
        pos = len(w) - len(s)
        if w.endswith(s):
            if pos >= p1:
                w = w[:pos] + ("" if code == 1 else "ic")
            break

    return w.translate(_CA_CLEAN)
