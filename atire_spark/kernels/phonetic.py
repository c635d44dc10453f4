"""Phonetic term matchers with reference-ATIRE semantics.

The reference registers two phonetic matchers in the stemmer factory
(stemmer_factory.c:62-63) — they subclass ANT_stem, so they slot into
the same index/query gates as the real stemmers and the index records
them in ``~stemmer`` like any other:

- Soundex (phonetic_soundex.h:31-58): ATIRE's variant of the classic
  algorithm — fixed 4-char output (first letter + up to three digit
  codes, zero-padded), code table ``01230129022455012623019202``
  where h/w code to '9' and act as same-code separators (a consonant
  with the same code as the last-coded one is skipped when the
  immediately preceding letter was h/w), vowels reset the repeat
  suppression, non-alphabetics are ignored.

- Double Metaphone (phonetic_double_metaphone.h:47, internals in
  phonetic_double_metaphone_internals.h — Philips' published
  algorithm, C/C++ Users Journal 18(6), June 2000): ATIRE keys terms
  by the PRIMARY metaphone key only, lowercased, truncated to 4
  chars.  This module implements the published algorithm
  independently in Python; parity with the compiled reference is
  frozen in tests/test_phonetic.py (full-vocabulary sweep).

Both operate on the uppercased word padded with trailing spaces (the
reference pads 4 so multi-char lookaheads read harmless blanks).
"""

from __future__ import annotations

# ------------------------------------------------------------------ soundex
# a..z -> digit; h and w are '9' (separator sentinels), vowels '0'
_SOUNDEX_VAL = "01230129022455012623019202"


def soundex(term: str) -> str:
    """ATIRE soundex (phonetic_soundex.h:31-58).

    Keeps the first character verbatim, then appends the soundex code
    of each later letter unless it is a vowel code ('0'), an h/w
    ('9'), a repeat of the previous letter's code, or a repeat of the
    last APPENDED code across an h/w separator.  Result is always 4
    chars, '0'-padded.  Characters outside a-z are skipped (the
    reference's ANT_isalpha gate).

    A first char outside a-z: the QUERY-side stem gate excludes such
    terms, but the INDEX side stems every WORD token longer than 3
    bytes (index_document.c:103-111) — the reference then evaluates
    ``soundex_val[*what - 'a']`` with a negative index (signed char ×
    UTF-8 lead byte), an out-of-bounds read of whatever rodata
    precedes the table. A clean engine cannot reproduce an
    out-of-bounds read; we keep the DEFINED part (first character
    verbatim, later a-z letters coded) and initialize the suppression
    state as a vowel ('0'), i.e. nothing suppressed. Such terms are
    excluded from strict A/B like the other characterized reference
    UB paths.
    """
    out = [term[0], "0", "0", "0"]
    o0 = ord(term[0])
    last = _SOUNDEX_VAL[o0 - 97] if 97 <= o0 <= 122 else "0"
    last_coded = ""
    n_out = 1
    for ch in term[1:]:
        o = ord(ch)
        if not (97 <= o <= 122):
            continue
        current = _SOUNDEX_VAL[o - 97]
        if (
            current != "0"
            and current != "9"
            and current != last
            and not (last == "9" and last_coded == current)
        ):
            out[n_out] = last_coded = current
            n_out += 1
            if n_out >= 4:
                break
        last = current
    return "".join(out)


# --------------------------------------------------------- double metaphone
_VOWELS = frozenset("AEIOUY")
_KEY_LENGTH = 4


def _is_vowel(w: str, pos: int, length: int) -> bool:
    return 0 <= pos < length and w[pos] in _VOWELS


def _at(w: str, start: int, length: int, *candidates: str) -> bool:
    """areStringsAt: does w[start:start+length] equal any candidate?
    Negative offsets are always false (the reference's guard)."""
    if start < 0:
        return False
    frag = w[start : start + length]
    return frag in candidates


def double_metaphone(term: str) -> tuple[str, str | None]:
    """Primary and alternate metaphone keys for ``term`` (Philips
    2000, as compiled into the reference).  Keys are uppercase, max 4
    chars; the alternate is None when no rule produced a distinct
    alternate pronunciation.  ``phonetic_double_metaphone`` below
    applies ATIRE's term mapping (primary key, lowercased).
    """
    length = len(term)
    w = term.upper() + "    "
    last = length - 1
    slavo = ("W" in w) or ("K" in w) or ("CZ" in w)  # WITZ implies W

    # key lengths are counted in CHARS (an add("KS") is two) — the
    # main-loop guard compares them against _KeyLength exactly like
    # the reference's m_primaryKeyLength/m_alternateKeyLength
    primary = ""
    alternate = ""
    has_alternate = False

    def add(prim: str, alt: str | None = None) -> None:
        nonlocal has_alternate, primary, alternate
        if prim:
            primary += prim
        if alt is not None:
            if alt:
                has_alternate = True
                if alt[0] != " ":
                    alternate += alt
            elif prim and prim[0] != " ":
                alternate += prim
        elif prim:
            alternate += prim

    current = 0
    if length < 1:
        return "", None
    # silent initial letters: GN-, KN-, PN-, WR-, PS-
    if _at(w, 0, 2, "GN", "KN", "PN", "WR", "PS"):
        current += 1
    # initial X is pronounced Z, which maps to S ('Xavier')
    if w[0] == "X":
        add("S")
        current += 1

    while (
        len(primary) < _KEY_LENGTH or len(alternate) < _KEY_LENGTH
    ) and current < length:
        c = w[current]
        if c in _VOWELS:
            if current == 0:
                add("A")  # all initial vowels map to A
            current += 1

        elif c == "B":
            add("P")  # '-mb' as in 'dumb' is skipped from the M case
            current += 2 if w[current + 1] == "B" else 1

        elif c == "\xc7":  # C-cedilla
            add("S")
            current += 1

        elif c == "C":
            # germanic '-ACH-' with a consonant before, e.g. 'bacher'
            if (
                current > 1
                and not _is_vowel(w, current - 2, length)
                and _at(w, current - 1, 3, "ACH")
                and (
                    w[current + 2] != "I"
                    and (
                        w[current + 2] != "E"
                        or _at(w, current - 2, 6, "BACHER", "MACHER")
                    )
                )
            ):
                add("K")
                current += 2
            elif current == 0 and _at(w, current, 6, "CAESAR"):
                add("S")
                current += 2
            elif _at(w, current, 4, "CHIA"):  # italian 'chianti'
                add("K")
                current += 2
            elif _at(w, current, 2, "CH"):
                if current > 0 and _at(w, current, 4, "CHAE"):  # 'michael'
                    add("K", "X")
                elif (
                    current == 0
                    and (
                        _at(w, current + 1, 5, "HARAC", "HARIS")
                        or _at(w, current + 1, 3, "HOR", "HYM", "HIA", "HEM")
                    )
                    and not _at(w, 0, 5, "CHORE")
                ):
                    add("K")  # greek roots: 'chemistry', 'chorus'
                elif (
                    # germanic or 'kh' sound
                    _at(w, 0, 4, "VAN ", "VON ")
                    or _at(w, 0, 3, "SCH")
                    # 'architect' but not 'arch'; 'orchestra', 'orchid'
                    or _at(w, current - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                    or _at(w, current + 2, 1, "T", "S")
                    or (
                        (_at(w, current - 1, 1, "A", "O", "U", "E") or current == 0)
                        # 'wachtler', 'wechsler', but not 'tichner'
                        and _at(
                            w, current + 2, 1,
                            "L", "R", "N", "M", "B", "H", "F", "V", "W", " ",
                        )
                    )
                ):
                    add("K")
                elif current > 0:
                    if _at(w, 0, 2, "MC"):  # 'McHugh'
                        add("K")
                    else:
                        add("X", "K")
                else:
                    add("X")
                current += 2
            elif _at(w, current, 2, "CZ") and not _at(w, current - 2, 4, "WICZ"):
                add("S", "X")  # 'czerny'
                current += 2
            elif _at(w, current + 1, 3, "CIA"):  # 'focaccia'
                add("X")
                current += 3
            elif _at(w, current, 2, "CC") and not (current == 1 and w[0] == "M"):
                # double C, but not 'McClellan'
                if _at(w, current + 2, 1, "I", "E", "H") and not _at(
                    w, current + 2, 2, "HU"
                ):
                    # 'bellocchio' but not 'bacchus'
                    if (current == 1 and w[current - 1] == "A") or _at(
                        w, current - 1, 5, "UCCEE", "UCCES"
                    ):
                        add("KS")  # 'accident', 'accede', 'succeed'
                    else:
                        add("X")  # 'bacci', 'bertucci'
                    current += 3
                else:  # Pierce's rule
                    add("K")
                    current += 2
            elif _at(w, current, 2, "CK", "CG", "CQ"):
                add("K")
                current += 2
            elif _at(w, current, 2, "CI", "CE", "CY"):
                if _at(w, current, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")  # italian vs english
                else:
                    add("S")
                current += 2
            else:
                add("K")
                if _at(w, current + 1, 2, " C", " Q", " G"):
                    current += 3  # 'mac caffrey', 'mac gregor'
                elif _at(w, current + 1, 1, "C", "K", "Q") and not _at(
                    w, current + 1, 2, "CE", "CI"
                ):
                    current += 2
                else:
                    current += 1

        elif c == "D":
            if _at(w, current, 2, "DG"):
                if _at(w, current + 2, 1, "I", "E", "Y"):
                    add("J")  # 'edge'
                    current += 3
                else:
                    add("TK")  # 'edgar'
                    current += 2
            elif _at(w, current, 2, "DT", "DD"):
                add("T")
                current += 2
            else:
                add("T")
                current += 1

        elif c == "F":
            current += 2 if w[current + 1] == "F" else 1
            add("F")

        elif c == "G":
            if w[current + 1] == "H":
                if current > 0 and not _is_vowel(w, current - 1, length):
                    add("K")
                    current += 2
                elif current == 0:
                    if w[current + 2] == "I":
                        add("J")  # 'ghislane', 'ghiradelli'
                    else:
                        add("K")
                    current += 2
                elif (
                    # Parker's rule (refined): 'hugh'
                    (current > 1 and _at(w, current - 2, 1, "B", "H", "D"))
                    # 'bough'
                    or (current > 2 and _at(w, current - 3, 1, "B", "H", "D"))
                    # 'broughton'
                    or (current > 3 and _at(w, current - 4, 1, "B", "H"))
                ):
                    current += 2
                else:
                    # 'laugh', 'McLaughlin', 'cough', 'gough', 'rough'
                    if (
                        current > 2
                        and w[current - 1] == "U"
                        and _at(w, current - 3, 1, "C", "G", "L", "R", "T")
                    ):
                        add("F")
                    elif current > 0 and w[current - 1] != "I":
                        add("K")
                    current += 2
            elif w[current + 1] == "N":
                if current == 1 and _is_vowel(w, 0, length) and not slavo:
                    add("KN", "N")
                elif (
                    # not e.g. 'cagney'
                    not _at(w, current + 2, 2, "EY")
                    and w[current + 1] != "Y"
                    and not slavo
                ):
                    add("N", "KN")
                else:
                    add("KN")
                current += 2
            elif _at(w, current + 1, 2, "LI") and not slavo:
                add("KL", "L")  # 'tagliaro'
                current += 2
            elif current == 0 and (
                w[current + 1] == "Y"
                or _at(
                    w, current + 1, 2,
                    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER",
                )
            ):
                add("K", "J")  # -ges-, -gep- ... at beginning
                current += 2
            elif (
                (_at(w, current + 1, 2, "ER") or w[current + 1] == "Y")
                and not _at(w, 0, 6, "DANGER", "RANGER", "MANGER")
                and not _at(w, current - 1, 1, "E", "I")
                and not _at(w, current - 1, 3, "RGY", "OGY")
            ):
                add("K", "J")  # -ger-, -gy-
                current += 2
            elif _at(w, current + 1, 1, "E", "I", "Y") or _at(
                w, current - 1, 4, "AGGI", "OGGI"
            ):
                # italian 'biaggi'
                if (
                    _at(w, 0, 4, "VAN ", "VON ")
                    or _at(w, 0, 3, "SCH")
                    or _at(w, current + 1, 2, "ET")
                ):
                    add("K")  # obvious germanic
                elif _at(w, current + 1, 4, "IER "):
                    add("J")  # always soft if french ending
                else:
                    add("J", "K")
                current += 2
            else:
                current += 2 if w[current + 1] == "G" else 1
                add("K")

        elif c == "H":
            # keep only if first & before vowel, or between two vowels
            if (current == 0 or _is_vowel(w, current - 1, length)) and _is_vowel(
                w, current + 1, length
            ):
                add("H")
                current += 2
            else:  # also takes care of 'HH'
                current += 1

        elif c == "J":
            # obvious spanish: 'jose', 'san jacinto'
            if _at(w, current, 4, "JOSE") or _at(w, 0, 4, "SAN "):
                if (current == 0 and w[current + 4] == " ") or _at(w, 0, 4, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                current += 1
            else:
                if current == 0:
                    add("J", "A")  # Yankelovich / Jankelowicz
                elif (
                    _is_vowel(w, current - 1, length)
                    and not slavo
                    and (w[current + 1] == "A" or w[current + 1] == "O")
                ):
                    add("J", "H")  # spanish 'bajador'
                elif current == last:
                    add("J", " ")
                elif not _at(
                    w, current + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z"
                ) and not _at(w, current - 1, 1, "S", "K", "L"):
                    add("J")
                current += 2 if w[current + 1] == "J" else 1

        elif c == "K":
            current += 2 if w[current + 1] == "K" else 1
            add("K")

        elif c == "L":
            if w[current + 1] == "L":
                # spanish 'cabrillo', 'gallegos'
                if (
                    current == length - 3
                    and _at(w, current - 1, 4, "ILLO", "ILLA", "ALLE")
                ) or (
                    (_at(w, last - 1, 2, "AS", "OS") or _at(w, last, 1, "A", "O"))
                    and _at(w, current - 1, 4, "ALLE")
                ):
                    add("L", " ")
                    current += 2
                    continue
                current += 2
            else:
                current += 1
            add("L")

        elif c == "M":
            if (
                _at(w, current - 1, 3, "UMB")
                and (current + 1 == last or _at(w, current + 2, 2, "ER"))
            ) or w[current + 1] == "M":
                current += 2  # 'dumb', 'thumb'
            else:
                current += 1
            add("M")

        elif c == "N":
            current += 2 if w[current + 1] == "N" else 1
            add("N")

        elif c == "\xd1":  # N-tilde
            current += 1
            add("N")

        elif c == "P":
            if w[current + 1] == "H":
                add("F")
                current += 2
            else:
                # also 'campbell', 'raspberry'
                current += 2 if _at(w, current + 1, 1, "P", "B") else 1
                add("P")

        elif c == "Q":
            current += 2 if w[current + 1] == "Q" else 1
            add("K")

        elif c == "R":
            # french 'rogier', excluding 'hochmeier'
            if (
                current == last
                and not slavo
                and _at(w, current - 2, 2, "IE")
                and not _at(w, current - 4, 2, "ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            current += 2 if w[current + 1] == "R" else 1

        elif c == "S":
            if _at(w, current - 1, 3, "ISL", "YSL"):
                current += 1  # 'island', 'isle', 'carlisle'
            elif current == 0 and _at(w, current, 5, "SUGAR"):
                add("X", "S")
                current += 1
            elif _at(w, current, 2, "SH"):
                if _at(w, current + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                current += 2
            elif _at(w, current, 3, "SIO", "SIA") or _at(w, current, 4, "SIAN"):
                # italian & armenian
                if not slavo:
                    add("S", "X")
                else:
                    add("S")
                current += 3
            elif (
                current == 0 and _at(w, current + 1, 1, "M", "N", "L", "W")
            ) or _at(w, current + 1, 1, "Z"):
                # 'smith' matches 'schmidt', 'snider' matches 'schneider'
                add("S", "X")
                current += 2 if _at(w, current + 1, 1, "Z") else 1
            elif _at(w, current, 2, "SC"):
                if w[current + 2] == "H":
                    # Schlesinger's rule
                    if _at(w, current + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        # dutch: 'school', 'schooner'
                        if _at(w, current + 3, 2, "ER", "EN"):
                            add("X", "SK")  # 'schermerhorn', 'schenker'
                        else:
                            add("SK")
                        current += 3
                    else:
                        if (
                            current == 0
                            and not _is_vowel(w, 3, length)
                            and w[3] != "W"
                        ):
                            add("X", "S")
                        else:
                            add("X")
                        current += 3
                elif _at(w, current + 2, 1, "I", "E", "Y"):
                    add("S")
                    current += 3
                else:
                    add("SK")
                    current += 3
            else:
                # french 'resnais', 'artois'
                if current == last and _at(w, current - 2, 2, "AI", "OI"):
                    add("", "S")
                else:
                    add("S")
                current += 2 if _at(w, current + 1, 1, "S", "Z") else 1

        elif c == "T":
            if _at(w, current, 4, "TION"):
                add("X")
                current += 3
            elif _at(w, current, 3, "TIA", "TCH"):
                add("X")
                current += 3
            elif _at(w, current, 2, "TH") or _at(w, current, 3, "TTH"):
                # 'thomas', 'thames', or germanic
                if (
                    _at(w, current + 2, 2, "OM", "AM")
                    or _at(w, 0, 4, "VAN ", "VON ")
                    or _at(w, 0, 3, "SCH")
                ):
                    add("T")
                else:
                    add("0", "T")  # '0' is the theta symbol here
                current += 2
            else:
                current += 2 if _at(w, current + 1, 1, "T", "D") else 1
                add("T")

        elif c == "V":
            current += 2 if w[current + 1] == "V" else 1
            add("F")

        elif c == "W":
            if _at(w, current, 2, "WR"):  # can be mid-word
                add("R")
                current += 2
            else:
                if current == 0 and (
                    _is_vowel(w, current + 1, length) or _at(w, current, 2, "WH")
                ):
                    if _is_vowel(w, current + 1, length):
                        add("A", "F")  # Wasserman matches Vasserman
                    else:
                        add("A")  # Uomo matches Womo
                if (
                    (current == last and _is_vowel(w, current - 1, length))
                    or _at(w, current - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                    or _at(w, 0, 3, "SCH")
                ):
                    add("", "F")  # Arnow matches Arnoff
                    current += 1
                elif _at(w, current, 4, "WICZ", "WITZ"):
                    add("TS", "FX")  # polish 'filipowicz'
                    current += 4
                else:
                    current += 1

        elif c == "X":
            # french 'breaux': final X after IAU/EAU/AU/OU is silent
            if not (
                current == last
                and (
                    _at(w, current - 3, 3, "IAU", "EAU")
                    or _at(w, current - 2, 2, "AU", "OU")
                )
            ):
                add("KS")
            current += 2 if _at(w, current + 1, 1, "C", "X") else 1

        elif c == "Z":
            if w[current + 1] == "H":
                add("J")  # chinese pinyin 'zhao'
                current += 2
            else:
                if _at(w, current + 1, 2, "ZO", "ZI", "ZA") or (
                    slavo and current > 0 and w[current - 1] != "T"
                ):
                    add("S", "TS")
                else:
                    add("S")
                current += 2 if w[current + 1] == "Z" else 1

        else:
            current += 1

    prim = primary[:_KEY_LENGTH]
    alt = alternate[:_KEY_LENGTH]
    return prim, (alt if has_alternate else None)


# ----------------------------------------------------- stemmer-slot mappers
def phonetic_soundex(term: str) -> str:
    """The ``-t soundex`` term mapper (phonetic_soundex.h:23)."""
    return soundex(term)


def phonetic_double_metaphone(term: str) -> str:
    """The ``-t double_metaphone`` term mapper
    (phonetic_double_metaphone.h:47): primary key, lowercased."""
    return double_metaphone(term)[0].lower()
