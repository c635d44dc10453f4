"""Pregen field encoders — the ``pregen_writer_normal`` generators.

The reference's pregen writers turn a per-document field (a string,
integer or date pulled from the document name/metadata) into a single
sortable integer RSV, written to a ``.pregen`` side file and ranked by
``ranking_function_pregen`` at query time.  This module mirrors the
"normal" (closed-form) generator family
(source/pregen_writer_normal.c:19-279):

- ``integer``      — atol with clamp to [1, T_max]  (:19-29)
- ``bintrunc``     — first sizeof(T) raw bytes, big-endian,
                     left-aligned (:35-53)
- ``recentdate``   — atol of a unix timestamp (:61-72; the narrow-
                     accumulator compression path is the reference's
                     own TODO)
- ``strtrunc`` / ``base32`` / ``base36`` / ``base37`` / ``base40`` /
  ``ascii_printables`` — radix-packed string prefixes under the
  matching character encoder (:94-179 and encode_char_*.h), with the
  reference's exact digit-budget arithmetic: ``floor(log_base(T_max))``
  full digits plus one scaled final digit (maths.h:410-452), leading /
  repeated spaces stripped, unencodable characters skipped, all-zero
  encodings bumped to 1.

``bits`` parameterizes the accumulator width — ``ANT_PREGEN_T`` is a
compile-time knob in the reference (pregen_t.h:9-13, default unsigned
64-bit); the Spark layer compiles for 63 bits so values fit a Spark
LongType exactly.

The arithmetic-coded variants (``base32arith`` etc.,
pregen_writer_normal.c:181-238) live in
:mod:`atire_spark.kernels.arith` — the reference ships fixed
(non-adaptive) character models, so the encode is closed-form too.

Unicode: the reference decomposes each codepoint into base form +
combining marks, throws the marks away, and lowercases
(unicode.c:198-257 ANT_UNICODE_normalize_lowercase_toutf8, tables
generated from UnicodeData).  :func:`normalize_lowercase` reproduces
that with ``unicodedata`` NFKD + combining-class filter — verified
value-identical against the compiled reference's ``pregen_create``
on a Unicode sweep (tests/test_pregen.py).
"""

from __future__ import annotations

from atire_spark.kernels.unorm import normalize_lowercase  # noqa: F401 (re-export)

CHAR_ENCODE_FAIL = 255


def _enc_8bit(b: int) -> int:
    return b


def _enc_base32(b: int) -> int:
    # encode_char_base32.h: space 0, digits doubled-up 1-5, letters 6-31
    if b == 0x20:
        return 0
    if 0x30 <= b <= 0x39:
        return 1 + ((b - 0x30) >> 1)
    if 0x61 <= b <= 0x7A:
        return b - 0x61 + 6
    return CHAR_ENCODE_FAIL


def _enc_base36(b: int) -> int:
    if 0x30 <= b <= 0x39:
        return b - 0x30
    if 0x61 <= b <= 0x7A:
        return b - 0x61 + 10
    return CHAR_ENCODE_FAIL


def _enc_base37(b: int) -> int:
    if b == 0x20:
        return 0
    if 0x30 <= b <= 0x39:
        return b - 0x30 + 1
    if 0x61 <= b <= 0x7A:
        return b - 0x61 + 11
    return CHAR_ENCODE_FAIL


def _enc_base40(b: int) -> int:
    if b == 0x20:
        return 0
    if b < 0x30:
        return 1
    if b <= 0x39:
        return b - 0x30 + 2
    if b < 0x61:
        return 12
    if b <= 0x7A:
        return b - 0x61 + 13
    return 39  # c > 'z'


def _enc_printable_ascii(b: int) -> int:
    # encode_char_printable_ascii.h: all printables distinct (feed
    # lowercased input), every >0x7F codepoint folds onto DEL
    if b < 0x20:
        return CHAR_ENCODE_FAIL
    if b > 0x7F:
        b = 0x7F
    if b > 0x5A:  # eliminate the uppercase hole
        b -= 26
    return b - 0x20


#: scheme -> (num_symbols, encoder); names follow
#: indexer_param_block_pregen.c:32-66
RADIX_SCHEMES = {
    "strtrunc": (256, _enc_8bit),
    "base32": (32, _enc_base32),
    "base36": (36, _enc_base36),
    "base37": (37, _enc_base37),
    "base40": (40, _enc_base40),
    "asciiprintables": (70, _enc_printable_ascii),
}


def _digit_budget(base: int, bits: int) -> tuple[int, int]:
    """(full_digits, final_digit_radix) per maths.h:410-452: how many
    whole base-``base`` digits fit in an unsigned ``bits``-bit integer,
    and the scale of the one extra partial digit (1 when the type
    packs exactly)."""
    tmax = (1 << bits) - 1
    if base & (base - 1) == 0:
        lb = base.bit_length() - 1
        digits = bits // lb
        has_rem = (bits % lb) != 0
    else:
        digits, v = 0, tmax
        while v >= base:
            v //= base
            digits += 1
        has_rem = True
    final = (tmax // base**digits) if has_rem else 1
    return digits, final


def encode_radix(field: str, scheme: str, bits: int = 64) -> int:
    """generate_radix (pregen_writer_normal.c:94-179)."""
    base, enc = RADIX_SCHEMES[scheme]
    digits, final = _digit_budget(base, bits)
    dest = digits
    result = 0
    prev_space = True  # leading spaces are not significant
    enc_space = enc(0x20)
    for ch in field:
        if dest < 0:
            break
        for b in normalize_lowercase(ch).encode("utf-8"):
            if dest < 0:
                break
            e = enc(b)
            if e == CHAR_ENCODE_FAIL:
                continue
            if e == enc_space and enc_space != CHAR_ENCODE_FAIL:
                if prev_space:
                    continue
                prev_space = True
            else:
                prev_space = False
            if dest == 0:
                # final digit isn't the full radix: scale down
                result = result * final + (e * (final - 1)) // (base - 1)
            else:
                result = result * base + e
            dest -= 1
    if dest >= 0:
        # left-justify so longer strings aren't always larger
        result *= base ** dest
        result *= final
    return result if result else 1


def encode_integer(field: str, bits: int = 64) -> int:
    """generate_integer (:19-29): atol, clamped to [1, T_max]."""
    import re

    m = re.match(r"\s*[+-]?\d+", field or "")
    value = int(m.group()) if m else 0
    tmax = (1 << bits) - 1
    return tmax if value > tmax else 1 if value <= 0 else value


def encode_bintrunc(field: str, bits: int = 64) -> int:
    """generate_bintrunc (:35-53): first width bytes big-endian,
    left-aligned."""
    raw = (field or "").encode("utf-8")
    width = bits // 8
    take = raw[:width]
    result = int.from_bytes(take, "big")
    return result << (8 * (width - len(take)))


def encode_recentdate(field: str) -> int:
    """generate_recentdate (:61-72): the ≥4-byte accumulator path."""
    import re

    m = re.match(r"\s*[+-]?\d+", field or "")
    return int(m.group()) if m else 0


def encode_field(field: str, field_type: str, bits: int = 64) -> int:
    """Dispatch per indexer_param_block_pregen.c:32-66 type names."""
    if field_type == "integer":
        return encode_integer(field, bits)
    if field_type == "bintrunc":
        return encode_bintrunc(field, bits)
    if field_type == "recentdate":
        return encode_recentdate(field)
    return encode_radix(field, field_type, bits)
