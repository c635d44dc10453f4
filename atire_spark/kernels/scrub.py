"""Byte-level input scrubber — ANT_directory_iterator_scrub.

The reference's ``-S`` indexing option repairs raw document bytes
before parsing (source/directory_iterator_scrub.c:33-127), with three
composable modes (directory_iterator_scrub.h:21-23):

- NUL: NUL bytes become spaces;
- NON_ASCII: every high-bit byte becomes a space;
- UTF8: invalid UTF-8 is repaired in place — wild continuation bytes
  and UTF-16 surrogate lead bytes (0xD8-0xDF) spaced, beyond-U+10FFFF
  4-byte leads spaced, overlong ASCII (0xC0/0xC1) decoded to the
  correct single byte (re-checked for NUL), overlong multi-byte
  sequences re-encoded minimally when the sequence is structurally
  valid, and truncated sequences (missing continuation bytes) spaced
  whole.  Branch order and cursor advancement mirror the C exactly —
  the "wild continuation byte chomper" cleans up what the earlier
  branches leave behind.

Operates on bytes (the reference scrubs the raw file buffer); the
Spark wrapper :func:`scrub_column` applies it per text value around a
UTF-8 encode/decode.
"""

from __future__ import annotations

__all__ = ["scrub", "scrub_column", "NUL", "NON_ASCII", "UTF8"]

NUL = 1
NON_ASCII = 2
UTF8 = 4

_SPACE = 0x20


def _utf8_bytes(lead: int) -> int:
    if lead < 0x80:
        return 1
    if (lead & 0xE0) == 0xC0:
        return 2
    if (lead & 0xF0) == 0xE0:
        return 3
    if (lead & 0xF8) == 0xF0:
        return 4
    return 8


def _isutf8(data: bytearray, i: int) -> bool:
    n = _utf8_bytes(data[i])
    if n > 4:
        return False
    if i + n > len(data):
        return False
    for j in range(1, n):
        if (data[i + j] >> 6) != 2:
            return False
    return True


def _to_wide(data: bytearray, i: int) -> int:
    """utf8_to_wide_safe (unicode.c:421-448): 0 on anything broken."""
    if not _isutf8(data, i):
        return 0
    n = _utf8_bytes(data[i])
    if n == 1:
        return data[i]
    if n == 2:
        return ((data[i] & 0x1F) << 6) | (data[i + 1] & 0x3F)
    if n == 3:
        return (
            ((data[i] & 0x0F) << 12)
            | ((data[i + 1] & 0x3F) << 6)
            | (data[i + 2] & 0x3F)
        )
    return (
        ((data[i] & 0x07) << 18)
        | ((data[i + 1] & 0x3F) << 12)
        | ((data[i + 2] & 0x3F) << 6)
        | (data[i + 3] & 0x3F)
    )


def scrub(data: bytes, scrubbing: int) -> bytes:
    buf = bytearray(data)
    size = len(buf)
    i = 0
    while i < size:
        b = buf[i]
        if scrubbing & NUL and b == 0:
            buf[i] = _SPACE
            b = _SPACE
        if scrubbing & NON_ASCII and b & 0x80:
            buf[i] = _SPACE
            b = _SPACE
        if scrubbing & UTF8 and b >= 0x80:
            if (b & 0xC0) == 0x80:
                # a wild continuation byte appeared!
                buf[i] = _SPACE
            elif 0xD8 <= b < 0xE0:
                # UTF-16 surrogate halves are invalid code points
                buf[i] = _SPACE
            elif (b == 0xF4 and _to_wide(buf, i) > 0x10FFFF) or b > 0xF4:
                buf[i] = _SPACE
            elif b in (0xC0, 0xC1):
                # overlong ASCII: decode in place, chomper eats byte 2
                w = (
                    ((b & 0x1F) << 6) | (buf[i + 1] & 0x3F)
                    if i + 1 < size
                    else 0
                )
                buf[i] = w & 0xFF
                if buf[i] == 0:
                    buf[i] = _SPACE
            elif i + 1 < size and (
                (b == 0xE0 and (buf[i + 1] & 0xE0) == 0x80)
                or (b == 0xF0 and (buf[i + 1] & 0xF0) == 0x80)
                or (b == 0xF8 and (buf[i + 1] & 0xF8) == 0x80)
                or (b == 0xFC and (buf[i + 1] & 0xFC) == 0x80)
            ):
                # overlong non-ASCII: re-encode minimally if the
                # sequence is structurally valid, else space the lead
                if _isutf8(buf, i):
                    enc = chr(_to_wide(buf, i)).encode("utf-8")
                    buf[i:i + len(enc)] = enc
                    i += len(enc) - 1
                else:
                    buf[i] = _SPACE
            else:
                n = _utf8_bytes(b)
                found = 1
                for j in range(1, n):
                    if i + j >= size or (buf[i + j] & 0xC0) != 0x80:
                        break
                    found += 1
                if found != n:
                    for j in range(found):
                        buf[i + j] = _SPACE
                i += found - 1
        i += 1
    return bytes(buf)


def scrub_column(df, col: str, scrubbing: int = UTF8, out: str | None = None):
    """Apply the scrubber to a string column (UTF-8 encode → scrub →
    lossy decode), vectorized in one Arrow pass."""
    import pandas as pd  # noqa: F401 — resolved by the hint lookup
    from pyspark.sql.functions import pandas_udf

    # annotations are strings under `from __future__ import
    # annotations`; pyspark resolves them via the function's globals
    globals().setdefault("pd", pd)

    @pandas_udf("string")
    def fn(col_s: pd.Series) -> pd.Series:
        return col_s.map(
            lambda s: scrub((s or "").encode("utf-8", "surrogatepass"),
                            scrubbing).decode("utf-8", "replace")
        )

    return df.withColumn(out or col, fn(df[col]))
