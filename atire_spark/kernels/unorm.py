"""Unicode normalize-lowercase — ANT_UNICODE_normalize_lowercase_toutf8.

The reference normalizes every WORD-token character the same way
everywhere (parser.c:182,199 word parsing, pregen_writer_normal.c:201
field packing, channel_trec.c:152 topic reading): decompose the
codepoint into base form + combining marks with its generated
UnicodeData tables, throw the marks away, lowercase
(unicode.c:198-257).  NUMBER tokens and CJK characters are indexed
raw — the parser never routes them through this function
(parser.c:209-216, 251-283).

``unicodedata`` NFKD + combining-class filter reproduces the table:
verified value-identical against the compiled reference's own pregen
writer on a Unicode sweep (tests/test_pregen.py
TestArithVsReferenceBinary) and against the compiled indexer's
vocabulary on a Unicode corpus (tests/test_reference_ab.py).
"""

from __future__ import annotations

import unicodedata

__all__ = ["normalize_lowercase", "normalize_word"]


def normalize_lowercase(ch: str) -> str:
    """One codepoint (unicode.c:213-257): ASCII fast-path tolower;
    otherwise decompose, drop combining marks, lowercase.  Codepoints
    with no decomposition pass through unchanged (the reference
    writes the raw character)."""
    if ch <= "\x7f":
        return ch.lower()
    dec = "".join(
        c for c in unicodedata.normalize("NFKD", ch) if not unicodedata.combining(c)
    )
    return dec.lower() if dec else ch


def normalize_word(tok: str) -> str:
    """A whole WORD token, character by character (the parser's
    normalized_buf accumulation, parser.c:155-203)."""
    if tok.isascii():
        return tok.lower()
    return "".join(normalize_lowercase(ch) for ch in tok)
