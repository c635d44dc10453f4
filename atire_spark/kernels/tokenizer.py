"""Tokenizer with reference-ATIRE parsing semantics for plain text.

Reference rules (/root/reference/source/parser.c:62-365,
/root/reference/source/index_document.c:44-136):

- a WORD token is a maximal run of (Unicode) letters, lowercased /
  normalized; a NUMBER token is a maximal run of (Unicode) decimal
  digits, indexed *raw* (parser.c:209-221, parser_token.h:30 —
  numbers have no normalized form);
- punctuation tokens are emitted but never indexed
  (index_document.c:129-131) — we simply don't emit them;
- tokens whose RAW byte length exceeds MAX_TERM_LENGTH (20*1024,
  atire_api.h:21) are discarded before counting
  (index_document.c:55-56), so they contribute neither postings nor
  document length;
- document length = number of surviving WORD + NUMBER tokens
  (index_document.c:61,118), duplicates included, *before* the per-doc
  tf saturation at 255 (memory_index_hash_node.h:140-143).

Normalization: WORD tokens are normalized character-by-character the
reference's way — decompose, drop combining marks, lowercase
(unicode.c:198-257 via :mod:`atire_spark.kernels.unorm`); NUMBER
tokens and CJK characters are indexed raw (parser.c:209-216,251-283).
The batch path keeps the pure-ASCII fast path (one vectorized
``str.lower``) and routes only tokens containing non-ASCII letters
through the per-character normalize — verified against the compiled
reference's vocabulary on a Unicode corpus
(tests/test_reference_ab.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from atire_spark.kernels.unorm import normalize_word

MAX_TERM_BYTES = 20 * 1024  # atire_api.h:21 MAX_TERM_LENGTH

# CJK codepoint ranges, exactly the reference's is_cjk_language
# (unicode.c:596-634 — ischinese || iskorean || isjapanese).  The
# reference classifies these CT_OTHER, never CT_LETTER, so letter
# runs must not swallow them (parser.c:141,251).
_CJK = (
    "㐀-䶿"  # CJK Unified Ideographs Extension A
    "一-鿿"  # CJK Unified Ideographs
    "豈-﫿"  # CJK Compatibility Ideographs
    "\U00020000-\U0002a6df"  # CJK Unified Ideographs Extension B
    "\U0002f800-\U0002fa1f"  # CJK Compatibility Ideographs Supplement
    "ᄀ-ᇿ"  # Hangul Jamo
    "가-힣"  # Hangul Syllables
    "㄰-㆏"  # Hangul Compatibility Jamo
    "ꥠ-꥿"  # Hangul Jamo Extended-A
    "ힰ-퟿"  # Hangul Jamo Extended-B
    "぀-ゟ"  # Hiragana
    "゠-ヿ"  # Katakana
)

# one CJK char per token (parser.c:251-258 unsegmented default), or a
# letter run with CJK excluded, or a decimal-digit run
_TOKEN_RE = re.compile(
    rf"[{_CJK}]|(?:(?![{_CJK}])[^\W\d_])+|\d+", re.UNICODE
)
# bigram mode scans whole CJK runs first, expanded in Python
_TOKEN_RUN_RE = re.compile(
    rf"[{_CJK}]+|(?:(?![{_CJK}])[^\W\d_])+|\d+", re.UNICODE
)
_CJK_RUN_RE = re.compile(rf"^[{_CJK}]+$")


def _cjk_bigrams(run: str) -> list[str]:
    """BIGRAM_SEGMENTATION over one CJK run (parser.c:259-283):
    overlapping 2-char windows, the scan stepping back one char after
    each token, so run "abc" → ab, bc, c (the trailing char is its own
    token) and a 1-char run is itself."""
    if len(run) == 1:
        return [run]
    return [run[i : i + 2] for i in range(len(run) - 1)] + [run[-1]]


def dict_segmenter(dictionary, max_word_len: int | None = None):
    """Dictionary-driven CJK segmenter — the ONFLY_SEGMENTATION plugin
    slot (parser.c:27-29,53-60: the plugin receives a CJK run and
    returns a space-separated token list; everything else about the
    tokenization is unchanged).

    Greedy forward longest-match against ``dictionary`` (a set of
    words); characters that begin no dictionary word fall back to
    single-char tokens, so the unsegmented default is the identity
    dictionary. The returned callable is what ``cjk_segmenter``
    parameters accept — any ``str → list[str]`` plugin works.

    The dictionary ships inside the task closure; keep it modest or
    wrap it in a Spark broadcast at very large sizes."""
    words = frozenset(dictionary)
    longest = max_word_len or (max((len(w) for w in words), default=1))

    def segment(run: str) -> list[str]:
        out, i, n = [], 0, len(run)
        while i < n:
            for ln in range(min(longest, n - i), 1, -1):
                if run[i : i + ln] in words:
                    out.append(run[i : i + ln])
                    i += ln
                    break
            else:
                out.append(run[i])
                i += 1
        return out

    return segment


# combining marks (category M*) are neither CT_LETTER nor CT_NUMBER in
# the reference's generated tables: a standalone mark (NFD text) ENDS
# the current letter run and is skipped — verified against the compiled
# indexer's vocabulary ("cégurei" indexes as ce + gurei, while
# precomposed "cégurei" is one letter run normalizing to cegurei).
# Replacing marks with a separator before the token scan reproduces
# that exactly; built lazily from unicodedata (once per process).
_MARK_RE_CACHE: list = []


def _mark_re():
    if not _MARK_RE_CACHE:
        import sys
        import unicodedata

        parts: list[str] = []
        start = None
        prev = None
        for cp in range(0x300, sys.maxunicode + 1):
            is_m = unicodedata.category(chr(cp)).startswith("M")
            if is_m and start is None:
                start = cp
            elif not is_m and start is not None:
                parts.append(f"{chr(start)}-{chr(cp - 1)}")
                start = None
            prev = cp
        if start is not None:
            parts.append(f"{chr(start)}-{chr(prev)}")
        _MARK_RE_CACHE.append(re.compile("[" + "".join(parts) + "]"))
    return _MARK_RE_CACHE[0]


def tokenize(
    text: str | None, cjk_bigrams: bool = False, cjk_segmenter=None
) -> list[str]:
    """Tokenize one string → list of indexable terms (lowercased words,
    raw digit runs, CJK chars — single per token by default,
    overlapping bigrams, or ``cjk_segmenter`` applied to whole CJK
    runs), with the >20KB raw-length drop applied."""
    if not text:
        return []
    if not text.isascii():
        # standalone combining marks terminate letter/number runs and
        # are skipped (see _mark_re) — substitution before the scan is
        # equivalent because a mark never belongs to any token class
        text = _mark_re().sub(" ", text)
    if cjk_bigrams and cjk_segmenter is not None:
        raise ValueError("cjk_bigrams and cjk_segmenter are exclusive")
    out = []
    scan_runs = cjk_bigrams or cjk_segmenter is not None
    toks = (
        _TOKEN_RUN_RE.findall(text) if scan_runs else _TOKEN_RE.findall(text)
    )
    for tok in toks:
        # byte_len <= 4 * char_len, so char_len <= MAX/4 can never exceed
        if len(tok) > MAX_TERM_BYTES // 4 and len(tok.encode("utf-8")) > MAX_TERM_BYTES:
            continue
        if scan_runs and _CJK_RUN_RE.match(tok):
            out.extend(
                _cjk_bigrams(tok) if cjk_bigrams else cjk_segmenter(tok)
            )
        elif tok.isascii():
            out.append(tok.lower())
        elif _CJK_RUN_RE.match(tok):
            out.append(tok)  # CJK is indexed raw (parser.c:251-283)
        else:
            out.append(normalize_word(tok))
    return out


# ASCII rows have no CJK and no Unicode digits/letters, so the token
# grammar collapses to plain byte classes over the pre-lowered text —
# one regex pass per row with zero per-token work (no lower, no
# normalize, no byte-length check: a token cannot outgrow its row)
_ASCII_TOKEN_RE = re.compile(r"[a-z]+|[0-9]+")


def tokenize_flat(
    texts: pd.Series, cjk_bigrams: bool = False, cjk_segmenter=None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch tokenization as a FLAT token stream.

    Returns ``(row_idx, tokens, doc_len)``: ``tokens`` is the
    concatenated per-row token stream (object ndarray), ``row_idx``
    the POSITIONAL row (0..len-1) of each token, and ``doc_len`` the
    per-row surviving token count (WORD+NUMBER, duplicates included).
    The flat shape is what the indexer actually consumes (factorize +
    per-doc counting); :func:`tokenize_batch` regroups it into lists
    for callers that want row-aligned values.

    Fast path: an ASCII row ≤ MAX_TERM_BYTES is lowercased ONCE as a
    whole string and scanned with the byte-class regex — equivalent to
    the full grammar because ASCII has no CJK, no non-ASCII digits,
    and lowercasing cannot move an ASCII token boundary. Everything
    else (non-ASCII, oversized, null) routes through the per-string
    reference-parity :func:`tokenize`.
    """
    if cjk_bigrams and cjk_segmenter is not None:
        raise ValueError("cjk_bigrams and cjk_segmenter are exclusive")
    n = len(texts)
    doc_len = np.zeros(n, dtype=np.int64)
    if n == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=object),
            doc_len,
        )
    findall = _ASCII_TOKEN_RE.findall
    per_row: list[list[str]] = [
        findall(s.lower())
        if (
            isinstance(s, str)
            and len(s) <= MAX_TERM_BYTES
            and s.isascii()
        )
        else tokenize(
            s if isinstance(s, str) else None,
            cjk_bigrams=cjk_bigrams,
            cjk_segmenter=cjk_segmenter,
        )
        for s in texts.to_numpy(dtype=object)
    ]
    counts = np.fromiter((len(t) for t in per_row), dtype=np.int64, count=n)
    np.copyto(doc_len, counts)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    tokens = np.array(
        [t for row in per_row for t in row], dtype=object
    )
    return row_idx, tokens, doc_len


def tokenize_batch(
    texts: pd.Series, cjk_bigrams: bool = False, cjk_segmenter=None
) -> tuple[pd.Series, np.ndarray]:
    """Vectorized batch tokenization (row-aligned view).

    Returns ``(tokens, doc_len)`` where ``tokens`` is a Series of
    list[str] aligned with ``texts`` and ``doc_len`` the per-row
    surviving token count (WORD+NUMBER, duplicates included). Thin
    regrouping over :func:`tokenize_flat` — the indexer consumes the
    flat stream directly and never pays this regroup.
    """
    if not texts.index.is_unique:
        raise ValueError("tokenize_batch requires a unique index")
    row_idx, flat, doc_len = tokenize_flat(
        texts, cjk_bigrams=cjk_bigrams, cjk_segmenter=cjk_segmenter
    )
    if len(texts) == 0:
        return pd.Series([], index=texts.index, dtype=object), doc_len
    bounds = np.cumsum(doc_len)[:-1]
    lists = [list(a) for a in np.split(flat, bounds)]
    return pd.Series(lists, index=texts.index), doc_len


def term_counts(tokens: list[str], tf_cap: int = 255) -> tuple[list[str], list[int]]:
    """Per-document (term, tf) with tf saturated at ``tf_cap``
    (memory_index_hash_node.h:140-143)."""
    if not tokens:
        return [], []
    s = pd.Series(tokens).value_counts()
    tfs = np.minimum(s.to_numpy(), tf_cap)
    return list(s.index), [int(x) for x in tfs]
