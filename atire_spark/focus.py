"""INEX focused retrieval: the reference's focus_lowest_tag.

Re-expresses ANT_focus_lowest_tag::focus()
(source/focus_lowest_tag.c:13-92) and the trivial whole-article
focuser (source/focus_article.c): given a ranked document and the
query's term set, the focused passage runs from the opening tag
immediately preceding the FIRST query-term occurrence to the end of
the closing tag immediately following the LAST occurrence (with the
reference's exact edge behavior: no match -> the whole document; a
trailing match with no closing tag after it leaves the previous
finish in place).

The transcript corpus is untagged, so :func:`tag_document` supplies a
deterministic tagged rendering (``<doc><p>…</p>…</doc>`` with eight
tokens per paragraph) — the focusing machinery itself is faithful and
would run unchanged over a natively tagged (INEX/Wikipedia) corpus.

Spark shape: focusing is a per-(query, doc) map over the top-k join —
no shuffle beyond the docmap/documents joins the materialisation step
already performs; passages never cross documents, so the operator
scales as rows(top-k × queries).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from atire_spark.kernels.tokenizer import tokenize
from atire_spark.query import parse_query

# a tag token, open or close; attribute-free synthetic tags and the
# reference parser's TT_TAG_OPEN/TT_TAG_CLOSE both anchor on '<'
_TAG_RE = re.compile(r"<(/?)[A-Za-z][^>]*>")
# letter runs and digit runs are separate tokens (parser.c:209-221)
_WORD_RE = re.compile(r"[^\W\d_]+|\d+", re.UNICODE)

TOKENS_PER_P = 8  # synthetic paragraph width for tag_document


def tag_document(text: str) -> str:
    """Deterministic tagged rendering of an untagged document."""
    toks = text.split()
    paras = [
        " ".join(toks[i:i + TOKENS_PER_P])
        for i in range(0, len(toks), TOKENS_PER_P)
    ]
    return "<doc>" + "".join(f"<p>{p}</p>" for p in paras) + "</doc>"


def focus_passage(document: str, terms) -> tuple[int, int]:
    """(start, finish) character offsets of the focused passage, with
    focus_lowest_tag.c's scan order and edge cases."""
    terms = set(terms)
    start = 0
    finish = 0  # the C's "== document" sentinel
    last_open = None
    found_first = False
    find_last = False

    pos = 0
    n = len(document)
    while pos < n:
        m = _TAG_RE.match(document, pos)
        if m is not None:
            if m.group(1):  # close tag
                if find_last:
                    find_last = False
                    finish = m.end()
            else:  # open tag
                if not found_first:
                    last_open = m.start()
            pos = m.end()
            continue
        w = _WORD_RE.match(document, pos)
        if w is not None:
            tok = w.group(0)
            norm = tok if tok.isdigit() else tok.lower()
            if norm in terms:
                found_first = True
                find_last = True
            pos = w.end()
            continue
        pos += 1

    if not found_first:
        return 0, n
    if last_open is not None:
        start = last_open
    if finish == 0:
        finish = n
    return start, finish


def focus_article(document: str, terms) -> tuple[int, int]:
    """focus_article.c: the whole document is the passage."""
    return 0, len(document)


_FOCUSERS = {"lowest_tag": focus_passage, "article": focus_article}


def focus_to_inex(document: str, start: int, finish: int) -> tuple[int, int]:
    """Convert passage offsets to INEX character offsets — counted in
    characters EXCLUDING XML tags, with each entity reference counted
    as one character (ANT_search_engine_forum_INEX::focus_to_INEX,
    source/search_engine_forum_INEX.c:38-100).  The mirror walks
    Python characters where the C walks UTF-8 byte groups — the same
    unit, since ``utf8_bytes`` advances exactly one code point.

    Faithful quirks: counting starts at the first ``<`` not followed
    by ``!``/``?`` (:47-49); an entity terminated by a space consumes
    the space without counting it (:69-79); the per-character
    comparisons are strict ``<`` against the span pointers (:54-57),
    so a span that starts mid-tag resolves to the count at the tag's
    first character."""
    inex_start = inex_finish = offset = 0
    i, n = 0, len(document)
    while i < n:
        if document[i] == "<" and i + 1 < n and document[i + 1] not in "!?":
            break
        i += 1
    while i < n:
        if i < start:
            inex_start = offset
        if i < finish:
            inex_finish = offset
        c = document[i]
        if c == "<":
            while i < n and document[i] != ">":
                i += 1
            if i < n:
                i += 1
        elif c == "&":
            while i < n and document[i] not in " ;":
                i += 1
            offset += 1
            if i < n:
                i += 1
        else:
            offset += 1
            i += 1
    return inex_start, inex_finish


def focus_results(
    results: DataFrame,
    docmap: DataFrame,
    documents: DataFrame,
    queries: list[tuple[int, str]],
    mode: str = "lowest_tag",
    tagger=tag_document,
    inex_offsets: bool = False,
) -> DataFrame:
    """Focus a top-k result frame: join the doc repository, render the
    tagged form, and extract the per-hit passage distributed (one
    Arrow batch pass; no driver materialisation).

    ``inex_offsets=True`` adds ``inex_start``/``inex_finish`` —
    tag-excluded character offsets computed by :func:`focus_to_inex`
    inside the same batch pass (the tagged rendering never leaves the
    executor) — for the BEP / focused run exporters."""
    import pandas as pd

    focuser = _FOCUSERS[mode]
    # query-side terms come from the NEXI CO parse (the reference
    # focuses the parsed query terms, not a re-tokenization)
    term_sets = {
        qid: frozenset(t for t, _ in parse_query(text))
        for qid, text in queries
    }

    joined = (
        results.join(docmap, "docid")
        .join(documents, ["conv_id", "turn_idx"])
        .select("query_id", "rank", "docid", "rsv_fixed", "text")
    )

    def fn(batches):
        for pdf in batches:
            tagged = [tagger(t) for t in pdf["text"]]
            spans = [
                focuser(doc, term_sets.get(int(q), frozenset()))
                for doc, q in zip(tagged, pdf["query_id"])
            ]
            out = {
                "query_id": pdf["query_id"],
                "rank": pdf["rank"],
                "docid": pdf["docid"],
                "rsv_fixed": pdf["rsv_fixed"],
                "start": [s for s, _ in spans],
                "finish": [f for _, f in spans],
                "passage": [
                    doc[s:f] for doc, (s, f) in zip(tagged, spans)
                ],
            }
            if inex_offsets:
                conv = [
                    focus_to_inex(doc, s, f)
                    for doc, (s, f) in zip(tagged, spans)
                ]
                out["inex_start"] = [a for a, _ in conv]
                out["inex_finish"] = [b for _, b in conv]
            yield pd.DataFrame(out)

    schema = (
        "query_id long, rank int, docid long, rsv_fixed long,"
        " start int, finish int, passage string"
    )
    if inex_offsets:
        schema += ", inex_start long, inex_finish long"
    return joined.mapInPandas(fn, schema=schema)
