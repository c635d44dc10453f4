"""INEX focusing parity (focus_lowest_tag.c:13-92 semantics).

Expected passages hand-derived from the C scan: start = '<' of the
open tag immediately before the first query-term hit; finish = end of
the first close tag after the last hit; no match -> whole document;
a trailing hit with no following close tag keeps the previous finish.
"""

from __future__ import annotations

import pytest

from atire_spark.focus import focus_article, focus_passage, tag_document

DOC = "<doc><p>alpha beta gamma</p><p>delta epsilon zeta</p></doc>"


def test_single_hit_bounds_to_enclosing_paragraph():
    s, f = focus_passage(DOC, {"beta"})
    assert DOC[s:f] == "<p>alpha beta gamma</p>"


def test_hits_spanning_paragraphs():
    s, f = focus_passage(DOC, {"beta", "epsilon"})
    assert DOC[s:f] == "<p>alpha beta gamma</p><p>delta epsilon zeta</p>"


def test_no_match_returns_whole_document():
    assert focus_passage(DOC, {"missing"}) == (0, len(DOC))


def test_match_before_any_tag_starts_at_document():
    doc = "alpha <p>beta</p>"
    s, f = focus_passage(doc, {"alpha"})
    assert (s, doc[s:f]) == (0, "alpha <p>beta</p>")


def test_trailing_match_without_close_keeps_previous_finish():
    # the C consumes find_last only on a close tag; 'zeta' after the
    # last close leaves finish at </p>'s end
    doc = "<p>alpha</p> zeta"
    s, f = focus_passage(doc, {"alpha", "zeta"})
    assert doc[s:f] == "<p>alpha</p>"


def test_numbers_match_raw():
    doc = "<p>build 42 shipped</p>"
    s, f = focus_passage(doc, {"42"})
    assert doc[s:f] == "<p>build 42 shipped</p>"


def test_case_normalization_on_words():
    doc = "<p>Alpha BETA</p>"
    s, f = focus_passage(doc, {"beta"})
    assert doc[s:f] == "<p>Alpha BETA</p>"


def test_start_tracks_last_open_tag_before_first_hit():
    doc = "<doc><p>one two</p><sec><p>three hit</p></sec></doc>"
    s, f = focus_passage(doc, {"hit"})
    assert doc[s:f] == "<p>three hit</p>"


def test_focus_article_is_whole_document():
    assert focus_article(DOC, {"beta"}) == (0, len(DOC))


def test_tag_document_is_deterministic_and_grouped():
    text = " ".join(f"w{i}" for i in range(10))
    tagged = tag_document(text)
    assert tagged.startswith("<doc><p>w0 ")
    assert tagged.count("<p>") == 2  # 8 + 2 tokens
    assert tagged.endswith("</p></doc>")
    assert tagged == tag_document(text)


@pytest.mark.parametrize(
    "doc,terms,expect",
    [
        # close tag between hits updates finish, later hit extends it
        ("<p>a hit</p><p>hit b</p><p>c</p>", {"hit"},
         "<p>a hit</p><p>hit b</p>"),
        # open tags inside the span do not move start
        ("<p>hit <b>x</b> hit</p>", {"hit"}, "<p>hit <b>x</b> hit</p>"),
    ],
)
def test_scan_order_cases(doc, terms, expect):
    s, f = focus_passage(doc, terms)
    assert doc[s:f] == expect


def test_focus_results_end_to_end(spark):
    """search -> focus_results passage extraction over the engine."""
    from atire_spark.build import build_index
    from atire_spark.focus import focus_results
    from atire_spark.query import SearchEngine
    from atire_spark.synth import make_transcripts

    tdf = spark.createDataFrame(make_transcripts("tiny"))
    idx = build_index(spark, tdf)
    eng = SearchEngine(spark, idx)
    queries = [(1, "alpha window")]
    topk = eng.search_batch(queries, k=5)
    out = focus_results(topk, idx.docmap, tdf, queries).toPandas()
    assert len(out) == 5
    assert (out["finish"] > out["start"]).all()
    # every passage is a substring of its tagged document and contains
    # a query term whenever the document does
    for _, r in out.iterrows():
        assert r["passage"]
        assert r["passage"].startswith("<") or r["start"] == 0
