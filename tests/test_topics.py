"""Topic-file readers — channel_trec.c / channel_inex.c parity."""

from atire_spark.topics import (
    _cas_clean,
    _co_clean,
    _trec_clean,
    read_inex_topics,
    read_trec_topics,
)

TREC_TOPICS = """<top>
<num> Number: 051
<title> Topic: Airbus Subsidies

<desc> Description:
Document will discuss government assistance to Airbus Industrie,
or mention a trade dispute between Airbus and a U.S. aircraft
producer over the issue of subsidies.
<narr> Narrative: ignored unless selected
</top>
<top>
<num> Number: 052
<title> Topic: South African Sanctions
</top>
"""


class TestTrecReader:
    def test_title_only(self):
        got = read_trec_topics(TREC_TOPICS, tags="t")
        # "<title> Topic: ..." keeps only the text after the colon
        # (channel_trec.c:262-265)
        assert got == [
            (51, "airbus subsidies"),
            (52, "south african sanctions"),
        ]

    def test_title_and_description_with_continuations(self):
        got = dict(read_trec_topics(TREC_TOPICS, tags="td"))
        q = got[51]
        assert q.startswith("airbus subsidies")
        assert "government assistance to airbus industrie" in q
        # "U.S." -> "u s  " (runs emit one space each, the '.'s drop,
        # the real space survives; no collapse — strip is ends-only)
        assert "u s  aircraft" in q
        assert "ignored" not in q

    def test_clueweb_topic_number_form(self):
        text = (
            '<topic number="7" type="faceted">\n'
            "<query>low cost airlines</query>\n"
            "</topic>\n"
        )
        assert read_trec_topics(text, tags="q") == [
            (7, "low cost airlines")
        ]

    def test_clean_drops_first_punct_char_of_a_run(self):
        # channel_trec.c:151-160: from++ precedes the space-emitting
        # loop, so a single punct char vanishes entirely
        assert _trec_clean("a-b") == "a b"  # '-' dropped, spaces from runs
        assert _trec_clean("U.S.") == "u s"
        assert _trec_clean("x  (42)") == "x   42"


INEX_TOPICS = """<inex-topic-file>
<topic id="2009001" ct_no="186">
  <title>Nobel prize</title>
  <castitle>//article[about(., Nobel prize)]</castitle>
  <description>information about Nobel prize</description>
  <narrative>I need to prepare a presentation.</narrative>
</topic>
<topic id="2009-Eff-228" ct_no="9">
  <title>efficiency topic</title>
</topic>
</inex-topic-file>
"""


class TestInexReader:
    def test_title_co_clean(self):
        got = read_inex_topics(INEX_TOPICS, tags="t")
        assert got == [
            (2009001, "nobel prize"),
            (228, "efficiency topic"),
        ]

    def test_castitle_cas_clean(self):
        got = dict(read_inex_topics(INEX_TOPICS, tags="c"))
        # //article[about(., Nobel prize)]: target element uppercased,
        # 'about' blanked, search terms lowercased
        assert got[2009001] == "ARTICLE nobel prize"

    def test_description_tag(self):
        got = dict(read_inex_topics(INEX_TOPICS, tags="d"))
        assert got[2009001] == "information about nobel prize"

    def test_reference_topic_file_parses(self):
        # the reference's own INEX 2009 topic file
        with open("/root/reference/evaluation/INEX-2009-topics.xml") as fh:
            text = fh.read()
        got = read_inex_topics(text, tags="t")
        assert len(got) >= 50
        assert got[0] == (2009001, "nobel prize")
        assert all(q == q.lower() for _, q in got)

    def test_cas_support_elements_uppercase(self):
        # support element path before the comma is uppercased
        s = "//sec[about(.//title, hello)]"
        out = _cas_clean(s)
        assert "SEC" in out and "TITLE" in out and "hello" in out

    def test_co_clean_collapses(self):
        assert _co_clean("A  B-c") == "a b c"
