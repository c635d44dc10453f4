"""Run-file exporters (TREC / INEX snippet) and broker-style
federated search.

TREC lines per atire_engine_result_set_export_TREC.c:43-49; INEX
snippet XML per atire_engine_result_set_export_INEX_snippet.c:36-108;
broker merge semantics (virtual docid offsets, rsv-desc /
lowest-global-docid tie-break, cumulative routing) per
atire_broke.c:168-226 and atire_engine_result_set.c:141-165.
"""

import pandas as pd
import pytest

from atire_spark.build import build_index
from atire_spark.export import export_inex_snippet, export_trec
from atire_spark.federate import (
    doc_counts,
    federated_route,
    search_federated,
)
from atire_spark.query import SearchEngine
from atire_spark.synth import make_transcripts

BATCH = [(1, "alpha"), (2, "00001 00002"), (3, "alpha bravo")]


@pytest.fixture(scope="module")
def engine(spark):
    pdf = make_transcripts(120)
    idx = build_index(spark, spark.createDataFrame(pdf))
    return SearchEngine(spark, idx)


class TestTrecExport:
    def test_lines_match_materialized_results(self, spark, engine):
        res = engine.search_batch(BATCH, k=5)
        mat = engine.materialize(res)
        lines = export_trec(mat, run_name="atire_spark").toPandas()
        want = mat.toPandas()
        assert len(lines) == len(want)
        merged = lines.merge(want, on=["query_id", "rank"])
        for _, r in merged.iterrows():
            assert r["line"] == (
                f"{r.query_id} Q0 {r.conv_id}:{r.turn_idx} "
                f"{r['rank']} {r.rsv_fixed} atire_spark"
            )

    def test_paging_keeps_absolute_rank(self, spark, engine):
        # atire_engine_result_set_export_TREC.c:38-42: rank printed
        # is current+1 in the full list, not renumbered per page
        res = engine.search_batch(BATCH, k=5)
        mat = engine.materialize(res)
        page = export_trec(mat, first=3, page_length=2).toPandas()
        assert sorted(page["rank"].unique()) == [3, 4]
        for _, r in page.iterrows():
            assert f" {r['rank']} " in r["line"]


class TestInexSnippetExport:
    def test_document_structure_and_order(self, spark, engine):
        res = engine.search_batch(BATCH[:2], k=3)
        mat = engine.materialize(res)
        doc = (
            export_inex_snippet(mat, "otago", "run1", "desc")
            .orderBy("qid", "r")
            .toPandas()["line"]
            .tolist()
        )
        assert doc[0] == (
            '<inex-snippet-submission participant-id="otago" run-id="run1">'
        )
        assert doc[1] == "<description>desc</description>"
        assert doc[-1] == "</inex-snippet-submission>"
        # one <topic> block per query, snippets in rank order inside
        body = doc[2:-1]
        assert body[0] == '<topic topic-id="1">'
        n_res = len(mat.filter("query_id = 1").toPandas())
        assert body[1 + n_res] == "</topic>"
        assert body[1].startswith('   <snippet rsv="')

    def test_doc_id_strips_dirs_and_extension(self, spark):
        # atire_engine_result_set_export_INEX_snippet.c:61-82
        mat = spark.createDataFrame(
            [(1, 1, 7, "a/b", 9, 12, 0.12), (1, 2, 8, "c", 4, 10, 0.10)],
            "query_id LONG, rank INT, docid LONG, conv_id STRING, "
            "turn_idx INT, rsv_fixed LONG, rsv DOUBLE",
        )
        # conv_id with a slash and the :turn suffix (no '.'): strips
        # to the last path component; a '.' would truncate there
        doc = (
            export_inex_snippet(mat)
            .orderBy("qid", "r")
            .toPandas()["line"]
            .tolist()
        )
        assert '   <snippet rsv="12" doc-id="b:9"></snippet>' in doc
        assert '   <snippet rsv="10" doc-id="c:4"></snippet>' in doc


class TestFocusToInex:
    def test_tags_excluded_entities_count_one(self):
        # search_engine_forum_INEX.c:38-100 hand vector
        from atire_spark.focus import focus_to_inex

        doc = "<doc><p>hello &amp; world</p></doc>"
        w = doc.index("world")
        s, f = focus_to_inex(doc, w, w + 5)
        # the C updates INEX_* with the offset BEFORE counting the
        # current char and only while current < span pointer
        # (forum_INEX.c:54-57), so start lands on the offset recorded
        # at the space preceding 'world': "hello " (6) + entity (1)
        # = 7, and finish at the offset before 'd' is counted = 12
        assert (s, f) == (7, 12)

    def test_whole_document_span(self):
        from atire_spark.focus import focus_to_inex

        doc = "<doc><p>ab cd</p></doc>"
        s, f = focus_to_inex(doc, 0, len(doc))
        assert s == 0 and f == 5  # "ab cd"


class TestInexElementAndEfficiency:
    @pytest.fixture(scope="class")
    def mat(self, spark, engine):
        res = engine.search_batch(BATCH[:2], k=3)
        return engine.materialize(res)

    def test_element_submission_structure(self, spark, mat):
        from atire_spark.export import export_inex_element

        doc = (
            export_inex_element(mat, "otago", "r1", "adhoc")
            .orderBy("qid", "r")
            .toPandas()["line"]
            .tolist()
        )
        assert doc[0].startswith(
            '<inex-submission participant-id="otago" run-id="r1" '
            'task="adhoc"'
        )
        assert "<collection>wikipedia</collection>" in doc
        assert doc[-1] == "</inex-submission>"
        i = doc.index('<topic topic-id="1">')
        # first result block: 0-based rank (forum_INEX.c:131)
        assert doc[i + 1] == "<result>"
        assert doc[i + 3] == "<path>/article[1]</path>"
        assert doc[i + 4] == "<rank>0</rank></result>"

    def test_efficiency_timings_and_surrogate_rsv(self, spark, mat):
        from atire_spark.export import export_inex_efficiency

        stats = spark.createDataFrame(
            [(1, 12, 3, 4096), (2, 7, 1, 512)],
            "query_id LONG, cpu_time_ms LONG, io_time_ms LONG, "
            "io_bytes LONG",
        )
        doc = (
            export_inex_efficiency(mat, "otago", "r1", 3, stats)
            .orderBy("qid", "r")
            .toPandas()["line"]
            .tolist()
        )
        assert 'topk = "3"' in doc[0]
        hdr = [ln for ln in doc if ln.startswith('<topic topic-id = "1"')]
        assert hdr and 'total_time_ms = "15"' in hdr[0]
        assert 'cpu_time_ms = "12"' in hdr[0]
        # the reference's literal stray '>' (forum_INEX_efficiency.c:100)
        assert "<path>/article[1]></path>" in doc
        # first result of topic 1: rsv = hits - which = 3 - 0
        i = doc.index(hdr[0])
        assert doc[i + 5] == "<rsv>3</rsv></result>"
        assert doc[-1] == "</efficiency-submission>"


class TestInexFocusExport:
    def test_focus_and_bep_lines(self, spark, engine):
        from atire_spark.export import export_inex_focus
        from atire_spark.focus import focus_results

        from atire_spark.synth import make_transcripts

        res = engine.search_batch([(1, "alpha")], k=3)
        qset = [(1, "alpha")]
        # the same deterministic corpus the engine fixture indexed
        corpus = spark.createDataFrame(make_transcripts(120))
        foc = focus_results(
            res,
            engine.index.docmap,
            corpus,
            qset,
            inex_offsets=True,
        )
        lines = export_inex_focus(
            foc, engine.index.docmap, run_id="run9"
        ).toPandas()
        assert len(lines) == 3
        fp = foc.toPandas().set_index("rank")
        for _, r in lines.iterrows():
            parts = r["line"].split(" ")
            rank = int(parts[3])
            # topic Q0 name rank hits-which run start finish
            assert parts[0] == "1" and parts[1] == "Q0"
            assert int(parts[4]) == 3 - (rank - 1)
            assert parts[5] == "run9"
            assert int(parts[6]) == fp.loc[rank, "inex_start"]
            assert int(parts[7]) == fp.loc[rank, "inex_finish"]
        bep = export_inex_focus(
            foc, engine.index.docmap, run_id="run9", bep=True
        ).toPandas()
        assert all(len(l.split(" ")) == 7 for l in bep["line"])


@pytest.fixture(scope="module")
def shards(spark):
    pdf = make_transcripts(160)
    convs = sorted(pdf["conv_id"].unique())
    half = convs[len(convs) // 2]
    left = pdf[pdf["conv_id"] < half]
    right = pdf[pdf["conv_id"] >= half]
    ea = SearchEngine(spark, build_index(spark, spark.createDataFrame(left)))
    eb = SearchEngine(spark, build_index(spark, spark.createDataFrame(right)))
    return ea, eb


class TestFederatedSearch:
    def test_merge_matches_reference_semantics(self, spark, shards):
        ea, eb = shards
        k = 10
        got = search_federated([ea, eb], BATCH, k=k).toPandas()

        # oracle: merge the two LOCAL result sets in pandas with the
        # broker's offset + sort rules
        na = doc_counts([ea])[0]
        ra = ea.search_batch(BATCH, k=k).toPandas()
        rb = eb.search_batch(BATCH, k=k).toPandas()
        rb = rb.assign(docid=rb.docid + na)
        allr = pd.concat([ra, rb], ignore_index=True)
        want_rows = []
        for qid in sorted({q for q, _ in BATCH}):
            sub = allr[allr.query_id == qid].sort_values(
                ["rsv_fixed", "docid"], ascending=[False, True]
            )
            for rank, (_, r) in enumerate(sub.head(k).iterrows(), 1):
                want_rows.append((qid, rank, r.docid, r.rsv_fixed))
        want = pd.DataFrame(
            want_rows, columns=["query_id", "rank", "docid", "rsv_fixed"]
        )
        got = got[["query_id", "rank", "docid", "rsv_fixed"]].reset_index(
            drop=True
        )
        assert got.astype("int64").equals(want.astype("int64"))

    def test_local_statistics_documented_divergence(self, spark, shards):
        # the broker does NOT recompute global df/N — shard-local
        # scores merge as-is; this pins that the federation is the
        # broker semantics, not a statistics-identical global rebuild
        ea, eb = shards
        fed = search_federated([ea, eb], [(1, "alpha")], k=5).toPandas()
        assert len(fed) == 5
        assert (fed["rank"] == range(1, 6)).all()

    def test_route_walks_cumulative_counts(self, spark, shards):
        ea, eb = shards
        na, nb = doc_counts([ea, eb])
        assert federated_route([ea, eb], 0) == (0, 0)
        assert federated_route([ea, eb], na - 1) == (0, na - 1)
        assert federated_route([ea, eb], na) == (1, 0)
        assert federated_route([ea, eb], na + nb - 1) == (1, nb - 1)
        with pytest.raises(IndexError):
            federated_route([ea, eb], na + nb)
