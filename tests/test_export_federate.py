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

BATCH = [(1, "alpha"), (2, "term00001 term00002"), (3, "alpha bravo")]


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
