"""Stopword removal (PRUNE_STOPWORDS_BEFORE_INDEXING) and
serialise-time term culling (should_prune) semantics."""

import pandas as pd

TRANSCRIPTS = pd.DataFrame(
    {
        "conv_id": ["c0"] * 4,
        "turn_idx": [0, 1, 2, 3],
        "text": [
            "the spark merge of the data",  # stops: the, of
            "the the the",  # all stopwords → still a doc
            "spark data merge merge singletonword",
            "rare data",
        ],
    }
)


def test_stopwords_counted_in_doc_len_but_not_indexed(spark):
    from atire_spark.build import build_index
    from atire_spark.kernels.stopwords import NCBI_STOPWORDS

    assert "the" in NCBI_STOPWORDS and "of" in NCBI_STOPWORDS
    tdf = spark.createDataFrame(TRANSCRIPTS)
    idx = build_index(spark, tdf, stop_before_indexing="ncbi")
    docmap = idx.docmap.orderBy("docid").toPandas()
    # terms_in_document++ precedes the stop check
    # (index_document.c:61,100): lengths count every token
    assert list(docmap["doc_len"]) == [6, 3, 5, 2]
    # the all-stopword doc consumed a docid
    assert len(docmap) == 4
    terms = {r["term"] for r in idx.postings.select("term").collect()}
    assert "the" not in terms and "of" not in terms
    assert {"spark", "data", "merge"} <= terms
    # collection stats include the stopped tokens
    stats = idx.stats.collect()[0]
    assert stats["collection_len"] == 16


def test_stopped_search_matches_plain_for_nonstop_query(spark):
    """A no-stopword query over the stopped index ranks identically to
    hand math: doc lengths (with stops) drive the BM25 prior."""
    from atire_spark.build import build_index
    from atire_spark.oracle import OracleIndex
    from atire_spark.query import SearchEngine

    tdf = spark.createDataFrame(TRANSCRIPTS)
    idx = build_index(spark, tdf, stop_before_indexing="ncbi")
    eng = SearchEngine(spark, idx)
    got = eng.search_one("merge data", k=10).toPandas()
    # oracle equivalent: full lengths, stop terms absent from postings
    oi = OracleIndex.build(TRANSCRIPTS)
    for t in list(oi.postings):
        from atire_spark.kernels.stopwords import NCBI_STOPWORDS

        if t in NCBI_STOPWORDS:
            del oi.postings[t]
    want = oi.search("merge data", k=10)
    assert list(got["docid"]) == list(want["docid"])
    assert list(got["rsv_fixed"]) == list(want["rsv_fixed"])


def test_culling_predicates(spark):
    from atire_spark.build import build_index

    tdf = spark.createDataFrame(TRANSCRIPTS)
    # cf==1 culls singletonword + rare; df/N >= 0.75 culls data (3/4);
    # stoplist culls the/of
    idx = build_index(
        spark,
        tdf,
        cull_cf_singletons=True,
        cull_df_proportion=0.75,
        cull_stoplist="ncbi",
    )
    terms = {r["term"] for r in idx.postings.select("term").collect()}
    assert "singletonword" not in terms  # cf == 1
    assert "rare" not in terms  # cf == 1
    assert "data" not in terms  # df/N = 0.75 >= 0.75
    assert "the" not in terms and "of" not in terms  # stoplist
    assert {"spark", "merge"} <= terms
    # dictionary (term_stats-derived unique_terms) reflects the cull,
    # doc lengths / collection stats do not
    stats = idx.stats.collect()[0]
    assert stats["collection_len"] == 16
    assert int(stats["unique_terms"]) == len(terms)


def test_cull_df_max(spark):
    from atire_spark.build import build_index

    tdf = spark.createDataFrame(TRANSCRIPTS)
    idx = build_index(spark, tdf, cull_df_max=1)
    terms = {r["term"] for r in idx.postings.select("term").collect()}
    # df<=1 culls everything appearing in exactly one doc
    assert "singletonword" not in terms and "rare" not in terms
    assert "of" not in terms  # df == 1
    assert {"the", "spark", "data", "merge"} <= terms
