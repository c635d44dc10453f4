"""atire_merge analogue: merging two independently built indexes must
rank exactly like one build over the concatenated collection."""

import pytest
from pyspark.sql import functions as F

from atire_spark.build import build_index
from atire_spark.merge import merge_indexes
from atire_spark.query import SearchEngine
from atire_spark.synth import make_transcripts


@pytest.fixture(scope="module")
def parts(spark):
    pdf = make_transcripts(160)
    # part conv_ids of the left half sort before the right half, so
    # "merge left+right" and "build over the whole frame" assign the
    # SAME docids (input order = (conv_id, turn_idx) order)
    convs = sorted(pdf["conv_id"].unique())
    half = convs[len(convs) // 2]
    left = pdf[pdf["conv_id"] < half]
    right = pdf[pdf["conv_id"] >= half]
    return pdf, left, right


BATCH = [(1, "alpha"), (2, "00001 00002"), (3, "zzznotaterm")]


class TestMergeIndexes:
    def test_rank_identical_to_monolithic_build(self, spark, parts):
        pdf, left, right = parts
        a = build_index(spark, spark.createDataFrame(left), block_bits=7)
        b = build_index(spark, spark.createDataFrame(right), block_bits=7)
        merged = merge_indexes(
            spark, a, b, block_bits=7, blocks_per_seg=2
        )
        mono = build_index(spark, spark.createDataFrame(pdf), block_bits=7)

        # identical docmap (docid offsets line up with input order)
        got = merged.docmap.orderBy("docid").toPandas()
        want = mono.docmap.orderBy("docid").toPandas()
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))

        # identical global term stats
        gs = (
            merged.postings.select("term", "df", "cf").distinct()
            .orderBy("term").toPandas()
        )
        ws = (
            mono.postings.select("term", "df", "cf").distinct()
            .orderBy("term").toPandas()
        )
        assert gs.equals(ws)

        # rank-identical retrieval
        em = SearchEngine(spark, merged)
        eo = SearchEngine(spark, mono)
        rm = em.search_batch(BATCH, k=15).toPandas()
        ro = eo.search_batch(BATCH, k=15).toPandas()
        cols = ["query_id", "rank", "docid", "rsv_fixed"]
        assert rm[cols].values.tolist() == ro[cols].values.tolist()

    def test_incompatible_indexes_rejected(self, spark, parts):
        _, left, right = parts
        a = build_index(spark, spark.createDataFrame(left))
        bq = build_index(
            spark, spark.createDataFrame(right), quantize_bits=8
        )
        with pytest.raises(ValueError, match="quantized"):
            merge_indexes(spark, a, bq)
        bs = build_index(
            spark, spark.createDataFrame(right), stemmer="porter"
        )
        with pytest.raises(ValueError, match="stemmer"):
            merge_indexes(spark, a, bs)


def test_merged_cf_exact_past_tf_saturation(spark):
    """Stored postings saturate tf at 255; merged global cf must come
    from the original segment metadata, not from decoded tfs."""
    import pandas as pd

    left = pd.DataFrame(
        {"conv_id": ["a0"], "turn_idx": [0], "text": ["alpha bravo"]}
    )
    right = pd.DataFrame(
        {
            "conv_id": ["b0"],
            "turn_idx": [0],
            "text": [" ".join(["capterm"] * 300) + " alpha"],
        }
    )
    a = build_index(spark, spark.createDataFrame(left))
    b = build_index(spark, spark.createDataFrame(right))
    merged = merge_indexes(spark, a, b)
    mono = build_index(
        spark, spark.createDataFrame(pd.concat([left, right]))
    )
    gm = {
        r["term"]: (int(r["df"]), int(r["cf"]))
        for r in merged.postings.select("term", "df", "cf").distinct().collect()
    }
    go = {
        r["term"]: (int(r["df"]), int(r["cf"]))
        for r in mono.postings.select("term", "df", "cf").distinct().collect()
    }
    assert gm == go
    assert gm["capterm"] == (1, 300)  # cf uncapped, tf saturated in postings


def test_fold_merge_random_uneven_parts_including_empty(spark):
    """K-way fold-merge over seeded RANDOM uneven split points —
    including a zero-document part (a real occurrence in the
    reference's split recipe when a range of the collection is empty
    or filtered out entirely) — must stay rank-identical to the
    monolithic build."""
    import numpy as np

    pdf = make_transcripts(120)
    convs = sorted(pdf["conv_id"].unique())
    rng = np.random.default_rng(7)
    mono = build_index(spark, spark.createDataFrame(pdf), block_bits=7)
    eo = SearchEngine(spark, mono)
    ro = eo.search_batch(BATCH, k=15).toPandas()
    cols = ["query_id", "rank", "docid", "rsv_fixed"]

    for trial in range(2):
        # 3 cut points -> 4 parts; duplicating a cut makes one part
        # EMPTY (cut[i] == cut[i+1] selects zero conversations)
        cuts = sorted(rng.choice(len(convs), size=3, replace=False))
        if trial == 1:
            cuts[1] = cuts[0]  # force an empty part
        edges = [0, *cuts, len(convs)]
        parts = []
        for lo, hi in zip(edges, edges[1:]):
            keep = set(convs[lo:hi])
            parts.append(pdf[pdf["conv_id"].isin(keep)])
        schema = spark.createDataFrame(pdf).schema
        merged = None
        for p in parts:
            t = build_index(
                spark, spark.createDataFrame(p, schema=schema), block_bits=7
            )
            merged = (
                t
                if merged is None
                else merge_indexes(spark, merged, t, block_bits=7, blocks_per_seg=2)
            )
        em = SearchEngine(spark, merged)
        rm = em.search_batch(BATCH, k=15).toPandas()
        assert rm[cols].values.tolist() == ro[cols].values.tolist(), (
            f"trial {trial} cuts {cuts}"
        )
