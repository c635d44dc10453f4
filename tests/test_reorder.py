"""atire_reorder analogue: rewriting the index under a docid
permutation must leave per-document scores identical and the docmap
consistently remapped (atire_reorder.c:382-560)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from atire_spark.build import build_index
from atire_spark.query import SearchEngine
from atire_spark.reorder import order_from_doclist, reorder_index
from atire_spark.synth import make_transcripts

BATCH = [(1, "alpha"), (2, "00001 00002"), (3, "alpha bravo")]


@pytest.fixture(scope="module")
def setup(spark):
    pdf = make_transcripts(140)
    idx = build_index(spark, spark.createDataFrame(pdf))
    n = idx.stats.collect()[0]["documents"]
    rng = np.random.RandomState(7)
    perm = rng.permutation(n)
    mapping = spark.createDataFrame(
        pd.DataFrame(
            {"docid": np.arange(n, dtype=np.int64),
             "new_docid": perm.astype(np.int64)}
        )
    )
    re_idx = reorder_index(spark, idx, mapping)
    return idx, re_idx, mapping, n


class TestReorderIndex:
    def test_docmap_is_the_permuted_original(self, spark, setup):
        idx, re_idx, mapping, n = setup
        want = (
            idx.docmap.join(mapping, "docid")
            .select(
                F.col("new_docid").alias("docid"),
                "conv_id", "turn_idx", "doc_len",
            )
            .orderBy("docid")
            .toPandas()
        )
        got = re_idx.docmap.orderBy("docid").toPandas()
        assert got.reset_index(drop=True).equals(
            want.reset_index(drop=True)
        )

    def test_scores_permutation_invariant(self, spark, setup):
        idx, re_idx, mapping, n = setup
        m = {
            r["docid"]: r["new_docid"] for r in mapping.collect()
        }
        k = n  # full ranking: per-doc score equality, no tie-break noise
        orig = SearchEngine(spark, idx).search_batch(BATCH, k=k).toPandas()
        reord = (
            SearchEngine(spark, re_idx).search_batch(BATCH, k=k).toPandas()
        )
        for qid in {q for q, _ in BATCH}:
            a = orig[orig.query_id == qid]
            b = reord[reord.query_id == qid]
            want = {m[d]: r for d, r in zip(a.docid, a.rsv_fixed)}
            got = dict(zip(b.docid, b.rsv_fixed))
            assert got == want, f"query {qid}: score map diverged"

    def test_topk_rank_identical_modulo_tiebreak(self, spark, setup):
        idx, re_idx, mapping, n = setup
        # within each rsv level the doc SET matches; ordering inside a
        # level follows the new docids (tie-break is docid desc)
        orig = SearchEngine(spark, idx).search_batch(BATCH, k=10).toPandas()
        reord = (
            SearchEngine(spark, re_idx).search_batch(BATCH, k=10).toPandas()
        )
        assert (
            orig.groupby("query_id").rsv_fixed.apply(sorted).to_dict()
            == reord.groupby("query_id").rsv_fixed.apply(sorted).to_dict()
        )

    def test_rejects_non_permutation(self, spark, setup):
        idx, _, _, n = setup
        bad = spark.createDataFrame(
            pd.DataFrame(
                {"docid": np.arange(n, dtype=np.int64),
                 "new_docid": np.zeros(n, dtype=np.int64)}
            )
        )
        with pytest.raises(ValueError, match="not a permutation"):
            reorder_index(spark, idx, bad)

    def test_order_from_doclist(self, spark, setup):
        idx, _, _, n = setup
        # the reference's input: external names in the NEW order
        doclist = idx.docmap.orderBy(F.col("docid").desc()).select(
            "conv_id",
            "turn_idx",
            (F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy(F.col("docid").desc())
            ) - 1).cast("long").alias("new_docid"),
        )
        mapping = order_from_doclist(idx.docmap, doclist)
        got = {r["docid"]: r["new_docid"] for r in mapping.collect()}
        assert got == {d: n - 1 - d for d in range(n)}
