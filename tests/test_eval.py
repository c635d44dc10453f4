"""Evaluation metrics vs hand-computed values (reference semantics:
evaluator.c registry + per-metric files, see eval.py docstrings)."""

import pytest

RESULTS = [
    # query_id, rank, docid
    (1, 1, 10),
    (1, 2, 11),
    (1, 3, 12),
    (1, 4, 13),
    (1, 5, 14),
    # query 2: no relevant retrieved
    (2, 1, 20),
    (2, 2, 21),
]
QRELS = [
    # query_id, docid, relevance (graded; 0 = judged irrelevant)
    (1, 10, 2),
    (1, 12, 1),
    (1, 13, 0),
    (1, 99, 1),  # relevant but never retrieved
    (2, 30, 1),  # query 2 has 1 relevant doc, not retrieved
    (2, 20, 0),
]


@pytest.fixture(scope="module")
def frames(spark):
    r = spark.createDataFrame(RESULTS, "query_id long, rank int, docid long")
    q = spark.createDataFrame(QRELS, "query_id long, docid long, relevance int")
    return r, q


def _one(df, qid, col):
    rows = {int(r["query_id"]): r[col] for r in df.collect()}
    return rows[qid]


def test_map(spark, frames):
    from atire_spark.eval import mean_average_precision

    r, q = frames
    df = mean_average_precision(r, q)
    # q1: hits at rank 1 (1/1) and rank 3 (2/3), / 3 relevant total
    assert _one(df, 1, "average_precision") == pytest.approx((1 + 2 / 3) / 3)
    assert _one(df, 2, "average_precision") == 0.0


def test_p_and_s_at_10(spark, frames):
    from atire_spark.eval import precision_at, success_at

    r, q = frames
    p = precision_at(r, q, 10)
    # 2 relevant in the 5 examined; reference divides by min(examined, n)
    assert _one(p, 1, "precision_at_10") == pytest.approx(2 / 5)
    assert _one(p, 2, "precision_at_10") == 0.0
    s = success_at(r, q, 10)
    assert _one(s, 1, "success_at_10") == 1.0
    assert _one(s, 2, "success_at_10") == 0.0


def test_bpref(spark, frames):
    from atire_spark.eval import bpref

    r, q = frames
    df = bpref(r, q)
    # R=3, N=1, denom = min(3,1) = 1; both relevant retrieved docs see
    # 0 judged-nonrelevant above them → (1 + 1)/3
    assert _one(df, 1, "bpref") == pytest.approx(2 / 3)
    assert _one(df, 2, "bpref") == 0.0


def test_ndcg(spark, frames):
    import math

    from atire_spark.eval import ndcg

    r, q = frames
    df = ndcg(r, q)
    ln2 = math.log(2.0)
    dcg = (2**2 - 1) * 0.5**0 * (ln2 / math.log(2.0)) + (
        (2**1 - 1) * 0.5**2 * (ln2 / math.log(4.0))
    )
    idcg = (
        (2**2 - 1) * 1.0 * (ln2 / math.log(2.0))
        + (2**1 - 1) * 0.5 * (ln2 / math.log(3.0))
        + (2**1 - 1) * 0.25 * (ln2 / math.log(4.0))
    )
    assert _one(df, 1, "ndcg") == pytest.approx(dcg / idcg)
    assert _one(df, 2, "ndcg") == 0.0


def test_err(spark, frames):
    from atire_spark.eval import expected_reciprocal_rank

    r, q = frames
    df = expected_reciprocal_rank(r, q)
    # max judgement 2 → r = (2^rel - 1)/4; judged docs at ranks 1,3,4
    r1 = (2**2 - 1) / 4  # 0.75
    r3 = (2**1 - 1) / 4  # 0.25
    want = r1 * 1.0 / 1 + r3 * (1 - r1) / 3  # rank-4 doc has r=0
    assert _one(df, 1, "err") == pytest.approx(want)
    assert _one(df, 2, "err") == 0.0


def test_evaluate_combined(spark, frames):
    from atire_spark.eval import evaluate

    r, q = frames
    df = evaluate(r, q).toPandas()
    assert set(df.columns) >= {
        "query_id",
        "average_precision",
        "precision_at_10",
        "success_at_10",
        "bpref",
        "ndcg",
        "err",
    }
    assert len(df) == 2


class TestRankEffectiveness:
    """evaluation_rank_effectiveness.c:23-61 hand-computed values."""

    def test_hand_value(self, spark):
        import pandas as pd

        # ranked list: d1(rel) d2(nonrel) d3(unjudged) d4(rel)
        results = spark.createDataFrame(
            pd.DataFrame(
                {
                    "query_id": [1, 1, 1, 1],
                    "rank": [1, 2, 3, 4],
                    "docid": [10, 20, 30, 40],
                }
            )
        )
        qrels = spark.createDataFrame(
            pd.DataFrame(
                {
                    "query_id": [1, 1, 1, 1],
                    "docid": [10, 20, 40, 50],
                    "relevance": [5, 0, 3, 7],
                }
            )
        )
        from atire_spark.eval import rank_effectiveness

        got = rank_effectiveness(results, qrels).collect()[0]
        # total_nonrel=1, n_rel=3; d10: 1-0/1=1; d40: 1-1/1=0 → 1/3
        assert got["rank_effectiveness"] == pytest.approx(1.0 / 3.0)

    def test_all_relevant_scores_one(self, spark):
        import pandas as pd

        results = spark.createDataFrame(
            pd.DataFrame({"query_id": [1], "rank": [1], "docid": [10]})
        )
        qrels = spark.createDataFrame(
            pd.DataFrame(
                {"query_id": [1, 1], "docid": [10, 20], "relevance": [1, 2]}
            )
        )
        from atire_spark.eval import rank_effectiveness

        got = rank_effectiveness(results, qrels).collect()[0]
        assert got["rank_effectiveness"] == 1.0


class TestMagp:
    def test_hand_value(self, spark):
        import pandas as pd

        from atire_spark.eval import magp_document

        results = spark.createDataFrame(
            pd.DataFrame(
                {"query_id": [1, 1], "rank": [1, 2], "docid": [10, 20]}
            )
        )
        # d10: 40 of 100 chars relevant; d20 judged nonrel; one more
        # relevant doc (d30) not retrieved
        qrels = spark.createDataFrame(
            pd.DataFrame(
                {
                    "query_id": [1, 1, 1],
                    "docid": [10, 20, 30],
                    "relevance": [40, 0, 10],
                    "doc_length": [100, 50, 10],
                }
            )
        )
        got = magp_document(results, qrels).collect()[0]
        b2 = 0.25 * 0.25
        p = 0.4
        f = (1 + b2) * p / (b2 * p + 1)
        # precision += f/1 at rank 1; divided by n_rel=2
        assert got["magp"] == pytest.approx(f / 2.0)


class TestIntentAware:
    def test_ia_map_is_mean_over_subtopics(self, spark):
        import pandas as pd

        from atire_spark.eval import intent_aware, mean_average_precision

        results = spark.createDataFrame(
            pd.DataFrame(
                {"query_id": [1, 1], "rank": [1, 2], "docid": [10, 20]}
            )
        )
        # subtopic 0: d10 relevant (AP=1); subtopic 1: d20 relevant
        # (AP=1/2)
        qrels = spark.createDataFrame(
            pd.DataFrame(
                {
                    "query_id": [1, 1],
                    "subtopic": [0, 1],
                    "docid": [10, 20],
                    "relevance": [1, 1],
                }
            )
        )
        got = intent_aware(mean_average_precision, results, qrels).collect()[0]
        assert got["ia_average_precision"] == pytest.approx(0.75)


class TestQrelReaders:
    def test_trec_format(self, spark, tmp_path):
        p = tmp_path / "q.qrels"
        p.write_text("51 0 conv0:0 1\n51 0 conv0:1 0\n52 0 conv1:0 2\n")
        from atire_spark.eval import read_qrels

        df = read_qrels(spark, str(p)).toPandas()
        assert list(df.columns) == ["query_id", "subtopic", "doc", "relevance"]
        assert len(df) == 3
        assert set(df.query_id) == {51, 52}
        assert df[df.doc == "conv1:0"].relevance.iloc[0] == 2

    def test_inex_format_and_docid_resolution(self, spark, tmp_path):
        import pandas as pd

        p = tmp_path / "inex.qrels"
        p.write_text(
            "51 Q0 conv0:0 120 500 10:20\n51 Q0 convX:9 50 100\n"
        )
        from atire_spark.eval import qrels_with_docids, read_qrels

        df = read_qrels(spark, str(p))
        pdf = df.toPandas()
        assert "doc_length" in pdf.columns
        assert pdf.iloc[0].relevance == 120 and pdf.iloc[0].doc_length == 500
        docmap = spark.createDataFrame(
            pd.DataFrame(
                {"docid": [0], "conv_id": ["conv0"], "turn_idx": [0],
                 "doc_len": [7]}
            )
        )
        resolved = qrels_with_docids(df, docmap).toPandas()
        # the assessment naming a document outside the collection drops
        assert len(resolved) == 1 and resolved.iloc[0].docid == 0

    def test_metrics_run_from_file(self, spark, tmp_path):
        import pandas as pd

        from atire_spark.eval import (
            mean_average_precision,
            qrels_with_docids,
            read_qrels,
        )

        p = tmp_path / "t.qrels"
        p.write_text("1 0 c0:0 1\n1 0 c0:1 0\n")
        docmap = spark.createDataFrame(
            pd.DataFrame(
                {"docid": [0, 1], "conv_id": ["c0", "c0"],
                 "turn_idx": [0, 1], "doc_len": [5, 5]}
            )
        )
        qrels = qrels_with_docids(read_qrels(spark, str(p)), docmap)
        results = spark.createDataFrame(
            pd.DataFrame(
                {"query_id": [1, 1], "rank": [1, 2], "docid": [0, 1]}
            )
        )
        got = mean_average_precision(results, qrels).collect()[0]
        assert got["average_precision"] == 1.0


def test_ia_counts_invalid_subtopics_in_denominator(spark):
    """A subtopic with no relevant docs contributes 0 but still counts
    (evaluate() returns 0 with valid=false; the IA wrapper divides by
    number_of_subtopics regardless)."""
    import pandas as pd

    from atire_spark.eval import intent_aware, mean_average_precision

    results = spark.createDataFrame(
        pd.DataFrame({"query_id": [1], "rank": [1], "docid": [10]})
    )
    qrels = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [1, 1],
                "subtopic": [0, 1],
                "docid": [10, 20],
                "relevance": [1, 0],  # subtopic 1: judged-nonrel only
            }
        )
    )
    got = intent_aware(mean_average_precision, results, qrels).collect()[0]
    # subtopic 0 AP = 1; subtopic 1 invalid → 0; mean over 2 subtopics
    assert got["ia_average_precision"] == 0.5


class TestKendallTau:
    """pregen_kendall_tau.c:116-190 — tau-b with the reference's tie
    corrections; verified equivalent to the textbook tau-b."""

    def test_hand_vectors(self):
        from atire_spark.eval import kendall_tau

        assert kendall_tau([(1, 1), (2, 2), (3, 3)]) == 1.0
        assert kendall_tau([(1, 3), (2, 2), (3, 1)]) == -1.0
        assert abs(kendall_tau([(1, 1), (2, 3), (3, 2)]) - 1 / 3) < 1e-12

    def test_matches_brute_force_with_ties(self):
        import itertools
        import math
        import random

        from atire_spark.eval import kendall_tau

        def brute(pairs):
            conc = disc = t1 = t2 = 0
            for (a1, a2), (b1, b2) in itertools.combinations(pairs, 2):
                s1 = (a1 > b1) - (a1 < b1)
                s2 = (a2 > b2) - (a2 < b2)
                if s1 == 0 and s2 == 0:
                    continue
                if s1 == 0:
                    t1 += 1
                elif s2 == 0:
                    t2 += 1
                elif s1 == s2:
                    conc += 1
                else:
                    disc += 1
            return (conc - disc) / math.sqrt(
                (conc + disc + t1) * (conc + disc + t2)
            )

        rng = random.Random(9)
        for _ in range(50):
            n = rng.randint(3, 30)
            pairs = [
                (rng.randint(0, 5), rng.randint(0, 5)) for _ in range(n)
            ]
            if len({p[0] for p in pairs}) < 2 or len({p[1] for p in pairs}) < 2:
                continue
            assert abs(kendall_tau(pairs) - brute(pairs)) < 1e-9

    def test_spark_grouped(self, spark):
        import pandas as pd

        from atire_spark.eval import kendall_tau, kendall_tau_df

        pdf = pd.DataFrame(
            {
                "query_id": [1, 1, 1, 2, 2, 2],
                "s1": [1, 2, 3, 1, 2, 3],
                "s2": [1, 2, 3, 3, 2, 1],
            }
        )
        got = {
            r["query_id"]: r["tau"]
            for r in kendall_tau_df(
                spark.createDataFrame(pdf), "s1", "s2", by="query_id"
            ).collect()
        }
        assert got[1] == 1.0 and got[2] == -1.0
        single = kendall_tau_df(
            spark.createDataFrame(pdf[pdf.query_id == 1]), "s1", "s2"
        ).collect()[0]["tau"]
        assert single == 1.0
