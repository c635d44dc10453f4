"""Property tests for the near-dup pair members: the distributed
implementations must agree with brute-force all-pairs references on
arbitrary small corpora (hypothesis-generated)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from atire_spark.corpus import (
    NGRAM_DF_CAP,
    NGRAM_N,
    NGRAM_THR,
    SIMHASH_HAM_MAX,
    dedup_ngram_jaccard,
    dedup_simhash_pairs,
)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "7"]


def _shingle_set(text: str, n: int) -> set:
    toks = [t for t in text.lower().split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute_ngram_pairs(texts: list[str]) -> dict:
    """All-pairs reference with the SAME rare-n-gram blocking spec:
    a pair qualifies iff it shares >= 1 n-gram with df <= cap AND its
    exact Jaccard >= threshold."""
    sets = {i: _shingle_set(t, NGRAM_N) for i, t in enumerate(texts)}
    sets = {i: s for i, s in sets.items() if s}
    df: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    rare = {g for g, d in df.items() if d <= NGRAM_DF_CAP}
    out = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if not (sets[a] & sets[b] & rare):
                continue
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= NGRAM_THR:
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_strategy)
def test_ngram_jaccard_matches_brute_force(spark, tmp_path_factory, texts):
    d = str(tmp_path_factory.mktemp("prop")) + "/documents.parquet"
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    got = {
        (r.doc_a, r.doc_b): (
            r.intersection,
            r.n_shingles_a,
            r.n_shingles_b,
        )
        for r in dedup_ngram_jaccard(spark, d.rsplit("/", 1)[0]).collect()
    }
    assert got == _brute_ngram_pairs(texts)


def _brute_simhash_pairs(sig: pd.DataFrame) -> set:
    """All-pairs Hamming over the 64-bit signatures; blocking recall is
    exact at radius <= 3 by pigeonhole, so the reference needs no
    blocking step."""
    rows = sig.sort_values("doc_id").to_dict("records")
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            ham = sum(
                bin(int(a[f"w{w}"]) ^ int(b[f"w{w}"])).count("1")
                for w in range(4)
            )
            if ham <= SIMHASH_HAM_MAX:
                out.add((a["doc_id"], b["doc_id"], 64 - ham))
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS[:4]), min_size=1, max_size=4).map(
            " ".join
        ),
        min_size=2,
        max_size=6,
    )
)
def test_simhash_pairs_match_brute_force(spark, tmp_path_factory, texts):
    from atire_spark.corpus import simhash

    d = str(tmp_path_factory.mktemp("prop")) + "/documents.parquet"
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    sf_dir = d.rsplit("/", 1)[0]
    sig = simhash(spark, sf_dir).toPandas()
    got = {
        (r.doc_a, r.doc_b, r.intersection)
        for r in dedup_simhash_pairs(spark, sf_dir).collect()
    }
    assert got == _brute_simhash_pairs(sig)
