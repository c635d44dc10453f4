"""Seeded query fuzz: rank identity engine vs numpy oracle.

The golden tests pin a fixed reference query set; this module widens
coverage with a deterministic pseudo-random sweep over the query-string
space — in-vocabulary terms, morphological mutations, out-of-vocabulary
junk, case noise, duplicate terms, NEXI signs (recorded, no ranked
effect) and quoted phrases (one inert verbatim term, per the
binary-verified reference semantics) — and
asserts the Spark engine's (docid, rsv_fixed) lists stay identical to
the oracle on every one. One `search_batch` job scores the whole sweep,
so the suite cost is a single Spark action plus the numpy oracle loop.
"""

import random

import pytest

from atire_spark.build import build_index
from atire_spark.oracle import OracleIndex
from atire_spark.query import SearchEngine
from atire_spark.synth import make_transcripts

N_QUERIES = 60
K = 10
SEED = 0xA71E3


@pytest.fixture(scope="module")
def corpus():
    return make_transcripts("small")


@pytest.fixture(scope="module")
def engine(spark, corpus):
    return SearchEngine(spark, build_index(spark, spark.createDataFrame(corpus)))


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex.build(corpus)


def _fuzz_queries(vocab: list[str]) -> list[tuple[int, str]]:
    rng = random.Random(SEED)

    def term() -> str:
        r = rng.random()
        if r < 0.55:  # in-vocabulary
            t = rng.choice(vocab)
        elif r < 0.75:  # morphological mutation (likely OOV, maybe not)
            t = rng.choice(vocab) + rng.choice(["s", "ing", "ed", "x", "q"])
        elif r < 0.9:  # pure junk
            t = "".join(rng.choice("qxzjvw") for _ in range(rng.randint(2, 9)))
        else:  # numeric-ish
            t = str(rng.randint(0, 99999))
        if rng.random() < 0.2:
            t = t.upper() if rng.random() < 0.5 else t.capitalize()
        return t

    out = []
    for qid in range(1, N_QUERIES + 1):
        n = rng.randint(1, 6)
        terms = [term() for _ in range(n)]
        if n > 1 and rng.random() < 0.25:  # duplicate a term
            terms.append(rng.choice(terms))
        text_parts = []
        i = 0
        while i < len(terms):
            r = rng.random()
            if r < 0.12 and i + 1 < len(terms):  # quoted phrase → one inert term
                text_parts.append(f'"{terms[i]} {terms[i + 1]}"')
                i += 2
                continue
            if r < 0.24:  # NEXI sign: parsed, no ranked effect
                text_parts.append(rng.choice(["+", "-"]) + terms[i])
            else:
                text_parts.append(terms[i])
            i += 1
        out.append((qid, " ".join(text_parts)))
    return out


def test_fuzz_rank_identity(engine, oracle):
    vocab = sorted(oracle.postings.keys())
    queries = _fuzz_queries(vocab)
    got = engine.search_batch(queries, k=K).toPandas()
    mismatches = []
    nonempty = 0
    for qid, text in queries:
        g = got[got.query_id == qid].sort_values("rank")
        o = oracle.search(text, k=K)
        if len(o):
            nonempty += 1
        if list(g.docid) != list(o.docid) or list(g.rsv_fixed) != list(
            o.rsv_fixed
        ):
            mismatches.append((qid, text, list(g.docid), list(o.docid)))
    assert not mismatches, mismatches[:5]
    # the sweep must actually exercise scoring, not just empty results
    assert nonempty >= N_QUERIES // 2, nonempty
