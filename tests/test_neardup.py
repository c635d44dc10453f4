"""Near-duplicate pair suite: exact n-gram Jaccard (rare-n-gram
blocking) and SimHash Hamming-radius pairs, on planted duplicates.

Both members share the MinHash pair schema and certify through the
`dedup_minhash_lsh` suite entry's DuckDB oracle; these tests pin the
semantics on a corpus we control."""

import pytest

from atire_spark.corpus import (
    NGRAM_THR,
    SIMHASH_HAM_MAX,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash_pairs,
)


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """Six docs: 0/1 identical, 2/3 near-identical (one token swap),
    4/5 unrelated."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),
        (2, base + " extra trailing words here"),
        (3, base + " extra trailing words there"),
        (4, "completely different content about spark shuffles and parquet files"),
        (5, "unrelated text concerning inverted index compression and postings"),
    ]
    d = str(tmp_path_factory.mktemp("neardup")) + "/documents.parquet"
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(d)
    return d.rsplit("/", 1)[0]


def test_ngram_jaccard_finds_planted_pairs(spark, docs_dir):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_jaccard(spark, docs_dir).collect()
    }
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (2, 3) in got and NGRAM_THR <= got[(2, 3)] < 1.0
    assert all(a < b for a, b in got)
    assert not any({a, b} & {4, 5} for a, b in got)


def test_ngram_jaccard_recall_covers_minhash(spark, docs_dir):
    """Rare-n-gram blocking is deterministic-recall: every pair the
    banded MinHash surfaces must also be found by the exact method
    (same n, same threshold)."""
    mh = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, docs_dir).collect()}
    ng = {(r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, docs_dir).collect()}
    assert mh <= ng


def test_simhash_pairs_identical_docs_hamming_zero(spark, docs_dir):
    got = {
        (r.doc_a, r.doc_b): (r.intersection, r.jaccard)
        for r in dedup_simhash_pairs(spark, docs_dir).collect()
    }
    assert got[(0, 1)] == (64, 1.0)  # identical text -> identical signature
    assert (2, 3) in got  # one-token swap stays within the radius
    for inter, sim in got.values():
        assert 64 - inter <= SIMHASH_HAM_MAX
        assert sim == inter / 64.0
