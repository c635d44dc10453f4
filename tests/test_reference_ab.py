"""A/B rank identity against the COMPILED reference ATIRE binary.

Every other correctness test pins the engine to oracles that *model*
the reference semantics (numpy fixed-point TaaT, DuckDB SQL).  This
test removes the model from the loop entirely: the actual reference
engine (built out-of-tree from /root/reference, see reference_ab.py)
and our Spark engine index byte-identical corpora and must produce the
same FULL ranking for every A/B query, compared STRICTLY element by
element: the harness zero-pads docnames so the reference's internal
docid (its lexicographic doclist rank) equals file order equals our
docid — scores, tie-breaks (rsv desc, docid desc via the accumulator
pointer compare, search_engine_accumulator.h:44-49), and boundary
selection all align exactly.

Skips cleanly when no prebuilt reference binary exists (the test never
compiles C++ — run ``python reference_ab.py identity`` once to build
and get the full 14-query report at the larger scale).
"""

import os

import pytest

import reference_ab as ab

# the SINGLE-THREADED build: stock parallel indexing assigns internal
# docids in thread-completion order, permuting nearby docs — identity
# needs deterministic file-order ids (see ensure_reference_built)
_BIN_DIR = os.path.join(ab.ATIRE_BUILD_DIR + "_st", "bin")
_HAVE_REF = all(
    os.access(os.path.join(_BIN_DIR, exe), os.X_OK)
    for exe in ("index", "atire")
)


@pytest.mark.skipif(
    not _HAVE_REF,
    reason="no prebuilt reference ATIRE binary (run reference_ab.py once)",
)
def test_full_ranking_identity_vs_reference_binary(spark):
    import shutil
    import tempfile

    from atire_spark.build import build_index
    from atire_spark.query import SearchEngine
    from atire_spark.synth import make_transcripts

    work = tempfile.mkdtemp(prefix="atire_ab_test_")
    pdf, trec = ab.prepare_corpus(make_transcripts(400))
    trec_path = os.path.join(work, "corpus.xml")
    with open(trec_path, "w") as fh:
        fh.write(trec)
    index_path = os.path.join(work, "index.aspt")
    ab.run_reference_build(_BIN_DIR, trec_path, index_path, work)
    k_full = len(pdf)
    ref_hits, _ = ab.run_reference_queries(
        _BIN_DIR, index_path, ab.AB_QUERIES, k_full, work, l=4 * k_full
    )

    engine = SearchEngine(spark, build_index(spark, spark.createDataFrame(pdf)))
    rows = engine.search_batch(ab.AB_QUERIES, k=k_full).collect()
    ours = {qid: [] for qid, _ in ab.AB_QUERIES}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        ours[r["query_id"]].append((int(r["docid"]), int(r["rsv_fixed"])))

    assert len(ref_hits) == len(ab.AB_QUERIES)
    for (qid, qtext), ref in zip(ab.AB_QUERIES, ref_hits):
        # STRICT list identity: zero-padded docnames align the two
        # engines' docid assignment, so scores, tie order, and member
        # selection must agree element by element
        assert ref == ours[qid], qtext

    # variant spot-checks on the same index: a negative-scoring LM
    # ranker (signed accumulator ordering + the 0->nonzero candidate
    # rule live) and termcount
    for name, flag in (("lmd", "lmd:6750"), ("termcount", "termcount")):
        ref_hits, _ = ab.run_reference_queries(
            _BIN_DIR, index_path, ab.AB_QUERIES, k_full, work,
            extra_flags=["-R" + flag], l=4 * k_full,
        )
        rows = engine.search_batch(
            ab.AB_QUERIES, k=k_full, ranker=name
        ).collect()
        got = {qid: [] for qid, _ in ab.AB_QUERIES}
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            got[r["query_id"]].append((int(r["docid"]), int(r["rsv_fixed"])))
        for (qid, qtext), ref in zip(ab.AB_QUERIES, ref_hits):
            assert ref == got[qid], f"{name}: {qtext}"

    shutil.rmtree(work, ignore_errors=True)


@pytest.mark.skipif(
    not _HAVE_REF,
    reason="no prebuilt reference ATIRE binary (run reference_ab.py once)",
)
def test_unicode_normalize_identity_vs_reference_binary(spark):
    """WORD-token normalization parity on a Unicode corpus: the
    reference decomposes, drops combining marks and lowercases
    (unicode.c:213-257); kernels/unorm.py must land the same
    vocabulary, postings and scores.  Covers decomposable letters
    (café/Über/Ångström), no-decomposition letters (straße, Ł — which
    therefore do NOT match their ASCII-folded query), and df==N
    degeneracy, full-ranking score-group identity."""
    import os
    import tempfile

    import pandas as pd

    from atire_spark.build import build_index
    from atire_spark.query import SearchEngine

    work = tempfile.mkdtemp(prefix="atire_uni_ab_")
    words = [
        "café", "Über", "naïve", "résumé", "straße", "Ångström", "ŁÓDŹ",
        "çhårs", "plain", "words", "täst", "Ünïcödé", "ELYSÉE", "français",
    ]
    rows = []
    for i in range(80):
        text = (
            " ".join(words[(i + j) % len(words)] for j in range(6))
            + f" filler{i % 4}"
        )
        rows.append(
            {
                "conv_id": f"c{i // 8:05d}",
                "turn_idx": i % 8,
                "role": "user",
                "text": text,
                "tool": "",
                "ts": pd.Timestamp("2025-01-01"),
            }
        )
    pdf, trec = ab.prepare_corpus(pd.DataFrame(rows))
    trec_path = os.path.join(work, "corpus.xml")
    with open(trec_path, "w", encoding="utf-8") as fh:
        fh.write(trec)
    index_path = os.path.join(work, "index.aspt")
    ab.run_reference_build(_BIN_DIR, trec_path, index_path, work)

    queries = [
        (1, "cafe"),
        (2, "uber strasse"),
        (3, "naive resume"),
        (4, "angstrom elysee"),
        (5, "lodz"),  # Ł never decomposes: 0 hits on BOTH engines
        (6, "chars francais"),
        (7, "tast unicode"),
    ]
    k = len(pdf)
    ref_hits, _ = ab.run_reference_queries(
        _BIN_DIR, index_path, queries, k, work, l=4 * k
    )
    eng = SearchEngine(spark, build_index(spark, spark.createDataFrame(pdf)))
    res = eng.search_batch(queries, k=k).toPandas()

    matched_any = False
    for qid, qtext in queries:
        ours = [
            (int(r.docid), int(r.rsv_fixed))
            for r in res[res.query_id == qid].sort_values("rank").itertuples()
        ]
        ref = ref_hits[qid - 1]
        assert ab._score_groups(ours) == ab._score_groups(ref), (qid, qtext)
        matched_any = matched_any or bool(ref)
    assert matched_any  # the corpus really was reachable
    assert not ref_hits[4], "Ł must not fold to plain l on either side"


@pytest.mark.skipif(
    not _HAVE_REF,
    reason="no prebuilt reference ATIRE binary (run reference_ab.py once)",
)
def test_randomized_fuzz_identity_vs_reference_binary():
    """Seeded random-query differential fuzz (reference_ab.fuzz) must
    stay strict full-ranking identical — a fresh seed per test run
    would be flaky-by-design, so the seed is pinned and distinct from
    the recorded AB_REPORT runs."""
    out = ab.fuzz("tiny", cpus=8, n_queries=15, seed=424242)
    assert not out.get("skipped")
    assert out["matched"] == out["queries"], out["mismatches"][:2]


@pytest.mark.skipif(
    not _HAVE_REF,
    reason="no prebuilt reference ATIRE binary (run reference_ab.py once)",
)
def test_fuzz_quantized_and_conjunctive_modes():
    """The -Q8 baked-score TaaT path and the -Rallterms conjunctive
    mode stay strict under random queries (pinned seeds)."""
    out = ab.fuzz("tiny", cpus=8, n_queries=8, seed=515, quantized=True)
    assert out["matched"] == out["queries"], out["mismatches"][:2]
    out = ab.fuzz("tiny", cpus=8, n_queries=8, seed=516, conjunctive=True)
    assert out["matched"] == out["queries"], out["mismatches"][:2]


@pytest.mark.skipif(
    not _HAVE_REF,
    reason="no prebuilt reference ATIRE binary (run reference_ab.py once)",
)
def test_fuzz_blind_kl_feedback_mode():
    """The two-pass blind-KL feedback chain stays strict under random
    queries (pinned seed)."""
    out = ab.fuzz("tiny", cpus=8, n_queries=6, seed=517, feedback=True)
    assert out["matched"] == out["queries"], out["mismatches"][:2]
