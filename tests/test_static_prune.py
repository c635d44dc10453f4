"""Build-side static prune (-K) — atire_spark.prune.static_prune_index.

The reference cuts each term's impact-ordered list at exactly K
postings at serialise time (memory_index.c:545-546) and records
~trimpoint (memory_index.c:1520-1521). The kept set equals the
read-side -K trim's first-K set, so plain BM25 over the pruned index
must match trimmed BM25 over the full index — which is the oracle
here."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from atire_spark.build import build_index
from atire_spark.prune import static_prune_index
from atire_spark.query import SearchEngine

PRUNE_TRANSCRIPTS = pd.DataFrame(
    {
        "conv_id": [f"c{i:02d}" for i in range(30)],
        "turn_idx": [0] * 30,
        "text": [
            " ".join(
                ["common"] * (1 + i % 7)
                + (["mid"] * (i % 3) if i % 2 == 0 else [])
                + (["zebra"] if i in (3, 9) else [])
                + ["filler", "words", "here"]
            )
            for i in range(30)
        ],
    }
)

QUERIES = [(1, "common"), (2, "common mid"), (3, "zebra filler")]
K = 5


@pytest.fixture(scope="module")
def engines(spark):
    idx = build_index(spark, spark.createDataFrame(PRUNE_TRANSCRIPTS))
    pruned = static_prune_index(spark, idx, K)
    return SearchEngine(spark, idx), SearchEngine(spark, pruned), pruned


def test_pruned_equals_readside_trim(spark, engines):
    full, pruned_eng, _ = engines
    want = full.search_batch(QUERIES, k=10, trim_postings_k=K).toPandas()
    got = pruned_eng.search_batch(QUERIES, k=10).toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_trim_point_recorded(spark, engines):
    _, _, pruned = engines
    row = pruned.stats.collect()[0].asDict()
    assert row["trim_point"] == K


def test_postings_physically_cut(spark, engines):
    _, _, pruned = engines
    rows = pruned.postings.filter("term = 'common'").collect()
    kept = sum(int(r["seg_df"]) for r in rows)
    assert kept == K  # exact-K, mid-quantum cut
    # dictionary df/cf keep the TRUE collection values (reference
    # serialise shortens impacted_length but not the dictionary)
    assert all(int(r["df"]) == 30 for r in rows)


def test_untouched_terms_pass_through(spark, engines):
    full, _, pruned = engines
    a = full.index.postings.filter("term = 'zebra'").collect()
    b = pruned.postings.filter("term = 'zebra'").collect()
    assert len(a) == len(b) == 1
    assert bytes(a[0]["postings"]) == bytes(b[0]["postings"])


def test_roundtrip_decode_matches_topk_slice(spark, engines):
    """Decoded pruned postings == the first K of the full term in
    (impact desc, docid asc) order."""
    from atire_spark.kernels.impact import decode_segment

    full, _, pruned = engines
    out = []
    for r in sorted(
        pruned.postings.filter("term = 'common'").collect(),
        key=lambda r: r["first_docid"],
    ):
        d, t, _ = decode_segment(
            np.asarray(r["impacts"]), np.asarray(r["doc_counts"]),
            bytes(r["postings"]), None,
            byte_offsets=np.asarray(r["byte_offsets"]),
        )
        out.append(pd.DataFrame({"docid": d, "tf": t}))
    got = pd.concat(out, ignore_index=True)
    # oracle: full decode, global order, first K
    fo = []
    for r in full.index.postings.filter("term = 'common'").collect():
        d, t, _ = decode_segment(
            np.asarray(r["impacts"]), np.asarray(r["doc_counts"]),
            bytes(r["postings"]), None,
            byte_offsets=np.asarray(r["byte_offsets"]),
        )
        fo.append(pd.DataFrame({"docid": d, "tf": t}))
    fdf = pd.concat(fo, ignore_index=True)
    fdf = fdf.sort_values(["tf", "docid"], ascending=[False, True]).head(K)
    got = got.sort_values(["tf", "docid"], ascending=[False, True])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), fdf.reset_index(drop=True)
    )


def test_distributed_trim_cum_matches_bruteforce(spark):
    """The distributed cum_before computation (_with_trim_cum) must
    realize the reference's global impact-descending read order
    exactly: take(quantum) == min(count, max(K - cum_before, 0))
    computed against a driver-side brute-force walk of the same
    metadata, across a multi-segment index and several trim points."""
    # many docs + tiny blocks -> every term spans multiple segments
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i:03d}" for i in range(64)],
            "turn_idx": [0] * 64,
            "text": [
                " ".join(
                    ["common"] * (1 + i % 5)
                    + ["mid"] * (i % 3)
                    + ["tail"] * (1 if i % 4 == 0 else 0)
                )
                for i in range(64)
            ],
        }
    )
    idx = build_index(spark, spark.createDataFrame(pdf), block_bits=3)
    eng = SearchEngine(spark, idx)
    hits = idx.postings.filter(
        idx.postings.term.isin(["common", "mid", "tail"])
    )
    joined = {
        (r["term"], int(r["seg_group"])): r
        for r in eng._with_trim_cum(hits).collect()
    }
    meta = hits.select(
        "term", "seg_group", "impacts", "doc_counts"
    ).collect()
    per_term: dict[str, list] = {}
    for r in meta:
        per_term.setdefault(r["term"], []).append(r)
    assert any(len(rows) > 1 for rows in per_term.values())
    for trim in (1, 3, 7, 100):
        for term, rows in per_term.items():
            quanta = []
            for r in rows:
                for gi, (imp, cnt) in enumerate(
                    zip(r["impacts"], r["doc_counts"])
                ):
                    quanta.append((int(imp), int(r["seg_group"]), gi, cnt))
            quanta.sort(key=lambda x: (-x[0], x[1], x[2]))
            remaining, want = trim, {}
            for imp, sg, gi, cnt in quanta:
                want[(sg, gi)] = min(cnt, max(remaining, 0))
                remaining -= cnt
            for r in rows:
                sg = int(r["seg_group"])
                cum = np.asarray(joined[(term, sg)]["cum_before"])
                cnt = np.asarray(r["doc_counts"])
                got = np.minimum(cnt, np.maximum(trim - cum, 0))
                assert list(got) == [
                    want[(sg, gi)] for gi in range(len(cnt))
                ], (term, sg, trim)
