"""Build-path regression guards for the single-tokenize build:
the at-scale shuffle-join docid path must produce an index identical
to the broadcast path, and the shuffle/segment sizing rules must keep
their shape."""

from __future__ import annotations

import numpy as np
import pandas as pd

from atire_spark import build as B
from atire_spark.build import build_index

TRANSCRIPTS = pd.DataFrame(
    {
        "conv_id": [f"c{i:03d}" for i in range(12) for _ in range(2)],
        "turn_idx": [0, 1] * 12,
        "text": [
            f"alpha bravo term{i % 5} shared words here number {i}"
            for i in range(24)
        ],
    }
)


def _decoded(idx):
    from atire_spark.kernels.impact import decode_segment

    out = []
    for row in idx.postings.collect():
        d, t, _ = decode_segment(
            np.asarray(row["impacts"]),
            np.asarray(row["doc_counts"]),
            row["postings"],
            None,
        )
        out.extend((row["term"], int(x), int(y)) for x, y in zip(d, t))
    return sorted(out)


def test_shuffle_join_docid_path_identical(spark, monkeypatch):
    """BROADCAST_DOCMAP_MAX=0 forces the web-scale shuffle join in
    pass 3; postings and docmap must be identical to the broadcast
    path (the only difference is the join strategy)."""
    base = build_index(spark, spark.createDataFrame(TRANSCRIPTS))
    monkeypatch.setattr(B, "BROADCAST_DOCMAP_MAX", 0)
    big = build_index(spark, spark.createDataFrame(TRANSCRIPTS))
    assert _decoded(big) == _decoded(base)
    a = [tuple(r) for r in base.docmap.orderBy("docid").collect()]
    b = [tuple(r) for r in big.docmap.orderBy("docid").collect()]
    assert a == b


def test_shuffle_sizing_shape():
    f = B.shuffle_partitions_for_tokens
    # small corpora: one partition per core, never fewer
    assert f(10_000, 32) == 32
    # big corpora: pair budget governs (3M pairs per partition)
    assert f(96_000_000, 8) == 32
    assert f(3_000_000_000, 32) == 1000


def test_adaptive_block_bits_shape():
    f = B._adaptive_block_bits
    # small-corpus floor
    assert f(100, 8) == 10
    # 140k docs / 32 cores -> ~parallelism/4 segments (span 4n/P)
    assert f(140_000, 32) == 15
    # the 1M-doc cap governs at cluster scale
    assert f(10**12, 4000) == 20
