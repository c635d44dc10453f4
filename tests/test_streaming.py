"""Structured Streaming ingestion: incremental appends must converge
to the same searchable state as one batch build (the reference's
multi-part-index + merge recipe, run continuously)."""

import os
import tempfile

import pandas as pd
import pytest

BATCH1 = pd.DataFrame(
    {
        "conv_id": ["s0", "s0", "s1"],
        "turn_idx": [0, 1, 0],
        "text": [
            "alpha bravo charlie alpha",
            "bravo delta",
            "echo alpha foxtrot",
        ],
    }
)
BATCH2 = pd.DataFrame(
    {
        "conv_id": ["s2", "s2", "s3"],
        "turn_idx": [0, 1, 0],
        "text": [
            "charlie delta delta golf",
            "alpha golf",
            "",  # empty turn: no docid
        ],
    }
)


@pytest.fixture()
def stream_dirs():
    with tempfile.TemporaryDirectory() as tmp:
        yield os.path.join(tmp, "idx"), os.path.join(tmp, "ckpt")


def _rsv_by_doc(eng, query):
    res = eng.search_one(query, k=50)
    return {
        (r["conv_id"], int(r["turn_idx"])): int(r["rsv_fixed"])
        for r in eng.materialize(res).collect()
    }


def test_incremental_appends_match_batch_build(spark, stream_dirs):
    from atire_spark.build import build_index
    from atire_spark.query import SearchEngine
    from atire_spark.streaming import append_batch, load_stream_index

    index_dir, _ = stream_dirs
    os.makedirs(index_dir, exist_ok=True)
    n1 = append_batch(spark, spark.createDataFrame(BATCH1), index_dir, 0)
    n2 = append_batch(spark, spark.createDataFrame(BATCH2), index_dir, 1)
    assert (n1, n2) == (3, 2)  # the empty turn consumed no docid

    streamed = SearchEngine(spark, load_stream_index(spark, index_dir))
    full = pd.concat([BATCH1, BATCH2], ignore_index=True)
    batch = SearchEngine(spark, build_index(spark, spark.createDataFrame(full)))

    # identical collection stats
    assert streamed.n_docs == batch.n_docs == 5
    assert streamed.collection_len == batch.collection_len
    # identical global term stats
    ts_s = {
        r["term"]: (int(r["df"]), int(r["cf"]))
        for r in streamed.postings.select("term", "df", "cf").distinct().collect()
    }
    ts_b = {
        r["term"]: (int(r["df"]), int(r["cf"]))
        for r in batch.postings.select("term", "df", "cf").distinct().collect()
    }
    assert ts_s == ts_b
    # identical scores per document identity (docids may be assigned in
    # arrival vs sorted order — both are valid reference input orders)
    for q in ["alpha", "delta golf", "charlie bravo"]:
        assert _rsv_by_doc(streamed, q) == _rsv_by_doc(batch, q)


def test_epoch_replay_is_idempotent(spark, stream_dirs):
    from atire_spark.streaming import append_batch, load_stream_index

    index_dir, _ = stream_dirs
    os.makedirs(index_dir, exist_ok=True)
    assert append_batch(spark, spark.createDataFrame(BATCH1), index_dir, 0) == 3
    # restart replays epoch 0: must be a no-op
    assert append_batch(spark, spark.createDataFrame(BATCH1), index_dir, 0) == 0
    idx = load_stream_index(spark, index_dir)
    assert idx.docmap.count() == 3

    # lineage: exactly one committed-epoch metrics row (the replay
    # logged nothing), with real posting volume
    from atire_spark.streaming import read_ingest_log

    log = read_ingest_log(spark, index_dir).collect()
    assert len(log) == 1
    row = log[0]
    assert row["epoch"] == 0 and row["docs_added"] == 3
    assert row["postings_rows"] > 0 and row["postings_bytes"] > 0
    assert row["wall_sec"] > 0


def test_compacted_stream_index_scores_identical(spark, stream_dirs):
    """Compaction to the batch layout must not change a single score,
    and must shrink the posting file count (the point of compacting)."""
    import glob

    from atire_spark.build import load_index
    from atire_spark.query import SearchEngine
    from atire_spark.streaming import (
        append_batch,
        compact_stream_index,
        load_stream_index,
    )

    index_dir, _ = stream_dirs
    os.makedirs(index_dir, exist_ok=True)
    append_batch(spark, spark.createDataFrame(BATCH1), index_dir, 0)
    append_batch(spark, spark.createDataFrame(BATCH2), index_dir, 1)
    streamed = SearchEngine(spark, load_stream_index(spark, index_dir))

    out = index_dir + "_compact"
    compact_stream_index(spark, index_dir, out)
    compacted = SearchEngine(spark, load_index(spark, out))

    for q in ("alpha", "delta golf", "charlie"):
        assert _rsv_by_doc(compacted, q) == _rsv_by_doc(streamed, q)

    n_stream = len(glob.glob(f"{index_dir}/segments/*.parquet"))
    n_compact = len(glob.glob(f"{out}/postings/*.parquet"))
    assert n_compact < n_stream


def test_readstream_file_source_drains(spark, stream_dirs):
    """End-to-end through writeStream/foreachBatch with a file source
    and availableNow trigger (one file per micro-batch)."""
    from atire_spark.query import SearchEngine
    from atire_spark.streaming import load_stream_index, stream_build

    index_dir, ckpt = stream_dirs
    with tempfile.TemporaryDirectory() as src:
        spark.createDataFrame(BATCH1).coalesce(1).write.parquet(f"{src}/b1")
        spark.createDataFrame(BATCH2).coalesce(1).write.parquet(f"{src}/b2")
        stream = (
            spark.readStream.schema("conv_id string, turn_idx long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = stream_build(spark, stream, index_dir, ckpt)
        q.awaitTermination(120)
    eng = SearchEngine(spark, load_stream_index(spark, index_dir))
    assert eng.n_docs == 5
    got = eng.search_one("alpha", k=10).count()
    assert got == 3  # three docs contain alpha (s0/0, s1/0, s2/1)


def test_streamed_index_topsig_equals_batch(spark, stream_dirs):
    """TopSig signatures built over a streamed index equal the batch
    build's bit-for-bit (arrival order here coincides with the sorted
    order, so docids match and even the docid-seeded zero-fill bits
    agree). The streamed side exercises the re-tokenize fallback while
    the batch side reads the staged tokenized parquet — so this also
    certifies the two tokenized sources are interchangeable."""
    import numpy as np

    from atire_spark.build import build_index
    from atire_spark.streaming import append_batch, load_stream_index
    from atire_spark.topsig import build_topsig

    index_dir, _ = stream_dirs
    os.makedirs(index_dir, exist_ok=True)
    append_batch(spark, spark.createDataFrame(BATCH1), index_dir, 0)
    append_batch(spark, spark.createDataFrame(BATCH2), index_dir, 1)
    streamed_idx = load_stream_index(spark, index_dir)
    assert streamed_idx.tokenized is None  # loaded → fallback path

    full = pd.concat([BATCH1, BATCH2], ignore_index=True)
    full_df = spark.createDataFrame(full)
    batch_idx = build_index(spark, full_df)
    assert batch_idx.tokenized is not None  # fresh → staged path

    s_sigs = {
        int(r["docid"]): np.asarray(r["sig"], dtype=np.int64)
        for r in build_topsig(
            spark, full_df, streamed_idx, width=256, density=12.0
        ).collect()
    }
    b_sigs = {
        int(r["docid"]): np.asarray(r["sig"], dtype=np.int64)
        for r in build_topsig(
            spark, full_df, batch_idx, width=256, density=12.0
        ).collect()
    }
    assert s_sigs.keys() == b_sigs.keys() and len(s_sigs) == 5
    for d in s_sigs:
        assert np.array_equal(s_sigs[d], b_sigs[d]), f"doc {d}"
