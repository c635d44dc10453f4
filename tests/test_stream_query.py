"""Streaming query side: standing-query matching must reproduce the
batch engine's exact fixed-point BM25 scores; windowed stats and the
stateful running top-k must converge to their batch equivalents."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from atire_spark.build import build_index
from atire_spark.query import SearchEngine
from atire_spark.stream_query import (
    frozen_stats_from_index,
    running_topk,
    standing_query_matches,
    windowed_turn_stats,
)
from atire_spark.synth import make_transcripts

STANDING = [(1, "alpha"), (2, "alpha bravo"), (3, "zzznope"), (4, "alpha alpha")]


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = make_transcripts("tiny")
    tdf = spark.createDataFrame(pdf)
    idx = build_index(spark, tdf)
    eng = SearchEngine(spark, idx)
    stats = frozen_stats_from_index(spark, idx, STANDING)
    return tdf, eng, stats


def _engine_scores(eng, query):
    res = eng.materialize(eng.search_one(query, k=10_000))
    return {
        (r["conv_id"], int(r["turn_idx"])): int(r["rsv_fixed"])
        for r in res.collect()
    }


def test_standing_matches_equal_batch_engine(spark, corpus):
    """Every turn of the snapshot corpus, streamed past the matcher,
    must score exactly what the batch engine scores that turn's docid
    (same frozen stats, same fixed-point arithmetic)."""
    tdf, eng, stats = corpus
    got = standing_query_matches(tdf, STANDING, stats).toPandas()
    by_q = {
        qid: {
            (r.conv_id, int(r.turn_idx)): int(r.rsv_fixed)
            for r in grp.itertuples()
        }
        for qid, grp in got.groupby("query_id")
    }
    assert by_q[1] == _engine_scores(eng, "alpha")
    assert by_q[2] == _engine_scores(eng, "alpha bravo")
    assert 3 not in by_q  # vocab-miss query matches nothing
    assert by_q[4] == _engine_scores(eng, "alpha alpha")  # weight=2 path


def test_standing_matches_streaming_run(spark, corpus):
    """The same matcher over readStream (file source, availableNow)
    emits the identical row set in append mode."""
    tdf, _, stats = corpus
    want = (
        standing_query_matches(tdf, STANDING, stats)
        .toPandas()
        .sort_values(["query_id", "conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    with tempfile.TemporaryDirectory() as tmp:
        src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
        tdf.write.parquet(src)
        stream = (
            spark.readStream.schema(tdf.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            standing_query_matches(stream, STANDING, stats)
            .writeStream.format("memory")
            .queryName("sq_matches")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = (
            spark.table("sq_matches")
            .toPandas()
            .sort_values(["query_id", "conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
    assert len(got) == len(want)
    assert got["rsv_fixed"].tolist() == want["rsv_fixed"].tolist()
    assert got["conv_id"].tolist() == want["conv_id"].tolist()


def test_windowed_turn_stats_match_batch(spark, corpus):
    """Windowed streaming stats (complete mode drain) == the same
    window aggregation run in batch."""
    tdf, _, _ = corpus
    with tempfile.TemporaryDirectory() as tmp:
        src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
        tdf.write.parquet(src)
        stream = spark.readStream.schema(tdf.schema).parquet(src)
        q = (
            windowed_turn_stats(stream, window="10 minutes")
            .writeStream.format("memory")
            .queryName("win_stats")
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["win_start"]: (r["turns"], r["tokens"], r["empty_turns"])
            for r in spark.table("win_stats").collect()
        }
    want_df = (
        tdf.groupBy(F.window("ts", "10 minutes").alias("win"))
        .agg(
            F.count("*").alias("turns"),
            F.sum(
                F.expr(
                    "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0))"
                )
            ).cast("long").alias("tokens"),
            F.sum(F.when(F.col("text") == "", 1).otherwise(0))
            .cast("long")
            .alias("empty_turns"),
        )
        .select(F.col("win.start").alias("win_start"), "turns", "tokens", "empty_turns")
    )
    want = {
        r["win_start"]: (r["turns"], r["tokens"], r["empty_turns"])
        for r in want_df.collect()
    }
    assert got == want and len(got) > 1


def test_running_topk_converges_to_batch_topk(spark, corpus):
    """Stateful streaming top-k over multiple micro-batches ends at the
    batch top-k of the full match set (rsv desc, (conv, turn) asc)."""
    tdf, _, stats = corpus
    k = 5
    matches = standing_query_matches(tdf, STANDING, stats).toPandas()
    want = {}
    for qid, grp in matches.groupby("query_id"):
        rows = sorted(
            zip(grp["conv_id"], grp["turn_idx"], grp["rsv_fixed"]),
            key=lambda r: (-r[2], r[0], r[1]),
        )[:k]
        want[qid] = [(c, int(t), int(r)) for c, t, r in rows]

    with tempfile.TemporaryDirectory() as tmp:
        src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
        # several files -> several micro-batches -> state actually merges
        tdf.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(tdf.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            running_topk(standing_query_matches(stream, STANDING, stats), k=k)
            .writeStream.format("memory")
            .queryName("run_topk")
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # memory sink in update mode appends every emission; the final
        # state per query is its LAST emitted batch of rows
        emitted = spark.table("run_topk").toPandas()
    got = {}
    for qid, grp in emitted.groupby("query_id"):
        # reconstruct the last emission: ranks restart at 1 each time
        rows = list(zip(grp["rank"], grp["conv_id"], grp["turn_idx"], grp["rsv_fixed"]))
        last = []
        for rank, conv, tidx, rsv in rows:
            if rank == 1:
                last = []
            last.append((conv, int(tidx), int(rsv)))
        got[qid] = last
    assert got == want


def test_standing_refuses_stemmed_index(spark):
    """A ~stemmer index's df table is keyed by stems; the matcher must
    refuse instead of silently missing terms (engine mismatch rule)."""
    pdf = make_transcripts("tiny")
    idx = build_index(spark, spark.createDataFrame(pdf), stemmer="s")
    with pytest.raises(ValueError, match="stemmed"):
        frozen_stats_from_index(spark, idx, STANDING)
