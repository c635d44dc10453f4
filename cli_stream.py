"""Streaming CLI: continuous index ingestion and standing-query
matching over a transcripts file stream.

Ingest (the reference's split-index + atire_merge recipe run
continuously; docids in arrival order, epoch-idempotent):

    spark-submit --py-files dist/atire_spark.zip cli_stream.py ingest \\
        --source /data/incoming --index /idx/live --checkpoint /ckpt/live

Match (queries stand, turns stream — alerting/routing; exact
fixed-point BM25 against a frozen snapshot index's statistics):

    spark-submit --py-files dist/atire_spark.zip cli_stream.py match \\
        --source /data/incoming --index /idx/snapshot \\
        --queries '1:alpha bravo' '2:merge sort' \\
        --out /alerts --checkpoint /ckpt/match [--topk 10]

Compact (LSM/Iceberg-maintenance step: rewrite the appended per-epoch
segment files into the range-clustered batch layout; scores unchanged):

    spark-submit --py-files dist/atire_spark.zip cli_stream.py compact \\
        --index /idx/live --out /idx/compacted

Ingest and match drain-and-stop by default (``--follow`` keeps running). The
source is a parquet file stream with the transcripts schema
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp).
"""

from __future__ import annotations

import argparse
import json
import time

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _stream(spark, source: str, files_per_trigger: int | None):
    # file streams need an explicit schema; take it from the files
    # already in the source (physical int32 vs int64 turn_idx both
    # appear in the wild) and fall back to the declared transcript
    # schema for a not-yet-populated directory
    try:
        schema = spark.read.parquet(source).schema
    except Exception:
        schema = TRANSCRIPTS_SCHEMA
    r = spark.readStream.schema(schema)
    if files_per_trigger:
        r = r.option("maxFilesPerTrigger", files_per_trigger)
    return r.parquet(source)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["ingest", "match", "compact"])
    ap.add_argument("--source", help="parquet stream dir (ingest/match)")
    ap.add_argument("--index", required=True, help="index dir (ingest: target; match: snapshot for stats)")
    ap.add_argument("--checkpoint", help="stream checkpoint dir (ingest/match)")
    ap.add_argument("--out", help="match output parquet dir")
    ap.add_argument(
        "--queries",
        nargs="*",
        default=[],
        help="standing queries as id:text (match mode)",
    )
    ap.add_argument("--threshold", type=int, default=0, help="min rsv_fixed")
    ap.add_argument("--topk", type=int, default=0, help="if > 0, also maintain a running top-k per query (console sink)")
    ap.add_argument("--stemmer", default=None)
    ap.add_argument("--stop-before-indexing", default=None)
    ap.add_argument("--files-per-trigger", type=int, default=None)
    ap.add_argument("--follow", action="store_true", help="keep running instead of drain-and-stop")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from atire_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app=f"atire_spark_stream_{args.mode}")
    t0 = time.monotonic()

    if args.mode == "compact":
        if not args.out:
            ap.error("compact mode requires --out")
        from atire_spark.build import load_index
        from atire_spark.streaming import compact_stream_index

        compact_stream_index(spark, args.index, args.out)
        row = load_index(spark, args.out).stats.collect()[0].asDict()
        print(
            json.dumps(
                {
                    "mode": "compact",
                    "out": args.out,
                    "documents": int(row["documents"]),
                    "unique_terms": int(row["unique_terms"]),
                    "wall_sec": round(time.monotonic() - t0, 2),
                }
            )
        )
        spark.stop()
        return

    if not args.source or not args.checkpoint:
        ap.error(f"{args.mode} mode requires --source and --checkpoint")
    if args.mode == "ingest":
        from atire_spark.streaming import load_stream_index, stream_build

        q = stream_build(
            spark,
            _stream(spark, args.source, args.files_per_trigger),
            args.index,
            args.checkpoint,
            stemmer=args.stemmer,
            stop_before_indexing=args.stop_before_indexing,
            trigger_available_now=not args.follow,
        )
        q.awaitTermination()
        row = (
            load_stream_index(spark, args.index)
            .stats.collect()[0]
            .asDict()
        )
        print(
            json.dumps(
                {
                    "mode": "ingest",
                    "index": args.index,
                    "documents": int(row["documents"]),
                    "unique_terms": int(row["unique_terms"]),
                    "wall_sec": round(time.monotonic() - t0, 2),
                }
            )
        )
    else:
        if not args.queries or not args.out:
            ap.error("match mode requires --queries and --out")
        import os

        from atire_spark.build import load_index
        from atire_spark.stream_query import (
            frozen_stats_from_index,
            running_topk,
            standing_query_matches,
        )
        from atire_spark.streaming import load_stream_index

        standing = []
        for spec in args.queries:
            qid, _, text = spec.partition(":")
            standing.append((int(qid), text))
        # snapshot stats come from either layout: a batch-built index
        # (postings/) or a continuously-ingested stream index (segments/)
        if os.path.isdir(os.path.join(args.index, "segments")):
            idx = load_stream_index(spark, args.index)
        else:
            idx = load_index(spark, args.index)
        stats = frozen_stats_from_index(spark, idx, standing)
        matches = standing_query_matches(
            _stream(spark, args.source, args.files_per_trigger),
            standing,
            stats,
            threshold=args.threshold,
        )
        writer = (
            matches.writeStream.format("parquet")
            .option("path", args.out)
            .option("checkpointLocation", args.checkpoint)
            .outputMode("append")
        )
        if not args.follow:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        queries = [q]
        if args.topk:
            tk = (
                running_topk(matches, k=args.topk)
                .writeStream.format("console")
                .option("checkpointLocation", args.checkpoint + "_topk")
                .outputMode("update")
            )
            if not args.follow:
                tk = tk.trigger(availableNow=True)
            queries.append(tk.start())
        for q in queries:
            q.awaitTermination()
        try:
            n = spark.read.parquet(args.out).count()
        except Exception:
            n = 0  # no matches ever emitted: sink dir was never created
        print(
            json.dumps(
                {
                    "mode": "match",
                    "out": args.out,
                    "standing_queries": len(standing),
                    "matches": int(n),
                    "wall_sec": round(time.monotonic() - t0, 2),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
