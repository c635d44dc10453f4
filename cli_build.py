"""spark-submit entry point: build (or resume) an index.

Usage:
    spark-submit --py-files atire_spark.zip cli_build.py \
        --input /path/transcripts_parquet --workdir /path/index

    python cli_build.py --synthetic-convs 20000 --workdir /tmp/idx

The build is checkpointed: re-running the same command after a crash
resumes from the _build_log (per-chunk lineage: turns parsed, postings
emitted, bytes compressed — the reference's -N10000 progress reporting,
reference atire/index.c:75-79, as durable rows instead of stdout).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet path of the transcripts table")
    src.add_argument("--synthetic-convs", type=int, help="generate N synthetic convs")
    ap.add_argument("--workdir", required=True, help="index output/checkpoint dir")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--chunks", type=int, default=8, help="tokenize checkpoint chunks")
    ap.add_argument("--term-chunks", type=int, default=8)
    ap.add_argument("--block-bits", type=int, default=20)
    ap.add_argument("--blocks-per-seg", type=int, default=16)
    ap.add_argument(
        "--quantize-bits",
        metavar="N|auto",
        help="the reference's -Q: quantize each posting's BM25 rsv "
        "into N bits (or 'auto' = memory_index.c:1553-1556); runs as "
        "an extra resumable phase, enables --qaat/--wand early "
        "termination in cli_search",
    )
    ap.add_argument(
        "--static-prune-k",
        type=int,
        metavar="K",
        help="the reference's -K: statically prune each term's "
        "impact-ordered postings to its first K at index level "
        "(memory_index.c:545-546; records ~trimpoint) — applied as a "
        "post-build index rewrite, the checkpointed tables stay "
        "un-pruned for resume",
    )
    ap.add_argument(
        "--topsig",
        metavar="W:D",
        help="also build a TopSig signature index of width W bits and "
        "density D%% (the reference's -Topsig:<w>:<d>; default 4096:12)",
        nargs="?",
        const="4096:12",
    )
    args = ap.parse_args()

    from atire_spark.checkpoint import build_index_checkpointed
    from atire_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app="atire_spark_build")
    if args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        from atire_spark.synth import make_transcripts_bench

        transcripts = spark.createDataFrame(make_transcripts_bench(args.synthetic_convs))

    t0 = time.monotonic()
    tables = build_index_checkpointed(
        spark,
        transcripts,
        args.workdir,
        n_chunks=args.chunks,
        n_term_chunks=args.term_chunks,
        block_bits=args.block_bits,
        blocks_per_seg=args.blocks_per_seg,
        quantize_bits=(
            None
            if args.quantize_bits is None
            else (
                "auto"
                if args.quantize_bits == "auto"
                else int(args.quantize_bits)
            )
        ),
    )
    if args.static_prune_k:
        from atire_spark.build import write_index
        from atire_spark.prune import static_prune_index

        pruned = static_prune_index(spark, tables, args.static_prune_k)
        pruned.build_log = tables.build_log
        write_index(pruned, f"{args.workdir}/index_pruned")
        tables = pruned
    wall = time.monotonic() - t0
    topsig_info = None
    if args.topsig:
        from atire_spark.topsig import build_topsig

        w_str, _, d_str = args.topsig.partition(":")
        ts_w, ts_d = int(w_str), float(d_str or 12.0)
        ts0 = time.monotonic()
        build_topsig(
            spark, transcripts, tables, width=ts_w, density=ts_d
        ).write.parquet(f"{args.workdir}/topsig", mode="overwrite")
        with open(f"{args.workdir}/topsig_meta.json", "w") as fh:
            json.dump({"width": ts_w, "density": ts_d}, fh)
        topsig_info = {
            "topsig_width": ts_w,
            "topsig_density": ts_d,
            "topsig_sec": round(time.monotonic() - ts0, 2),
        }
    stats = tables.stats.collect()[0].asDict()
    log = tables.build_log
    turns = (
        log.filter(log.phase == "tokenize").groupBy().sum("turns_parsed").collect()[0][0]
    )
    print(
        json.dumps(
            {
                "workdir": args.workdir,
                "wall_sec": round(wall, 2),
                "turns_parsed": int(turns or 0),
                "turns_per_sec": round((turns or 0) / wall, 1),
                **{k: (v if isinstance(v, str) else float(v) if isinstance(v, float) else int(v)) for k, v in stats.items()},
                **(topsig_info or {}),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
