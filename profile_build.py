"""Leg-by-leg build profile at pinned local[N] (default 8).

Decomposes the single-tokenize build into:
  P1. tokenize + side-write tokens + keys parquet
  P2. docid assignment over narrow keys (+ docmap write)
  P3. stage1 + segment encode + stage
  P4. term stats agg
  P5. docmap/postings/stats final write

Usage: python profile_build.py [cpus] [n_convs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    if hasattr(os, "sched_setaffinity"):
        os.sched_setaffinity(0, set(range(cpus)))

    from pyspark.sql import functions as F

    from atire_spark import build as B
    from atire_spark.build import (
        SIDE_TOKENS_SCHEMA,
        IndexTables,
        _docids_from_keys,
        _stage1_from_tokens,
        _tokenize_sidewrite,
        build_index,
        write_index,
    )
    from atire_spark.session import get_spark
    from atire_spark.synth import make_transcripts_bench

    spark = get_spark(cpus=cpus, app="profile_build")
    pdf = make_transcripts_bench(n_convs)
    n_turns = len(pdf)

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(pdf).repartition(4 * cpus).write.parquet(
            f"{tmp}/input"
        )
        tdf = spark.read.parquet(f"{tmp}/input")
        # warmup
        warm = build_index(spark, spark.createDataFrame(pdf.iloc[: len(pdf) // 4]))
        write_index(warm, f"{tmp}/warmidx", mode="overwrite")

        for rep in range(2):
            stage_dir = f"{tmp}/stage{rep}"
            os.makedirs(f"{stage_dir}/tokens", exist_ok=True)
            legs = {}
            t_all = time.monotonic()

            t0 = time.monotonic()
            from pyspark import StorageLevel

            keys = _tokenize_sidewrite(tdf, f"{stage_dir}/tokens").persist(
                StorageLevel.MEMORY_AND_DISK
            )
            n_keys = keys.count()
            legs["P1_tokenize_sidewrite"] = time.monotonic() - t0

            t0 = time.monotonic()
            key_parts, docmap_rows, n_total, coll_len = _docids_from_keys(
                keys, max(cpus, 4), n_keys
            )
            keys.unpersist()
            docmap = docmap_rows
            legs["P2_docids"] = time.monotonic() - t0

            block_bits = B._adaptive_block_bits(max(n_total, 1), cpus)
            t0 = time.monotonic()
            tokens = spark.read.parquet(f"{stage_dir}/tokens")
            dm_pdf = docmap.select("conv_id", "turn_idx", "docid").toPandas()
            stage1 = _stage1_from_tokens(
                tokens.select(
                    "conv_id", "turn_idx", "doc_len", "terms", "occs"
                ),
                block_bits,
                docid_pdf=dm_pdf,
            )
            stage2 = B.encode_segments(stage1, 1, stage_dir=stage_dir)
            legs["P3_stage1_encode"] = time.monotonic() - t0

            t0 = time.monotonic()
            term_stats = stage2.groupBy("term").agg(
                F.sum("seg_df").alias("df"), F.sum("seg_cf").alias("cf")
            ).persist()
            postings = stage2.join(term_stats, "term")
            stats = term_stats.agg(F.count("*").alias("unique_terms")).select(
                F.lit(n_total).cast("long").alias("documents"),
                F.lit(coll_len).cast("long").alias("collection_len"),
                F.lit(coll_len / n_total if n_total else 0.0).alias("mean_doc_len"),
                "unique_terms",
                F.lit(0).alias("quantized"), F.lit(0).alias("quant_bits"),
                F.lit(0.0).alias("quant_min"), F.lit(0.0).alias("quant_max"),
                F.lit("").alias("stemmer"), F.lit("vbyte").alias("codec"),
            )
            legs["P4_stats"] = time.monotonic() - t0

            t0 = time.monotonic()
            tables = IndexTables(
                docmap=docmap, postings=postings, stats=stats,
                cached=[term_stats, key_parts],
            )
            write_index(tables, f"{tmp}/idx{rep}", mode="overwrite")
            legs["P5_write"] = time.monotonic() - t0

            total = time.monotonic() - t_all
            print(f"--- rep {rep}: total {total:.2f}s  "
                  f"({n_turns/total:.0f} turns/s)")
            for k, v in legs.items():
                print(f"    {k:24s} {v:6.2f}s  {100*v/total:4.1f}%")
    spark.stop()


if __name__ == "__main__":
    main()
