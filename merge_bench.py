"""Split + per-part index + merge at bench scale — the reference's own
web-scale recipe (reference README.md:78-93: VLC2/.GOV2 are indexed as
parts and combined with ``atire_merge``), demonstrated end-to-end on a
~1M-turn corpus with rank-identity against the monolithic build.

Protocol:
- generate the deterministic ~1M-turn transcripts table (150k convs);
- split into 4 contiguous conv_id ranges (parts of a sorted corpus, so
  part-local docid order concatenates to the global (conv_id, turn_idx)
  order — the same discipline the reference's docid-offset merge
  assumes);
- build each part independently, write it to parquet (parts are
  durable artifacts in the recipe: a part can be rebuilt/merged without
  touching the others — this is also the resume story at 100 TB);
- fold-merge: ((p0+p1) + (p2+p3)) via :func:`atire_spark.merge.merge_indexes`
  (left side's encoded segments are reused byte-for-byte, only the
  right side re-blocks — so the fold rewrites each byte O(log parts)
  times, not O(parts));
- build the monolithic index over the same frame and compare the full
  top-k (docid, rsv_fixed) per query: identical or the run fails.

Prints ONE JSON line. Run: ``python merge_bench.py`` (env
``MERGE_BENCH_CONVS`` overrides the corpus size, default 150000).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from atire_spark.build import build_index, load_index, write_index
from atire_spark.merge import merge_indexes
from atire_spark.query import SearchEngine
from atire_spark.session import get_spark
from atire_spark.synth import make_transcripts_bench

QUERIES = [
    ("q1_rare", "09874"),
    ("q2_stop", "alpha"),
    ("q6_five_terms", "00001 00002 00003 00004 00005"),
]


def main() -> None:
    n_convs = int(os.environ.get("MERGE_BENCH_CONVS", "150000"))
    n_parts = 4
    spark = get_spark(cpus=32, app="atire_merge_bench")
    out: dict = {"metric": "split_merge_vs_monolithic", "parts": n_parts}

    t0 = time.monotonic()
    pdf = make_transcripts_bench(n_convs)
    out["turns"] = len(pdf)
    out["gen_sec"] = round(time.monotonic() - t0, 1)

    # contiguous conv ranges of a sorted corpus (conv%06d names sort
    # numerically); parts stay conv-aligned so every conversation's
    # turns land in one part
    convs = sorted(pdf["conv_id"].unique())
    bounds = [convs[i * len(convs) // n_parts] for i in range(1, n_parts)]

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(pdf).repartition(128).write.parquet(
            f"{tmp}/input"
        )
        del pdf
        tdf = spark.read.parquet(f"{tmp}/input")

        part_secs = []
        for i in range(n_parts):
            lo = bounds[i - 1] if i else None
            hi = bounds[i] if i < n_parts - 1 else None
            part = tdf
            if lo is not None:
                part = part.filter(part.conv_id >= lo)
            if hi is not None:
                part = part.filter(part.conv_id < hi)
            t0 = time.monotonic()
            write_index(build_index(spark, part), f"{tmp}/part{i}")
            part_secs.append(round(time.monotonic() - t0, 1))
        out["part_build_sec"] = part_secs

        # each fold level lands on disk before the next consumes it —
        # exactly the reference recipe (atire_merge emits an on-disk
        # index per invocation); a lazy fold would instead re-evaluate
        # the lower merges once per consumer of the upper one
        t0 = time.monotonic()
        parts = [load_index(spark, f"{tmp}/part{i}") for i in range(n_parts)]
        write_index(
            merge_indexes(
                spark, parts[0], parts[1], stage_dir=f"{tmp}/mstage01"
            ),
            f"{tmp}/m01",
        )
        write_index(
            merge_indexes(
                spark, parts[2], parts[3], stage_dir=f"{tmp}/mstage23"
            ),
            f"{tmp}/m23",
        )
        merged = merge_indexes(
            spark,
            load_index(spark, f"{tmp}/m01"),
            load_index(spark, f"{tmp}/m23"),
            stage_dir=f"{tmp}/mstage",
        )
        write_index(merged, f"{tmp}/merged")
        out["merge_sec"] = round(time.monotonic() - t0, 1)

        t0 = time.monotonic()
        write_index(build_index(spark, tdf), f"{tmp}/mono")
        out["mono_build_sec"] = round(time.monotonic() - t0, 1)

        em = SearchEngine(spark, load_index(spark, f"{tmp}/merged"))
        eo = SearchEngine(spark, load_index(spark, f"{tmp}/mono"))
        lat = {}
        identical = True
        for name, q in QUERIES:
            t0 = time.monotonic()
            got = (
                em.search_one(q, k=10)
                .select("rank", "docid", "rsv_fixed")
                .collect()
            )
            lat[name] = round(time.monotonic() - t0, 3)
            want = (
                eo.search_one(q, k=10)
                .select("rank", "docid", "rsv_fixed")
                .collect()
            )
            if [tuple(r) for r in got] != [tuple(r) for r in want]:
                identical = False
        out["merged_query_sec"] = lat
        out["rank_identical_to_monolithic"] = identical

    print(json.dumps(out))
    if not identical:
        sys.exit(1)


if __name__ == "__main__":
    main()
