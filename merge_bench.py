"""Split + per-part index + merge at bench scale — the reference's own
web-scale recipe (reference README.md:78-93: VLC2/.GOV2 are indexed as
parts and combined with ``atire_merge``), demonstrated end-to-end with
rank-identity against the monolithic build. Default ~1M turns; set
``MERGE_BENCH_CONVS=1430000 MERGE_BENCH_PARTS=8`` for the ~10M-turn
demonstration (the input then generates DISTRIBUTED — no driver-side
corpus materialization).

Protocol:
- generate the deterministic transcripts table (chunked per-executor
  generator above ~300k convs, driver generator below);
- split into contiguous conv_id ranges (parts of a sorted corpus, so
  part-local docid order concatenates to the global (conv_id, turn_idx)
  order — the same discipline the reference's docid-offset merge
  assumes);
- build each part independently, write it to parquet (parts are
  durable artifacts in the recipe: a part can be rebuilt/merged without
  touching the others — this is also the resume story at 100 TB);
- fold-merge pairwise via :func:`atire_spark.merge.merge_indexes`
  (left side's encoded segments are reused byte-for-byte, only the
  right side re-blocks — so the fold rewrites each byte O(log parts)
  times, not O(parts)); every fold level lands on disk before the next
  consumes it, exactly like the reference's per-invocation indexes;
- report the per-turn byte budget at every level (parts → each fold →
  final): the disk-discipline curve that must stay flat as the corpus
  grows;
- build the monolithic index over the same frame and compare the full
  top-k (docid, rsv_fixed) per query: identical or the run fails.

Prints ONE JSON line. Run: ``python merge_bench.py``.
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
from atire_spark.synth import make_transcripts_bench, make_transcripts_bench_sdf

QUERIES = [
    ("q1_rare", "09874"),
    ("q2_stop", "alpha"),
    ("q6_five_terms", "00001 00002 00003 00004 00005"),
]


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_convs = int(os.environ.get("MERGE_BENCH_CONVS", "150000"))
    n_parts = int(os.environ.get("MERGE_BENCH_PARTS", "4"))
    spark = get_spark(cpus=32, app="atire_merge_bench")
    out: dict = {"metric": "split_merge_vs_monolithic", "parts": n_parts}

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.monotonic()
        if n_convs > 300_000:
            make_transcripts_bench_sdf(spark, n_convs).write.parquet(
                f"{tmp}/input"
            )
            name_width = 7
        else:
            pdf = make_transcripts_bench(n_convs)
            spark.createDataFrame(pdf).repartition(128).write.parquet(
                f"{tmp}/input"
            )
            del pdf
            name_width = 6
        tdf = spark.read.parquet(f"{tmp}/input")
        n_turns = tdf.count()
        out["turns"] = n_turns
        out["gen_sec"] = round(time.monotonic() - t0, 1)

        # contiguous conv ranges of a sorted corpus (zero-padded names
        # sort numerically); parts stay conv-aligned so every
        # conversation's turns land in one part
        bounds = [
            f"conv{i * n_convs // n_parts:0{name_width}d}"
            for i in range(1, n_parts)
        ]

        part_secs = []
        part_turns = []
        part_bytes = []
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
            part_bytes.append(_du(f"{tmp}/part{i}"))
            part_turns.append(
                int(
                    load_index(spark, f"{tmp}/part{i}")
                    .stats.select("documents")
                    .head()[0]
                )
            )
        out["part_build_sec"] = part_secs
        out["part_turns"] = part_turns
        out["bytes_per_turn_parts"] = round(
            sum(part_bytes) / max(sum(part_turns), 1), 1
        )

        # pairwise fold; each level durable before the next
        t0 = time.monotonic()
        level = [f"{tmp}/part{i}" for i in range(n_parts)]
        lvl = 0
        curve = [out["bytes_per_turn_parts"]]
        while len(level) > 1:
            nxt = []
            for j in range(0, len(level) - 1, 2):
                dst = f"{tmp}/m{lvl}_{j // 2}"
                write_index(
                    merge_indexes(
                        spark,
                        load_index(spark, level[j]),
                        load_index(spark, level[j + 1]),
                        stage_dir=f"{dst}_stage",
                    ),
                    dst,
                )
                nxt.append(dst)
            if len(level) % 2:
                nxt.append(level[-1])
            level = nxt
            lvl += 1
            curve.append(
                round(
                    sum(_du(p) for p in level) / max(n_turns, 1), 1
                )
            )
        merged_path = level[0]
        out["merge_sec"] = round(time.monotonic() - t0, 1)
        out["bytes_per_turn_curve"] = curve
        out["bytes_per_turn_merged"] = curve[-1]

        t0 = time.monotonic()
        write_index(build_index(spark, tdf), f"{tmp}/mono")
        out["mono_build_sec"] = round(time.monotonic() - t0, 1)
        out["bytes_per_turn_mono"] = round(_du(f"{tmp}/mono") / n_turns, 1)

        em = SearchEngine(spark, load_index(spark, merged_path))
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
