"""Benchmark harness — prints ONE JSON line for the driver.

Measures the two BASELINE.json target metrics:
- index-build throughput (turns/sec) over a synthetic transcripts table
  (vectorized generator, deterministic seed) — size via
  SPARK_GRAFT_BENCH_CONVS (default 20000 convs ≈ 140k turns);
- BM25 top-k query latency (per-query seconds + p50) over the built
  index, warm, plus the documents-derived sf corpus from
  SPARK_GRAFT_SF_DIR for the driver's cross-round comparison.

Env:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  SPARK_GRAFT_BENCH_CONVS (default 20000)

Output: {"metric": ..., "value": <total core seconds>, "unit": "sec",
         "queries": {...}, "sf": ..., + detail fields}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time


BENCH_QUERIES: list[tuple[str, str]] = [
    ("q1_rare", "term09874"),
    ("q2_stop", "alpha"),
    ("q3_mixed", "term00001 term08712"),
    ("q4_adversarial", "omegaterm"),
    ("q5_multi_stop", "alpha bravo charlie"),
    ("q6_five_terms", "term00001 term00002 term00003 term00004 term00005"),
    ("q7_absent", "zzznotaterm"),
    ("q8_common_pair", "term00001 term00002"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from atire_spark.build import build_index, load_index, write_index
    from atire_spark.query import SearchEngine
    from atire_spark.session import get_spark
    from atire_spark.synth import make_transcripts_bench

    spark = get_spark(cpus=cpus, app="atire_spark_bench")

    # ---- index-build throughput on synthetic transcripts ----------------
    gen0 = time.monotonic()
    pdf = make_transcripts_bench(n_convs)
    n_turns = len(pdf)
    gen_sec = time.monotonic() - gen0

    tdf = spark.createDataFrame(pdf)
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.monotonic()
        tables = build_index(spark, tdf)
        write_index(tables, f"{tmp}/idx")
        build_sec = time.monotonic() - t0

        # ---- query latency on the built index (warm) --------------------
        idx = load_index(spark, f"{tmp}/idx")
        eng = SearchEngine(spark, idx)
        eng.search_one("alpha", k=10).collect()  # warm cache + JIT

        q_secs: dict[str, float] = {}
        for name, qtext in BENCH_QUERIES:
            runs = []
            for _ in range(3):
                t0 = time.monotonic()
                eng.search_one(qtext, k=10).collect()
                runs.append(time.monotonic() - t0)
            q_secs[name] = round(statistics.median(runs), 4)

        # ---- sf-dir corpus end-to-end (driver cross-round signal) -------
        t0 = time.monotonic()
        import __spark_entry__ as entry_mod

        sf_eng = entry_mod._engine(spark, sf_dir)
        sf_res = sf_eng.search_batch(entry_mod.TESTDATA_QUERIES, k=10)
        sf_rows = sf_res.count()
        sf_sec = time.monotonic() - t0

    p50 = statistics.median(q_secs.values())
    total = round(build_sec + sum(q_secs.values()) + sf_sec, 3)
    out = {
        "metric": "index_build_and_bm25_topk",
        "value": total,
        "unit": "sec",
        "queries": q_secs,
        "sf": sf,
        "build_sec": round(build_sec, 3),
        "build_turns": n_turns,
        "build_turns_per_sec": round(n_turns / build_sec, 1),
        "query_p50_sec": round(p50, 4),
        "sf_corpus_sec": round(sf_sec, 3),
        "sf_corpus_rows": sf_rows,
        "cpus": cpus,
        "gen_sec": round(gen_sec, 3),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
