"""Two-cluster-size scaling evidence (the north_rule criterion).

The target rule asks for indexing-throughput scaling efficiency >= 0.8
from N to 4N executors. The sandbox has no real cluster, so (per the
driver instruction) the same job runs at two parallelism levels on the
same input — local[N] and local[4N] — in separate JVMs, and this
script reports throughput at both plus

    efficiency = throughput(4N) / (4 * throughput(N))

Usage:
    python scaling_bench.py                # N=8 -> local[8] vs local[32]
    SPARK_GRAFT_SCALE_CONVS=40000 python scaling_bench.py
    python scaling_bench.py --worker 8     # (internal) one measured run

Each worker is a fresh ``spark-submit``-equivalent process (one JVM,
one SparkSession) so the two measurements share nothing but the input
generator seed. Prints ONE JSON line; also meant to be pasted into
BENCH.md / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time


def worker(cpus: int, n_convs: int, mode: str) -> None:
    """One measured build. The input is staged to PARQUET first (outside
    the timed region): a driver-local in-memory frame re-serializes
    from the driver on every scan — a single-threaded cost no real
    table ingest has, which would show up as fake serial fraction in
    the scaling ratio. Reading files is the deployment input path."""
    from atire_spark.build import build_index, write_index
    from atire_spark.session import get_spark
    from atire_spark.synth import make_transcripts_bench

    if os.environ.get("SPARK_GRAFT_SCALE_AFFINITY", "1") == "1" and hasattr(
        os, "sched_setaffinity"
    ):
        # pin the WHOLE leg (this process + the JVM + Python workers it
        # forks) to exactly `cpus` CPUs. Without this, a "local[2]"
        # JVM on an idle 32-core host runs its GC, netty, parquet
        # compression and shuffle threads on extra cores — the N leg
        # cheats and the measured N→4N efficiency collapses even when
        # the engine scales. A real N-core executor container has N
        # cores for EVERYTHING, which is what affinity reproduces.
        os.sched_setaffinity(0, set(range(cpus)))
    if mode == "executors":
        # N separate executor JVMs x SPARK_GRAFT_SCALE_EXEC_CORES each
        # — the faithful "N vs 4N executors" simulation (each executor
        # has its own heap and garbage collector, like a cluster node)
        exec_cores = int(os.environ.get("SPARK_GRAFT_SCALE_EXEC_CORES", "8"))
        if exec_cores > cpus:
            raise SystemExit(
                f"SPARK_GRAFT_SCALE_EXEC_CORES={exec_cores} exceeds this "
                f"leg's {cpus} cpus — local-cluster[0,...] would hang; "
                "lower it or use SPARK_GRAFT_SCALE_MODE=threads"
            )
        n_exec = cpus // exec_cores
        spark = get_spark(
            cpus=cpus,
            app=f"scale{n_exec}x{exec_cores}",
            master=f"local-cluster[{n_exec},{exec_cores},8192]",
            extra_conf={
                "spark.executor.memory": "7g",
                # executor JVMs are fresh processes: ship the package
                # path like spark-submit --py-files would
                "spark.executorEnv.PYTHONPATH": os.path.dirname(
                    os.path.abspath(__file__)
                ),
            },
        )
    else:
        spark = get_spark(cpus=cpus, app=f"scale{cpus}")
    pdf = make_transcripts_bench(n_convs)
    with tempfile.TemporaryDirectory() as tmp:
        # FIXED input layout (32 files) for every leg: the input table's
        # file count is a property of the data, not of the cluster being
        # measured — per-leg layouts would hand the bigger leg a
        # differently-shaped scan and bias the ratio
        spark.createDataFrame(pdf).repartition(32).write.parquet(
            f"{tmp}/input"
        )
        tdf = spark.read.parquet(f"{tmp}/input")
        job = os.environ.get("SPARK_GRAFT_SCALE_JOB", "build")
        if job == "match":
            # standing-query matcher scaling: map-only scan, so this
            # leg pair evidences the streaming query side's linear
            # scale-out claim. Stats snapshot + JIT/Arrow warmup are
            # untimed (a deployed matcher runs against a long-lived
            # snapshot with warm workers).
            from atire_spark.stream_query import (
                frozen_stats_from_index,
                standing_query_matches,
            )

            standing = [
                (1, "09874"), (2, "alpha"), (3, "00001 08712"),
                (4, "omegaterm"), (5, "alpha bravo charlie"),
                (6, "00001 00002 00003 00004 00005"),
                (7, "zzznotaterm"), (8, "00001 00002"),
            ]
            idx = build_index(
                spark, spark.createDataFrame(pdf.iloc[: len(pdf) // 8])
            )
            stats = frozen_stats_from_index(spark, idx, standing)
            standing_query_matches(
                spark.createDataFrame(pdf.iloc[: len(pdf) // 8]),
                standing, stats,
            ).count()  # warmup
            t0 = time.monotonic()
            standing_query_matches(tdf, standing, stats).count()
            build_sec = time.monotonic() - t0
        else:
            # untimed warmup over a small slice: the first build in a
            # fresh JVM pays whole-stage codegen JIT and Python-worker
            # forking — a FIXED startup cost, not throughput. The
            # shorter 4N leg would otherwise carry proportionally more
            # of it, biasing the ratio; a deployed cluster is
            # long-lived and runs warm (bench.py warms up for the same
            # reason, and the nocoord_bench control warms identically)
            warm = build_index(
                spark, spark.createDataFrame(pdf.iloc[: len(pdf) // 8])
            )
            write_index(warm, f"{tmp}/warmidx")
            t0 = time.monotonic()
            tables = build_index(spark, tdf)
            write_index(tables, f"{tmp}/idx")
            build_sec = time.monotonic() - t0
    spark.stop()
    print(json.dumps({"cpus": cpus, "turns": len(pdf), "build_sec": build_sec}))


def main() -> None:
    mode = os.environ.get("SPARK_GRAFT_SCALE_MODE", "threads")
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]),
               int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "40000")),
               mode)
        return
    import statistics

    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    # the sandbox host's available CPU drifts minute-to-minute (it is
    # shared); single-shot leg pairs have produced efficiencies from
    # 0.29 to 0.98 on IDENTICAL code. Interleave the legs (N, 4N, N,
    # 4N, ...) so both sample the same drift, take the median per leg.
    runs: dict[int, list[float]] = {n: [], 4 * n: []}
    turns = 0
    for _ in range(repeats):
        for cpus in (n, 4 * n):
            out = subprocess.run(
                [sys.executable, __file__, "--worker", str(cpus)],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            rec = json.loads(line)
            runs[cpus].append(rec["build_sec"])
            turns = rec["turns"]
    sec_n = statistics.median(runs[n])
    sec_4n = statistics.median(runs[4 * n])
    r_n = turns / sec_n
    r_4n = turns / sec_4n
    eff = r_4n / (4.0 * r_n)
    job = os.environ.get("SPARK_GRAFT_SCALE_JOB", "build")
    print(json.dumps({
        "metric": (
            "index_build_scaling"
            if job == "build"
            else "standing_query_match_scaling"
        ),
        "mode": mode,
        "n_cores": n,
        "repeats": repeats,
        "turns": turns,
        "build_sec_n": round(sec_n, 1),
        "build_sec_4n": round(sec_4n, 1),
        "build_sec_n_runs": [round(x, 1) for x in runs[n]],
        "build_sec_4n_runs": [round(x, 1) for x in runs[4 * n]],
        "turns_per_sec_n": round(r_n, 1),
        "turns_per_sec_4n": round(r_4n, 1),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
