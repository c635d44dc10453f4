"""No-coordination hardware-floor control for the scaling criterion.

BENCH.md's round-3 scaling attribution compares the engine's pinned
local[N] -> local[4N] efficiency against the same host running K fully
INDEPENDENT single-core builds (separate JVMs, separate inputs, zero
shuffle or scheduling between them). Any efficiency loss the control
shows is the box's shared memory system (DRAM/LLC bandwidth), not
engine coordination — on the deployment the north_rule describes
(N vs 4N executor MACHINES) each executor brings its own memory
system, so that loss does not transfer.

This script is the committed form of that control:

    python nocoord_bench.py            # K=2 vs K=8 independent builds
    SPARK_GRAFT_SCALE_CONVS=40000 python nocoord_bench.py

Each worker process is pinned to ONE distinct CPU and runs a full
local[1] build of its own copy of the corpus. Aggregate throughput at
K workers = K * turns / max(worker wall); the floor efficiency is
    agg(4K0) / (4 * agg(K0)).
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time


def worker(cpu: int, n_convs: int) -> None:
    cores = int(os.environ.get("SPARK_GRAFT_SCALE_WORKER_CORES", "1"))
    os.sched_setaffinity(0, set(range(cpu * cores, (cpu + 1) * cores)))
    # K co-resident JVMs must fit the box: the engine legs run ONE
    # driver at the default heap, so give each control worker 1/K of
    # comparable headroom rather than K full-size heaps (8 x 48g on a
    # 128 GiB host measures swap, not memory bandwidth)
    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    from atire_spark.build import build_index, write_index
    from atire_spark.session import get_spark
    from atire_spark.synth import make_transcripts_bench

    spark = get_spark(cpus=cores, app=f"nocoord{cpu}")
    pdf = make_transcripts_bench(n_convs)
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(pdf).repartition(32).write.parquet(
            f"{tmp}/input"
        )
        tdf = spark.read.parquet(f"{tmp}/input")
        # untimed warmup: same discipline as scaling_bench.py's build
        # leg — JIT/codegen/worker-fork are fixed startup costs, not
        # throughput, and both sides of the attribution must exclude
        # them identically
        warm = build_index(
            spark, spark.createDataFrame(pdf.iloc[: len(pdf) // 8])
        )
        write_index(warm, f"{tmp}/warmidx")
        t0 = time.monotonic()
        tables = build_index(spark, tdf)
        write_index(tables, f"{tmp}/idx")
        wall = time.monotonic() - t0
    spark.stop()
    print(json.dumps({"cpu": cpu, "turns": len(pdf), "build_sec": wall}))


def leg(k: int, n_convs: int) -> tuple[int, float]:
    """K pinned independent builds; returns (turns each, max wall)."""
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(cpu)],
            stdout=subprocess.PIPE,
            text=True,
            env={**os.environ, "SPARK_GRAFT_SCALE_CONVS": str(n_convs)},
        )
        for cpu in range(k)
    ]
    walls, turns = [], 0
    for p in procs:
        out, _ = p.communicate()
        if p.returncode:
            raise SystemExit(f"worker failed rc={p.returncode}")
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        walls.append(rec["build_sec"])
        turns = rec["turns"]
    return turns, max(walls)


def main() -> None:
    n_convs = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "40000"))
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]), n_convs)
        return
    k0 = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    out = {}
    for k in (k0, 4 * k0):
        turns, wall = leg(k, n_convs)
        out[k] = {"turns_each": turns, "max_wall_sec": round(wall, 1),
                  "agg_turns_per_sec": round(k * turns / wall, 1)}
    eff = out[4 * k0]["agg_turns_per_sec"] / (
        4.0 * out[k0]["agg_turns_per_sec"]
    )
    print(json.dumps({
        "metric": "nocoord_hardware_floor",
        "k": k0,
        "worker_cores": int(
            os.environ.get("SPARK_GRAFT_SCALE_WORKER_CORES", "1")
        ),
        "legs": out,
        "floor_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
