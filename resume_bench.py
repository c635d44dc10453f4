"""Kill/resume evidence for the checkpointed build — prints ONE JSON line.

The north rule requires the build to be "resumable from checkpoint with
per-partition lineage + metrics". tests/test_checkpoint.py proves
byte-identity under an injected failure at toy scale; this harness
proves it under a real SIGKILL at bench scale:

1. generate the bench transcripts corpus (deterministic seed) to parquet;
2. run the checkpointed build in a CHILD PROCESS and SIGKILL it once the
   lineage log shows the pipeline mid-flight (tokenize done, postings
   partially committed) — a real crash, not a monkeypatched exception;
3. resume in a fresh process (same flags; the _build_log is the only
   state) and time it;
4. run a one-shot non-checkpointed build of the same input for the
   reference wall-clock and output;
5. run a FULL checkpointed build from a clean log — the fair baseline
   for "how much work did resume skip" (same code path, same per-chunk
   commit barriers);
6. verify the resumed index is IDENTICAL to the one-shot build: docmap
   hash, postings hash (includes the compressed bytes), and
   rank/rsv-identical results on a query set.

Env: SPARK_GRAFT_CPUS (default 32), RESUME_BENCH_CONVS (default 100000).

Usage: python resume_bench.py            # orchestrates everything
       python resume_bench.py --child …  # internal (build legs)
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

N_CHUNKS = 8
N_TERM_CHUNKS = 8
QUERIES = [(1, "00001 08712"), (2, "alpha bravo"), (3, "omegaterm")]


def _spark(cpus: int):
    from atire_spark.session import get_spark

    return get_spark(cpus=cpus, app="resume_bench")


def child(mode: str, transcripts: str, outdir: str) -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark(cpus)
    tdf = spark.read.parquet(transcripts)
    if mode == "checkpointed":
        from atire_spark.checkpoint import build_index_checkpointed

        build_index_checkpointed(
            spark, tdf, outdir, n_chunks=N_CHUNKS, n_term_chunks=N_TERM_CHUNKS
        )
    else:  # oneshot
        from atire_spark.build import build_index, write_index

        # same segmentation as the checkpointed leg — the identity
        # check compares (term, seg_group) rows including the
        # compressed bytes, so the layouts must agree
        write_index(
            build_index(spark, tdf, block_bits=20, blocks_per_seg=4096),
            outdir,
        )
    spark.stop()


def _log_rows_ok(workdir: str) -> int:
    import glob

    import duckdb

    files = glob.glob(f"{workdir}/_build_log/*.parquet")
    if not files:
        return 0
    try:
        return duckdb.execute(
            "SELECT count(*) FROM read_parquet(?) WHERE status='ok'", [files]
        ).fetchone()[0]
    except Exception:
        return 0  # a file mid-write; try again next poll


def _run_child(mode: str, transcripts: str, outdir: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, __file__, "--child", mode, transcripts, outdir],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def main() -> None:
    n_convs = int(os.environ.get("RESUME_BENCH_CONVS", "100000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scratch = tempfile.mkdtemp(prefix="resume_bench_")
    transcripts = f"{scratch}/transcripts"
    workdir = f"{scratch}/ckpt_idx"
    oneshot_dir = f"{scratch}/oneshot_idx"

    # ---- corpus ---------------------------------------------------------
    from atire_spark.synth import make_transcripts_bench

    pdf = make_transcripts_bench(n_convs)
    n_turns = len(pdf)
    os.makedirs(transcripts, exist_ok=True)
    pdf.to_parquet(
        f"{transcripts}/part-0.parquet",
        index=False,
        # Spark rejects pyarrow's default TIMESTAMP(NANOS) physical type
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )

    # ---- leg 1: build + SIGKILL mid-postings ---------------------------
    # tokenize chunks + docids + a few postings chunks committed = the
    # pipeline is provably mid-flight when the process dies
    kill_threshold = N_CHUNKS + 1 + 2
    p = _run_child("checkpointed", transcripts, workdir)
    t0 = time.monotonic()
    killed_at_rows = -1
    while p.poll() is None:
        rows = _log_rows_ok(workdir)
        if rows >= kill_threshold:
            p.send_signal(signal.SIGKILL)
            p.wait()
            killed_at_rows = rows
            break
        time.sleep(1.0)
    kill_leg_sec = time.monotonic() - t0
    total_units = 2 * N_CHUNKS + 2  # tokenize + docids + postings + finalize

    # ---- leg 2: resume to completion ------------------------------------
    t0 = time.monotonic()
    p = _run_child("checkpointed", transcripts, workdir)
    rc = p.wait()
    resume_sec = time.monotonic() - t0
    assert rc == 0, f"resume leg failed rc={rc}"

    # ---- leg 3: one-shot reference --------------------------------------
    t0 = time.monotonic()
    p = _run_child("oneshot", transcripts, oneshot_dir)
    rc = p.wait()
    oneshot_sec = time.monotonic() - t0
    assert rc == 0, f"oneshot leg failed rc={rc}"

    # ---- leg 4: full checkpointed rebuild (fair savings baseline) -------
    # resume-vs-oneshot mixes two code paths (the one-shot build has no
    # per-chunk commit barriers); the work the checkpoint actually saves
    # is measured against a full checkpointed build from a clean log
    ckpt_full_dir = f"{scratch}/ckpt_full_idx"
    t0 = time.monotonic()
    p = _run_child("checkpointed", transcripts, ckpt_full_dir)
    rc = p.wait()
    ckpt_full_sec = time.monotonic() - t0
    assert rc == 0, f"ckpt-full leg failed rc={rc}"

    # ---- verify: resumed == one-shot ------------------------------------
    from pyspark.sql import functions as F

    from atire_spark.build import load_index
    from atire_spark.checkpoint import build_index_checkpointed
    from atire_spark.query import SearchEngine

    spark = _spark(cpus)
    tdf = spark.read.parquet(transcripts)
    ckpt = build_index_checkpointed(  # all phases logged ok → pure read
        spark, tdf, workdir, n_chunks=N_CHUNKS, n_term_chunks=N_TERM_CHUNKS
    )
    ref = load_index(spark, oneshot_dir)

    def doc_hash(t):
        # bit_xor: order-independent, no ANSI long-overflow unlike sum()
        return t.docmap.agg(
            F.bit_xor(F.xxhash64("conv_id", "turn_idx", "docid", "doc_len")),
            F.count("*"),
        ).collect()[0]

    def post_hash(t):
        return t.postings.agg(
            F.bit_xor(
                F.xxhash64(
                    "term",
                    "seg_group",
                    "first_docid",
                    "last_docid",
                    "n_postings",
                    "postings",
                    "doc_lens",
                )
            ),
            F.count("*"),
        ).collect()[0]

    docmap_identical = doc_hash(ckpt) == doc_hash(ref)
    postings_identical = post_hash(ckpt) == post_hash(ref)
    a = (
        SearchEngine(spark, ckpt)
        .search_batch(QUERIES, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        SearchEngine(spark, ref)
        .search_batch(QUERIES, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    queries_identical = a[["query_id", "docid", "rsv_fixed"]].equals(
        b[["query_id", "docid", "rsv_fixed"]]
    )
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "resume_build_kill9",
                "convs": n_convs,
                "turns": n_turns,
                "cpus": cpus,
                "units_total": total_units,
                "units_done_at_kill": killed_at_rows,
                "kill_leg_sec": round(kill_leg_sec, 1),
                "resume_sec": round(resume_sec, 1),
                "oneshot_sec": round(oneshot_sec, 1),
                "ckpt_full_sec": round(ckpt_full_sec, 1),
                "resume_saved_pct": round(
                    100.0 * (1 - resume_sec / ckpt_full_sec), 1
                ),
                "docmap_identical": docmap_identical,
                "postings_identical": postings_identical,
                "queries_identical": queries_identical,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        main()
