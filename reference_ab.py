"""Direct A/B against the COMPILED reference ATIRE engine.

Everything else in this repo certifies rank identity against a numpy
oracle that *models* the reference semantics (SURVEY.md section 4.5).
This harness removes the model from the loop: it compiles the actual
reference (out-of-tree, under /tmp — the repo never gains C++ code),
feeds the reference binary and our Spark engine byte-identical corpora,
and asserts the top-k (docid, fixed-point rsv) lists are EQUAL, then
measures the reference's real single-node build throughput and query
latency for BASELINE.md.

Build recipe (reproduced by :func:`ensure_reference_built`)::

    cp -r /root/reference /tmp/atire_build
    # 2008-era C++ under gcc 12+: relax to -fpermissive, silence -Wall
    sed -i 's/-x c++ -std=c++11 -Wall  \\\\/-x c++ -std=gnu++11 -fpermissive -w \\\\/' \
        /tmp/atire_build/GNUmakefile.defns
    make -C /tmp/atire_build -j24    # -> bin/index, bin/atire, ...

Corpus parity protocol
----------------------
The reference's TREC reader indexes the serialization wrapper itself:
``<DOC>``/``<DOCNO>`` tag names become (length-exempt, idf==0) terms and
the DOCNO text is tokenized into the document (parser.c:62-365 makes
``t123`` -> word ``t`` + number ``123``, both counted in doc length,
index_document.c:61).  Our engine reads the transcripts table directly
and has no wrapper.  To make the two engines score the *same* index we
give both sides the same two extra tokens per document:

    reference doc:   <DOC>\\n<DOCNO>t{docid}</DOCNO>\\n{text}\\n</DOC>
    our text column: "t{docid} {text}"

Effects (identical on both sides): every doc length +2, mean length
shifts accordingly, term ``t`` has df == N (idf == 0 -> contributes
nothing even if queried, ranking_function_bm25.c:91-92), and each
``{docid}`` number token is unique (df == 1, never queried).  The
``DOC``/``DOCNO`` tag terms exist only in the reference index but are
excluded from doc length (index_document.c:61 counts words+numbers
only) and have idf == 0, so they cannot influence any score.  Hence
every query over the real vocabulary must produce bit-identical
fixed-point accumulators — verified here, not assumed.

Empty turns are dropped from BOTH inputs before export (the wrapper
would otherwise make the reference index a 2-token doc that our engine
skips, desynchronizing docids — index.c:533-540 vs build.py docid rank).

Usage::

    python reference_ab.py identity [--scale small] [--cpus 8]
    python reference_ab.py throughput [--convs 20000] [--repeats 3]

Both modes print one JSON line; ``identity`` exits nonzero on any
rank/score mismatch.  Requires the reference build (made on demand from
/root/reference); skips with a clear message when neither is available.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

ATIRE_BUILD_DIR = os.environ.get("ATIRE_BUILD_DIR", "/tmp/atire_build")
REFERENCE_SRC = os.environ.get("ATIRE_REFERENCE_SRC", "/root/reference")

# query set: the bench queries plus parity stressors (repeated term,
# mixed case, absent term, many terms, tf-capped term).  Vocabulary
# words are reached through their NUMBER halves: NEXI's query lexer
# keeps ``term09874`` whole (one XML-name token — a vocabulary miss on
# BOTH engines, since the index side splits word+number), so reachable
# queries use the bare zero-padded numbers; the ``term`` word half has
# df==N → idf 0 → contributes nothing even when queried.  A few
# deliberate whole-word queries stay in to pin the miss/fold behavior.
AB_QUERIES: list[tuple[int, str]] = [
    (1, "09874"),
    (2, "alpha"),
    (3, "00001 08712"),
    (4, "omegaterm"),
    (5, "alpha bravo charlie"),
    (6, "00001 00002 00003 00004 00005"),
    (7, "zzznotaterm"),
    (8, "00001 00002"),
    (9, "00001 00001"),  # repeated query term (query_frequency: 2× rsv)
    (10, "Alpha"),  # mixed case folds whole (string_pair_to_term)
    (11, "capterm"),  # tf saturation at 255
    (12, "end"),  # punctuation-stripped token
    (13, "00042 31415 00007 alpha delta echo"),
    (14, "term00100"),  # whole-word = ONE XML-name token = vocab miss
    (15, "ALPHA"),  # all-uppercase = verbatim tag lookup = 0 hits
    (16, 'alpha "bravo charlie"'),  # phrase inert → only alpha scores
    (17, "+omegaterm -alpha"),  # signs recorded, bare-term scoring
    (18, "alpha, bravo"),  # stopper + leftover → query refused
]


def ensure_reference_built() -> str | None:
    """Return the reference bin dir, building it out-of-tree if needed.

    Returns None (with a stderr note) when neither a built tree nor the
    reference sources exist — callers skip gracefully.
    """
    bin_dir = os.path.join(ATIRE_BUILD_DIR, "bin")
    if all(
        os.access(os.path.join(bin_dir, exe), os.X_OK)
        for exe in ("index", "atire")
    ):
        return bin_dir
    if not os.path.isdir(REFERENCE_SRC):
        print("reference_ab: no built ATIRE and no source tree; skipping", file=sys.stderr)
        return None
    if not os.path.isdir(ATIRE_BUILD_DIR):
        shutil.copytree(REFERENCE_SRC, ATIRE_BUILD_DIR)
    defns = os.path.join(ATIRE_BUILD_DIR, "GNUmakefile.defns")
    with open(defns) as fh:
        text = fh.read()
    patched = text.replace(
        "override CFLAGS += -x c++ -std=c++11 -Wall  \\",
        "override CFLAGS += -x c++ -std=gnu++11 -fpermissive -w \\",
    )
    if patched != text:
        with open(defns, "w") as fh:
            fh.write(patched)
    os.makedirs(bin_dir, exist_ok=True)
    rc = subprocess.run(
        ["make", "-j", str(min(24, os.cpu_count() or 8))],
        cwd=ATIRE_BUILD_DIR,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    ).returncode
    if rc != 0 or not os.access(os.path.join(bin_dir, "index"), os.X_OK):
        print("reference_ab: ATIRE build failed; skipping", file=sys.stderr)
        return None
    return bin_dir


# ----------------------------------------------------------------------
# corpus export
# ----------------------------------------------------------------------
def prepare_corpus(transcripts):
    """Sort, drop empty turns, assign docids, and wrap text.

    Returns (pandas DataFrame with wrapped ``text`` ready for our
    engine, TREC xml string for the reference indexer).
    """
    from atire_spark.kernels.tokenizer import tokenize

    df = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    keep = df["text"].map(lambda t: bool(tokenize(t)))
    df = df[keep].reset_index(drop=True)
    docids = df.index.to_numpy()
    orig_text = list(df["text"])
    df = df.assign(text=["t%d %s" % (d, t) for d, t in zip(docids, orig_text)])
    parts = [
        "<DOC>\n<DOCNO>t%d</DOCNO>\n%s\n</DOC>\n" % (d, t)
        for d, t in zip(docids, orig_text)
    ]
    return df, "".join(parts)


# docid comes from the <name> (our DOCNO, "t{docid}"), NOT from <id>:
# the reference's internal id is the document's rank in the
# LEXICOGRAPHICALLY sorted doclist ("t13351" lands at id 13345 on the
# small corpus), so <id> never aligns with file order past the first
# few thousand docs
_HIT_RE = re.compile(
    r"<hit><rank>(\d+)</rank><id>\d+</id><name>t(\d+)</name><rsv>([-\d.]+)</rsv></hit>"
)
_BLOCK_RE = re.compile(r"<ATIREsearch>(.*?)</ATIREsearch>", re.S)
_TIME_RE = re.compile(r"<time>(\d+)</time>")


def run_reference_queries(
    bin_dir: str, index_path: str, queries: list[tuple[int, str]], k: int, cwd: str
):
    """Feed queries over stdin to one interactive atire process; parse
    per-query ordered (docid, rsv_int) hit lists and <time> millis."""
    qtext = "".join(q + "\n" for _, q in queries)
    proc = subprocess.run(
        [os.path.join(bin_dir, "atire"), "-nologo", "-findex", index_path, "-l%d" % k],
        input=qtext.encode(),
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        cwd=cwd,
    )
    blocks = _BLOCK_RE.findall(proc.stdout.decode("utf-8", "replace"))
    hits, times_ms = [], []
    for block in blocks:
        hits.append(
            [(int(d), int(round(float(r)))) for _, d, r in _HIT_RE.findall(block)]
        )
        m = _TIME_RE.search(block)
        times_ms.append(int(m.group(1)) if m else None)
    return hits, times_ms


def run_reference_build(bin_dir: str, trec_path: str, index_path: str, cwd: str) -> float:
    t0 = time.perf_counter()
    subprocess.run(
        [
            os.path.join(bin_dir, "index"),
            "-nologo",
            "-rtrec",
            trec_path,
            "-findex",
            index_path,
        ],
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        cwd=cwd,
    )
    return time.perf_counter() - t0


# ----------------------------------------------------------------------
# modes
# ----------------------------------------------------------------------
def _score_groups(hits: list[tuple[int, int]]) -> list[tuple[int, frozenset]]:
    """Ordered (rsv, {docids}) groups of a descending-ranked hit list.

    Equal-score tie ORDER is engine-internal on both sides (the
    reference breaks ties by its lexicographic-doclist accumulator
    address, search_engine_accumulator.h:44-49; we break by numeric
    docid) so identity is asserted per score GROUP over the FULL
    ranking — every document's fixed-point score must agree, which is
    strictly stronger than a top-k list compare under ties.
    """
    groups: list[tuple[int, set]] = []
    for d, r in hits:
        if groups and groups[-1][0] == r:
            groups[-1][1].add(d)
        else:
            groups.append((r, {d}))
    return [(r, frozenset(s)) for r, s in groups]


def identity(scale: str, cpus: int, k: int = 10) -> dict:
    from atire_spark.build import build_index
    from atire_spark.query import SearchEngine
    from atire_spark.session import get_spark
    from atire_spark.synth import make_transcripts

    bin_dir = ensure_reference_built()
    if bin_dir is None:
        return {"skipped": True}

    work = tempfile.mkdtemp(prefix="atire_ab_")
    pdf, trec = prepare_corpus(make_transcripts(scale))
    trec_path = os.path.join(work, "corpus.xml")
    with open(trec_path, "w") as fh:
        fh.write(trec)
    index_path = os.path.join(work, "index.aspt")
    ref_build_s = run_reference_build(bin_dir, trec_path, index_path, work)
    # FULL rankings (k = corpus size): every matching document's score
    # is compared, not just a top-k window
    k_full = len(pdf)
    ref_hits, _ = run_reference_queries(bin_dir, index_path, AB_QUERIES, k_full, work)

    spark = get_spark(cpus=cpus, app="reference_ab")
    sdf = spark.createDataFrame(pdf)
    engine = SearchEngine(spark, build_index(spark, sdf))
    rows = engine.search_batch(AB_QUERIES, k=k_full).collect()
    ours: dict[int, list[tuple[int, int]]] = {qid: [] for qid, _ in AB_QUERIES}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        ours[r["query_id"]].append((int(r["docid"]), int(r["rsv_fixed"])))

    mismatches = []
    for (qid, qtext), ref in zip(AB_QUERIES, ref_hits):
        ref_groups = _score_groups(ref)
        our_groups = _score_groups(ours[qid])
        if ref_groups != our_groups:
            bad = next(
                (
                    {
                        "rsv_ref": rg[0] if rg else None,
                        "rsv_ours": og[0] if og else None,
                        "only_ref": sorted(rg[1] - og[1])[:5] if rg and og else [],
                        "only_ours": sorted(og[1] - rg[1])[:5] if rg and og else [],
                    }
                    for rg, og in zip(
                        list(ref_groups) + [None], list(our_groups) + [None]
                    )
                    if rg != og
                ),
                None,
            )
            mismatches.append(
                {
                    "query": qtext,
                    "n_ref": len(ref),
                    "n_ours": len(ours[qid]),
                    "first_diff_group": bad,
                }
            )
    out = {
        "mode": "identity",
        "scale": scale,
        "docs": int(len(pdf)),
        "queries": len(AB_QUERIES),
        "matched": len(AB_QUERIES) - len(mismatches),
        "mismatches": mismatches,
        "reference_build_s": round(ref_build_s, 3),
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def throughput(n_convs: int, repeats: int, k: int = 10) -> dict:
    """Measured single-node reference numbers at bench scale.

    Build: median of ``repeats`` full index runs (the reference uses
    its own 8 indexing threads, GNUmakefile.defns:37).  Query: the
    bench query set round-robined ``repeats`` times through one
    process; p50 of the reference's own per-query <time> millis."""
    from atire_spark.synth import make_transcripts_bench

    bin_dir = ensure_reference_built()
    if bin_dir is None:
        return {"skipped": True}

    work = tempfile.mkdtemp(prefix="atire_ab_bench_")
    pdf, trec = prepare_corpus(make_transcripts_bench(n_convs))
    trec_path = os.path.join(work, "corpus.xml")
    with open(trec_path, "w") as fh:
        fh.write(trec)
    index_path = os.path.join(work, "index.aspt")

    builds = [
        run_reference_build(bin_dir, trec_path, index_path, work)
        for _ in range(repeats)
    ]
    build_s = statistics.median(builds)

    queries = [(i + 1, q) for i, (_, q) in enumerate(AB_QUERIES)] * repeats
    t0 = time.perf_counter()
    _, times_ms = run_reference_queries(bin_dir, index_path, queries, k, work)
    wall_q = time.perf_counter() - t0
    times = [t for t in times_ms if t is not None]
    out = {
        "mode": "throughput",
        "docs": int(len(pdf)),
        "reference_build_s": round(build_s, 2),
        "reference_build_runs": [round(b, 2) for b in builds],
        "reference_turns_per_s": round(len(pdf) / build_s, 1),
        "reference_query_p50_ms": statistics.median(times) if times else None,
        "reference_query_mean_ms": (
            round(sum(times) / len(times), 2) if times else None
        ),
        "reference_query_wall_s": round(wall_q, 2),
        "n_query_executions": len(times),
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["identity", "throughput"])
    ap.add_argument("--scale", default="small")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--convs", type=int, default=20000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    if args.mode == "identity":
        out = identity(args.scale, args.cpus)
    else:
        out = throughput(args.convs, args.repeats)
    print(json.dumps(out))
    if out.get("mismatches"):
        sys.exit(1)


if __name__ == "__main__":
    main()
