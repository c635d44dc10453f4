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


def ensure_reference_built(single_threaded: bool = False) -> str | None:
    """Return the reference bin dir, building it out-of-tree if needed.

    ``single_threaded=True`` builds a SEPARATE tree with
    ``USE_PARALLEL_INDEXING := 0``: the stock build indexes with 8
    worker threads whose completion order assigns internal docids, so
    nearby documents land in a nondeterministically-permuted order
    (observed: doclist ``..., t0002729, t0002731, t0002732, t0002730,
    t0002733, ...``) — rank-identity A/B needs the deterministic
    file-order docid assignment, while throughput measurement wants
    the stock parallel build.

    Returns None (with a stderr note) when neither a built tree nor the
    reference sources exist — callers skip gracefully.
    """
    build_dir = ATIRE_BUILD_DIR + ("_st" if single_threaded else "")
    bin_dir = os.path.join(build_dir, "bin")
    if all(
        os.access(os.path.join(bin_dir, exe), os.X_OK)
        for exe in ("index", "atire")
    ):
        return bin_dir
    if not os.path.isdir(REFERENCE_SRC):
        print("reference_ab: no built ATIRE and no source tree; skipping", file=sys.stderr)
        return None
    if not os.path.isdir(build_dir):
        shutil.copytree(REFERENCE_SRC, build_dir)
    defns = os.path.join(build_dir, "GNUmakefile.defns")
    with open(defns) as fh:
        text = fh.read()
    patched = text.replace(
        "override CFLAGS += -x c++ -std=c++11 -Wall  \\",
        "override CFLAGS += -x c++ -std=gnu++11 -fpermissive -w \\",
    )
    if single_threaded:
        patched = patched.replace(
            "USE_PARALLEL_INDEXING := 1", "USE_PARALLEL_INDEXING := 0"
        )
    if patched != text:
        with open(defns, "w") as fh:
            fh.write(patched)
    os.makedirs(bin_dir, exist_ok=True)
    rc = subprocess.run(
        ["make", "-j", str(min(24, os.cpu_count() or 8))],
        cwd=build_dir,
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
    # ZERO-PADDED docnames: fixed-width names keep numeric and
    # lexicographic order identical so nothing downstream can depend
    # on the name format. docid alignment itself comes from the
    # single-threaded reference build (file-order internal ids); the
    # stock 8-thread indexer permutes nearby docids nondeterministically
    df = df.assign(
        text=["t%07d %s" % (d, t) for d, t in zip(docids, orig_text)]
    )
    parts = [
        "<DOC>\n<DOCNO>t%07d</DOCNO>\n%s\n</DOC>\n" % (d, t)
        for d, t in zip(docids, orig_text)
    ]
    return df, "".join(parts)


# docid comes from the <name> (our DOCNO, "t{docid}"), NOT from <id>:
# the reference's internal id is indexing-COMPLETION order — under the
# stock 8-thread indexer that permutes nearby documents ("t13351"
# observed at id 13345), and even the single-threaded build's ids are
# an internal detail; the DOCNO is the stable cross-engine key
_HIT_RE = re.compile(
    r"<hit><rank>(\d+)</rank><id>\d+</id><name>t(\d+)</name><rsv>([-\d.]+)</rsv></hit>"
)
_BLOCK_RE = re.compile(r"<ATIREsearch>(.*?)</ATIREsearch>", re.S)
_TIME_RE = re.compile(r"<time>(\d+)</time>")


def run_reference_queries(
    bin_dir: str,
    index_path: str,
    queries: list[tuple[int, str]],
    k: int,
    cwd: str,
    extra_flags: list[str] | None = None,
    l: int | None = None,
):
    """Feed queries over stdin to one interactive atire process; parse
    per-query ordered (docid, rsv_int) hit lists and <time> millis.
    ``extra_flags`` select ranker / stemmer / QaaT / feedback modes.

    ``-k`` (the top_k accuracy point) is always pinned to the list
    length: the reference's Bentley-McIlroy ``top_k_sort`` only
    guarantees accurate (rsv desc, docid desc) order for the first
    top_k entries — beyond it, equal-rsv runs keep partition-swap
    artifacts (observed: 2778 before 2779 mid-list without ``-k``).

    ``l`` overrides the printed-list length: full-ranking callers pass
    headroom above the corpus size because duplicate transition
    entries (see below) inflate numhits past the document count."""
    qtext = "".join(q + "\n" for _, q in queries)
    ll = l if l is not None else k
    proc = subprocess.run(
        [
            os.path.join(bin_dir, "atire"),
            "-nologo",
            "-findex",
            index_path,
            "-l%d" % ll,
            "-k%d" % ll,
        ]
        + (extra_flags or []),
        input=qtext.encode(),
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        cwd=cwd,
    )
    blocks = _BLOCK_RE.findall(proc.stdout.decode("utf-8", "replace"))
    hits, times_ms = [], []
    for block in blocks:
        parsed = [
            (int(d), int(round(float(r)))) for _, d, r in _HIT_RE.findall(block)
        ]
        # the reference appends a doc to accumulator_pointers once per
        # 0→nonzero transition (search_engine_result.h add_rsv); with
        # negative LM contributions a doc can cross zero and transition
        # AGAIN, so its final (docid, rsv) appears TWICE in the output
        # (observed: 60 duplicate hits on an lmd 5-term query).
        # Collapse the duplicates — an engine emitting one row per doc
        # is the correct observable; the duplicate is a reference
        # artifact of its candidate-list bookkeeping.
        seen: set[int] = set()
        dedup = []
        for d, r in parsed:
            if d not in seen:
                seen.add(d)
                dedup.append((d, r))
        hits.append(dedup)
        m = _TIME_RE.search(block)
        times_ms.append(int(m.group(1)) if m else None)
    return hits, times_ms


def run_reference_build(
    bin_dir: str,
    trec_path: str,
    index_path: str,
    cwd: str,
    extra_flags: list[str] | None = None,
) -> float:
    """ALL flags must precede the input filename: the reference's
    param parser stops at the first positional argument and silently
    treats everything after it as more input files — a trailing
    ``-findex``/``-Q``/``-t`` is ignored and the index lands at the
    default ``index.aspt`` (verified empirically; atire/index.c:162
    param parse)."""
    t0 = time.perf_counter()
    subprocess.run(
        [os.path.join(bin_dir, "index"), "-nologo"]
        + (extra_flags or [])
        + ["-rtrec", "-findex", index_path, trec_path],
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


def _diff_rankings(
    queries: list[tuple[int, str]],
    ref_hits: list[list[tuple[int, int]]],
    ours: dict[int, list[tuple[int, int]]],
    boundary_tolerant: bool = False,
) -> list[dict]:
    """Per-query ranking comparison; returns mismatch summaries.

    Default: STRICT list equality — with zero-padded docnames the two
    engines share docid assignment, signed-short scores, AND tie-break
    (rsv desc, docid desc), so full rankings must be identical element
    by element. ``boundary_tolerant=True`` relaxes to score-group
    comparison with a tolerant final group — used only for the QaaT
    early-termination heuristics, whose results legitimately depend on
    quantum traversal order (global in the reference, per docid-range
    partition here).
    """
    # a missing/short reference result set is a FAILURE, not a free
    # pass — zip() would silently compare nothing (the failure mode
    # when atire can't load the index and emits zero result blocks)
    if len(ref_hits) != len(queries):
        return [
            {
                "query": "*",
                "error": "reference returned %d result blocks for %d queries"
                % (len(ref_hits), len(queries)),
            }
        ]
    mismatches = []
    for (qid, qtext), ref in zip(queries, ref_hits):
        mine = ours.get(qid, [])
        if not boundary_tolerant:
            if ref == mine:
                continue  # strict element-by-element identity
            rg_cmp = _score_groups(ref)
            og_cmp = _score_groups(mine)
        else:
            ref_groups = _score_groups(ref)
            our_groups = _score_groups(mine)
            rg_cmp, og_cmp = ref_groups, our_groups
            if ref_groups and our_groups:
                rl, ol = ref_groups[-1], our_groups[-1]
                if rl[0] == ol[0] and len(rl[1]) == len(ol[1]):
                    rg_cmp = ref_groups[:-1]
                    og_cmp = our_groups[:-1]
            if rg_cmp == og_cmp:
                continue
        if True:
            bad = next(
                (
                    {
                        "rsv_ref": rg[0] if rg else None,
                        "rsv_ours": og[0] if og else None,
                        "only_ref": sorted(rg[1] - og[1])[:5] if rg and og else [],
                        "only_ours": sorted(og[1] - rg[1])[:5] if rg and og else [],
                    }
                    for rg, og in zip(
                        list(rg_cmp) + [None], list(og_cmp) + [None]
                    )
                    if rg != og
                ),
                None,
            )
            mismatches.append(
                {
                    "query": qtext,
                    "n_ref": len(ref),
                    "n_ours": len(ours.get(qid, [])),
                    "first_diff_group": bad,
                }
            )
    return mismatches


def _collect_ours(rows) -> dict[int, list[tuple[int, int]]]:
    """Spark result rows → {query_id: rank-ordered (docid, rsv_fixed)}."""
    ours: dict[int, list[tuple[int, int]]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        ours.setdefault(int(r["query_id"]), []).append(
            (int(r["docid"]), int(r["rsv_fixed"]))
        )
    return ours


def identity(scale: str, cpus: int, k: int = 10) -> dict:
    from atire_spark.build import build_index
    from atire_spark.query import SearchEngine
    from atire_spark.session import get_spark
    from atire_spark.synth import make_transcripts

    bin_dir = ensure_reference_built(single_threaded=True)
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
    ref_hits, _ = run_reference_queries(
        bin_dir, index_path, AB_QUERIES, k_full, work, l=4 * k_full
    )

    spark = get_spark(cpus=cpus, app="reference_ab")
    sdf = spark.createDataFrame(pdf)
    engine = SearchEngine(spark, build_index(spark, sdf))
    rows = engine.search_batch(AB_QUERIES, k=k_full).collect()
    ours: dict[int, list[tuple[int, int]]] = {qid: [] for qid, _ in AB_QUERIES}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        ours[r["query_id"]].append((int(r["docid"]), int(r["rsv_fixed"])))

    mismatches = _diff_rankings(AB_QUERIES, ref_hits, ours)
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


def fuzz(
    scale: str,
    cpus: int,
    n_queries: int = 60,
    seed: int = 20260821,
    ranker: str = "bm25",
    stemmer: str | None = None,
    quantized: bool = False,
    conjunctive: bool = False,
    feedback: bool = False,
    corpus: str = "ascii",
) -> dict:
    """Randomized differential identity vs the COMPILED reference:
    seeded random bag queries sampled from the corpus's real token
    population, full rankings compared element by element (same
    machinery as ``identity``).

    The sample pool mixes three populations on purpose:

    - index tokens (the letter/digit runs the indexer produces) —
      plain vocabulary hits;
    - raw whitespace words of the corpus (e.g. ``term00042``,
      ``t0000123`` docnames) — these exercise the QUERY lexer parity:
      the reference's NEXI lexer keeps an alphanumeric word as ONE
      XML-name token (a vocabulary miss), and our parse must agree;
    - absent terms — must score nothing on both sides.

    ``corpus="unicode"`` swaps in the Unicode corpus
    (synth.make_transcripts_unicode): accented Latin in NFC and NFD
    spellings, non-decomposable letters, Cyrillic/Greek with case
    variants, and CJK runs — the raw-word pool then carries
    pre-normalization spellings (decomposed marks, non-ASCII
    uppercase), so the QUERY-side normalize parity is fuzzed too,
    not just the indexer's.
    """
    import numpy as np

    from atire_spark.build import build_index
    from atire_spark.kernels.tokenizer import tokenize
    from atire_spark.query import SearchEngine
    from atire_spark.session import get_spark
    from atire_spark.synth import make_transcripts, make_transcripts_unicode

    bin_dir = ensure_reference_built(single_threaded=True)
    if bin_dir is None:
        return {"skipped": True}

    work = tempfile.mkdtemp(prefix="atire_abf_")
    if corpus == "unicode":
        n = {"tiny": 60, "small": 400, "medium": 2000}.get(scale, 400)
        source_pdf = make_transcripts_unicode(n)
    else:
        source_pdf = make_transcripts(scale)
    pdf, trec = prepare_corpus(source_pdf)
    trec_path = os.path.join(work, "corpus.xml")
    with open(trec_path, "w") as fh:
        fh.write(trec)
    index_path = os.path.join(work, "index.aspt")
    if quantized and (stemmer or ranker != "bm25" or conjunctive):
        raise ValueError("quantized fuzz supports only the plain BM25 path")
    if feedback and (quantized or conjunctive or stemmer or ranker != "bm25"):
        raise ValueError("feedback fuzz supports only the plain BM25 path")
    stem_flags = ["-t" + STEMMER_FLAGS[stemmer]] if stemmer else []
    build_flags = list(stem_flags)
    if quantized:
        build_flags += ["-QBM25:0.9:0.4", "-q8"]
    if feedback:
        build_flags += ["-Cn"]  # the blind-KL pass reads the doc store
    ref_build_s = run_reference_build(
        bin_dir, trec_path, index_path, work, extra_flags=build_flags
    )

    rng = np.random.default_rng(seed)
    index_pool: list[str] = []
    raw_pool: list[str] = []
    for t in pdf["text"]:
        index_pool.extend(tokenize(t))
        raw_pool.extend(t.split())
    index_pool = sorted(set(index_pool))
    raw_pool = sorted(set(raw_pool))
    if stemmer:
        # a mixed-case query term on a stemmed reference index takes
        # the unstemmed branch on the RAW first char but skips the
        # dictionary pre-lookup on the FOLDED buffer → the reference
        # ranks uninitialized term_details (see the variants stemmer
        # block) — keep the fuzz pool lowercase so we compare real
        # behavior, not an uninitialized-memory read
        raw_pool = [w for w in raw_pool if w == w.lower()]
    queries: list[tuple[int, str]] = []
    for qid in range(1, n_queries + 1):
        n_terms = int(rng.integers(1, 7))
        toks = []
        for _ in range(n_terms):
            r = rng.random()
            if r < 0.70:
                toks.append(index_pool[int(rng.integers(len(index_pool)))])
            elif r < 0.90:
                toks.append(raw_pool[int(rng.integers(len(raw_pool)))])
            else:
                toks.append(
                    "qq" + "".join(rng.choice(list("abcdefgh"), size=6))
                )
        queries.append((qid, " ".join(toks)))

    k_full = len(pdf)
    if quantized:
        # a -Q index's scores are baked in — no -R flag on either side
        query_flags = []
    elif feedback:
        query_flags = ["-Qr:17:5"]  # blind KL: 17 docs, 5 expansion terms
    elif conjunctive:
        # -Rallterms = TERMCOUNT + drop docs with rsv < terms_in_query
        query_flags = ["-Rallterms"] + stem_flags
    else:
        query_flags = ["-R" + RANKER_FLAGS[ranker]] + stem_flags
    ref_hits, _ = run_reference_queries(
        bin_dir, index_path, queries, k_full, work, l=4 * k_full,
        extra_flags=query_flags,
    )
    spark = get_spark(cpus=cpus, app="reference_ab_fuzz")
    engine = SearchEngine(
        spark,
        build_index(
            spark,
            spark.createDataFrame(pdf),
            stemmer=stemmer,
            quantize_bits=8 if quantized else None,
        ),
    )
    skipped_longest = 0
    if feedback:
        # REFERENCE BUG (found by this fuzz): the indexer stores each
        # -Cn document as raw_length+1 bytes (index.c:562-567, the +1
        # "to include the '\\0'") but records ~documentlongest as
        # raw_length (memory_index.c:1826, add_to_document_repository
        # gets raw_length=length). populate() sizes its buffer as
        # get_longest_document_length() (relevance_feedback.c:104,111)
        # and compress_text_none::decompress refuses when
        # destination < source — one byte short for EXACTLY the
        # collection's longest document(s). get_document ignores the
        # failure and returns the untouched buffer, so the previous
        # feedback document's text is silently indexed twice (or
        # garbage on the first slot). A clean engine cannot and should
        # not reproduce a stale-buffer read, so queries whose feedback
        # set contains a longest document are excluded from the strict
        # assertion (same policy as the mixed-case uninitialized read
        # in the variants stemmer block).
        lens = pdf["text"].str.len()
        longest = set(pdf.index[lens == lens.max()])
        # the exclusion set derives from the REFERENCE's own plain
        # first pass (its feedback set is its top 17), so the filter
        # cannot silently over-skip if the engines ever disagreed
        # about whether a longest doc enters the top 17
        ref_plain, _ = run_reference_queries(
            bin_dir, index_path, queries, 17, work, l=17
        )
        bad = {
            qid
            for (qid, _), hits in zip(queries, ref_plain)
            if any(docid in longest for docid, _ in hits[:17])
        }
        skipped_longest = len(bad)
        # skip CEILING: the exclusion is a narrow boundary-bug filter,
        # not a coverage valve — if it ever ate more than half the
        # query set (e.g. a corpus where the longest doc tops every
        # ranking), the reported n_queries would overstate what was
        # actually asserted, so fail loudly instead of shrinking
        if skipped_longest > len(queries) // 2:
            raise RuntimeError(
                f"feedback fuzz: longest-doc exclusion removed "
                f"{skipped_longest}/{len(queries)} queries — coverage "
                "too low to certify; regenerate the corpus (vary text "
                "lengths) instead of asserting the remainder"
            )
        queries = [q for q in queries if q[0] not in bad]
        # re-run the reference on the filtered set (hit blocks align
        # positionally with the query list)
        ref_hits, _ = run_reference_queries(
            bin_dir, index_path, queries, k_full, work, l=4 * k_full,
            extra_flags=query_flags,
        )
        rows = engine.search_feedback(
            queries, spark.createDataFrame(pdf), k=k_full,
            feedback_documents=17, feedback_terms=5,
        ).collect()
    else:
        rows = engine.search_batch(
            queries,
            k=k_full,
            ranker="termcount" if conjunctive else ranker,
            conjunctive=conjunctive,
        ).collect()
    ours: dict[int, list[tuple[int, int]]] = {qid: [] for qid, _ in queries}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        ours[r["query_id"]].append((int(r["docid"]), int(r["rsv_fixed"])))
    mismatches = _diff_rankings(queries, ref_hits, ours)
    out = {
        "mode": "fuzz",
        "scale": scale,
        "corpus": corpus,
        "docs": int(len(pdf)),
        "ranker": ranker,
        "stemmer": stemmer,
        "quantized": quantized,
        "conjunctive": conjunctive,
        "feedback": feedback,
        "skipped_longest_doc_boundary": skipped_longest,
        "seed": seed,
        # asserted coverage is explicit: `queries` counts only the
        # strictly-asserted set (post-exclusion); the generated size is
        # queries + skipped_longest_doc_boundary
        "queries_generated": len(queries) + skipped_longest,
        "asserted_coverage_pct": round(
            100.0 * len(queries) / max(len(queries) + skipped_longest, 1), 1
        ),
        "queries": len(queries),
        "matched": len(queries) - len(mismatches),
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


# ----------------------------------------------------------------------
# variants mode: binary-certify rankers / stemmers / quantization / QaaT
# ----------------------------------------------------------------------
# our ranker name → the reference's -R flag with OUR implemented
# parameter defaults (all taken from the reference's own headers; the
# kbtfidf pair is k=5, b=5−e so tf=1 scores exactly idf²,
# ranking_function_kbtfidf.c:139)
RANKER_FLAGS: dict[str, str] = {
    "bm25": "BM25:0.9:0.4",
    "bm25l": "BM25L:0.9:0.4:0.5",
    "bm25plus": "BM25+:0.9:0.4:1",
    "bm25t": "BM25T:0.2",
    "bm25adpt": "BM25ADPT:0.3",
    "tflodop": "TFlodop:0.1:0.1",
    "lmd": "lmd:6750",
    "lmds": "lmds:2500",
    "lmjm": "lmjm:0.5",
    "divergence": "divergence",
    "bose": "be",
    "dlh13": "DLH13",
    "dph": "DPH",
    "dfree": "DFRee",
    "dfi": "DFI",
    "dfiw": "DFIW",
    "dfi_idf": "DFI_IDF",
    "dfiw_idf": "DFIW_IDF",
    "inner": "tfidf",
    "kbtfidf": "kbtfidf:5:2.281718171540955",
    "termcount": "termcount",
    "docid_asc": "docid:1",
    "docid_desc": "docid:0",
}

# the Pitman-Yor LM rankers need the Puurula length vectors baked into
# the index: the reference builds one index per vector kind
# (-Ilmp / -Ilmptfidf); our build(puurula=True) stores both families
PUURULA_RANKERS: dict[str, tuple[str, str]] = {
    "lmp": ("-Ilmp", "lmp:1000:0.5"),
    # lmptfidf's powerlaw slot is (int)(g*1000) and must be <= 9
    # (puurula_idf.c:45-48 exits on the help text's own 0.5 default);
    # 0.005 is the largest-step value the C code accepts — the same g
    # our engine implements (PUURULA_IDF_G)
    "lmptfidf": ("-Ilmptfidf", "lmptfidf:1000:0.005"),
}

# our stemmer name → the reference's -t flag suffix (TERM EXPANSION)
STEMMER_FLAGS: dict[str, str] = {
    "porter": "p",
    "s": "s",
    "paice_husk": "h",
    "krovetz": "k",
    "otago": "o",
    "otago_v2": "O",
    "soundex": "S",
    "double_metaphone": "D",
    "snowball_armenian": "Xa",
    "snowball_basque": "Xb",
    "snowball_catalan": "Xc",
    "snowball_danish": "XD",
    "snowball_dutch": "Xd",
    "snowball_kraaij_pohlmann": "Xk",
    "snowball_porter": "XE",
    "snowball_english": "Xe",
    "snowball_lovins": "Xl",
    "snowball_finnish": "XF",
    "snowball_french": "Xf",
    "snowball_german": "Xg",
    "snowball_german2": "X2",
    "snowball_hungarian": "Xh",
    "snowball_italian": "Xi",
    "snowball_norwegian": "Xn",
    "snowball_portuguese": "Xp",
    "snowball_romanian": "XR",
    "snowball_russian": "Xr",
    "snowball_spanish": "XS",
    "snowball_swedish": "Xs",
    "snowball_turkish": "Xt",
}

# QaaT early-termination: -Pq suffix → our search_qaat argument.
# ":n" (no early termination) must be EXACT; the d/s/l heuristics are
# results-changing and order-dependent (the reference prunes over one
# global accumulator, we per disjoint docid range) so they are
# reported informationally, not asserted.
QAAT_MODES: list[tuple[str, str | None, bool]] = [
    ("n", None, True),
    ("d", "diff", False),
    ("s", "diff_smallest", False),
    ("l", "diff_largest", False),
]


def variants(
    scale: str,
    cpus: int,
    stem_convs: int = 400,
    only: str | None = None,
) -> dict:
    """Binary-certify engine variants against the reference CLI.

    Hard-asserted (must match full-ranking score groups): every
    search_batch ranker (-R...), allterms/conjunctive, every stemmer
    slot (-t..., index+query side), the 8-bit quantized index, and
    QaaT with no early termination. Reported informationally: the
    QaaT d/s/l early-termination heuristics (results-changing by
    design and traversal-order-dependent).
    """
    from atire_spark.build import build_index
    from atire_spark.query import SearchEngine
    from atire_spark.session import get_spark
    from atire_spark.synth import make_transcripts

    bin_dir = ensure_reference_built(single_threaded=True)
    if bin_dir is None:
        return {"skipped": True}

    spark = get_spark(cpus=cpus, app="reference_ab_variants")
    work = tempfile.mkdtemp(prefix="atire_ab_var_")
    out: dict[str, dict] = {}
    hard_fail = 0

    def check(name: str, queries, ref_hits, rows, hard=True, boundary=False):
        nonlocal hard_fail
        mm = _diff_rankings(
            queries, ref_hits, _collect_ours(rows), boundary_tolerant=boundary
        )
        out[name] = {"matched": len(queries) - len(mm), "queries": len(queries)}
        if mm:
            out[name]["mismatches"] = mm[:3]
            out[name]["asserted"] = hard
            if hard:
                hard_fail += 1

    if only in (None, "rankers", "quantized", "feedback"):
        pdf, trec = prepare_corpus(make_transcripts(scale))
        trec_path = os.path.join(work, "corpus.xml")
        with open(trec_path, "w") as fh:
            fh.write(trec)
        k_full = len(pdf)

    # ---- rankers on the plain index ----------------------------------
    if only in (None, "rankers"):
        plain_idx = os.path.join(work, "plain.aspt")
        run_reference_build(bin_dir, trec_path, plain_idx, work)
        eng = SearchEngine(spark, build_index(spark, spark.createDataFrame(pdf)))
        for name, flag in RANKER_FLAGS.items():
            ref_hits, _ = run_reference_queries(
                bin_dir, plain_idx, AB_QUERIES, k_full, work,
                extra_flags=["-R" + flag], l=4 * k_full,
            )
            rows = eng.search_batch(AB_QUERIES, k=k_full, ranker=name).collect()
            check(f"ranker:{name}", AB_QUERIES, ref_hits, rows)
        # -Rallterms = the TERMCOUNT scorer + a post-filter dropping
        # docs with rsv < terms_in_query (ranking_function_factory.c:
        # 196-198 + search_engine.c boolean_results_list) — NOT an
        # arbitrary-ranker conjunctive mode
        ref_hits, _ = run_reference_queries(
            bin_dir, plain_idx, AB_QUERIES, k_full, work,
            extra_flags=["-Rallterms"], l=4 * k_full,
        )
        rows = eng.search_batch(
            AB_QUERIES, k=k_full, ranker="termcount", conjunctive=True
        ).collect()
        check("ranker:allterms", AB_QUERIES, ref_hits, rows)
        # Pitman-Yor LM rankers: per-kind reference index, one ours
        peng = SearchEngine(
            spark,
            build_index(spark, spark.createDataFrame(pdf), puurula=True),
        )
        for name, (idx_flag, rflag) in PUURULA_RANKERS.items():
            p_idx = os.path.join(work, f"puurula_{name}.aspt")
            run_reference_build(
                bin_dir, trec_path, p_idx, work, extra_flags=[idx_flag]
            )
            ref_hits, _ = run_reference_queries(
                bin_dir, p_idx, AB_QUERIES, k_full, work,
                extra_flags=["-R" + rflag], l=4 * k_full,
            )
            rows = peng.search_batch(AB_QUERIES, k=k_full, ranker=name).collect()
            check(f"ranker:{name}", AB_QUERIES, ref_hits, rows)

    # ---- quantized index + QaaT --------------------------------------
    if only in (None, "quantized"):
        q_idx = os.path.join(work, "quant.aspt")
        run_reference_build(
            bin_dir, trec_path, q_idx, work,
            extra_flags=["-QBM25:0.9:0.4", "-q8"],
        )
        qeng = SearchEngine(
            spark,
            build_index(spark, spark.createDataFrame(pdf), quantize_bits=8),
        )
        ref_hits, _ = run_reference_queries(
            bin_dir, q_idx, AB_QUERIES, k_full, work, l=4 * k_full
        )
        rows = qeng.search_batch(AB_QUERIES, k=k_full).collect()
        check("quantized:taat", AB_QUERIES, ref_hits, rows)
        for suffix, et, hard in QAAT_MODES:
            kq = k_full if et is None else 10
            ref_hits, _ = run_reference_queries(
                bin_dir, q_idx, AB_QUERIES, kq, work,
                extra_flags=["-Pq:" + suffix],
            )
            res = qeng.search_qaat(AB_QUERIES, k=kq, early_termination=et)
            check(
                f"qaat:{suffix}", AB_QUERIES, ref_hits, res.collect(),
                hard=hard, boundary=et is not None,
            )

    # ---- blind relevance feedback (needs the -Cn document store) ------
    if only in (None, "feedback"):
        fb_idx = os.path.join(work, "fb.aspt")
        run_reference_build(bin_dir, trec_path, fb_idx, work, extra_flags=["-Cn"])
        fb_eng = SearchEngine(
            spark, build_index(spark, spark.createDataFrame(pdf))
        )
        fb_doc = spark.createDataFrame(pdf)
        ref_hits, _ = run_reference_queries(
            bin_dir, fb_idx, AB_QUERIES, k_full, work,
            extra_flags=["-Qr:17:5"], l=4 * k_full,
        )
        rows = fb_eng.search_feedback(
            AB_QUERIES, fb_doc, k=k_full,
            feedback_documents=17, feedback_terms=5,
        ).collect()
        check("feedback:blind_kl", AB_QUERIES, ref_hits, rows)
        # BLIND_RM (-Qm) is a silent NO-OP in the compiled reference:
        # its candidate lookup (relevance_feedback_blind_kl_rm.c:29
        # get_term_node on the pseudo-doc index) never finds the
        # original query terms, feedback_terms_in_query stays 0, and
        # the rerun is skipped — verified directly (-Qm:17:0.5 output
        # is byte-identical to the no-feedback baseline while -Qr
        # visibly rescores). Assert THAT observable strictly; our
        # search_feedback_rm implements the code's evident intent
        # (posterior re-weighting) and is certified against the SQL
        # oracle instead.
        ref_rm, _ = run_reference_queries(
            bin_dir, fb_idx, AB_QUERIES, k_full, work,
            extra_flags=["-Qm:17:0.5"], l=4 * k_full,
        )
        rows = fb_eng.search_batch(AB_QUERIES, k=k_full).collect()
        check("feedback:blind_rm_reference_noop", AB_QUERIES, ref_rm, rows)

    # ---- stemmer slots (smaller corpus: one Spark build per stemmer) --
    if only in (None, "stemmers"):
        spdf, strec = prepare_corpus(make_transcripts(stem_convs))
        strec_path = os.path.join(work, "stem_corpus.xml")
        with open(strec_path, "w") as fh:
            fh.write(strec)
        sk_full = len(spdf)
        s_sdf = spark.createDataFrame(spdf)
        # q10 "Alpha" is EXCLUDED from the stemmer block: with a
        # stemmer attached, a mixed-case query term takes the
        # unstemmed branch on the RAW first char (atire_api.c:861
        # tests term->start, not the folded buffer) but the pre-lookup
        # loop skipped it (atire_api.c:912 tests the FOLDED buffer) —
        # the reference then ranks UNINITIALIZED term_details
        # (observed: 2621 garbage hits). A real engine cannot and
        # should not reproduce an uninitialized-memory read.
        stem_queries = [(q, t) for q, t in AB_QUERIES if t != "Alpha"]
        # the phonetic slots are A/B'd separately below: on a
        # phonetic-STEMMED index the reference's stemmed search
        # re-stems the vocabulary's CODES (soundex('a410') == 'a000'
        # ≠ 'a410') and returns ZERO hits for every ≥3-char lowercase
        # query — stem-of-stem never matches. Their intended mode is
        # search-time expansion over an unstemmed index.
        for name, flag in STEMMER_FLAGS.items():
            if name in ("soundex", "double_metaphone"):
                continue
            s_idx = os.path.join(work, f"stem_{name}.aspt")
            run_reference_build(
                bin_dir, strec_path, s_idx, work, extra_flags=["-t" + flag]
            )
            ref_hits, _ = run_reference_queries(
                bin_dir, s_idx, stem_queries, sk_full, work,
                extra_flags=["-t" + flag], l=4 * sk_full,
            )
            s_eng = SearchEngine(
                spark, build_index(spark, s_sdf, stemmer=name)
            )
            rows = s_eng.search_batch(stem_queries, k=sk_full).collect()
            check(f"stemmer:{name}", stem_queries, ref_hits, rows)
        # search-time stemmer/phonetic EXPANSION over an unstemmed
        # index (atire -t<f> without indexing -t): the reference's
        # stem_into_internal_buffers class conflation == our
        # search_stemmed_iterator
        plain_s_idx = os.path.join(work, "stem_plain.aspt")
        run_reference_build(bin_dir, strec_path, plain_s_idx, work)
        iter_eng = SearchEngine(spark, build_index(spark, s_sdf))
        for name in ("soundex", "double_metaphone", "porter", "s"):
            ref_hits, _ = run_reference_queries(
                bin_dir, plain_s_idx, stem_queries, sk_full, work,
                extra_flags=["-t" + STEMMER_FLAGS[name]], l=4 * sk_full,
            )
            rows = iter_eng.search_stemmed_iterator(
                stem_queries, stemmer=name, k=sk_full
            ).collect()
            check(f"stem_iterator:{name}", stem_queries, ref_hits, rows)

    shutil.rmtree(work, ignore_errors=True)
    n_ok = sum(1 for v in out.values() if "mismatches" not in v)
    return {
        "mode": "variants",
        "variants": len(out),
        "fully_matched": n_ok,
        "hard_failures": hard_fail,
        "detail": out,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "mode", choices=["identity", "throughput", "variants", "fuzz"]
    )
    ap.add_argument("--scale", default="small")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--convs", type=int, default=20000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--stem-convs", type=int, default=400)
    ap.add_argument("--n-queries", type=int, default=60)
    ap.add_argument("--seed", type=int, default=20260821)
    ap.add_argument("--ranker", default="bm25", choices=sorted(RANKER_FLAGS))
    ap.add_argument(
        "--stemmer", default=None, choices=sorted(STEMMER_FLAGS)
    )
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--conjunctive", action="store_true")
    ap.add_argument("--feedback", action="store_true")
    ap.add_argument("--corpus", default="ascii", choices=["ascii", "unicode"])
    ap.add_argument(
        "--only",
        choices=["rankers", "quantized", "stemmers", "feedback"],
        default=None,
    )
    args = ap.parse_args()
    if args.mode == "identity":
        out = identity(args.scale, args.cpus)
    elif args.mode == "variants":
        out = variants(args.scale, args.cpus, args.stem_convs, args.only)
    elif args.mode == "fuzz":
        out = fuzz(
            args.scale, args.cpus, args.n_queries, args.seed, args.ranker,
            args.stemmer, args.quantized, args.conjunctive, args.feedback,
            args.corpus,
        )
    else:
        out = throughput(args.convs, args.repeats)
    print(json.dumps(out))
    if out.get("mismatches") or out.get("hard_failures"):
        sys.exit(1)


if __name__ == "__main__":
    main()
