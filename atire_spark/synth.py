"""Deterministic synthetic transcripts + query fixtures (FIXTURES.md).

Schema is exactly the BASELINE.json input_hint:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. Seeded numpy Generator → identical output across runs
and across machines; generation order is stable so docid = dense rank
over (conv_id, turn_idx) is reproducible.

Corpus properties exercised (per FIXTURES.md):
- Zipf(s=1.2) vocabulary of 10,000 terms ``term00000``…;
- conv lengths ~ 1 + Poisson(6);
- punctuation, mixed case, digit runs (NUMBER tokens);
- ~0.5% empty/whitespace-only turns (must not consume a docid);
- rare >20KB single-token rows (must be dropped, reference
  index_document.c:55-56);
- 5 "stop-terms" in ~60% of turns and one adversarial term in every
  turn of the largest 10% of conversations (skew for salted merge).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 10_000
STOP_TERMS = ["alpha", "bravo", "charlie", "delta", "echo"]
ADVERSARIAL_TERM = "omegaterm"
ROLES = ["user", "assistant", "tool"]
BASE_TS = datetime(2025, 1, 1, 0, 0, 0)

SCALES = {"tiny": 20, "small": 2_000, "bench": 200_000}


def make_transcripts(scale: str | int = "tiny", seed: int = SEED) -> pd.DataFrame:
    """Generate the transcripts table for a named scale or conv count."""
    n_convs = SCALES[scale] if isinstance(scale, str) else int(scale)
    rng = np.random.default_rng(seed)

    vocab = np.array([f"term{i:05d}" for i in range(VOCAB_SIZE)])
    # Zipf(s=1.2) over ranks 1..VOCAB_SIZE via normalized power-law weights
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    zipf_p = ranks ** -1.2
    zipf_p /= zipf_p.sum()

    conv_lens = 1 + rng.poisson(6, size=n_convs)
    # adversarial term goes into every turn of the largest 10% of convs
    cutoff = np.quantile(conv_lens, 0.9)
    adversarial_convs = conv_lens >= cutoff

    total_turns = int(conv_lens.sum())
    n_tokens = rng.integers(5, 121, size=total_turns)
    empty_mask = rng.random(total_turns) < 0.005
    stop_mask = rng.random(total_turns) < 0.60
    digit_mask = rng.random(total_turns) < 0.10
    upper_mask = rng.random(total_turns) < 0.15
    punct_mask = rng.random(total_turns) < 0.30
    long_tok_mask = rng.random(total_turns) < 0.0008  # a few >20KB tokens
    role_idx = rng.integers(0, 3, size=total_turns)
    tool_ids = rng.integers(0, 8, size=total_turns)

    rows = []
    t = 0
    for conv in range(n_convs):
        conv_id = f"conv{conv:06d}"
        for turn_idx in range(int(conv_lens[conv])):
            if empty_mask[t]:
                text = "   " if t % 2 == 0 else ""
            else:
                k = int(n_tokens[t])
                toks = list(rng.choice(vocab, size=k, p=zipf_p))
                if stop_mask[t]:
                    toks.insert(0, STOP_TERMS[t % len(STOP_TERMS)])
                if adversarial_convs[conv]:
                    toks.append(ADVERSARIAL_TERM)
                if digit_mask[t]:
                    toks.append(str(int(rng.integers(0, 10**9))))
                if upper_mask[t]:
                    toks[0] = toks[0].upper()
                if punct_mask[t]:
                    toks[len(toks) // 2] += ","
                    toks.append("end.")
                if long_tok_mask[t]:
                    toks.append("x" * (20 * 1024 + 7))
                if conv == 1 and turn_idx == 0:
                    # force the tf cap to bind (tf 300 → stored 255,
                    # memory_index_hash_node.h:140-143) and doc_len to
                    # keep counting past it (index_document.c:61)
                    toks.extend(["capterm"] * 300)
                text = " ".join(toks)
            role = ROLES[int(role_idx[t])]
            tool = f"tool{int(tool_ids[t])}" if role == "tool" else None
            rows.append(
                (
                    conv_id,
                    turn_idx,
                    role,
                    text,
                    tool,
                    BASE_TS + timedelta(minutes=t),
                )
            )
            t += 1

    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def make_transcripts_bench(n_convs: int, seed: int = SEED) -> pd.DataFrame:
    """Fully vectorized generator for throughput benchmarks (hundreds of
    thousands of turns). Same statistical shape as :func:`make_transcripts`
    (Zipf vocabulary, Poisson conv lengths, stop-terms in 60% of turns,
    adversarial term in the largest 10% of convs) minus the rare edge
    rows — those live in the fixture generator where correctness tests
    need them."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"term{i:05d}" for i in range(VOCAB_SIZE)])
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    zipf_p = ranks ** -1.2
    zipf_p /= zipf_p.sum()

    conv_lens = 1 + rng.poisson(6, size=n_convs)
    total = int(conv_lens.sum())
    conv_names = np.array([f"conv{i:06d}" for i in range(n_convs)])
    conv_of_turn = np.repeat(np.arange(n_convs), conv_lens)
    # contiguous turn_idx per conv: global index minus conv start offset
    starts = np.concatenate(([0], np.cumsum(conv_lens)[:-1]))
    turn_idx = np.arange(total, dtype=np.int64) - starts[conv_of_turn]

    n_tok = rng.integers(5, 121, size=total)
    tok_strs = vocab[rng.choice(VOCAB_SIZE, size=int(n_tok.sum()), p=zipf_p)]
    bounds = np.cumsum(n_tok)[:-1]
    texts = pd.Series([" ".join(x) for x in np.split(tok_strs, bounds)])

    stop_mask = rng.random(total) < 0.60
    stop_pick = np.array(STOP_TERMS)[np.arange(total) % len(STOP_TERMS)]
    texts = texts.where(~stop_mask, pd.Series(stop_pick) + " " + texts)
    cutoff = np.quantile(conv_lens, 0.9)
    adv_mask = (conv_lens >= cutoff)[conv_of_turn]
    texts = texts.where(~adv_mask, texts + f" {ADVERSARIAL_TERM}")

    roles = np.array(ROLES)[rng.integers(0, 3, size=total)]
    tool = np.where(
        roles == "tool",
        pd.Series(rng.integers(0, 8, size=total)).map(lambda k: f"tool{k}"),
        None,
    )
    ts = pd.Timestamp(BASE_TS) + pd.to_timedelta(np.arange(total), unit="m")
    return pd.DataFrame(
        {
            "conv_id": conv_names[conv_of_turn],
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": texts.to_numpy(),
            "tool": tool,
            "ts": ts,
        }
    )


def make_queries(seed: int = SEED) -> pd.DataFrame:
    """The reference-style query set (~30 queries, FIXTURES.md §2):
    single rare term, single stop-term, mixed rare+common, absent term,
    digits, uppercase input, multi-term."""
    rng = np.random.default_rng(seed + 1)
    # vocabulary words are reached via their NUMBER half: the NEXI
    # query lexer keeps ``termNNNNN`` whole (one XML-name token — a
    # vocab miss, since the index splits word+number), while the bare
    # zero-padded number co-occurs 1:1 with its word and the ``term``
    # word itself has df==N → idf 0 (skipped). Identical scores,
    # reference-reachable queries.
    queries: list[str] = [
        "09874",  # single rare term
        "alpha",  # single stop-term
        "00001 08712",  # common + rare
        "zzznotaterm",  # absent from corpus
        "12345",  # digits
        "Alpha",  # mixed-case input → case-folded (string_pair_to_term)
        "omegaterm",  # adversarial skew term
        "alpha bravo charlie",  # all stop-terms
        "00001 00002 00003 00004 00005",
        "end",  # punctuation-split token
        "capterm",  # tf saturates at 255 in the capped turn
        "capterm 00001",
    ]
    while len(queries) < 30:
        n = int(rng.integers(1, 6))
        terms = [f"{int(rng.integers(0, VOCAB_SIZE)):05d}" for _ in range(n)]
        queries.append(" ".join(terms))
    return pd.DataFrame(
        {"query_id": np.arange(1, len(queries) + 1), "query": queries}
    )


def make_transcripts_skewed(n_docs: int = 4096) -> pd.DataFrame:
    """Skewed-impact corpus for the QaaT QUANTUM_STOP_DIFF demo
    (reference atire/atire_api.c:759-782).

    The uniform bench corpus never fires the stop rule — adjacent
    top-k scores sit ~1 fixed-point unit apart, so the gap between the
    (k-1)th and kth result can't exceed the remaining quantum bound.
    This corpus is built so it does, the regime the rule exists for:

    - 9 "head" docs: tf(skewterm)=200, short → quantized impact ~255;
    - 1 "bridge" doc: tf=1, short → one mid impact, the kth result;
    - ~5% "tail" docs: tf=1 with geometrically spread lengths → the
      BM25 length prior fans their scores across ~60 distinct LOW
      impact levels (many separate quanta);
    - the rest: pad-only docs (the pad term's df=N makes its idf — and
      so the quantization floor — exactly 0, reference semantics).

    After the two head quanta the in-heap gap (255 - bridge) exceeds
    the tail's max impact, so QUANTUM_STOP_DIFF stops and every tail
    quantum is skipped. Deterministic, no RNG.
    """
    n_tail = max(n_docs // 20, 16)
    tail_lens = np.unique(
        np.geomspace(95, 950, n_tail).astype(np.int64)
    )  # distinct lengths → distinct impact levels
    rows = []
    t = 0

    def emit(text: str) -> None:
        nonlocal t
        rows.append(
            (
                f"skew{t:06d}",
                0,
                ROLES[t % 3],
                text,
                None,
                BASE_TS + timedelta(minutes=t),
            )
        )
        t += 1

    for _ in range(9):  # heads
        emit(" ".join(["skewterm"] * 200 + ["pad"] * 20))
    emit(" ".join(["skewterm"] + ["pad"] * 12))  # bridge (kth result)
    for ln in tail_lens:  # tail: tf=1, long docs
        emit(" ".join(["skewterm"] + ["pad"] * int(ln - 1)))
    while t < n_docs:  # pad-only docs
        emit(" ".join(["pad"] * 13))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def make_transcripts_topical(n_docs: int = 1_000_000) -> pd.DataFrame:
    """Docid-topic-correlated corpus for the block-max WAND scale
    bench — the regime segment-level pruning exists for.

    On the UNIFORM bench corpus a query of common terms has provably
    tight bounds (measured at 1M turns: every (query, seg_group)
    ceiling within 1-3 fixed-point units of the true k-th score), so
    NO exact algorithm — ours or the reference's — can skip a block.
    Real collections are not like that: crawl/URL docid order
    correlates with topic (and the reference ships a docid reorderer,
    atire/atire_reorder.c, precisely to create that correlation), so
    a term's high-impact postings cluster into few blocks. This
    generator reproduces that shape deterministically:

    - 5 topic terms ``skaa..skae`` (pure alpha — the tokenizer splits
      letter/digit boundaries);
    - 12 "head" docs per term (tf=200, short → impact ceiling), named
      to sort FIRST so they share the low docid blocks;
    - the rest are per-term contiguous "topic runs": tf=1 docs whose
      lengths cycle 30..300 (length prior spreads impacts), each doc
      naming ONE topic term, runs ordered by term — so a docid block
      holds postings of (mostly) one topic term, and a 5-term query's
      per-block ceiling is ONE term's tail impact, far under the
      top-k threshold set by the heads. Fully vectorized, no RNG.
    """
    n_terms = 5
    heads_per_term = 12
    n_heads = n_terms * heads_per_term
    n_tail = n_docs - n_heads
    tnames = ["sk" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(n_terms)]
    head_txt = [
        " ".join([tnames[i]] * 200 + ["pad"] * 20)
        for i in range(n_terms)
        for _ in range(heads_per_term)
    ]
    head_ids = [
        f"ahead{i:02d}x{j:03d}"
        for i in range(n_terms)
        for j in range(heads_per_term)
    ]
    # per-term contiguous tail runs; lengths cycle so the impact
    # spread is reproducible at any n_docs
    term_of_tail = np.repeat(np.arange(n_terms), -(-n_tail // n_terms))[:n_tail]
    lens = 30 + (np.arange(n_tail) * 7) % 271
    pads = {ln: " ".join(["pad"] * int(ln)) for ln in np.unique(lens)}
    tail_txt = [
        f"{tnames[t]} {pads[ln]}" for t, ln in zip(term_of_tail, lens)
    ]
    tail_ids = [
        f"tail{t:02d}x{j:08d}"
        for t, j in zip(term_of_tail, range(n_tail))
    ]
    ts = pd.Timestamp(BASE_TS) + pd.to_timedelta(np.arange(n_docs), unit="s")
    return pd.DataFrame(
        {
            "conv_id": head_ids + tail_ids,
            "turn_idx": np.zeros(n_docs, dtype=np.int32),
            "role": np.array(ROLES)[np.arange(n_docs) % 3],
            "text": head_txt + tail_txt,
            "tool": None,
            "ts": ts,
        }
    )


def make_transcripts_unicode(
    n_convs: int = 400, seed: int = SEED
) -> pd.DataFrame:
    """Unicode corpus for the differential A/B fuzz: the tokenizer's
    normalize + CJK paths under randomized load (reference
    unicode.c:198-257 decompose/strip-marks/lowercase,
    parser.c:251-283 CJK handling).

    Vocabulary mixes, deterministically from ``seed``:

    - accented-Latin words in BOTH precomposed (NFC) and
      combining-mark (NFD) spellings of the same underlying word —
      the two must land in one postings list;
    - non-decomposable letters (ß ł ø æ) that survive normalization
      and therefore do NOT fold to ASCII;
    - Cyrillic and Greek words with random uppercase variants
      (non-ASCII case folding);
    - CJK runs of 1–4 Han characters (per-char tokens under the
      parser's unsegmented default);
    - plain ASCII words and digit runs as the control group.
    """
    import unicodedata

    rng = np.random.default_rng(seed)

    accent_map = {
        "a": "áàâäã", "e": "éèêë", "i": "íìîï",
        "o": "óòôöõ", "u": "úùûü", "c": "ç", "n": "ñ",
    }
    syll = ["ba", "ce", "di", "fo", "gu", "lan", "mer", "nor", "pat", "rei"]
    latin: list[str] = []
    for i in range(60):
        base = syll[i % 10] + syll[(i * 3 + 1) % 10] + syll[(i * 7 + 2) % 10]
        chars = list(base)
        for j, ch in enumerate(chars):
            if ch in accent_map and (i + j) % 3 == 0:
                opts = accent_map[ch]
                chars[j] = opts[(i * 5 + j) % len(opts)]
        w = "".join(chars)
        latin.append(unicodedata.normalize("NFC", w))
        latin.append(unicodedata.normalize("NFD", w))
    hard = ["straße", "łódź", "smørrebrød", "æther", "þing", "ďábel"]
    cyr_c, cyr_v = "бвгдклмнпрст", "аеиоу"
    cyrillic = [
        cyr_c[i % 12] + cyr_v[i % 5] + cyr_c[(i * 5 + 3) % 12]
        + cyr_v[(i * 3 + 1) % 5]
        for i in range(30)
    ]
    greek = [
        "αβγ δελτα ωμεγα σιγμα λογος φυσις".split()[i % 6] for i in range(12)
    ]
    han = list("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年")
    cjk = [
        "".join(han[(i * 7 + j) % len(han)] for j in range(1 + i % 4))
        for i in range(40)
    ]
    ascii_w = [f"plain{i:03d}" for i in range(40)]
    vocab = np.array(
        latin + hard + cyrillic + greek + cjk + ascii_w, dtype=object
    )
    ranks = np.arange(1, vocab.size + 1, dtype=np.float64)
    p = ranks ** -1.1
    p /= p.sum()

    rows = []
    t = 0
    for conv in range(n_convs):
        conv_id = f"uconv{conv:06d}"
        for turn_idx in range(1 + int(rng.poisson(3))):
            r = rng.random()
            if r < 0.004:
                text = ""
            else:
                k = int(rng.integers(4, 26))
                toks = list(rng.choice(vocab, size=k, p=p))
                if rng.random() < 0.2:  # non-ASCII uppercase variant
                    toks[0] = toks[0].upper()
                if rng.random() < 0.1:
                    toks.append(str(int(rng.integers(0, 10**6))))
                if rng.random() < 0.25:
                    toks[len(toks) // 2] += ","
                text = " ".join(toks)
            rows.append(
                (
                    conv_id,
                    turn_idx,
                    ROLES[t % 3],
                    text,
                    None,
                    BASE_TS + timedelta(minutes=t),
                )
            )
            t += 1
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def _bench_chunk(lo: int, hi: int, seed: int) -> pd.DataFrame:
    """One deterministic chunk of the distributed bench corpus: convs
    [lo, hi) generated with rng([seed, lo]) — chunk content depends
    only on its id range, never on partitioning, so any cluster layout
    produces the identical corpus."""
    rng = np.random.default_rng([seed, lo])
    n_convs = hi - lo
    vocab = np.array([f"term{i:05d}" for i in range(VOCAB_SIZE)])
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    zipf_p = ranks ** -1.2
    zipf_p /= zipf_p.sum()

    conv_lens = 1 + rng.poisson(6, size=n_convs)
    total = int(conv_lens.sum())
    conv_names = np.array([f"conv{lo + i:07d}" for i in range(n_convs)])
    conv_of_turn = np.repeat(np.arange(n_convs), conv_lens)
    starts = np.concatenate(([0], np.cumsum(conv_lens)[:-1]))
    turn_idx = np.arange(total, dtype=np.int64) - starts[conv_of_turn]

    n_tok = rng.integers(5, 121, size=total)
    tok_strs = vocab[rng.choice(VOCAB_SIZE, size=int(n_tok.sum()), p=zipf_p)]
    bounds = np.cumsum(n_tok)[:-1]
    texts = pd.Series([" ".join(x) for x in np.split(tok_strs, bounds)])
    stop_mask = rng.random(total) < 0.60
    stop_pick = np.array(STOP_TERMS)[np.arange(total) % len(STOP_TERMS)]
    texts = texts.where(~stop_mask, pd.Series(stop_pick) + " " + texts)
    roles = np.array(ROLES)[rng.integers(0, 3, size=total)]
    return pd.DataFrame(
        {
            "conv_id": conv_names[conv_of_turn],
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": texts.to_numpy(),
            "tool": None,
            "ts": pd.Timestamp(BASE_TS)
            + pd.to_timedelta(lo * 8 + turn_idx, unit="m"),
        }
    )


def make_transcripts_bench_sdf(
    spark, n_convs: int, seed: int = SEED, chunk: int = 20000
):
    """DISTRIBUTED deterministic bench corpus (10M+ turns): chunk ids
    fan out over the cluster and every chunk generates its conv range
    locally (:func:`_bench_chunk`), so no driver-side string
    materialization and no upload — the generator scales with
    executors exactly like the build it feeds. 7-digit conv names keep
    lexicographic == numeric order past 10^6 conversations."""
    import math

    n_chunks = max(1, math.ceil(n_convs / chunk))

    def gen(batches):
        for pdf in batches:
            for cid in pdf["id"]:
                lo = int(cid) * chunk
                yield _bench_chunk(lo, min(n_convs, lo + chunk), seed)

    sc = spark.sparkContext
    return (
        spark.range(n_chunks)
        .repartition(min(n_chunks, sc.defaultParallelism * 4))
        .mapInPandas(
            gen,
            schema=(
                "conv_id string, turn_idx int, role string, text string,"
                " tool string, ts timestamp"
            ),
        )
    )
