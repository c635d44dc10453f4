"""TopSig signature kernels — vectorized numpy, shared by the Spark
engine and the pytest oracles.

Reference semantics reproduced:
  * source/index_document_topsig_signature.c:63-146 (``add_term``):
    each accepted term adds ``num_positive = width·density/200`` paired
    ±weight draws at pseudo-random bit positions; terms whose weight
    ``tf·ln((tf/doc_len)·(L/cf))`` falls below *e* are stopped.
  * source/index_document_topsig.c:183-238 (``index_document``):
    signature bit = 1 where the accumulated vector is positive, 0 where
    negative; exact zeros are filled systematically-randomly.
  * atire/atire_api.c:1038-1092 (``process_topsig_query``): the query
    builds the same signature with tf=1, doc_len=1, then every nonzero
    dimension is searched — positive dims score the documents with the
    bit set, negative dims the documents with the bit clear
    (source/ranking_function_topsig_positive.c / _negative.c each add
    integer 1 per agreeing document; priors default to zero).

Documented deviations (the engine and its DuckDB oracle stay
bit-identical to EACH OTHER; these replace process-local C state):
  * the Pearson-table seed + xorshift64 PRNG chain
    (source/hash_random.h) becomes a cross-language stable hash chain:
    ``seed(term) = lower 64 bits of md5(term)`` (little-endian — what
    DuckDB's ``md5_number_lower`` returns) and draw ``j`` lands on
    ``splitmix64(seed + j) % width`` with sign + for even j / − for
    odd j.
  * the zero-bit fill draws from ``splitmix64(md5('doc:'+docid) + bit)``
    instead of the document's running xorshift seed
    (index_document_topsig.c:227-236).
  * weights are quantized to ``floor(1000·w + 0.5)`` BEFORE
    accumulation so bit signs are integer sums — order-independent
    across partitions and engines (precedent: the reference's own
    ×1000 truncation in set_puurula_length, memory_index.c:1270-1410).
  * ``doc_len`` is the true document length; the reference passes a
    running accepted-term counter that starts at zero
    (index_document_topsig.c:205-211), a div-by-zero artifact we do
    not reproduce.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

TOPSIG_WIDTH = 4096  # indexer_param_block_topsig.c:18
TOPSIG_DENSITY = 12.0  # indexer_param_block_topsig.c:19

_SPLIT_C1 = np.uint64(0x9E3779B97F4A7C15)
_SPLIT_C2 = np.uint64(0xBF58476D1CE4E5B9)
_SPLIT_C3 = np.uint64(0x94D049BB133111EB)

# byte-popcount table for signature agreement counting (numpy < 2 has
# no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def md5_u64(s: str) -> int:
    """Lower 64 bits of md5, little-endian — DuckDB md5_number_lower."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def splitmix64(x: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """Vectorized splitmix64. Runs in-place over two buffers (``out``
    and one scratch) — fresh large temporaries page-fault badly on a
    memory-pressured host, and this kernel sits in every signature
    build batch."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        if out is None:
            out = np.empty_like(x)
        np.add(x, _SPLIT_C1, out=out)
        tmp = np.empty_like(out)
        for shift, mult in (
            (30, _SPLIT_C2),
            (27, _SPLIT_C3),
        ):
            np.right_shift(out, np.uint64(shift), out=tmp)
            np.bitwise_xor(out, tmp, out=out)
            np.multiply(out, mult, out=out)
        np.right_shift(out, np.uint64(31), out=tmp)
        np.bitwise_xor(out, tmp, out=out)
        return out


def num_positive(width: int, density: float) -> int:
    """index_document_topsig_signature.c:124 — truncating C cast."""
    return int(width * (density / 200.0))


def quantize_weight(w: np.ndarray) -> np.ndarray:
    """floor(1000·w + 0.5) as int64 (w is > e > 0 after the stop
    filter, so this is round-half-up on both engines)."""
    return np.floor(1000.0 * np.asarray(w, dtype=np.float64) + 0.5).astype(
        np.int64
    )


def term_weights(
    tf: np.ndarray, doc_len: np.ndarray, cf: np.ndarray, coll_len: float
) -> np.ndarray:
    """add_term's weight: tf·ln((tf/doc_len)·(L/cf)) — same operation
    order as the SQL oracle."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    cf = np.asarray(cf, dtype=np.float64)
    return tf * np.log((tf / dl) * (float(coll_len) / cf))


def accumulate(
    term_seeds: np.ndarray,
    wq: np.ndarray,
    doc_idx: np.ndarray,
    n_docs: int,
    width: int,
    density: float,
) -> np.ndarray:
    """Sum every term's ±wq draws into per-doc int64 vectors.

    ``term_seeds``/``wq``/``doc_idx`` are parallel per-contribution
    arrays; the 2·num_positive draw loop is over the (short) draw axis
    with each step fully vectorized across contributions.
    """
    acc = np.zeros(n_docs * width, dtype=np.int64)
    if term_seeds.size == 0:
        return acc.reshape(n_docs, width)
    seeds = term_seeds.astype(np.uint64)
    base = doc_idx.astype(np.int64) * width
    wq = wq.astype(np.int64)
    neg_wq = -wq
    # preallocated per-draw buffers: the loop body is all in-place
    h = np.empty_like(seeds)
    shifted = np.empty_like(seeds)
    flat = np.empty(seeds.size, dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(2 * num_positive(width, density)):
            np.add(seeds, np.uint64(j), out=shifted)
            splitmix64(shifted, out=h)
            np.remainder(h, np.uint64(width), out=h)
            np.add(base, h.view(np.int64), out=flat)
            np.add.at(acc, flat, wq if j % 2 == 0 else neg_wq)
    return acc.reshape(n_docs, width)


def fill_bits(docids: np.ndarray, width: int) -> np.ndarray:
    """The zero-dimension systematic-random fill, one bool row per doc.

    Chunked over documents with reused buffers — the naive
    (docs × width) broadcast materializes several multi-hundred-MB
    uint64 temporaries per Arrow batch."""
    docids = np.asarray(docids)
    dseeds = np.array(
        [md5_u64(f"doc:{int(d)}") for d in docids], dtype=np.uint64
    )
    bits = np.arange(width, dtype=np.uint64)
    out = np.empty((len(docids), width), dtype=bool)
    chunk = max(1, (1 << 20) // max(width, 1))  # ~8 MB of u64 per chunk
    grid = np.empty((chunk, width), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for s in range(0, len(docids), chunk):
            e = min(s + chunk, len(docids))
            g = grid[: e - s]
            np.add(dseeds[s:e, None], bits[None, :], out=g)
            splitmix64(g, out=g)
            np.bitwise_and(g, np.uint64(1), out=g)
            out[s:e] = g.view(np.int64).astype(bool)
    return out


def signature_bits(acc: np.ndarray, docids: np.ndarray) -> np.ndarray:
    """index_document_topsig.c:219-238: +ve → 1, 0 → random, −ve → 0."""
    width = acc.shape[1]
    return (acc > 0) | ((acc == 0) & fill_bits(docids, width))


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """(n, width) bool → (n, width/64) int64 words, bit i of word w =
    signature bit 64·w+i (little-endian packing on both axes)."""
    packed = np.packbits(bits, axis=1, bitorder="little")
    return packed.view("<u8").view(np.int64)


def unpack_bits(words: np.ndarray, width: int) -> np.ndarray:
    b = np.unpackbits(
        words.astype("<i8").view(np.uint8).reshape(words.shape[0], -1),
        axis=1,
        bitorder="little",
    )
    return b[:, :width].astype(bool)


def query_vector(
    terms: list[str],
    weights: list[int],
    cfs: dict[str, int],
    coll_len: float,
    width: int,
    density: float,
) -> np.ndarray:
    """process_topsig_query: add_term(tf=1, doc_len=1, L) per query
    term occurrence — w = ln(L/cf), stop below e, integer-quantized;
    terms absent from the collection default to cf = tf = 1
    (index_document_topsig_signature.c:78-84)."""
    keep_terms, keep_wq = [], []
    for t, qw in zip(terms, weights):
        cf = float(cfs.get(t, 1))
        w = math.log(float(coll_len) / cf)
        if w < math.e:
            continue
        keep_terms.append(t)
        keep_wq.append(int(np.floor(1000.0 * w + 0.5)) * int(qw))
    if not keep_terms:
        return np.zeros(width, dtype=np.int64)
    seeds = np.array([md5_u64(t) for t in keep_terms], dtype=np.uint64)
    return accumulate(
        seeds,
        np.array(keep_wq, dtype=np.int64),
        np.zeros(len(keep_terms), dtype=np.int64),
        1,
        width,
        density,
    )[0]


def popcount_rows(words: np.ndarray) -> np.ndarray:
    """Per-row popcount of (n, nwords) int64 signature words."""
    u8 = words.astype("<i8").view(np.uint8).reshape(words.shape[0], -1)
    return _POP8[u8].sum(axis=1)


def agreement_scores(
    sig_words: np.ndarray, qvec: np.ndarray
) -> np.ndarray:
    """ranking_function_topsig_positive/negative: +1 per agreeing
    nonzero query dimension — popcount(sig & pos) + popcount(~sig & neg)
    restricted to the query's nonzero dims."""
    width = qvec.size
    pos = pack_bits((qvec > 0)[None, :]).view(np.int64)[0]
    neg = pack_bits((qvec < 0)[None, :]).view(np.int64)[0]
    s = sig_words.astype("<i8").view(np.uint64)
    posm = pos.astype("<i8").view(np.uint64)
    negm = neg.astype("<i8").view(np.uint64)
    agree = (s & posm[None, :]) | (~s & negm[None, :])
    # the last word's pad bits are zero in both masks, so ~s pad bits
    # never score
    return popcount_rows(agree.view(np.int64))
