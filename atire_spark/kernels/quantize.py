"""Index-time score quantization (the reference's -Q mode).

Reference semantics (/root/reference/source/ranking_function.c:495-526,
/root/reference/source/memory_index.c:1541-1589):

- during serialisation every posting's *raw* BM25 rsv is computed with
  the ranking function's ``rank()`` (ranking_function_bm25.c:194-209):
  ``idf = ln(N/df)`` (kept even when 0 — the quantizer does NOT skip
  df==N terms), float32 doc-length prior, ``rsv = idf * tf*(k1+1) /
  (tf + prior)``;
- the global collection min/max rsv over ALL postings is found
  (memory_index.c:1570-1580, ``rsv_all_nodes``) and stored in the index
  as ``~quantmax`` / ``~quantmin``;
- each posting's stored impact becomes
  ``(unsigned short)((((rsv-min)/(max-min)) * ((1<<bits)-2)) + 1)``
  (ranking_function.c:505-526) — truncation toward zero, range
  1..(1<<bits)-1; default bits = 8 (memory_index.c:1556);
- a quantized index sets ``~quantized=1``; at query time the impact
  value IS the score: ``add_rsv(long)`` adds it straight into the
  uint16 accumulator with no +1/x100 fixed-point step
  (search_engine_accumulator.h:77, atire_api.c:287-293).

Everything here is vectorized numpy; the same expressions are repeated
verbatim in the SQL oracle so all three implementations share operation
order and precision.
"""

from __future__ import annotations

import numpy as np

from atire_spark.kernels.bm25 import BM25_B, BM25_K1

DEFAULT_QUANT_BITS = 8  # memory_index.c:1556


def raw_rsv(
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    df: int,
    n_docs: int,
    mean_doc_len: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    """The quantizer's per-posting raw BM25 score
    (ranking_function_bm25.c:194-209): float32 prior, idf kept even at
    0, everything else double.

    INDEX-TIME LENGTH OFF-BY-ONE (binary-verified on a 6-doc corpus
    where every impact was enumerated): the memory index stores each
    document length as ``length + 1`` (the +1 keeps the value nonzero
    for compression; the SEARCH side subtracts it back, cf. the
    ``decompress_buffer[current] - 1`` reads), but the quantization
    ranker is constructed over the RAW in-memory array
    (memory_index.c:1558 get_indexing_ranker(…, document_lengths, …))
    — so the quantizer's prior uses ``len+1`` per doc and a mean of
    ``(collection_len + N) / N = mean + 1``. ``doc_lens`` /
    ``mean_doc_len`` here are the true (search-side) values; the +1 is
    applied internally.
    """
    tf_d = np.asarray(tfs, dtype=np.float64)
    lens = np.asarray(doc_lens, dtype=np.float64) + 1.0
    prior = (
        k1 * ((1.0 - b) + b * (lens / (mean_doc_len + 1.0)))
    ).astype(np.float32)
    # df may be a scalar (one term's postings) or a per-posting array
    # (the -Q min/max pass feeds whole batches of mixed terms)
    idf = np.log(np.float64(n_docs) / np.asarray(df, dtype=np.float64))
    return idf * ((tf_d * (k1 + 1.0)) / (tf_d + prior.astype(np.float64)))


def quantize_rsv(
    rsv: np.ndarray, qmin: float, qmax: float, bits: int = DEFAULT_QUANT_BITS
) -> np.ndarray:
    """rsv → integer impact in 1..(1<<bits)-1 (ranking_function.c:505-526).

    The C call site casts the *whole* expression (scale + 1) to
    unsigned short, i.e. truncation toward zero of ``scaled + 1``.
    ``qmax == qmin`` (degenerate single-score collection) maps every
    posting to impact 1.
    """
    rsv = np.asarray(rsv, dtype=np.float64)
    if qmax == qmin:
        return np.ones(rsv.size, dtype=np.int64)
    scale = float((1 << bits) - 2)
    return np.trunc(((rsv - qmin) / (qmax - qmin)) * scale + 1.0).astype(np.int64)
