"""BM25 scoring with the reference's exact arithmetic.

Reference (/root/reference/source/ranking_function_bm25.c:76-130 and
/root/reference/source/search_engine_accumulator.h:76):

- ``idf = ln(N / df)`` computed in double; if ``idf == 0`` (df == N)
  the term contributes NOTHING (ranking_function_bm25.c:91-92);
- the per-doc length prior ``k1 * (1 - b + b * len/avglen)`` is stored
  as **float32** (ranking_function_bm25.c:27-31 allocates a float
  array) and promoted back to double inside the score division;
- per impact group the score is computed once per (tf, doc):
  ``rsv = idf * (tf*(k1+1)) / (tf + prior)`` with tf = the group's
  impact value as double (prescalar = postscalar = 1 by default);
- fixed-point accumulation: each term hit adds
  ``1 + trunc(rsv * 100)`` into a **SIGNED 16-bit** accumulator — the
  header's ``unsigned short`` default is OVERRIDDEN by the build
  (GNUmakefile.defns:94 ``-DANT_ACCUMULATOR_T="short"``), so scores
  order SIGNED (negative LM scores sink below zero, they do not wrap
  to the top) — binary-verified via reference_ab.py variants;
  16-bit addition wraps mod 65536 and modular addition is associative,
  so the engine may sum in int64 and reduce to the signed 16-bit value
  once (:func:`accum_value`);
- a document enters the results list only when its accumulator
  TRANSITIONS from 0 to nonzero (search_engine_result.h add_rsv); all
  prefix sums being zero forces every contribution to be zero, so the
  rule is order-independent: a doc is a candidate iff ANY of its
  per-occurrence contributions is nonzero (a contribution is zero when
  ``trunc(rsv*100) == -1``, i.e. rsv ∈ (-0.02, -0.01]);
- defaults k1 = 0.9, b = 0.4 (ranking_function_bm25.h:14-15);
- final order: rsv desc (signed), tie → larger docid first
  (search_engine_accumulator.h:36-42 pointer compare).

Every expression below keeps the same operation order/precision so
near-tie ranks cannot drift between engine, oracle, and SQL oracle.
"""

from __future__ import annotations

import numpy as np

BM25_K1 = 0.9
BM25_B = 0.4
ACCUM_MOD = 1 << 16  # 16-bit accumulator wrap
ACCUM_HALF = 1 << 15  # signed boundary: values >= 2^15 are negative


def accum_value(total):
    """int64 modular sum(s) → the reference's SIGNED short accumulator
    value (two's complement 16-bit). Works on numpy arrays, pandas
    Series, and Python ints."""
    w = total % ACCUM_MOD
    return w - (w >= ACCUM_HALF) * ACCUM_MOD


def accum_value_col(col):
    """Spark Column version of :func:`accum_value`."""
    from pyspark.sql import functions as F

    w = F.pmod(col, F.lit(ACCUM_MOD))
    return w - F.when(w >= ACCUM_HALF, F.lit(ACCUM_MOD)).otherwise(F.lit(0))


def doc_priors(doc_lens: np.ndarray, mean_doc_len: float, k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    """float32 length prior per doc: ``(float)(k1*(1-b + b*(len/mean)))``
    — the double expression is evaluated first, then cast to float32,
    exactly like ranking_function_bm25.c:30."""
    lens = np.asarray(doc_lens, dtype=np.float64)
    one_minus_b = 1.0 - b
    return (k1 * (one_minus_b + b * (lens / mean_doc_len))).astype(np.float32)


def idf(n_docs: int, df: int) -> float:
    """``ln(N/df)`` with the division done first (ranking_function_bm25.c:91)."""
    return float(np.log(np.float64(n_docs) / np.float64(df)))


def group_contrib(
    tf: int,
    idf_value: float,
    priors_f32: np.ndarray,
    k1: float = BM25_K1,
    weight: int = 1,
) -> np.ndarray:
    """Fixed-point contributions for one impact group.

    ``priors_f32`` are the float32 priors of the group's docs. Returns
    int64 contributions ``weight * (1 + trunc(100 * rsv))`` — ``weight``
    is the query-term multiplicity (the reference scores a repeated
    query term once per occurrence, adding the identical contribution
    each time).
    """
    tf_d = np.float64(tf)
    top_row = tf_d * (k1 + 1.0)
    denom = tf_d + priors_f32.astype(np.float64)
    rsv = idf_value * (top_row / denom)
    # C cast double -> unsigned short truncates toward zero; rsv > 0 here
    contrib = 1 + (rsv * 100.0).astype(np.int64)
    return contrib * int(weight)
