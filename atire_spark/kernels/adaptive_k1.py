"""Per-term adaptive k1 solvers for BM25T and BM25-adpt.

Both rankers replace BM25's fixed k1 with a per-term value solved from
the term's own posting distribution before any document is scored:

- BM25T (ranking_function_bm25t.c:85-123): k1 solves
  g(k1) = k1/(k1-1)·ln(k1) = mean over the term's postings of
  ln(c'+1), c' = tf / (1 - b + b·len/avg_len), via the secant method
  (maths.h:196-218 ANT_secant) started at (1.0, 1.1).
- BM25-adpt (ranking_function_bm25adpt.c:93-196): build a 256-bin
  histogram of round(c'), suffix-cumulate it, derive the information
  gain curve IG[i], truncate it at the first non-monotone step past
  index 3, then pick k1 minimising the squared distance between
  IG[i]/IG[1] and the BM25 saturation curve ((k1+1)i)/(k1+i) with the
  reference's jump-halving range search (ranking_function_bm25adpt.c:
  47-90 ANT_range_search). IG[1] doubles as the term's idf.

Scoring then is plain BM25 shape: rsv = idf · ((k1+1)·c')/(k1+c')
(relevance_rank_top_k in both files).

Oracle parity: the two places a float SUM feeds a comparison (the
BM25T mean, the ADPT squared-distance objective) are rounded to 9
decimals on both the engine and the DuckDB side, so the solvers run
on bit-identical inputs regardless of float addition order; every
other op is written in the same order as the SQL expression.
"""

from __future__ import annotations

import math

import numpy as np

BM25T_B = 0.2  # ranking_function_factory.c:43 default
BM25ADPT_B = 0.3  # ranking_function_factory.c:44 default
ADPT_MAX_TF = 256  # ranking_function_bm25adpt.c:119 MAX_TF
_SECANT_E = 0.00001  # maths.h:198
_RS_END = 10.0  # ranking_function_bm25adpt.c:195 range end
_RS_ERR = 0.001  # ranking_function_bm25adpt.c:195 step tolerance


def secant(x1: float, x2: float, fn) -> float:
    """maths.h:196-218 ANT_secant, op-for-op (the same float64
    sequence the SQL oracle's recursive CTE runs)."""
    f1 = fn(x1)
    for _ in range(1000):  # C loops unbounded; this always converges
        f2 = fn(x2)
        if abs(f2 - f1) < _SECANT_E:
            return x2
        x3 = (f2 * x1 - f1 * x2) / (f2 - f1)
        x1, f1, x2 = x2, f2, x3
        if not abs((x1 - x2) / x2) > _SECANT_E:
            return x2
    return x2


def range_search(end: float, err: float, fn) -> float:
    """ranking_function_bm25adpt.c:47-90 ANT_range_search: walk up
    from ``err`` in unit jumps, halving (and possibly reversing) the
    jump whenever the objective worsens, until the jump underflows
    ``err``."""
    best = float("inf")
    jump = 1.0
    where = err
    while True:
        if where > abs(jump) + end:
            break
        score = fn(where)
        if score > best:
            jump /= 2.0
            if where + jump < 0:
                jump = -jump
            new = fn(where + jump)
            if new > score:
                jump = -jump
            else:
                where += jump
                best = new
        else:
            where += jump
            best = score
        if not abs(jump) > err:
            break
    return where


def bm25t_k1(sum_log: float, df: int) -> float:
    """k1 for one term from Σ ln(c'+1) over its postings
    (ranking_function_bm25t.c:89-123 compute_k1). The normalised mean
    is rounded to 9 dp for oracle parity (addition-order bridge)."""
    s = round(sum_log / df, 9)

    def evaluate(k1: float) -> float:
        g = 1.0 if k1 == 1.0 else (k1 / (k1 - 1.0)) * math.log(k1)
        d = g - s
        return d * d

    return secant(1.0, 1.1, evaluate)


def bm25adpt_k1(hist: np.ndarray, n_docs: int, df: int) -> tuple[float, float]:
    """(k1, ig1) for one term from its round(c') histogram
    (ranking_function_bm25adpt.c:113-196 compute_k1).

    ``hist`` is the raw 256-bin count of postings per rounded c'
    (integer, so partial-aggregation order cannot drift)."""
    counts = np.zeros(ADPT_MAX_TF, dtype=np.float64)
    # suffix-cumulate bins 255..1 (c:163-169), then pin [0]=N, [1]=df
    counts[1:] = np.cumsum(hist[::-1])[::-1][1:]
    counts[0] = float(n_docs)
    counts[1] = float(df)

    ln2 = math.log(2.0)
    left = -(math.log((df + 0.5) / (n_docs + 1.0)) / ln2)
    ig = np.zeros(ADPT_MAX_TF, dtype=np.float64)  # [255] stays 0 (memset)
    for i in range(ADPT_MAX_TF - 1):
        nxt = counts[i + 1] if i + 1 < ADPT_MAX_TF else 0.0
        ig[i] = left + math.log((nxt + 0.5) / (counts[i] + 1.0)) / ln2
    # truncate at the first non-monotone step past 3 (c:180-186), and
    # always kill [254] (c:187)
    for i in range(3, ADPT_MAX_TF - 1):
        if ig[i] > ig[i + 1]:
            ig[i + 1] = -1.0
            break
    ig[254] = -1.0
    ig1 = float(ig[1])

    # live prefix: evaluate_k1 (c:97-113) walks ascending while >= 0
    stop = 0
    while stop < ADPT_MAX_TF and ig[stop] >= 0.0:
        stop += 1
    live = [(float(i), float(ig[i])) for i in range(stop)]

    def evaluate(k1: float) -> float:
        k_hat = 0.0
        for idx, v in live:
            s = v / ig1 - ((k1 + 1.0) * idx) / (k1 + idx)
            k_hat += s * s
        return round(k_hat, 9)  # oracle parity: SQL SUM order differs

    return range_search(_RS_END, _RS_ERR, evaluate), ig1
