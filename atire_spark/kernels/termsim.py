"""Term-term postings similarity (stemmer_term_similarity.c).

The reference's similarity-gated stemmers compare a query term to each
stem-class candidate by the cosine of their tf·idf postings vectors
(stemmer_term_similarity.c:90-158 ``buffer_similarity``), with these
faithful quirks:

- the DOT PRODUCT weights each side by ``tf/doc_len`` (a per-doc
  normalization), but the NORMS use RAW tf² sums — the reference's
  normalization is asymmetric, and we reproduce it bit-for-bit;
- the idf factors multiply the numerator and both norms, so they
  cancel mathematically — except when a df equals N (idf 0), where
  the reference divides 0 by 0 and yields NaN; NaN compares false
  against any threshold, so such candidates are KEPT by the threshold
  gate (NaN < t is false in C and here);
- a base term absent from the vocabulary has an all-zero buffer
  (buffer_length_squared == 0) → similarity 0.0 for every candidate
  (stemmer_term_similarity.c:103-104);
- the numerator accumulates in the CANDIDATE's posting order — impact
  groups in descending-impact order, docids ascending within a group
  (the order get_decompressed_postings returns) — as a strict left
  fold in double; summation order changes the last bits, so engine
  and oracle share this one implementation.
"""

from __future__ import annotations

import numpy as np


def term_similarity(
    base_docids: np.ndarray,
    base_tfs: np.ndarray,
    cand_docids: np.ndarray,
    cand_tfs: np.ndarray,
    doc_len_of: dict[int, int],
    n_docs: int,
    df_a: int,
    df_b: int,
) -> float:
    """Similarity of candidate to base (buffer_similarity's value).

    ``cand_docids``/``cand_tfs`` must already be in the candidate's
    reference posting order: impact (tf) descending, docid ascending
    within an impact group.
    """
    bls = int(np.sum(base_tfs.astype(np.int64) ** 2))  # |A|² on raw tf
    if bls == 0:
        return 0.0
    if cand_docids.size == 0:
        return 0.0
    length_b = int(np.sum(cand_tfs.astype(np.int64) ** 2))
    tfa = {int(d): int(t) for d, t in zip(base_docids, base_tfs)}
    similarity = np.float64(0.0)
    # strict left fold in the candidate's posting order
    for d, tf_b in zip(cand_docids, cand_tfs):
        a = tfa.get(int(d))
        if a:
            dl = np.float64(doc_len_of[int(d)])
            similarity = similarity + (np.float64(a) / dl) * (
                np.float64(int(tf_b)) / dl
            )
    idf_a = np.float64(np.log(np.float64(n_docs) / np.float64(df_a)))
    idf_b = np.float64(np.log(np.float64(n_docs) / np.float64(df_b)))
    with np.errstate(invalid="ignore"):  # df == N → 0/0 → NaN, faithful
        similarity = similarity * (idf_a * idf_b)
        similarity = similarity / np.sqrt(np.float64(bls) * idf_a * idf_a)
        similarity = similarity / np.sqrt(
            np.float64(length_b) * idf_b * idf_b
        )
    return float(similarity)


def reference_posting_order(
    docids: np.ndarray, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Sort a term's (docid, tf) postings into the reference's
    decompressed order: impact groups descending, docids ascending
    within a group (tf == impact on an unquantized index)."""
    order = np.lexsort((docids, -tfs.astype(np.int64)))
    return docids[order], tfs[order]
