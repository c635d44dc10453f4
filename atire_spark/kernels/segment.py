"""Vectorized multi-segment builder.

Builds EVERY (term, seg_group) segment of a shuffle partition in one
numpy pass — the per-group layout is identical to
:func:`atire_spark.kernels.impact.impact_order` (impact-descending
quantum groups, per-quantum delta-encoded docids with implicit prev of
-1, per-quantum vbyte streams, posting-order doc lengths), but the
sort, delta encode, and vbyte encode each run ONCE over the whole
partition's postings instead of once per segment. With the adaptive
segment spans a partition holds 10^4-10^5 small segments; per-group
Python (pandas groupby + per-segment codec calls) was the dominant
build cost, ~10ms per segment — this pass is ~30µs per segment.

Reference layout being reproduced: memory_index.c:476-580
(impact_order_with_header) + per-quantum compression
(memory_index.c:804-1042).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from atire_spark.kernels.vbyte import vbyte_encode_raw


def build_segments_batch(
    pdf: pd.DataFrame,
    quantizer=None,
    codec: str = "vbyte",
) -> pd.DataFrame | None:
    """stage1 rows (term, seg_group, block, docids[], tfs[], lens[],
    df_b, cf_b [, df, cf]) → one segment row per (term, seg_group).

    ``quantizer(tfs, lens, df) -> impacts`` converts saturated tfs to
    quantized impacts (the -Q path); None keeps tf impacts. When a
    quantizer is given the input must carry global ``df``/``cf``
    columns and they are copied onto the output rows.

    ``codec`` compresses the posting streams: ``vbyte`` (reference
    default; one vectorized bulk encode sliced at value boundaries) or
    ``simple9`` (kernels/simple9.py; the packer restarts at every
    quantum boundary so the per-quantum byte offsets stay
    word-aligned). Doc-length streams stay vbyte either way.
    """
    if pdf is None or not len(pdf):
        return None
    quantized = quantizer is not None

    # ---- row ordering: group by (term, seg_group), rows within a
    # group by (block, first docid) — restores global docid order
    # across partition/batch boundaries
    tcode, tuniq = pd.factorize(pdf["term"])
    seg = pdf["seg_group"].to_numpy(np.int64)
    block = pdf["block"].to_numpy(np.int64)
    b0 = np.fromiter(
        (a[0] for a in pdf["docids"]), dtype=np.int64, count=len(pdf)
    )
    row_order = np.lexsort((b0, block, seg, tcode))
    tcode_s = tcode[row_order]
    seg_s = seg[row_order]
    # group id per (sorted) row
    row_gb = np.flatnonzero(
        (np.diff(tcode_s) != 0) | (np.diff(seg_s) != 0)
    ) + 1
    row_gid = np.zeros(len(pdf), dtype=np.int64)
    row_gid[row_gb] = 1
    row_gid = np.cumsum(row_gid)
    n_groups = int(row_gid[-1]) + 1
    row_gstarts = np.concatenate(([0], row_gb))

    # ---- flatten postings in row order
    docids_col = pdf["docids"].to_numpy()[row_order]
    tfs_col = pdf["tfs"].to_numpy()[row_order]
    lens_col = pdf["lens"].to_numpy()[row_order]
    counts = np.fromiter(
        (len(a) for a in docids_col), dtype=np.int64, count=len(pdf)
    )
    doc_all = np.concatenate(docids_col).astype(np.int64)
    tf_all = np.concatenate(tfs_col).astype(np.int64)
    len_all = np.concatenate(lens_col).astype(np.int64)
    g_all = np.repeat(row_gid, counts)

    cf_b = pdf["cf_b"].to_numpy(np.int64)[row_order]
    seg_cf = np.add.reduceat(cf_b, row_gstarts)

    if quantized:
        df_col = pdf["df"].to_numpy(np.int64)[row_order]
        cf_col = pdf["cf"].to_numpy(np.int64)[row_order]
        group_df = df_col[row_gstarts]
        group_cf = cf_col[row_gstarts]
        df_all = np.repeat(df_col, counts)
        tf_all = quantizer(tf_all, len_all, df_all)

    # ---- impact ordering within each group: stable sort by
    # (group, impact desc); position is the minor key so equal-impact
    # postings stay docid-ascending (memory_index.c:554-562)
    pos = np.arange(doc_all.size, dtype=np.int64)
    order2 = np.lexsort((pos, -tf_all, g_all))
    g_s = g_all[order2]
    tf_s = tf_all[order2]
    doc_s = doc_all[order2]
    len_s = len_all[order2]

    # ---- quantum boundaries: change of (group, impact)
    qb = np.flatnonzero((np.diff(g_s) != 0) | (np.diff(tf_s) != 0)) + 1
    qstarts = np.concatenate(([0], qb))
    qends = np.concatenate((qb, [g_s.size]))
    q_gid = g_s[qstarts]
    q_impact = tf_s[qstarts]
    q_count = qends - qstarts

    # ---- per-quantum delta encoding with implicit prev = -1
    shifted = doc_s + 1
    deltas = shifted.copy()
    deltas[1:] -= shifted[:-1]
    deltas[qstarts] = shifted[qstarts]

    # ---- one bulk posting encode; slice per group at quantum
    # boundaries (vbyte also slices at value boundaries, but quantum
    # starts are the only cut points either codec needs)
    if codec == "vbyte":
        pbuf, pends = vbyte_encode_raw(deltas)
        pstart_bytes = np.concatenate(([0], pends))[qstarts]
    else:
        from atire_spark.kernels.codecs import get_codec

        blob, pstart_bytes = get_codec(codec).encode_groups(deltas, qstarts)
        pbuf = np.frombuffer(blob, dtype=np.uint8)
    lbuf, lends = vbyte_encode_raw(len_s)

    # group boundaries in quantum space and in posting space
    g_qb = np.flatnonzero(np.diff(q_gid) != 0) + 1
    g_qstarts = np.concatenate(([0], g_qb))
    g_qends = np.concatenate((g_qb, [q_gid.size]))
    g_pstarts = qstarts[g_qstarts]  # first posting index of each group
    g_pends = np.concatenate((qstarts[g_qstarts[1:]], [g_s.size]))
    lends_all = np.concatenate(([0], lends))
    pb = pbuf.tobytes()
    lb = lbuf.tobytes()
    # per-group byte spans = [first quantum's byte start, next group's)
    g_bstarts = pstart_bytes[g_qstarts]
    g_bends = np.concatenate((g_bstarts[1:], [len(pb)]))

    terms = tuniq[tcode_s[row_gstarts]]
    seg_groups = seg_s[row_gstarts]

    rows = []
    for gi in range(n_groups):
        qs, qe = g_qstarts[gi], g_qends[gi]
        ps, pe = int(g_pstarts[gi]), int(g_pends[gi])
        impacts = q_impact[qs:qe]
        doc_counts = q_count[qs:qe]
        base_byte = int(g_bstarts[gi])
        row = {
            "term": terms[gi],
            "seg_group": int(seg_groups[gi]),
            "seg_df": pe - ps,
            "seg_cf": int(seg_cf[gi]),
            "max_impact": int(impacts[0]),
            "impacts": impacts.astype(np.int32).tolist(),
            "doc_counts": doc_counts.astype(np.int32).tolist(),
            "offsets": (qstarts[qs:qe] - ps).tolist(),
            "byte_offsets": (pstart_bytes[qs:qe] - base_byte).tolist(),
            "postings": pb[base_byte : int(g_bends[gi])],
            "doc_lens": lb[int(lends_all[ps]) : int(lends_all[pe])],
            "n_postings": pe - ps,
        }
        if quantized:
            row["df"] = int(group_df[gi])
            row["cf"] = int(group_cf[gi])
        rows.append(row)
    out = pd.DataFrame(rows)
    # first/last docid of the group in DOCID order (not impact order):
    # rows within a group are docid-sorted, so the group's docid range
    # is [first of first row, last of last row] — the query side uses
    # the range to size dense accumulator arrays without decoding
    row_gends = np.concatenate((row_gstarts[1:], [len(pdf)]))
    firsts = np.fromiter(
        (docids_col[i][0] for i in row_gstarts), dtype=np.int64, count=n_groups
    )
    lasts = np.fromiter(
        (docids_col[i - 1][-1] for i in row_gends), dtype=np.int64, count=n_groups
    )
    out["first_docid"] = firsts
    out["last_docid"] = lasts
    return out
