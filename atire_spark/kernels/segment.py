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

The core (:func:`build_segments_flat`) consumes FLAT posting arrays
plus per-row group keys and emits an Arrow RecordBatch whose list and
binary columns are built directly from offsets over the flat streams —
no per-row Python lists on either side. ``mapInArrow`` stages feed it
straight from Arrow list columns (``build_segments_arrow``); the
pandas wrapper (:func:`build_segments_batch`) remains for callers that
hold row-wise DataFrames (merge, reorder, tests).

Reference layout being reproduced: memory_index.c:476-580
(impact_order_with_header) + per-quantum compression
(memory_index.c:804-1042).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from atire_spark.kernels.vbyte import vbyte_encode_raw

SEGMENT_ARROW_FIELDS = [
    ("term", pa.string()),
    ("seg_group", pa.int64()),
    ("seg_df", pa.int64()),
    ("seg_cf", pa.int64()),
    ("first_docid", pa.int64()),
    ("last_docid", pa.int64()),
    ("max_impact", pa.int32()),
    ("impacts", pa.list_(pa.int32())),
    ("doc_counts", pa.list_(pa.int32())),
    ("offsets", pa.list_(pa.int64())),
    ("byte_offsets", pa.list_(pa.int64())),
    ("postings", pa.binary()),
    ("doc_lens", pa.binary()),
    ("n_postings", pa.int64()),
]
SEGMENT_ARROW_SCHEMA = pa.schema(SEGMENT_ARROW_FIELDS)
SEGMENT_ARROW_SCHEMA_Q = pa.schema(
    SEGMENT_ARROW_FIELDS + [("df", pa.int64()), ("cf", pa.int64())]
)


def _list_array(offsets: np.ndarray, values: pa.Array) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), values
    )


def _binary_array(data: bytes, offsets: np.ndarray) -> pa.Array:
    """Variable-binary column over one contiguous buffer: group i's
    value is data[offsets[i]:offsets[i+1]] — zero copies.

    pa.binary() offsets are int32; an unchecked ``astype`` would WRAP
    silently if one encode partition's blob crosses 2 GiB (possible on
    the merge path, whose encode has no n_shuffle sizing), corrupting
    every group after the wrap. Raise loudly instead — the fix is more
    encode partitions (or a large_binary schema migration)."""
    if len(offsets) and int(offsets[-1]) > np.iinfo(np.int32).max:
        raise ValueError(
            f"segment binary column is {int(offsets[-1])} bytes in one "
            "encode partition — exceeds the 2 GiB pa.binary() offset "
            "range; raise the encode partition count (n_shuffle) so "
            "each partition's postings/doc_lens blob stays under 2 GiB"
        )
    return pa.Array.from_buffers(
        pa.binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()),
         pa.py_buffer(data)],
    )


def build_segments_flat(
    term_of_row: pa.Array,
    seg: np.ndarray,
    counts: np.ndarray,
    doc_flat: np.ndarray,
    tf_flat: np.ndarray,
    len_flat: np.ndarray,
    cf_b: np.ndarray,
    df_row: np.ndarray | None = None,
    cf_row: np.ndarray | None = None,
    quantizer=None,
    codec: str = "vbyte",
) -> pa.RecordBatch | None:
    """Flat stage1 postings → one Arrow segment row per (term,
    seg_group).

    ``term_of_row``/``seg``/``counts``/``cf_b`` are per stage1 ROW
    (``counts[i]`` = number of postings of row i); ``doc_flat`` /
    ``tf_flat`` / ``len_flat`` are the row-major flattened posting
    streams. Rows need NOT be sorted or hold disjoint docid ranges:
    the kernel groups rows by (term, seg_group), restores global docid
    order per quantum with a full (group, impact desc, docid) sort,
    and derives first/last docid by reduction — stage1 batches may
    therefore come from arbitrary slices of the corpus.

    ``quantizer(tfs, lens, df) -> impacts`` converts saturated tfs to
    quantized impacts (the -Q path); None keeps tf impacts. When a
    quantizer is given ``df_row``/``cf_row`` (global per-term stats,
    constant within a group) must be supplied and are copied onto the
    output rows.

    ``codec`` compresses the posting streams: ``vbyte`` (reference
    default; one vectorized bulk encode sliced at value boundaries) or
    any kernels.codecs name (each packer restarts at every quantum
    boundary so the per-quantum byte offsets stay aligned). Doc-length
    streams stay vbyte either way.
    """
    n_rows = len(seg)
    if n_rows == 0 or doc_flat.size == 0:
        return None
    quantized = quantizer is not None

    # ---- group rows by (term, seg_group); term identity via the
    # dictionary codes of the arrow column (C++-side unique)
    de = term_of_row.dictionary_encode() if not isinstance(
        term_of_row, pa.DictionaryArray
    ) else term_of_row
    tcode = de.indices.to_numpy().astype(np.int64)
    vocab = de.dictionary
    row_order = np.lexsort((seg, tcode))
    tcode_s = tcode[row_order]
    seg_s = seg[row_order]
    counts_s = counts[row_order]
    cfb_s = cf_b[row_order]
    if n_rows > 1:
        row_gb = np.flatnonzero(
            (np.diff(tcode_s) != 0) | (np.diff(seg_s) != 0)
        ) + 1
    else:
        row_gb = np.empty(0, dtype=np.int64)
    row_gid = np.zeros(n_rows, dtype=np.int64)
    row_gid[row_gb] = 1
    row_gid = np.cumsum(row_gid)
    n_groups = int(row_gid[-1]) + 1
    row_gstarts = np.concatenate(([0], row_gb))

    # ---- flatten postings in group order: element permutation built
    # from the row permutation (repeat + arange, no per-row Python)
    ends = np.cumsum(counts)
    starts = ends - counts
    new_ends = np.cumsum(counts_s)
    new_starts = new_ends - counts_s
    perm = np.repeat(starts[row_order] - new_starts, counts_s) + np.arange(
        doc_flat.size, dtype=np.int64
    )
    doc_all = doc_flat[perm]
    tf_all = tf_flat[perm]
    len_all = len_flat[perm]
    g_all = np.repeat(row_gid, counts_s)
    seg_cf = np.add.reduceat(cfb_s, row_gstarts)

    if quantized:
        df_s = df_row[row_order]
        cf_s = cf_row[row_order]
        group_df = df_s[row_gstarts]
        group_cf = cf_s[row_gstarts]
        df_all = np.repeat(df_s, counts_s)
        tf_all = quantizer(tf_all, len_all, df_all)

    # ---- impact ordering within each group: sort by (group, impact
    # desc, docid) — docid as the minor key keeps equal-impact postings
    # docid-ascending (memory_index.c:554-562) WITHOUT assuming the
    # input rows arrived as disjoint docid ranges: the full sort
    # restores global docid order per quantum either way ((term, docid)
    # is unique per segment, so the order is total)
    order2 = np.lexsort((doc_all, -tf_all, g_all))
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

    n_q = q_gid.size
    q_per_group = g_qends - g_qstarts
    # per-quantum offsets relative to their group's start
    rel_offsets = qstarts - np.repeat(g_pstarts, q_per_group)
    rel_bytes = pstart_bytes - np.repeat(g_bstarts, q_per_group)
    q_off32 = np.concatenate((g_qstarts, [n_q]))

    seg_df = (g_pends - g_pstarts).astype(np.int64)
    cols = [
        vocab.take(pa.array(tcode_s[row_gstarts], type=pa.int64())),
        pa.array(seg_s[row_gstarts].astype(np.int64), type=pa.int64()),
        pa.array(seg_df, type=pa.int64()),
        pa.array(seg_cf.astype(np.int64), type=pa.int64()),
        pa.array(np.minimum.reduceat(doc_all, g_pstarts), type=pa.int64()),
        pa.array(np.maximum.reduceat(doc_all, g_pstarts), type=pa.int64()),
        pa.array(q_impact[g_qstarts].astype(np.int32), type=pa.int32()),
        _list_array(q_off32, pa.array(q_impact.astype(np.int32))),
        _list_array(q_off32, pa.array(q_count.astype(np.int32))),
        _list_array(q_off32, pa.array(rel_offsets.astype(np.int64))),
        _list_array(q_off32, pa.array(rel_bytes.astype(np.int64))),
        _binary_array(pb, np.concatenate((g_bstarts, [len(pb)]))),
        _binary_array(
            lb,
            np.concatenate((lends_all[g_pstarts], [len(lb)])),
        ),
        pa.array(seg_df, type=pa.int64()),
    ]
    schema = SEGMENT_ARROW_SCHEMA
    if quantized:
        cols.append(pa.array(group_df.astype(np.int64), type=pa.int64()))
        cols.append(pa.array(group_cf.astype(np.int64), type=pa.int64()))
        schema = SEGMENT_ARROW_SCHEMA_Q
    return pa.RecordBatch.from_arrays(cols, schema=schema)


def _flat_from_table(tbl: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray]:
    """(counts, flat values) of a list column across all chunks."""
    import pyarrow.compute as pc

    arr = tbl.column(col)
    counts = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    flats = [c.flatten() for c in arr.chunks] if isinstance(
        arr, pa.ChunkedArray
    ) else [arr.flatten()]
    flat = np.concatenate(
        [f.to_numpy(zero_copy_only=False) for f in flats]
    ) if flats else np.empty(0)
    return counts.astype(np.int64), flat


def build_segments_arrow(
    tbl: pa.Table, quantizer=None, codec: str = "vbyte"
) -> pa.RecordBatch | None:
    """stage1 rows as an Arrow table → segment RecordBatch (the
    mapInArrow fast path: list columns feed the flat kernel through
    offsets, never through per-row numpy object arrays)."""
    if tbl is None or tbl.num_rows == 0:
        return None
    counts, doc_flat = _flat_from_table(tbl, "docids")
    _, tf_flat = _flat_from_table(tbl, "tfs")
    _, len_flat = _flat_from_table(tbl, "lens")
    term_col = tbl.column("term")
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    get = lambda c: tbl.column(c).to_numpy(zero_copy_only=False)
    return build_segments_flat(
        term_col,
        get("seg_group").astype(np.int64),
        counts,
        doc_flat.astype(np.int64),
        tf_flat.astype(np.int64),
        len_flat.astype(np.int64),
        get("cf_b").astype(np.int64),
        df_row=get("df").astype(np.int64) if quantizer is not None else None,
        cf_row=get("cf").astype(np.int64) if quantizer is not None else None,
        quantizer=quantizer,
        codec=codec,
    )


def build_segments_batch(
    pdf: pd.DataFrame,
    quantizer=None,
    codec: str = "vbyte",
) -> pd.DataFrame | None:
    """stage1 rows (term, seg_group, block, docids[], tfs[], lens[],
    df_b, cf_b [, df, cf]) as a pandas frame → one segment row per
    (term, seg_group), as pandas (row-wise callers: merge, reorder,
    tests). Thin wrapper over :func:`build_segments_flat`."""
    if pdf is None or not len(pdf):
        return None
    counts = np.fromiter(
        (len(a) for a in pdf["docids"]), dtype=np.int64, count=len(pdf)
    )
    if counts.sum() == 0:
        return None
    quantized = quantizer is not None
    rb = build_segments_flat(
        pa.array(pdf["term"], type=pa.string()),
        pdf["seg_group"].to_numpy(np.int64),
        counts,
        np.concatenate(pdf["docids"].to_numpy()).astype(np.int64),
        np.concatenate(pdf["tfs"].to_numpy()).astype(np.int64),
        np.concatenate(pdf["lens"].to_numpy()).astype(np.int64),
        pdf["cf_b"].to_numpy(np.int64),
        df_row=pdf["df"].to_numpy(np.int64) if quantized else None,
        cf_row=pdf["cf"].to_numpy(np.int64) if quantized else None,
        quantizer=quantizer,
        codec=codec,
    )
    if rb is None:
        return None
    out = rb.to_pandas()
    for c in ("impacts", "doc_counts"):
        out[c] = out[c].map(lambda a: a.astype(np.int32).tolist())
    for c in ("offsets", "byte_offsets"):
        out[c] = out[c].map(lambda a: a.astype(np.int64).tolist())
    return out