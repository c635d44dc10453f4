"""Impact-ordered posting-segment layout + codec.

Reference layout (/root/reference/source/memory_index.c:476-580,
``impact_order_with_header``): postings for one term are grouped by
impact value (= saturated tf for the default unquantized index) in
*descending* impact order; within each group docids are ascending and
delta-encoded with an implicit previous docid of -1 (the first stored
delta is ``docid + 1``; the scorer starts its cursor at -1,
ranking_function_bm25.c:118-124). The header carries, per group
("quantum"): the impact value, the doc count, and the int offset of the
group in the decoded stream. The first header impact value is the
term's max impact (memory_index.c:567).

Our segment row adds what the reference keeps elsewhere:

- per-group *byte* offsets, because each group is vbyte-compressed
  independently (the reference's IMPACT_HEADER per-quantum compression,
  memory_index.c:804-1042) — enables partial/block-max decode;
- an inline vbyte stream of the doc lengths aligned with the posting
  order, replacing the reference's in-RAM ``~length`` vector
  (search_engine.c:191-306): at 10^12 docs a dense length array cannot
  live on one node, so each segment is self-contained and scoring needs
  no join.

Static pruning (reference -K, memory_index.c:545-546): optional
``static_prune`` cuts the list at EXACTLY that many postings —
``pruned_point = pointer[bucket] + (static_prune_point - sum)``
truncates the quantum containing the prune point mid-group, keeping
its lowest docids.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from atire_spark.kernels.vbyte import vbyte_decode, vbyte_encode


@dataclass
class Segment:
    """One postings segment (one term, one contiguous docid range)."""

    impacts: np.ndarray  # int32, descending impact (tf) per group
    doc_counts: np.ndarray  # int32, postings per group
    offsets: np.ndarray  # int64, int offset of group start in decoded stream
    byte_offsets: np.ndarray  # int64, byte offset of group start in `postings`
    postings: bytes  # per-group vbyte docid-delta streams, concatenated
    doc_lens: bytes  # vbyte doc lengths aligned with posting order
    n_postings: int
    max_impact: int


def impact_order(
    docids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    static_prune: int = 0,
    codec: str = "vbyte",
) -> Segment:
    """Build one impact-ordered segment from parallel arrays.

    ``docids`` must be ascending and unique; ``tfs`` the saturated term
    frequencies; ``doc_lens`` the document lengths aligned with
    ``docids``.

    ``codec`` picks the posting-stream compression: ``vbyte`` (the
    reference default, compression_factory.c:91) or ``simple9``
    (``-cs``, kernels/simple9.py). The inline doc-length stream is an
    engine-internal structure and stays vbyte either way.
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    doc_lens = np.ascontiguousarray(doc_lens, dtype=np.int64)
    n = docids.size
    if n == 0:
        raise ValueError("impact_order: empty posting list")

    # stable sort by impact descending, docid ascending (docids are
    # already ascending, so a stable sort on -tf preserves docid order
    # within each impact group — same result as the reference's bucket
    # scatter, memory_index.c:554-562)
    order = np.argsort(-tfs, kind="stable")
    s_tf = tfs[order]
    s_doc = docids[order]
    s_len = doc_lens[order]

    # group boundaries where impact changes
    change = np.flatnonzero(np.diff(s_tf)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    impacts = s_tf[starts].astype(np.int32)
    doc_counts = (ends - starts).astype(np.int32)

    # optional static prune: exact cut at the prune point — the
    # containing quantum truncates mid-group (memory_index.c:545-546)
    if 0 < static_prune < n:
        cum = np.cumsum(doc_counts)
        keep_groups = int(np.searchsorted(cum, static_prune, side="left")) + 1
        keep_groups = min(keep_groups, impacts.size)
        impacts = impacts[:keep_groups]
        doc_counts = doc_counts[:keep_groups].copy()
        prev = int(cum[keep_groups - 2]) if keep_groups > 1 else 0
        doc_counts[-1] = static_prune - prev
        starts = starts[:keep_groups]
        ends = np.concatenate((change[: keep_groups - 1], [static_prune]))
        n = static_prune
        s_doc = s_doc[:n]
        s_len = s_len[:n]

    # per-group delta encoding with implicit prev = -1: first stored
    # value is docid+1, later values are docid diffs within the group
    deltas = np.empty(n, dtype=np.int64)
    shifted = s_doc + 1  # work in the +1 domain so prev starts at 0
    deltas[:] = shifted
    deltas[1:] -= shifted[:-1]
    deltas[starts] = shifted[starts]  # restart at each group boundary

    # compress each group independently; record byte offsets (every
    # codec restarts its state at group boundaries — vbyte is
    # stateless per value, so one bulk encode sliced at the starts is
    # identical to per-group encodes)
    from atire_spark.kernels.codecs import get_codec

    postings_blob, byte_offsets = get_codec(codec).encode_groups(
        deltas, starts[: impacts.size]
    )

    offsets = np.zeros(impacts.size, dtype=np.int64)
    np.cumsum(doc_counts[:-1], out=offsets[1:])

    return Segment(
        impacts=impacts,
        doc_counts=doc_counts,
        offsets=offsets,
        byte_offsets=byte_offsets,
        postings=postings_blob,
        doc_lens=vbyte_encode(s_len),
        n_postings=int(n),
        max_impact=int(impacts[0]),
    )


def decode_segment(
    impacts: np.ndarray,
    doc_counts: np.ndarray,
    postings: bytes,
    doc_lens: bytes | None = None,
    max_groups: int | None = None,
    codec: str = "vbyte",
    byte_offsets: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Decode a segment back to ``(docids, tfs, doc_lens)``.

    ``max_groups`` decodes only the leading (highest-impact) groups —
    the reference's partial decompression to the trim point
    (search_engine.c:942-1070). Returned arrays are in impact order
    (group-major), not docid order.

    ``codec``: ``vbyte`` streams concatenate with no per-group
    padding, so one bulk decode + slice suffices and ``byte_offsets``
    is not needed; every other codec pads / restarts per group, so
    groups decode individually at the stored per-group byte offsets
    (the group walk is over ≤ n_quantums items, never per posting).
    ``simple9`` alone can also locate its group boundaries without
    offsets by walking the word selectors.
    """
    impacts = np.asarray(impacts, dtype=np.int64)
    doc_counts = np.asarray(doc_counts, dtype=np.int64)
    g = impacts.size if max_groups is None else min(max_groups, impacts.size)
    n = int(np.sum(doc_counts[:g]))

    if codec == "vbyte":
        deltas = vbyte_decode(postings)  # full decode; byte_offsets allow
        deltas = deltas[:n].astype(np.int64)  # partial via slicing instead
    elif byte_offsets is not None:
        from atire_spark.kernels.codecs import get_codec

        deltas = get_codec(codec).decode_prefix(
            bytes(postings),
            doc_counts[:g],
            np.asarray(byte_offsets, dtype=np.int64)[:g],
        )
    elif codec == "simple9":
        from atire_spark.kernels.simple9 import S9_TABLE
        from atire_spark.kernels.simple9 import decode as s9_decode

        words = np.frombuffer(bytes(postings), dtype=np.uint32)
        ints_of = np.asarray([t[0] for t in S9_TABLE], dtype=np.int64)
        slots = ints_of[(words & 0xF).astype(np.int64)]
        chunks = []
        w0 = 0
        for gi in range(g):
            cnt, got, w1 = int(doc_counts[gi]), 0, w0
            while got < cnt:
                got += int(slots[w1])
                w1 += 1
            chunks.append(
                s9_decode(words[w0:w1].tobytes(), count=cnt)
            )
            w0 = w1
        deltas = (
            np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.int64)
        )
    else:
        raise ValueError(
            f"codec {codec!r} needs the segment byte_offsets for group "
            "boundaries"
        )

    # undo per-group delta encoding (prev = -1 per group): the global
    # cumsum minus the cumsum at the end of the previous group gives the
    # within-group cumsum; -1 maps back from the +1-shifted domain
    starts = np.zeros(g, dtype=np.int64)
    np.cumsum(doc_counts[: g - 1], out=starts[1:])
    cum = np.cumsum(deltas)
    prefix = np.concatenate(([0], cum[starts[1:] - 1])) if g > 1 else np.zeros(1, dtype=np.int64)
    docids = cum - np.repeat(prefix, doc_counts[:g]) - 1

    tfs = np.repeat(impacts[:g], doc_counts[:g])
    lens = None
    if doc_lens is not None:
        lens = vbyte_decode(doc_lens)[:n].astype(np.int64)
    return docids, tfs, lens


def decode_group(blob_slice: bytes, count: int, codec: str = "vbyte") -> np.ndarray:
    """Decode ONE quantum group's byte slice (located via the
    segment's per-group byte_offsets) to its ``count`` delta values —
    the QaaT per-quantum partial read."""
    from atire_spark.kernels.codecs import get_codec

    return get_codec(codec).decode_group(blob_slice, count)
