"""Simple-9 word-aligned codec (Anh & Moffat 2005) — the reference's
``-cs`` compression option (compress_simple9.c; selected by
compression_factory.c alongside the default vbyte).

Wire format (compress_simple9.c:161-196): each 32-bit little-endian
word is ``(payload << 4) | selector``; the selector picks one of nine
packings of the 28 payload bits::

    selector  0   1   2   3   4   5   6   7   8
    ints     28  14   9   7   5   4   3   2   1
    bits      1   2   3   4   5   7   9  14  28

Values pack low-to-high within the payload (shift j·bits for the
j-th value). The encoder is greedy like the reference: at each
position it takes the densest selector whose next ``ints`` values all
fit in ``bits`` (a trailing partial group zero-pads — the decoder
over-produces and the caller trims to the known count, exactly like
``decompress(destination, ..., destination_integers)``).

Engine integration notes:

- only POSTING streams switch codec; the inline doc-length stream is
  an engine-internal structure and stays vbyte;
- values must fit 28 bits (the reference's ANT_compressable_integer
  payload limit — its encoder returns failure past that). Docid
  deltas exceed 2^28 only for >268M-doc gaps, where the build raises
  rather than corrupting the stream;
- :func:`encode_groups` restarts the packer at every quantum-group
  boundary so per-group byte offsets stay word-aligned and a partial
  (trim-point) read can slice and decode any group prefix, matching
  the vbyte layout contract in kernels/impact.py.

The encoder walks word-by-word in Python (the reference encoder is
likewise per-word); the DECODER — the query-side hot path — is fully
vectorized numpy.
"""

from __future__ import annotations

import numpy as np

# (ints, bits) per selector, densest first — simple9_table,
# compress_simple9.c:31-41
S9_TABLE = (
    (28, 1),
    (14, 2),
    (9, 3),
    (7, 4),
    (5, 5),
    (4, 7),
    (3, 9),
    (2, 14),
    (1, 28),
)
S9_MAX = (1 << 28) - 1


def _bits_needed(values: np.ndarray) -> np.ndarray:
    """ceil(log2(v+1)) with a 1-bit floor (a zero still occupies one
    1-bit slot)."""
    v = values.astype(np.uint64)
    out = np.zeros(v.size, dtype=np.int64)
    nz = v > 0
    out[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
    # float log2 is exact for < 2^28 but guard the boundary anyway
    out[nz] = np.maximum(out[nz], 1)
    return np.maximum(out, 1)


def encode_groups(
    values: np.ndarray, group_starts: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode ``values`` as concatenated Simple-9 words, restarting at
    every ``group_starts`` boundary. Returns ``(blob, byte_offsets)``
    with one byte offset per group (word-aligned)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if v.size and (v.min() < 0 or v.max() > S9_MAX):
        raise ValueError("simple9: value outside the 28-bit payload range")
    starts = np.ascontiguousarray(group_starts, dtype=np.int64)
    bits = _bits_needed(v)
    n = v.size
    # rolling max of bits over each selector window, so the greedy
    # feasibility test is O(1) per candidate selector
    rollmax = {}
    for ints, _b in S9_TABLE:
        if ints == 1:
            rollmax[ints] = bits
        else:
            w = min(ints, max(n, 1))
            if n == 0:
                rollmax[ints] = bits
            else:
                pad = np.full(w - 1, 0, dtype=np.int64)
                ext = np.concatenate((bits, pad))
                sw = np.lib.stride_tricks.sliding_window_view(ext, w)
                rollmax[ints] = sw.max(axis=1)
    bounds = np.concatenate((starts[1:], [n]))
    words: list[int] = []
    offsets = np.zeros(starts.size, dtype=np.int64)
    uv = v.astype(np.uint64)
    for gi in range(starts.size):
        offsets[gi] = len(words) * 4
        pos, end = int(starts[gi]), int(bounds[gi])
        while pos < end:
            for sel, (ints, b) in enumerate(S9_TABLE):
                take = min(ints, end - pos)
                # feasible iff every value in the (possibly truncated)
                # window fits in b bits; truncated windows zero-pad
                if take == ints:
                    ok = rollmax[ints][pos] <= b
                else:
                    ok = bits[pos : pos + take].max() <= b
                if ok:
                    shifts = (np.arange(take, dtype=np.uint64)) * np.uint64(b)
                    payload = int((uv[pos : pos + take] << shifts).sum())
                    words.append(((payload << 4) | sel) & 0xFFFFFFFF)
                    pos += take
                    break
            else:  # pragma: no cover - S9_MAX guard makes this dead
                raise ValueError("simple9: unpackable value")
    return (
        np.asarray(words, dtype=np.uint32).tobytes(),
        offsets,
    )


def encode(values: np.ndarray) -> bytes:
    """One-group convenience encoder."""
    blob, _ = encode_groups(values, np.zeros(1, dtype=np.int64))
    return blob


def decode(
    data: bytes | bytearray | np.ndarray, count: int | None = None
) -> np.ndarray:
    """Decode a Simple-9 word stream; yields every packed slot (the
    zero-padded tail included) unless ``count`` trims it — mirrors the
    reference decompress writing exactly destination_integers."""
    w = np.frombuffer(bytes(data), dtype=np.uint32)
    if w.size == 0:
        return np.zeros(0, dtype=np.int64)
    sel = (w & 0xF).astype(np.int64)
    payload = (w >> np.uint32(4)).astype(np.uint64)
    ints_of = np.asarray([t[0] for t in S9_TABLE], dtype=np.int64)
    n_out = ints_of[sel]
    starts = np.concatenate(([0], np.cumsum(n_out[:-1])))
    total = int(n_out.sum())
    out = np.zeros(total, dtype=np.int64)
    for s, (ints, b) in enumerate(S9_TABLE):
        rows = np.flatnonzero(sel == s)
        if rows.size == 0:
            continue
        shifts = (np.arange(ints, dtype=np.uint64)) * np.uint64(b)
        mask = np.uint64((1 << b) - 1)
        vals = (payload[rows][:, None] >> shifts[None, :]) & mask
        idx = starts[rows][:, None] + np.arange(ints, dtype=np.int64)[None, :]
        out[idx.ravel()] = vals.astype(np.int64).ravel()
    if count is not None:
        if total < count:
            raise ValueError(
                f"simple9: expected {count} ints, stream holds {total}"
            )
        return out[:count]
    return out
