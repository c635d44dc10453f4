"""Variable-byte integer codec, wire-compatible with the reference scheme.

Reference semantics (/root/reference/source/compress_variable_byte.h:31-96):
big-endian 7-bit groups, most-significant group first, and the stop bit
(0x80) is set on the *last* (least-significant) byte. 0 encodes as b'\\x80'.
Up to 9 bytes per integer (63-bit values).

Both encode and decode are fully vectorized numpy — these run inside
Arrow UDFs on posting lists of millions of entries, so no per-int Python.
"""

from __future__ import annotations

import numpy as np

# Byte-length thresholds: value < 2**(7*i) needs i bytes (i = 1..9).
_THRESHOLDS = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)
_MAX_VALUE = (1 << 63) - 1


def vbyte_encode_raw(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode to a uint8 buffer, also returning the per-value *end*
    byte offsets (cumulative). ``buf[ends[i-1]:ends[i]]`` is value i's
    encoding — callers slice one bulk encode into per-segment streams
    (vbyte streams concatenate losslessly at value boundaries)."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    if vals.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    if int(vals.max()) > _MAX_VALUE:
        raise ValueError("vbyte_encode: value out of 63-bit range")

    nbytes = np.searchsorted(_THRESHOLDS, vals, side="right").astype(np.int64) + 1
    ends = np.cumsum(nbytes)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_len = int(nbytes.max())
    last_idx = ends - 1
    for p in range(max_len):
        mask = nbytes > p
        idx = last_idx[mask] - p
        out[idx] = ((vals[mask] >> np.uint64(7 * p)) & np.uint64(0x7F)).astype(
            np.uint8
        )
    out[last_idx] |= 0x80
    return out, ends


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints (< 2**63) to vbyte bytes."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    if vals.size and int(vals.max()) > _MAX_VALUE:
        raise ValueError("vbyte_encode: value out of 63-bit range")

    # bytes needed per value: index of first threshold greater than value
    nbytes = np.searchsorted(_THRESHOLDS, vals, side="right").astype(np.int64) + 1
    ends = np.cumsum(nbytes)  # index one past the last byte of each value
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)

    # Fill byte position p (counting 0 = last/least-significant byte).
    # For values with nbytes > p, the byte at (end - 1 - p) holds bits
    # (value >> 7p) & 0x7F.
    max_len = int(nbytes.max())
    last_idx = ends - 1
    for p in range(max_len):
        mask = nbytes > p
        idx = last_idx[mask] - p
        out[idx] = ((vals[mask] >> np.uint64(7 * p)) & np.uint64(0x7F)).astype(
            np.uint8
        )
    out[last_idx] |= 0x80  # stop bit on the last byte of each value
    return out.tobytes()


def vbyte_decode(data: bytes | bytearray | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode vbyte bytes back to a uint64 array.

    ``count`` (if given) is validated against the number of stop bits.
    """
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint64)

    stop = (arr & 0x80) != 0
    seg_end = np.flatnonzero(stop)
    n = seg_end.size
    if count is not None and count != n:
        raise ValueError(f"vbyte_decode: expected {count} ints, found {n}")
    if not stop[-1]:
        raise ValueError("vbyte_decode: truncated stream (no final stop bit)")

    seg_start = np.empty(n, dtype=np.int64)
    seg_start[0] = 0
    seg_start[1:] = seg_end[:-1] + 1

    # segment id per byte, then shift = 7 * (distance from last byte)
    lengths = seg_end - seg_start + 1
    seg_id = np.repeat(np.arange(n, dtype=np.int64), lengths)
    idx = np.arange(arr.size, dtype=np.int64)
    shift = ((seg_end[seg_id] - idx) * 7).astype(np.uint64)
    contrib = (arr & np.uint8(0x7F)).astype(np.uint64) << shift
    return np.add.reduceat(contrib, seg_start)
