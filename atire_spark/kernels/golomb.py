"""Golomb posting codec, wire-compatible with the reference
(compress_golomb.c:1-100).

Per stream (= per quantum group in our segment layout): the divisor
``factor = max(1, trunc(0.69 * sum(values) / count))`` is computed
from the values themselves (compress_golomb.c:47-59), stored at the
head of the stream Elias-delta coded (compress_golomb.c:108-117 —
so each group is self-describing), then each value is coded as

- a unary quotient ``q = v // factor`` (``q`` zeros then a one), and
- a truncated-binary remainder: with ``b = floor_log2(factor)`` and
  ``pivot = 2^(b+1) - factor``, remainders below ``pivot`` use ``b``
  bits, the rest use ``b + 1`` bits holding ``pivot + r``
  (compress_golomb.c:75-99).

Bit-aligned, so decode is a per-value loop (see the perf note in
kernels/elias.py); groups restart the stream for partial reads.
"""

from __future__ import annotations

import numpy as np

from atire_spark.kernels.bitio import BitReader, BitWriter


def _encode_delta(w: BitWriter, value: int) -> None:
    """Elias-delta used for the stream-head factor (same arithmetic
    as kernels/elias.py ELIAS_DELTA)."""
    v = value + 1
    e = v.bit_length() - 1
    ew = e + 2
    ee = ew.bit_length() - 1
    w.push_zeros(ee)
    w.push_bits(ew, ee + 1)
    w.push_bits(v, e)


def _decode_delta(r: BitReader) -> int:
    ee = r.zeros_until_one()
    ew = (1 << ee) | r.get_bits(ee)
    e = ew - 2
    return ((1 << e) | r.get_bits(e)) - 1


class _GolombCodec:
    name = "golomb"

    @staticmethod
    def _factor(group: np.ndarray) -> int:
        # compress_golomb.c:47-59 — double multiply then C truncation
        f = int(0.69 * float(group.sum()) / group.size)
        return f if f >= 1 else 1

    def encode_groups(
        self, values: np.ndarray, group_starts: np.ndarray
    ) -> tuple[bytes, np.ndarray]:
        v = np.ascontiguousarray(values, dtype=np.int64)
        if v.size and v.min() < 0:
            raise ValueError("golomb: negative value")
        starts = np.ascontiguousarray(group_starts, dtype=np.int64)
        bounds = np.concatenate((starts[1:], [v.size]))
        blobs: list[bytes] = []
        offsets = np.zeros(starts.size, dtype=np.int64)
        pos = 0
        for gi in range(starts.size):
            offsets[gi] = pos
            group = v[int(starts[gi]) : int(bounds[gi])]
            w = BitWriter()
            factor = self._factor(group)
            b = factor.bit_length() - 1  # ANT_floor_log2
            pivot = (1 << (b + 1)) - factor
            _encode_delta(w, factor)
            for x in group:
                x = int(x)
                q = x // factor
                w.push_zeros(q)
                w.push_one()
                man = x - q * factor
                if man < pivot:
                    w.push_bits(man, b)
                else:
                    w.push_bits(pivot + man, b + 1)
            blob = w.getvalue()
            pos += len(blob)
            blobs.append(blob)
        return b"".join(blobs), offsets

    def decode_group(self, blob_slice: bytes, count: int) -> np.ndarray:
        r = BitReader(blob_slice)
        factor = _decode_delta(r)
        b = factor.bit_length() - 1
        pivot = (1 << (b + 1)) - factor
        out = np.empty(count, dtype=np.int64)
        for i in range(count):
            q = r.zeros_until_one()
            man = r.get_bits(b)
            if man >= pivot:
                man = ((man << 1) | r.get_bit()) - pivot
            out[i] = man + q * factor
        return out

    def decode_prefix(
        self, blob: bytes, doc_counts: np.ndarray, byte_offsets: np.ndarray
    ) -> np.ndarray:
        g = len(doc_counts)
        ends = np.concatenate((byte_offsets[1:g], [len(blob)])) if g else []
        chunks = [
            self.decode_group(
                blob[int(byte_offsets[gi]) : int(ends[gi])], int(doc_counts[gi])
            )
            for gi in range(g)
        ]
        return (
            np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.int64)
        )


GOLOMB = _GolombCodec()
