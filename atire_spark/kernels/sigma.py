"""Sigma-encoded posting codec (Trotman & Subramanya, CIKM 2007),
following the reference's encoder (compress_sigma.c:157-287).

Per stream: gaps are frequency-mapped before a Carryover-12 back end.
Unique values sort by (frequency desc, value asc); those with
frequency > threshold (= 1, compress_sigma.h:34) form a dictionary
whose power-of-two blocks ([0,2), [2,4), [4,8) … —
``ANT_pow2_zero`` maps 2^0 to 0) are re-sorted value-ascending and
difference-encoded within each block (first entry raw, then
``v - prev - 1``).  The stream is ``[dict_size, dict…, mapped…]``
carryover12-compressed, where a mapped value is its dictionary
position, or ``raw + dict_size`` for sub-threshold values.

Two deliberate departures from the reference C, both documented
because they make the scheme actually round-trip:

- ``ANT_compress_sigma::long_cmp`` (compress_sigma.c:100-110)
  compares the qsort POINTERS, not the pointed-at values, so the
  reference's within-block re-sort is implementation-defined noise;
  we sort by value ascending (the stated intent, and required for the
  non-negative difference encoding).
- the reference decoder's dictionary loop
  (compress_sigma.c:319-333) runs ``CARRY_DECODE(*into++ = last)``
  — a C++ lvalue-assignment chain that never updates ``last`` with
  the block-first raw value, so any dictionary with a block of size
  >= 2 whose predecessor block changed ``last`` decodes wrong.  Our
  decoder tracks ``last`` the way the encoder does.  (Finding: Sigma
  in ATIRE cannot round-trip dictionaries with >= 3 over-threshold
  uniques; it is not the default codec there.)
"""

from __future__ import annotations

import numpy as np

from atire_spark.kernels.carryover12 import CARRYOVER12


def _pow2_zero(p: int) -> int:
    """ANT_pow2_zero: 2^0 is 0 in the reference table (maths.c:69-75)."""
    return 0 if p == 0 else (1 << p)


class _SigmaCodec:
    name = "sigma"
    threshold = 1
    max_value = (1 << 27) - 1  # mapped raw values shift by dict size

    def _map_group(self, vals: np.ndarray) -> np.ndarray:
        """Build the [dict_size, dict deltas..., mapped values...]
        integer stream for one group."""
        uniq, counts = np.unique(vals, return_counts=True)
        # (freq desc, value asc): lexsort keys are last-significant-first
        order = np.lexsort((uniq, -counts))
        pre = uniq[order]
        pre_freq = counts[order]
        n_dict = int((pre_freq > self.threshold).sum())
        dictionary = pre[:n_dict].copy()
        # re-sort value-ascending within power-of-two blocks
        p = 0
        while _pow2_zero(p) < n_dict:
            lo = _pow2_zero(p)
            hi = min(_pow2_zero(p + 1), n_dict)
            dictionary[lo:hi] = np.sort(dictionary[lo:hi])
            p += 1
        # map every gap: dict position, else raw + n_dict
        dict_pos = {int(v): i for i, v in enumerate(dictionary)}
        mapped = np.asarray(
            [dict_pos.get(int(v), int(v) + n_dict) for v in vals],
            dtype=np.int64,
        )
        # difference-encode the dictionary within blocks
        enc_dict = dictionary.astype(np.int64).copy()
        p = 0
        while _pow2_zero(p) < n_dict:
            lo = _pow2_zero(p)
            hi = min(_pow2_zero(p + 1), n_dict)
            last = int(dictionary[lo])
            for i in range(lo + 1, hi):
                cur = int(dictionary[i])
                enc_dict[i] = cur - last - 1
                last = cur
            p += 1
        return np.concatenate(
            (np.asarray([n_dict], dtype=np.int64), enc_dict, mapped)
        )

    def encode_groups(
        self, values: np.ndarray, group_starts: np.ndarray
    ) -> tuple[bytes, np.ndarray]:
        v = np.ascontiguousarray(values, dtype=np.int64)
        if v.size and (v.min() < 0 or v.max() > self.max_value):
            raise ValueError("sigma: value outside 27-bit range")
        starts = np.ascontiguousarray(group_starts, dtype=np.int64)
        bounds = np.concatenate((starts[1:], [v.size]))
        blobs: list[bytes] = []
        offsets = np.zeros(starts.size, dtype=np.int64)
        pos = 0
        for gi in range(starts.size):
            offsets[gi] = pos
            stream = self._map_group(v[int(starts[gi]) : int(bounds[gi])])
            blob, _ = CARRYOVER12.encode_groups(
                stream, np.zeros(1, dtype=np.int64)
            )
            pos += len(blob)
            blobs.append(blob)
        return b"".join(blobs), offsets

    def decode_group(self, blob_slice: bytes, count: int) -> np.ndarray:
        if count == 0:
            return np.zeros(0, dtype=np.int64)
        # the stream length isn't known until dict_size is read, so
        # peek the head, then decode the exact 1 + dict + count span
        head = CARRYOVER12.decode_group(blob_slice, 1)
        n_dict = int(head[0])
        full = CARRYOVER12.decode_group(blob_slice, 1 + n_dict + count)
        enc_dict = full[1 : 1 + n_dict]
        mapped = full[1 + n_dict :]
        dictionary = enc_dict.copy()
        p = 0
        while _pow2_zero(p) < n_dict:
            lo = _pow2_zero(p)
            hi = min(_pow2_zero(p + 1), n_dict)
            last = int(dictionary[lo])
            for i in range(lo + 1, hi):
                last = int(enc_dict[i]) + last + 1
                dictionary[i] = last
            p += 1
        if n_dict == 0:
            return mapped.astype(np.int64)
        out = np.where(
            mapped >= n_dict,
            mapped - n_dict,
            dictionary[np.minimum(mapped, n_dict - 1)],
        )
        return out.astype(np.int64)

    def decode_prefix(
        self, blob: bytes, doc_counts: np.ndarray, byte_offsets: np.ndarray
    ) -> np.ndarray:
        g = len(doc_counts)
        if g == 0:
            return np.zeros(0, dtype=np.int64)
        ends = np.concatenate((byte_offsets[1:g], [len(blob)]))
        return np.concatenate(
            [
                self.decode_group(
                    blob[int(byte_offsets[gi]) : int(ends[gi])],
                    int(doc_counts[gi]),
                )
                for gi in range(g)
            ]
        )


SIGMA = _SigmaCodec()
