"""Elias gamma and delta posting codecs, wire-compatible with the
reference (compress_elias_gamma.h:34-58, compress_elias_delta.h:29-50).

Gamma (compress_elias_gamma.h:37-44): for value ``v`` let
``w = v + 1`` and ``e = floor_log2(w)``; emit ``e`` zero bits, then
the ``e + 1`` bits of ``w`` MSB-first (the leading bit is the 1 that
terminates the unary prefix).  Decode counts zeros to recover ``e``,
reads ``e`` mantissa bits, and returns ``(1 << e | mantissa) - 1``
(compress_elias_gamma.h:49-58).

Delta (compress_elias_delta.h:32-38): ``w = v + 1``,
``e = floor_log2(w)``; gamma-encode ``e + 1`` then emit the ``e``
low bits of ``w`` (without its leading 1).

Both encode one value at a time into an ANT_bitstream-layout bit
stream (kernels/bitio.py); streams restart at every quantum-group
boundary so per-group byte offsets support partial (trim-point)
reads, matching the segment layout contract in kernels/impact.py.
Bit-aligned codes have no word-parallel structure, so the decoder is
a per-value loop over numpy bit arrays — these codecs exist for
format parity; vbyte / the Simple family are the scale-path choices
(see BENCH.md).
"""

from __future__ import annotations

import numpy as np

from atire_spark.kernels.bitio import BitReader, BitWriter


def _encode_gamma_value(w: BitWriter, value: int) -> None:
    v = value + 1
    e = v.bit_length() - 1  # ANT_floor_log2
    w.push_zeros(e)
    w.push_bits(v, e + 1)


def _decode_gamma_value(r: BitReader) -> int:
    e = r.zeros_until_one()  # consumed the terminating 1 = MSB of v
    return ((1 << e) | r.get_bits(e)) - 1


class _EliasCodec:
    """Shared per-group framing for the two Elias variants."""

    def __init__(self, name: str, encode_one, decode_one) -> None:
        self.name = name
        self._encode_one = encode_one
        self._decode_one = decode_one

    def encode_groups(
        self, values: np.ndarray, group_starts: np.ndarray
    ) -> tuple[bytes, np.ndarray]:
        v = np.ascontiguousarray(values, dtype=np.int64)
        if v.size and v.min() < 0:
            raise ValueError(f"{self.name}: negative value")
        starts = np.ascontiguousarray(group_starts, dtype=np.int64)
        bounds = np.concatenate((starts[1:], [v.size]))
        blobs: list[bytes] = []
        offsets = np.zeros(starts.size, dtype=np.int64)
        pos = 0
        for gi in range(starts.size):
            offsets[gi] = pos
            w = BitWriter()
            for x in v[int(starts[gi]) : int(bounds[gi])]:
                self._encode_one(w, int(x))
            blob = w.getvalue()
            pos += len(blob)
            blobs.append(blob)
        return b"".join(blobs), offsets

    def decode_group(self, blob_slice: bytes, count: int) -> np.ndarray:
        r = BitReader(blob_slice)
        out = np.empty(count, dtype=np.int64)
        for i in range(count):
            out[i] = self._decode_one(r)
        return out

    def decode_prefix(
        self, blob: bytes, doc_counts: np.ndarray, byte_offsets: np.ndarray
    ) -> np.ndarray:
        """Decode the leading ``len(doc_counts)`` groups (each group is
        an independent byte-aligned stream located by its offset)."""
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


def _delta_encode_one(w: BitWriter, value: int) -> None:
    v = value + 1
    e = v.bit_length() - 1
    # gamma-code (e + 1): compress_elias_delta.h:32-38 calls
    # gamma::encode(exp + 1) whose own +1 makes the stored word e + 2;
    # we inline the arithmetic rather than nesting the off-by-ones
    ew = e + 2  # (e + 1) + 1, the value the gamma stage actually emits
    ee = ew.bit_length() - 1
    w.push_zeros(ee)
    w.push_bits(ew, ee + 1)
    w.push_bits(v, e)


def _delta_decode_one(r: BitReader) -> int:
    ee = r.zeros_until_one()
    ew = (1 << ee) | r.get_bits(ee)
    e = ew - 2  # undo both +1s
    return ((1 << e) | r.get_bits(e)) - 1


ELIAS_GAMMA = _EliasCodec(
    "elias_gamma", _encode_gamma_value, _decode_gamma_value
)
ELIAS_DELTA = _EliasCodec("elias_delta", _delta_encode_one, _delta_decode_one)
