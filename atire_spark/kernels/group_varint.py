"""Four-integer variable-byte ("group varint") posting codec,
wire-compatible with the reference
(compress_four_integer_variable_byte.c:30-83, the Google WSDM'09
"Group Varint Encoding" scheme).

Groups of up to four values share one header byte holding a 2-bit
byte-length code per value (``len - 1``), first value in the header's
high bits; each value follows big-endian in 1-4 bytes.  A tail group
of ``k < 4`` values MSB-aligns its header codes
(compress_four_integer_variable_byte.c:79, ``header <<= shift``); the
reference decoder's 256-case switch over-reads the phantom tail slots
and the caller trims by count — we decode exactly ``min(4,
remaining)`` values per group instead, which reads the same bytes.

The decoder walks one Python step per header byte (four values), not
per posting byte; like the bit-aligned codecs this scheme is here for
format parity — vbyte / the Simple family are the scale-path choices.
"""

from __future__ import annotations

import numpy as np


class _GroupVarintCodec:
    name = "group_varint"
    max_value = (1 << 32) - 1

    def encode_groups(
        self, values: np.ndarray, group_starts: np.ndarray
    ) -> tuple[bytes, np.ndarray]:
        v = np.ascontiguousarray(values, dtype=np.int64)
        if v.size and (v.min() < 0 or v.max() > self.max_value):
            raise ValueError("group_varint: value outside 32-bit range")
        starts = np.ascontiguousarray(group_starts, dtype=np.int64)
        bounds = np.concatenate((starts[1:], [v.size]))
        out = bytearray()
        offsets = np.zeros(starts.size, dtype=np.int64)
        uv = v.astype(np.uint64)
        # byte length per value: 1 + how many thresholds it exceeds
        nbytes = (
            1
            + (uv > 0xFF).astype(np.int64)
            + (uv > 0xFFFF).astype(np.int64)
            + (uv > 0xFFFFFF).astype(np.int64)
        )
        for gi in range(starts.size):
            offsets[gi] = len(out)
            pos, end = int(starts[gi]), int(bounds[gi])
            while pos < end:
                take = min(4, end - pos)
                header = 0
                body = bytearray()
                for j in range(take):
                    nb = int(nbytes[pos + j])
                    header = (header << 2) | (nb - 1)
                    body += int(uv[pos + j]).to_bytes(nb, "big")
                # MSB-align the header for tail groups
                header <<= 2 * (4 - take)
                out.append(header)
                out += body
                pos += take
        return bytes(out), offsets

    def decode_group(self, blob_slice: bytes, count: int) -> np.ndarray:
        buf = np.frombuffer(bytes(blob_slice), dtype=np.uint8)
        out = np.empty(count, dtype=np.int64)
        pos = 0
        vi = 0
        while vi < count:
            header = int(buf[pos])
            pos += 1
            take = min(4, count - vi)
            lens = [((header >> (6 - 2 * j)) & 3) + 1 for j in range(take)]
            total = sum(lens)
            chunk = buf[pos : pos + total]
            o = 0
            for j in range(take):
                val = 0
                for b in chunk[o : o + lens[j]]:
                    val = (val << 8) | int(b)
                out[vi + j] = val
                o += lens[j]
            pos += total
            vi += take
        return out

    def group_byte_length(self, blob: bytes, start: int, count: int) -> int:
        """Bytes consumed by ``count`` values starting at ``start``."""
        buf = np.frombuffer(bytes(blob), dtype=np.uint8)
        pos, vi = start, 0
        while vi < count:
            header = int(buf[pos])
            take = min(4, count - vi)
            pos += 1 + sum(
                ((header >> (6 - 2 * j)) & 3) + 1 for j in range(take)
            )
            vi += take
        return pos - start

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


GROUP_VARINT = _GroupVarintCodec()
