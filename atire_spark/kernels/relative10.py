"""Relative-10 posting codec, wire-compatible with the reference
(compress_relative10.c:14-212; Anh & Moffat's Relative-9/10 scheme).

Layout: the FIRST 32-bit word of each stream is plain Simple-9
(4-bit selector in the HIGH bits, payload low — note this differs
from compress_simple9.c's low-bit selector; relative10's first word
puts ``row << 28``).  Every following word carries a 2-bit selector
in its top bits choosing one of four rows *relative to the previous
row* via ``relative10_table``; the remaining 30 bits hold the values,
first value in the lowest bits.

Encoder transcription (compress_relative10.c:73-146): scan forward
quantizing widths through ``bits_to_use10`` until the word would
overflow; translate the desired row through ``transfer_array`` /
``relative_row`` (the reachable row may pack fewer, wider slots);
words always pack the row's full slot count except that the scan
never overruns the input, so tail words fall back to sparser rows.
The decoder emits each word's full slot count and the caller trims by
count (the reference writes to ``destination_integers`` and stops).

Decode tracks the row sequentially (one Python step per WORD — the
2-bit selector chain is inherently serial) but unpacks each word's
slots with numpy shift tables.
"""

from __future__ import annotations

import numpy as np

# (numbers, bits) per Relative-10 row — relative10_table cols 1-2
R10_ROWS = (
    (1, 30),
    (2, 15),
    (3, 10),
    (4, 7),
    (5, 6),
    (6, 5),
    (7, 4),
    (10, 3),
    (15, 2),
    (30, 1),
)
# transfer_array: desired row -> 2-bit selector (cols 4-13)
R10_TRANSFER = (
    (3, 2, 1, 0, 0, 0, 0, 0, 0, 0),
    (3, 2, 1, 0, 0, 0, 0, 0, 0, 0),
    (3, 2, 1, 0, 0, 0, 0, 0, 0, 0),
    (3, 3, 2, 1, 0, 0, 0, 0, 0, 0),
    (3, 3, 3, 2, 1, 0, 0, 0, 0, 0),
    (3, 3, 3, 3, 2, 1, 0, 0, 0, 0),
    (3, 3, 3, 3, 3, 2, 1, 0, 0, 0),
    (3, 3, 3, 3, 3, 3, 2, 1, 0, 0),
    (3, 3, 3, 3, 3, 3, 3, 2, 1, 0),
    (3, 3, 3, 3, 3, 3, 3, 2, 1, 0),
)
# relative_row: (prev row, selector) -> new row (last 4 cols)
R10_RELATIVE = (
    (3, 2, 1, 0),
    (3, 2, 1, 0),
    (3, 2, 1, 0),
    (4, 3, 2, 0),
    (5, 4, 3, 0),
    (6, 5, 4, 0),
    (7, 6, 5, 0),
    (8, 7, 6, 0),
    (9, 8, 7, 0),
    (9, 8, 7, 0),
)
# bits_to_use10[bits_needed] — quantized width (compress_relative10.c:44-56)
R10_BITS_TO_USE = (
    1, 1, 2, 3, 4, 5, 6, 7,
    10, 10, 10, 15, 15, 15, 15, 15,
    30, 30, 30, 30, 30, 30, 30, 30,
    30, 30, 30, 30, 30, 30, 30,
)
# table_row10[count - 1] — row for the number of ints that fit
R10_TABLE_ROW = (
    0, 1, 2, 3, 4, 5, 6, 6, 6,
    7, 7, 7, 7, 7, 8, 8, 8, 8,
    8, 8, 8, 8, 8, 8, 8, 8, 8,
    8, 8, 9, 9, 9,
)

# Simple-9 tables for the first word (compress_simple9.c:27-68)
S9_ROWS = ((1, 28), (2, 14), (3, 9), (4, 7), (5, 5), (7, 4), (9, 3),
           (14, 2), (28, 1))
S9_BITS_TO_USE = (
    1, 1, 2, 3, 4, 5, 7, 7,
    9, 9, 14, 14, 14, 14, 14, 28,
    28, 28, 28, 28, 28, 28, 28, 28,
    28, 28, 28, 28, 28,
)
S9_TABLE_ROW = (
    0, 1, 2, 3, 4, 4, 5, 5,
    6, 6, 6, 6, 6, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 8, 8,
)


def _bits_needed(v: int) -> int:
    return v.bit_length() if v > 0 else 0


class _Relative10Codec:
    name = "relative10"
    max_value = (1 << 28) - 1  # the first (Simple-9) word binds

    def _encode_group(self, vals: np.ndarray) -> list[int]:
        n = vals.size
        words: list[int] = []
        if n == 0:
            return words
        # first word: Simple-9, selector in the TOP 4 bits
        term = 0
        needed = 0
        while term < 28 and term < n:
            b = S9_BITS_TO_USE[_bits_needed(int(vals[term]))]
            if b > needed:
                needed = b
            if needed * (term + 1) > 28:
                break
            term += 1
        row = S9_TABLE_ROW[term - 1]
        count, bits = S9_ROWS[row]
        word = row << 28
        for j in range(count):
            word |= int(vals[j]) << (j * bits)
        words.append(word & 0xFFFFFFFF)
        pos = count
        # remainder: Relative-10 words, 2-bit selector in the top bits
        while pos < n:
            term = 0
            needed = 0
            while term < 30 and pos + term < n:
                b = R10_BITS_TO_USE[_bits_needed(int(vals[pos + term]))]
                if b > 30:
                    raise ValueError("relative10: value > 2^30")
                if b > needed:
                    needed = b
                if needed * (term + 1) > 30:
                    break
                term += 1
            r = R10_TRANSFER[row][R10_TABLE_ROW[term - 1]]
            row = R10_RELATIVE[row][r]
            count, bits = R10_ROWS[row]
            word = r << 30
            for j in range(count):
                word |= int(vals[pos + j]) << (j * bits)
            words.append(word & 0xFFFFFFFF)
            pos += count
        return words

    def encode_groups(
        self, values: np.ndarray, group_starts: np.ndarray
    ) -> tuple[bytes, np.ndarray]:
        v = np.ascontiguousarray(values, dtype=np.int64)
        if v.size and (v.min() < 0 or v.max() > self.max_value):
            raise ValueError("relative10: value outside 28-bit range")
        starts = np.ascontiguousarray(group_starts, dtype=np.int64)
        bounds = np.concatenate((starts[1:], [v.size]))
        all_words: list[int] = []
        offsets = np.zeros(starts.size, dtype=np.int64)
        for gi in range(starts.size):
            offsets[gi] = len(all_words) * 4
            all_words.extend(
                self._encode_group(v[int(starts[gi]) : int(bounds[gi])])
            )
        return np.asarray(all_words, dtype=np.uint32).tobytes(), offsets

    def decode_group(self, blob_slice: bytes, count: int) -> np.ndarray:
        words = np.frombuffer(bytes(blob_slice), dtype=np.uint32)
        out = np.empty(count, dtype=np.int64)
        if count == 0:
            return out
        w = int(words[0])
        row = w >> 28
        payload = np.uint64(w & 0x0FFFFFFF)
        got = 0
        n_slots, bits = S9_ROWS[row]
        take = min(n_slots, count)
        shifts = (np.arange(take, dtype=np.uint64)) * np.uint64(bits)
        mask = np.uint64((1 << bits) - 1)
        out[:take] = ((payload >> shifts) & mask).astype(np.int64)
        got = take
        wi = 1
        while got < count:
            w = int(words[wi])
            wi += 1
            row = R10_RELATIVE[row][w >> 30]
            n_slots, bits = R10_ROWS[row]
            payload = np.uint64(w & 0x3FFFFFFF)
            take = min(n_slots, count - got)
            shifts = (np.arange(take, dtype=np.uint64)) * np.uint64(bits)
            mask = np.uint64((1 << bits) - 1)
            out[got : got + take] = ((payload >> shifts) & mask).astype(
                np.int64
            )
            got += take
        return out

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


RELATIVE10 = _Relative10Codec()
