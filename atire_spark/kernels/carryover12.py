"""Carryover-12 posting codec, wire-compatible with the reference
(compress_carryover12.c:60-350 — Anh & Moffat's scheme, via the
authors' BSD-relicensed code in ATIRE).

The stream is a sequence of 32-bit little-endian words filled low
bits first.  One leading flag bit picks the "small" (max value fits
16 bits) or "big" transition-table pair.  Values are coded in blocks:
each block has a 2-bit column selector that walks a transition table
``row = table[prev_width][column]`` indexed by the PREVIOUS block's
bit width — the table pair (``trans_B1_30_*`` / ``trans_B1_32_*``)
depends on whether the selector shares the data word (32-bit table)
or starts a fresh word (30-bit table).  A block packs as many values
as fit in the remaining bits of one word at the chosen width
(``elems_coded``, compress_carryover12.c:242-263); the next selector
appears exactly when the remaining bits of the word are narrower than
the current width (decoder macro ``CARRY_DECODE``,
compress_carryover12_internals.h:78-88).

Stored values are raw (the encoder's ``WORD_ENCODE(x + 1, b)`` and
the macro's ``- 1`` cancel); a width-0 column encodes a run of >= 2
zeros.  TRANS_TABLE_STARTER (row 33) seeds the width state on both
sides.  Encode and decode are faithful ports of the reference's
macro state machines — one Python step per BLOCK (not per value:
slot extraction within a block is numpy), with per-group restarts so
byte offsets support partial reads like every other codec here.
"""

from __future__ import annotations

import numpy as np

TRANS_TABLE_STARTER = 33

# transition tables, 34 rows x 4 columns (compress_carryover12.c:95-125)
_raw_30_big = (
    0, 0, 0, 0, 1, 2, 3, 28, 1, 2, 3, 28, 2, 3, 4, 28, 3, 4, 5, 28,
    4, 5, 6, 28, 5, 6, 7, 28, 6, 7, 8, 28, 6, 7, 10, 28, 8, 10, 15, 28,
    9, 10, 14, 28, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 10, 15, 16, 28,
    10, 14, 15, 28, 7, 10, 15, 28, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 10, 16, 28, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 4, 9, 15, 28,
)
_raw_32_big = (
    0, 0, 0, 0, 1, 2, 3, 28, 1, 2, 3, 28, 2, 3, 4, 28, 3, 4, 5, 28,
    4, 5, 6, 28, 5, 6, 7, 28, 6, 7, 8, 28, 7, 9, 10, 28, 7, 10, 15, 28,
    8, 10, 15, 28, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 7, 10, 15, 28,
    10, 15, 16, 28, 10, 14, 15, 28, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 10, 16, 28, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 4, 10, 16, 28,
)
_raw_30_small = (
    0, 0, 0, 0, 1, 2, 3, 16, 1, 2, 3, 16, 2, 3, 4, 16, 3, 4, 5, 16,
    4, 5, 6, 16, 5, 6, 7, 16, 6, 7, 8, 16, 6, 7, 10, 16, 7, 8, 10, 16,
    9, 10, 14, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 8, 10, 15, 16,
    10, 14, 15, 16, 7, 10, 15, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3, 7, 10, 16,
)
_raw_32_small = (
    0, 0, 0, 0, 1, 2, 3, 16, 1, 2, 3, 16, 2, 3, 4, 16, 3, 4, 5, 16,
    4, 5, 6, 16, 5, 6, 7, 16, 6, 7, 8, 16, 7, 9, 10, 16, 7, 10, 15, 16,
    8, 10, 15, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 7, 10, 15, 16,
    8, 10, 15, 16, 10, 14, 15, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3, 7, 10, 16,
)
TRANS_30_BIG = tuple(_raw_30_big[i : i + 4] for i in range(0, 136, 4))
TRANS_32_BIG = tuple(_raw_32_big[i : i + 4] for i in range(0, 136, 4))
TRANS_30_SMALL = tuple(_raw_30_small[i : i + 4] for i in range(0, 136, 4))
TRANS_32_SMALL = tuple(_raw_32_small[i : i + 4] for i in range(0, 136, 4))

MAX_ELEM_PER_WORD = 64


def _bits_needed(v: int) -> int:
    """qceillog_2(v + 1) — bits to store v (0 -> 0, 1 -> 1, 3 -> 2)."""
    return v.bit_length()


class _WordEncoder:
    """The WORD_ENCODE / WORD_ENCODE_WRITE macro pair
    (compress_carryover12.c:149-193): buffers (value, width) pairs and
    flushes a 32-bit word with the first value in the low bits."""

    def __init__(self) -> None:
        self.words: list[int] = []
        self._vals: list[int] = []
        self._bits: list[int] = []
        self.remaining = 32

    def _flush(self) -> None:
        word = self._vals[-1]
        for i in range(len(self._vals) - 2, -1, -1):
            word = (word << self._bits[i]) | self._vals[i]
        self.words.append(word & 0xFFFFFFFF)
        self._vals.clear()
        self._bits.clear()
        self.remaining = 32

    def encode(self, x: int, b: int) -> None:
        if self.remaining < b:
            self._flush()
        self._vals.append(x - 1)
        self._bits.append(b)
        self.remaining -= b

    def finish(self) -> list[int]:
        if self._vals:
            self._flush()
        return self.words


def _elems_coded(avail: int, width: int, gaps: np.ndarray, start: int,
                 end: int) -> int:
    """compress_carryover12.c:242-263 — how many values from ``start``
    a block of ``width``-bit slots in ``avail`` bits can take (0 if
    the full window doesn't fit the width)."""
    if width:
        cap = avail // width
        real_end = start + cap if start + cap - 1 <= end else end + 1
        window = gaps[start:real_end]
        if window.size and (window >= (1 << width)).any():
            return 0
        return real_end - start
    # width 0: a run of zeros, at least 2 long
    limit = min(start + MAX_ELEM_PER_WORD, end + 1)
    window = gaps[start:limit]
    nz = np.flatnonzero(window != 0)
    run = int(nz[0]) if nz.size else window.size
    return run if run >= 2 else 0


class _Carryover12Codec:
    name = "carryover12"
    max_value = (1 << 28) - 1  # calc_min_bits caps at 28 bits

    def _encode_group(self, vals: np.ndarray) -> list[int]:
        n = vals.size
        if n == 0:
            return []
        max_bits = int(_bits_needed(int(vals.max())))
        if max_bits > 28:
            raise ValueError("carryover12: value outside 28-bit range")
        small = max_bits <= 16
        pc30 = TRANS_30_SMALL if small else TRANS_30_BIG
        pc32 = TRANS_32_SMALL if small else TRANS_32_BIG
        enc = _WordEncoder()
        enc.encode(1 if small else 2, 1)  # CARRY_BLOCK_ENCODE_START
        size = TRANS_TABLE_STARTER
        i = 0
        while i < n:
            avail = enc.remaining
            if avail < 2:
                avail = 30
                table = pc30
            else:
                avail -= 2
                table = pc32
            base = table[size]
            j = 0
            elems = 0
            while j < 4:
                size = base[j]
                if size > avail:
                    # data must start in the next word
                    avail = 32
                    j = 0
                    continue
                elems = _elems_coded(avail, size, vals, i, n - 1)
                if elems:
                    break
                j += 1
            if not elems:
                raise ValueError("carryover12: no feasible column")
            enc.encode(j + 1, 2)  # the 2-bit column selector
            for _ in range(elems):
                enc.encode(int(vals[i]) + 1, size)
                i += 1
        return enc.finish()

    def encode_groups(
        self, values: np.ndarray, group_starts: np.ndarray
    ) -> tuple[bytes, np.ndarray]:
        v = np.ascontiguousarray(values, dtype=np.int64)
        if v.size and v.min() < 0:
            raise ValueError("carryover12: negative value")
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
        # CARRY_BLOCK_DECODE_START: read the flag bit from word 0
        wi = 0
        wval = int(words[wi])
        wi += 1
        wremaining = 32
        flag = (wval & 1) + 1
        wval >>= 1
        wremaining -= 1
        small = flag == 1
        pc30 = TRANS_30_SMALL if small else TRANS_30_BIG
        pc32 = TRANS_32_SMALL if small else TRANS_32_BIG
        wbits = TRANS_TABLE_STARTER

        def get_selector():
            nonlocal wval, wremaining, wbits, wi
            if wremaining >= 2:
                wbits = pc32[wbits][wval & 3]
                wval >>= 2
                wremaining -= 2
                if wremaining < wbits:
                    wval = int(words[wi])
                    wi += 1
                    wremaining = 32
            else:
                wval = int(words[wi])
                wi += 1
                wbits = pc30[wbits][wval & 3]
                wval >>= 2
                wremaining = 30

        get_selector()
        got = 0
        while got < count:
            if wremaining < wbits:
                get_selector()
            # one block: every value this word still holds at wbits
            if wbits:
                take = min(wremaining // wbits, count - got)
                mask = (1 << wbits) - 1
                for k in range(take):
                    out[got + k] = (wval >> (k * wbits)) & mask
                wval >>= take * wbits
                wremaining -= take * wbits
                got += take
            else:
                # width-0 run of zeros: consumes no bits; the run length
                # is bounded by the NEXT selector, so emit until the
                # encoder's block cap or the caller's count
                take = count - got
                out[got : got + take] = 0
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


CARRYOVER12 = _Carryover12Codec()
