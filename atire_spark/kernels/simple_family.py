"""Simple-16 / Simple-8b and the three DP-"packed" Simple variants.

Word formats (transcribed from the reference, table-verified):

- **Simple-16** (compress_simple16.c:27-137): 32-bit little-endian
  words, 4-bit selector in the low bits, 28 payload bits split into
  per-selector slot layouts (16 selectors; slot widths derived from
  ``simple16_shift_table`` — the derivation was cross-checked against
  the reference's ``can_pack_table`` for every (bits, mask, offset)
  triple with zero mismatches).  The encoder picks the LOWEST selector
  index whose slot count fits the remaining input and whose window
  values each fit their slot (compress_simple16.c:115-131 — the
  ``ffs(last_bitmask)`` rule); words always pack their full slot
  count, so tails fall back to sparser selectors, never zero-pad.

- **Simple-8b** (compress_simple8b.c:36-160): 64-bit words, 4-bit
  selector, 60 payload bits.  Selectors 0 and 1 are magic runs of
  240/120 ones with no payload.  Masks 8 and 9 have a wider final
  slot in the layout (11/12 bits) that the reference's
  ``can_pack_table`` never exploits — feasibility is the uniform
  7/8-bit width (verified exhaustively); we mirror that.  The
  reference would silently decode an all-zeros run packed under a
  magic selector as ones (can_pack admits bits==0); we refuse to
  magic-pack zeros instead (unreachable for docid deltas, which are
  always >= 1).

- **Simple-9/16/8b-packed** (compress_simple9_packed.c:83-186 and
  siblings): same word formats, but the selector sequence is chosen
  by a backward dynamic program minimising the word count.  Quirks
  reproduced exactly: the single-integer fast path uses the sparsest
  selector; the last element is pre-assigned the sparsest selector;
  a selector that packs to the end of the input unconditionally
  overwrites (so the HIGHEST such selector index wins), otherwise the
  lowest selector achieving strictly fewer words wins; tail words may
  pack fewer ints than the selector's slot count (the decoder
  over-produces and the caller trims by count).

Encoders walk word-by-word in Python (as the reference does); the
query-side decoders are vectorized numpy grouped by selector, the
same shape as kernels/simple9.py.
"""

from __future__ import annotations

import numpy as np

# ---- layout tables -------------------------------------------------------

# simple16_shift_table rows → per-selector slot widths (verified above)
S16_WIDTHS: tuple[tuple[int, ...], ...] = (
    (1,) * 28,
    (2,) * 7 + (1,) * 14,
    (1,) * 7 + (2,) * 7 + (1,) * 7,
    (1,) * 14 + (2,) * 7,
    (2,) * 14,
    (4,) + (3,) * 8,
    (3,) + (4,) * 4 + (3,) * 3,
    (4,) * 7,
    (5,) * 4 + (4,) * 2,
    (4,) * 2 + (5,) * 4,
    (6,) * 3 + (5,) * 2,
    (5,) * 2 + (6,) * 3,
    (7,) * 4,
    (10, 9, 9),
    (14, 14),
    (28,),
)

# simple9 widths (simple9_table, compress_simple9.c:27-38) — used by
# the packed variant; the plain codec lives in kernels/simple9.py
S9_WIDTHS: tuple[tuple[int, ...], ...] = (
    (1,) * 28,
    (2,) * 14,
    (3,) * 9,
    (4,) * 7,
    (5,) * 5,
    (7,) * 4,
    (9,) * 3,
    (14,) * 2,
    (28,),
)

# simple8b: layout widths (slot boundaries, incl. the wide final slot
# of masks 8/9) vs feasibility widths (what can_pack actually admits)
_S8B_BASE = (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 15, 20, 30, 60)
S8B_INTS = (240, 120, 60, 30, 20, 15, 12, 10, 8, 7, 6, 5, 4, 3, 2, 1)
S8B_LAYOUT: list[tuple[int, ...] | None] = [None, None]
S8B_FEAS: list[tuple[int, ...] | None] = [None, None]
for _m, _w in enumerate(_S8B_BASE):
    _n = S8B_INTS[_m + 2]
    _widths = [_w] * _n
    _widths[-1] = 60 - _w * (_n - 1)  # masks 8/9 get an 11/12-bit tail
    S8B_LAYOUT.append(tuple(_widths))
    S8B_FEAS.append((_w,) * _n)


def _bits_needed(values: np.ndarray) -> np.ndarray:
    """ANT_ceiling_log2: bits to represent v (0 -> 0, 1 -> 1, 2,3 -> 2)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    out = np.zeros(v.size, dtype=np.int64)
    nz = v > 0
    out[nz] = (
        np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
    )
    # float log2 rounds at large powers of two — exact bit-level fixup
    over = nz & (v >> np.minimum(out, 63).astype(np.uint64) > 0)
    out[over] += 1
    under = nz & (out > 1) & (
        v >> np.maximum(out - 1, 0).astype(np.uint64) == 0
    )
    out[under] -= 1
    return out


class SimpleScheme:
    """One word-aligned Simple codec (greedy or DP-packed selector
    choice is chosen per instance)."""

    def __init__(
        self,
        name: str,
        layout: tuple[tuple[int, ...] | None, ...],
        word_bytes: int,
        packed: bool,
        feasibility: tuple[tuple[int, ...] | None, ...] | None = None,
        magic_runs: dict[int, int] | None = None,
    ) -> None:
        self.name = name
        self.layout = layout
        self.word_bytes = word_bytes
        self.packed = packed
        self.feas = feasibility or layout
        self.magic = magic_runs or {}
        self.ints = tuple(
            self.magic.get(m, len(w) if w else 0)
            for m, w in enumerate(layout)
        )
        self.n_masks = len(layout)
        self.last_mask = self.n_masks - 1
        # precomputed decode arrays per selector
        self._shifts = []
        self._masks = []
        for w in layout:
            if w is None:
                self._shifts.append(None)
                self._masks.append(None)
                continue
            sh = np.concatenate(([0], np.cumsum(w[:-1]))).astype(np.uint64)
            self._shifts.append(sh)
            self._masks.append(
                np.asarray([(1 << x) - 1 for x in w], dtype=np.uint64)
            )
        self.max_value = (1 << max(max(w) for w in layout if w)) - 1

    # -- feasibility ------------------------------------------------------

    def _fits(self, bits: np.ndarray, vals: np.ndarray, pos: int, m: int,
              remaining: int) -> bool:
        n = self.ints[m]
        if n > remaining:
            return False
        if m in self.magic:
            # run-of-ones: every value must be exactly 1.  (The
            # reference's can_pack row also admits zeros, which its
            # decoder then corrupts into ones; zeros here fall through
            # to the 1-bit-slot selectors instead.)
            return bool((vals[pos : pos + n] == 1).all())
        feas = self.feas[m]
        return bool((bits[pos : pos + n] <= np.asarray(feas)).all())

    # -- encoding ---------------------------------------------------------

    def _pack_word(self, vals: np.ndarray, pos: int, m: int, take: int) -> int:
        if m in self.magic:
            return m  # payload 0
        sh = self._shifts[m]
        word = 0
        for j in range(take):
            word |= int(vals[pos + j]) << int(sh[j])
        return ((word << 4) | m) & ((1 << (8 * self.word_bytes)) - 1)

    def _choose_greedy(self, bits, vals, pos, n):
        remaining = n - pos
        for m in range(self.n_masks):
            if self._fits(bits, vals, pos, m, remaining):
                return m
        raise ValueError(f"{self.name}: unpackable value at {pos}")

    def _encode_group_greedy(self, vals: np.ndarray, bits: np.ndarray) -> list[int]:
        words = []
        pos, n = 0, vals.size
        while pos < n:
            m = self._choose_greedy(bits, vals, pos, n)
            take = self.ints[m]
            words.append(self._pack_word(vals, pos, m, take))
            pos += take
        return words

    def _encode_group_packed(self, vals: np.ndarray, bits: np.ndarray) -> list[int]:
        n = vals.size
        if n == 0:
            return []
        if n == 1:
            # compress_simple9_packed.c:104-112 — sparsest selector
            return [self._pack_word(vals, 0, self.last_mask, 1)]
        blocks = np.full(n, -1, dtype=np.int64)
        masks = np.full(n, 255, dtype=np.int64)
        blocks[n - 1] = 0
        masks[n - 1] = self.last_mask
        for pos in range(n - 2, -1, -1):
            remaining = n - pos
            for m in range(self.n_masks):
                if not self._fits(bits, vals, pos, m, remaining):
                    continue
                num = self.ints[m]
                if pos + num >= n:
                    # unconditional overwrite: highest end-reaching
                    # selector wins (compress_simple9_packed.c:146-152)
                    blocks[pos] = 1
                    masks[pos] = m
                elif blocks[pos] == -1 or blocks[pos] > blocks[pos + num] + 1:
                    blocks[pos] = blocks[pos + num] + 1
                    masks[pos] = m
            if masks[pos] == 255:
                raise ValueError(f"{self.name}: unpackable value at {pos}")
        words = []
        pos = 0
        while pos < n:
            m = int(masks[pos])
            take = min(self.ints[m], n - pos)
            words.append(self._pack_word(vals, pos, m, take))
            pos += take
        return words

    def encode_groups(
        self, values: np.ndarray, group_starts: np.ndarray
    ) -> tuple[bytes, np.ndarray]:
        v = np.ascontiguousarray(values, dtype=np.int64)
        if v.size and (v.min() < 0 or v.max() > self.max_value):
            raise ValueError(f"{self.name}: value outside payload range")
        starts = np.ascontiguousarray(group_starts, dtype=np.int64)
        bits = _bits_needed(v)
        bounds = np.concatenate((starts[1:], [v.size]))
        encode = (
            self._encode_group_packed if self.packed
            else self._encode_group_greedy
        )
        all_words: list[int] = []
        offsets = np.zeros(starts.size, dtype=np.int64)
        for gi in range(starts.size):
            offsets[gi] = len(all_words) * self.word_bytes
            s, e = int(starts[gi]), int(bounds[gi])
            all_words.extend(encode(v[s:e], bits[s:e]))
        dtype = np.uint32 if self.word_bytes == 4 else np.uint64
        return np.asarray(all_words, dtype=dtype).tobytes(), offsets

    # -- decoding ---------------------------------------------------------

    def _word_array(self, data) -> np.ndarray:
        dtype = np.uint32 if self.word_bytes == 4 else np.uint64
        return np.frombuffer(bytes(data), dtype=dtype)

    def _decode_words(self, words: np.ndarray) -> np.ndarray:
        """Vectorized slot extraction grouped by selector."""
        if words.size == 0:
            return np.zeros(0, dtype=np.int64)
        w64 = words.astype(np.uint64)
        sel = (w64 & np.uint64(0xF)).astype(np.int64)
        payload = w64 >> np.uint64(4)
        ints_of = np.asarray(self.ints, dtype=np.int64)
        n_out = ints_of[sel]
        starts = np.concatenate(([0], np.cumsum(n_out[:-1])))
        out = np.zeros(int(n_out.sum()), dtype=np.int64)
        for m in range(self.n_masks):
            rows = np.flatnonzero(sel == m)
            if rows.size == 0:
                continue
            cnt = self.ints[m]
            idx = starts[rows][:, None] + np.arange(cnt, dtype=np.int64)
            if m in self.magic:
                out[idx.ravel()] = 1  # run of ones
                continue
            vals = (
                payload[rows][:, None] >> self._shifts[m][None, :]
            ) & self._masks[m][None, :]
            out[idx.ravel()] = vals.astype(np.int64).ravel()
        return out

    def slots_per_word(self, data) -> np.ndarray:
        words = self._word_array(data)
        sel = (words.astype(np.uint64) & np.uint64(0xF)).astype(np.int64)
        return np.asarray(self.ints, dtype=np.int64)[sel]

    def decode_group(self, blob_slice: bytes, count: int) -> np.ndarray:
        out = self._decode_words(self._word_array(blob_slice))
        if out.size < count:
            raise ValueError(
                f"{self.name}: expected {count} ints, stream holds {out.size}"
            )
        return out[:count]

    def decode_prefix(
        self, blob: bytes, doc_counts: np.ndarray, byte_offsets: np.ndarray
    ) -> np.ndarray:
        """Decode the leading groups.  Group boundaries come from the
        stored byte offsets (word-aligned by construction); the word
        walk is over <= n_quantums items, never per posting."""
        g = len(doc_counts)
        if g == 0:
            return np.zeros(0, dtype=np.int64)
        ends = np.concatenate((byte_offsets[1:g], [len(blob)]))
        chunks = [
            self.decode_group(
                blob[int(byte_offsets[gi]) : int(ends[gi])],
                int(doc_counts[gi]),
            )
            for gi in range(g)
        ]
        return np.concatenate(chunks)


SIMPLE16 = SimpleScheme("simple16", S16_WIDTHS, 4, packed=False)
SIMPLE16_PACKED = SimpleScheme("simple16_packed", S16_WIDTHS, 4, packed=True)
SIMPLE9_PACKED = SimpleScheme("simple9_packed", S9_WIDTHS, 4, packed=True)
SIMPLE8B = SimpleScheme(
    "simple8b", tuple(S8B_LAYOUT), 8, packed=False,
    feasibility=tuple(S8B_FEAS), magic_runs={0: 240, 1: 120},
)
SIMPLE8B_PACKED = SimpleScheme(
    "simple8b_packed", tuple(S8B_LAYOUT), 8, packed=True,
    feasibility=tuple(S8B_FEAS), magic_runs={0: 240, 1: 120},
)
