"""Bit-stream I/O matching the reference's ANT_bitstream layout.

Reference (/root/reference/source/bitstream.h:52-140, bitstream.c:22-42):
bits are pushed at increasing bit positions within 32-bit little-endian
words — bit *i* of the logical stream is bit ``i & 31`` of word
``i >> 5``.  Because little-endian words store their low byte first,
this is identical to "little bit order within consecutive bytes", so
numpy's ``packbits/unpackbits(bitorder="little")`` round-trips the
exact wire layout with no per-bit Python.

``push_bits(v, n)`` pushes the *n* low bits of ``v`` most-significant
bit first (bitstream.h:79-88); ``get_bits(n)`` reassembles them the
same way (bitstream.h:131-140).  ``eof()`` reports ``ceil(bits / 8)``
bytes (bitstream.c:36-42) — streams are byte-aligned, not
word-aligned, and the encoder zero-fills the tail.

The writer collects bits into a growing uint8 0/1 buffer and packs
once at the end; the reader unpacks the whole blob once.  Per-*value*
work is a short Python loop (the reference decoder is likewise
per-value), but per-*bit* work is all numpy.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    """Accumulates bits in stream order; ``getvalue()`` packs them."""

    __slots__ = ("_bits",)

    def __init__(self) -> None:
        self._bits: list[int] = []

    def push_bit(self, bit: int) -> None:
        self._bits.append(bit & 1)

    def push_zeros(self, n: int) -> None:
        if n > 0:
            self._bits.extend([0] * n)

    def push_one(self) -> None:
        self._bits.append(1)

    def push_bits(self, value: int, length: int) -> None:
        """Push the ``length`` low bits of ``value``, MSB first —
        bitstream.h:79-88."""
        for i in range(length - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def bit_length(self) -> int:
        return len(self._bits)

    def getvalue(self) -> bytes:
        """Pack to bytes, zero-filled to a byte boundary —
        the reference's eof() byte count (bitstream.c:36-42)."""
        if not self._bits:
            return b""
        arr = np.asarray(self._bits, dtype=np.uint8)
        return np.packbits(arr, bitorder="little").tobytes()


class BitReader:
    """Reads a blob written by :class:`BitWriter` (or the reference
    encoder) bit-by-bit in stream order."""

    __slots__ = ("_bits", "pos")

    def __init__(self, blob: bytes | bytearray | np.ndarray) -> None:
        buf = np.frombuffer(bytes(blob), dtype=np.uint8)
        self._bits = np.unpackbits(buf, bitorder="little")
        self.pos = 0

    def get_bit(self) -> int:
        b = int(self._bits[self.pos])
        self.pos += 1
        return b

    def get_bits(self, n: int) -> int:
        """MSB-first reassembly of ``n`` bits — bitstream.h:131-140."""
        if n <= 0:
            return 0
        chunk = self._bits[self.pos : self.pos + n].astype(np.uint64)
        self.pos += n
        shifts = np.arange(n - 1, -1, -1, dtype=np.uint64)
        return int((chunk << shifts).sum())

    def zeros_until_one(self) -> int:
        """Count zero bits up to (and consuming) the next 1 bit — the
        unary-prefix read shared by Elias gamma and Golomb decode."""
        ones = np.flatnonzero(self._bits[self.pos :])
        if ones.size == 0:
            raise ValueError("bitstream: ran off the end in a unary prefix")
        n = int(ones[0])
        self.pos += n + 1
        return n
