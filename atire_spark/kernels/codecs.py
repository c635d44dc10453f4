"""Posting-codec registry — every scheme in the reference's
compression factory (compression_factory.c:59-77), selectable at
``build_index(codec=...)`` time and recorded in the index stats row.

All codecs share one interface, shaped by how the engine stores
postings (kernels/impact.py): each quantum group's delta stream is
compressed independently so the per-group byte offsets in the segment
header support partial (trim-point / QaaT) reads.

- ``encode_groups(values, group_starts) -> (blob, byte_offsets)`` —
  compress the whole array, restarting the codec state at every group
  boundary; one byte offset per group.
- ``decode_group(blob_slice, count) -> int64[count]`` — decode one
  group from its byte slice.
- ``decode_prefix(blob, doc_counts, byte_offsets) -> int64`` — decode
  the leading groups (the highest-impact quantums).

Factory-name mapping (ours -> reference scheme):

=================  =============================================
vbyte              Variable-Byte (compress_variable_byte.c) — default
simple9            Simple-9 (compress_simple9.c)
simple16           Simple-16 (compress_simple16.c)
simple8b           Simple-8b (compress_simple8b.c)
simple9_packed     Simple-9-Packed (compress_simple9_packed.c)
simple16_packed    Simple-16-Packed (compress_simple16_packed.c)
simple8b_packed    Simple-8b-Packed (compress_simple8b_packed.c)
relative10         Relative-10 (compress_relative10.c)
carryover12        Carryover-12 (compress_carryover12.c)
sigma              Sigma (compress_sigma.c)
elias_gamma        Elias-Gamma (compress_elias_gamma.c)
elias_delta        Elias-Delta (compress_elias_delta.c)
golomb             Golomb (compress_golomb.c)
group_varint       Four Integer Variable Byte
                   (compress_four_integer_variable_byte.c)
none               No-Compression (compress_none.c): raw uint32 LE
=================  =============================================
"""

from __future__ import annotations

import numpy as np

from atire_spark.kernels.vbyte import (
    vbyte_decode,
    vbyte_encode_raw,
)


def prefix_via_groups(codec, blob, doc_counts, byte_offsets) -> np.ndarray:
    """Shared ``decode_prefix``: slice the blob at the stored per-group
    byte offsets and decode each leading group — the walk is over
    <= n_quantums groups, never per posting."""
    g = len(doc_counts)
    if g == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.concatenate((np.asarray(byte_offsets[1:g]), [len(blob)]))
    return np.concatenate(
        [
            codec.decode_group(
                blob[int(byte_offsets[gi]) : int(ends[gi])],
                int(doc_counts[gi]),
            )
            for gi in range(g)
        ]
    )


class _VbyteCodec:
    """Variable-byte (compress_variable_byte.c). Value streams
    concatenate with no padding, so a prefix decodes in ONE bulk pass
    and slices at value boundaries — no per-group walk needed."""

    name = "vbyte"

    def encode_groups(self, values, group_starts):
        buf, ends = vbyte_encode_raw(np.asarray(values, dtype=np.int64))
        starts_bytes = np.concatenate(([0], ends))[
            np.asarray(group_starts, dtype=np.int64)
        ]
        return buf.tobytes(), starts_bytes.astype(np.int64)

    def decode_group(self, blob_slice, count):
        return vbyte_decode(blob_slice, count=count).astype(np.int64)

    def decode_prefix(self, blob, doc_counts, byte_offsets):
        n = int(np.sum(np.asarray(doc_counts, dtype=np.int64)))
        return vbyte_decode(blob)[:n].astype(np.int64)


class _Simple9Codec:
    """Simple-9 (compress_simple9.c) — wraps kernels/simple9.py."""

    name = "simple9"

    def encode_groups(self, values, group_starts):
        from atire_spark.kernels.simple9 import encode_groups

        return encode_groups(values, group_starts)

    def decode_group(self, blob_slice, count):
        from atire_spark.kernels.simple9 import decode

        return decode(blob_slice, count=count).astype(np.int64)

    def decode_prefix(self, blob, doc_counts, byte_offsets):
        return prefix_via_groups(self, blob, doc_counts, byte_offsets)


class _NoneCodec:
    """No-Compression (compress_none.c): raw little-endian uint32 —
    4 bytes per value, memmove on both sides."""

    name = "none"

    def encode_groups(self, values, group_starts):
        v = np.ascontiguousarray(values, dtype=np.int64)
        if v.size and (v.min() < 0 or v.max() > 0xFFFFFFFF):
            raise ValueError("none: value outside uint32 range")
        starts = np.asarray(group_starts, dtype=np.int64)
        return v.astype("<u4").tobytes(), starts * 4

    def decode_group(self, blob_slice, count):
        out = np.frombuffer(bytes(blob_slice), dtype="<u4")[:count]
        return out.astype(np.int64)

    def decode_prefix(self, blob, doc_counts, byte_offsets):
        n = int(np.sum(np.asarray(doc_counts, dtype=np.int64)))
        return self.decode_group(blob, n)


def _build_registry() -> dict:
    from atire_spark.kernels.carryover12 import CARRYOVER12
    from atire_spark.kernels.elias import ELIAS_DELTA, ELIAS_GAMMA
    from atire_spark.kernels.golomb import GOLOMB
    from atire_spark.kernels.group_varint import GROUP_VARINT
    from atire_spark.kernels.relative10 import RELATIVE10
    from atire_spark.kernels.sigma import SIGMA
    from atire_spark.kernels.simple_family import (
        SIMPLE8B,
        SIMPLE8B_PACKED,
        SIMPLE9_PACKED,
        SIMPLE16,
        SIMPLE16_PACKED,
    )

    codecs = [
        _VbyteCodec(),
        _Simple9Codec(),
        _NoneCodec(),
        SIMPLE16,
        SIMPLE8B,
        SIMPLE9_PACKED,
        SIMPLE16_PACKED,
        SIMPLE8B_PACKED,
        RELATIVE10,
        CARRYOVER12,
        SIGMA,
        ELIAS_GAMMA,
        ELIAS_DELTA,
        GOLOMB,
        GROUP_VARINT,
    ]
    return {c.name: c for c in codecs}


CODECS = _build_registry()
CODEC_NAMES = tuple(CODECS)


def get_codec(name: str):
    try:
        return CODECS[name]
    except KeyError:
        raise ValueError(
            f"unknown postings codec {name!r}; known: {sorted(CODEC_NAMES)}"
        ) from None
