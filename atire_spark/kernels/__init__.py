"""Pure numpy/pandas kernels — no Spark imports.

These are the vectorized inner loops the Spark engine calls from inside
Arrow UDFs (mapInPandas / applyInPandas). Each kernel documents the
reference-ATIRE behaviour it reproduces (file:line into /root/reference).
"""

from atire_spark.kernels.vbyte import vbyte_encode, vbyte_decode
from atire_spark.kernels.tokenizer import (
    tokenize,
    tokenize_batch,
    tokenize_flat,
    MAX_TERM_BYTES,
)
from atire_spark.kernels.impact import impact_order, decode_segment
from atire_spark.kernels.bm25 import (
    BM25_K1,
    BM25_B,
    doc_priors,
    group_contrib,
)

__all__ = [
    "vbyte_encode",
    "vbyte_decode",
    "tokenize",
    "tokenize_batch",
    "tokenize_flat",
    "MAX_TERM_BYTES",
    "impact_order",
    "decode_segment",
    "BM25_K1",
    "BM25_B",
    "doc_priors",
    "group_contrib",
]
