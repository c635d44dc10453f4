"""Compressed document repository — the reference's ``-C`` store.

ATIRE can store every source document inside the index, per-document
compressed, and serve it back at query time (``get_document``,
atire/atire_api.c:1784-1848).  The scheme factory
(source/compression_text_factory.c:20-47; CLI letters
indexer_param_block.c:222-231) offers: none (don't store),
uncompressed raw, deflate (zlib), bz2, and snappy.

Spark shape: a ``docstore`` table (docid BIGINT, scheme STRING,
payload BINARY) written next to the index, built in one Arrow pass
(per-document codec calls, no shuffle beyond the docmap join);
``fetch_documents`` is a pushed ``isin`` docid scan + the matching
per-row decompress — the broker's get_document routing composes via
:func:`atire_spark.federate.federated_route`.

Python's stdlib provides zlib and bz2; snappy gates on the optional
``snappy`` package (absent in this sandbox) exactly like the
reference gates on ANT_HAS_SNAPPY.
"""

from __future__ import annotations

import bz2 as _bz2
import zlib as _zlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["SCHEMES", "build_docstore", "fetch_documents"]


def _snappy_mod():
    try:
        import snappy  # type: ignore

        return snappy
    except ImportError as exc:  # pragma: no cover - sandbox has no snappy
        raise ImportError(
            "snappy scheme needs the python-snappy package (the "
            "reference likewise compiles it in only under "
            "ANT_HAS_SNAPPY)"
        ) from exc


SCHEMES = {
    "uncompressed": (lambda b: b, lambda b: b),
    "deflate": (
        lambda b: _zlib.compress(b),
        lambda b: _zlib.decompress(b),
    ),
    "bz2": (
        lambda b: _bz2.compress(b),
        lambda b: _bz2.decompress(b),
    ),
    "snappy": (
        lambda b: _snappy_mod().compress(b),
        lambda b: _snappy_mod().decompress(b),
    ),
}


def build_docstore(
    transcripts: DataFrame,
    docmap: DataFrame,
    scheme: str = "deflate",
) -> DataFrame:
    """(docid, scheme, payload) — each turn's text stored
    per-document compressed, keyed by the index docid."""
    if scheme not in SCHEMES:
        raise ValueError(
            f"unknown document compression scheme {scheme!r} "
            f"(factory: {sorted(SCHEMES)}; 'none' means don't store)"
        )
    comp, _ = SCHEMES[scheme]
    joined = docmap.select("docid", "conv_id", "turn_idx").join(
        transcripts.select("conv_id", "turn_idx", "text"),
        ["conv_id", "turn_idx"],
    )

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"],
                    "scheme": scheme,
                    "payload": [
                        comp((t or "").encode("utf-8"))
                        for t in pdf["text"]
                    ],
                }
            )

    return joined.mapInPandas(
        fn, schema="docid long, scheme string, payload binary"
    )


def fetch_documents(docstore: DataFrame, docids: list[int]) -> DataFrame:
    """get_document: pushed docid ``isin`` scan + per-row decompress;
    returns (docid, text)."""
    hits = docstore.filter(F.col("docid").isin([int(d) for d in docids]))

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"],
                    "text": [
                        SCHEMES[s][1](bytes(p)).decode("utf-8")
                        for s, p in zip(pdf["scheme"], pdf["payload"])
                    ],
                }
            )

    return hits.mapInPandas(fn, schema="docid long, text string")
