"""Broker-style federated search over independent sub-indexes.

The reference's ``atire_broker`` fans a query out to N running
``atire`` instances and merges their answers into one ranked list in
a *virtual global docid space*: sub-engine i's docids are offset by
the total document count of engines 0..i-1
(atire/atire_broke.c:168-193), results sort by rsv descending with
ties broken by the LOWEST global docid
(atire/atire_engine_result_set.c:141-165 — note this is the opposite
tie-break from the engine-internal accumulator sort), and a document
fetch walks the cumulative counts to route to the owning instance
(atire_broke.c:197-226).

Scores are each sub-engine's LOCAL BM25 (local df/N/mean length) —
the broker merges rsvs as-is, it does not recompute global
statistics.  That is the documented reference semantics; for
statistics-identical results across shards use
``atire_spark.merge.merge_indexes`` instead, which rebuilds one
global index.

Spark-first shape: each sub-search is the engine's own pruned-scan
batch plan; the merge is a union + per-query window re-rank — the
only federation-added shuffle is over ≤ engines × queries × k rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["doc_counts", "search_federated", "federated_route"]


def doc_counts(engines: Sequence) -> list[int]:
    """Per-engine document counts, in broker connection order
    (atire_broke.c:187 get_document_count)."""
    return [
        int(e.index.stats.select("documents").head()[0]) for e in engines
    ]


def _bases(counts: Sequence[int]) -> list[int]:
    bases, acc = [], 0
    for c in counts:
        bases.append(acc)
        acc += c
    return bases


def search_federated(
    engines: Sequence,
    queries: list[tuple[int, str]],
    k: int = 10,
    **search_kw,
) -> DataFrame:
    """Scatter ``queries`` to every engine, gather top-k per engine,
    merge in the virtual docid space and return the global top-k.

    Each sub-engine is asked for the full ``first + page_length``
    window (here: k) exactly like the broker
    (atire_broke.c:175 ``search(query, 1, first + page_length)``) —
    a result outside a shard's local top-k can never enter the merged
    top-k, so gathering k per shard is lossless.
    """
    if not engines:
        raise ValueError("no engines connected (atire_broke.c:155-158)")
    counts = doc_counts(engines)
    bases = _bases(counts)
    parts = []
    for base, eng in zip(bases, engines):
        res = eng.search_batch(queries, k=k, **search_kw)
        parts.append(
            res.select(
                "query_id",
                (F.col("docid") + F.lit(base)).alias("docid"),
                "rsv_fixed",
                "rsv",
            )
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv_fixed").desc(), F.col("docid").asc()
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "docid", "rsv_fixed", "rsv")
        .orderBy("query_id", "rank")
    )


def federated_route(
    engines: Sequence, virtual_docid: int
) -> tuple[int, int]:
    """Map a virtual docid to (engine_index, local_docid) — the
    broker's get_document cumulative walk (atire_broke.c:197-226).

    Raises IndexError past the end of the virtual space (the
    reference returns NULL there)."""
    base = 0
    for i, c in enumerate(doc_counts(engines)):
        if base + c > virtual_docid >= base:
            return i, virtual_docid - base
        base += c
    raise IndexError(
        f"virtual docid {virtual_docid} beyond federation size {base}"
    )
