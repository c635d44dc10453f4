"""TopSig signature indexing and search, Spark-first.

The reference grafts TopSig onto its inverted index by treating every
signature bit number as a pseudo-term (index_document_topsig.c:219-243)
and scoring negative query dimensions by walking the *gaps* of that
bit's postings list (ranking_function_topsig_negative.c). On Spark the
natural physical design is the signature table itself: one row per
document holding the packed width-bit signature — scoring is then a
map-only scan with broadcast query masks (no join, no shuffle until the
k-row-per-query top-k), which is the shape that survives 10^9+
documents. Ranking is identical; the only divergence is that a
negative dimension whose pseudo-term would be absent from the
reference's dictionary (no document has the bit set) scores uniformly
here instead of being skipped (atire_api.c:1081-1087) — a constant
rsv offset that cannot reorder documents.

Build dataflow (at 100 TB):
  tokenized turns (map) → explode → join term cf (AQE broadcast for
  small vocabularies, shuffle-hash otherwise) → weight/stop/quantize
  in JVM codegen → groupBy(docid) collect compact (term, wq) arrays
  (the one shuffle, token-row sized) → vectorized signature kernel
  (mapInPandas) → (docid, sig) rows, ~width/8 bytes each.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atire_spark.build import IndexTables, tokenize_stage
from atire_spark.kernels.topsig import (
    TOPSIG_DENSITY,
    TOPSIG_WIDTH,
    accumulate,
    agreement_scores,
    md5_u64,
    pack_bits,
    popcount_rows,
    query_vector,
    signature_bits,
    unpack_bits,
)
from atire_spark.query import parse_query

_E = math.e  # add_term's stop threshold (index_document_topsig_signature.c:117)


def _index_stemmer(index: IndexTables) -> str | None:
    """The index's recorded ~stemmer (memory_index.c:1487-1521) — the
    reference stems TopSig query terms with the engine's stemmer
    (atire_api.c:1057-1061), so both query paths follow it."""
    return index.stats.collect()[0].asDict().get("stemmer") or None


def _term_cf(index: IndexTables) -> DataFrame:
    """(term, cf) — postings rows carry the global cf, one value per
    term across its segment rows."""
    return index.postings.groupBy("term").agg(F.max("cf").alias("cf"))


def build_topsig(
    spark: SparkSession,
    transcripts: DataFrame,
    index: IndexTables,
    width: int = TOPSIG_WIDTH,
    density: float = TOPSIG_DENSITY,
    stemmer: str | None = "auto",
) -> DataFrame:
    """→ (docid, sig array<long>) — one packed signature per document
    in ``index.docmap`` (docids and doc lengths are the index's own, so
    TopSig results materialize through the same docmap).

    A fresh build carries ``index.tokenized`` (the staged tokenized
    parquet, token arrays already stem/stop-processed) and the
    signature pass reads it directly — the corpus is tokenized once
    across both indexes. Only an index re-loaded from storage falls
    back to re-tokenizing ``transcripts``."""
    if width % 64 != 0 or width <= 0:
        # signatures pack into 64-bit words (the reference's widths —
        # 4096 default — are word-aligned too)
        raise ValueError(f"topsig width must be a positive multiple of 64, got {width}")
    coll_len = float(
        # NULL over an all-empty index (sum of zero docmap rows);
        # no documents reach the signature kernel then, so 0 is inert
        index.stats.select("collection_len").collect()[0][0] or 0.0
    )
    if index.tokenized is not None:
        toks = index.tokenized
    else:
        if stemmer == "auto":  # follow the index's recorded ~stemmer
            stemmer = _index_stemmer(index)
        toks = tokenize_stage(transcripts, stemmer=stemmer).join(
            index.docmap.select("conv_id", "turn_idx", "docid"),
            ["conv_id", "turn_idx"],
        )
    exploded = toks.select(
        "docid",
        F.col("doc_len").cast("double").alias("dl"),
        F.explode(F.arrays_zip("terms", "occs")).alias("z"),
    ).select(
        "docid",
        "dl",
        F.col("z.terms").alias("term"),
        F.col("z.occs").cast("double").alias("occ"),
    )
    # weight, stop filter and quantization run JVM-side (whole-stage
    # codegen); operation order mirrors the oracle SQL exactly
    w = F.col("occ") * F.log(
        (F.col("occ") / F.col("dl"))
        * (F.lit(coll_len) / F.col("cf").cast("double"))
    )
    contribs = (
        exploded.join(_term_cf(index), "term")
        .withColumn("w", w)
        .filter(F.col("w") >= F.lit(_E))
        .select(
            "docid",
            "term",
            F.floor(F.lit(1000.0) * F.col("w") + F.lit(0.5))
            .cast("long")
            .alias("wq"),
        )
        .groupBy("docid")
        .agg(
            F.collect_list("term").alias("terms"),
            F.collect_list("wq").alias("wqs"),
        )
    )
    # every document gets a signature — docs whose terms were all
    # stopped resolve to the zero vector (pure fill bits)
    per_doc = index.docmap.select("docid").join(contribs, "docid", "left")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            docids = pdf["docid"].to_numpy(dtype=np.int64)
            terms_flat: list[str] = []
            wq_parts: list[np.ndarray] = []
            idx_parts: list[np.ndarray] = []
            for i, (tl, wl) in enumerate(zip(pdf["terms"], pdf["wqs"])):
                if tl is None or len(tl) == 0:
                    continue
                terms_flat.extend(tl)
                wq_parts.append(np.asarray(wl, dtype=np.int64))
                idx_parts.append(np.full(len(tl), i, dtype=np.int64))
            if terms_flat:
                uniq, inv = np.unique(
                    np.asarray(terms_flat, dtype=object), return_inverse=True
                )
                seeds = np.array(
                    [md5_u64(t) for t in uniq], dtype=np.uint64
                )[inv]
                wq = np.concatenate(wq_parts)
                didx = np.concatenate(idx_parts)
            else:
                seeds = np.empty(0, dtype=np.uint64)
                wq = np.empty(0, dtype=np.int64)
                didx = np.empty(0, dtype=np.int64)
            acc = accumulate(seeds, wq, didx, len(docids), width, density)
            sig = pack_bits(signature_bits(acc, docids))
            yield pd.DataFrame(
                {"docid": docids, "sig": [row for row in sig]}
            )

    return per_doc.mapInPandas(fn, schema="docid long, sig array<long>")


def _query_masks(
    queries: list[tuple[int, str]],
    cfs: dict[str, int],
    coll_len: float,
    width: int,
    density: float,
    stemmer: str | None,
) -> dict[int, np.ndarray]:
    out: dict[int, np.ndarray] = {}
    for qid, text in queries:
        parsed = parse_query(text, stemmer)
        if not parsed:
            continue
        qv = query_vector(
            [t for t, _ in parsed],
            [w for _, w in parsed],
            cfs,
            coll_len,
            width,
            density,
        )
        if np.any(qv != 0):
            out[qid] = qv
    return out


def search_topsig(
    spark: SparkSession,
    signatures: DataFrame,
    index: IndexTables,
    queries: list[tuple[int, str]],
    k: int = 10,
    width: int = TOPSIG_WIDTH,
    density: float = TOPSIG_DENSITY,
    stemmer: str | None = "auto",
    cfs: dict[str, int] | None = None,
    coll_len: float | None = None,
) -> DataFrame:
    """Agreement-count ranking over the signature table → the engine's
    standard (query_id, rank, docid, rsv_fixed, rsv) shape; ties break
    larger-docid-first like every other ranker
    (search_engine_accumulator.h:36-50). rsv is the integer agreement
    count (the topsig rankers accumulate longs, never fixed-point
    hundredths). ``stemmer="auto"`` follows the index's recorded
    ~stemmer like SearchEngine does.

    ``cfs``/``coll_len`` optionally preload the global term statistics
    — the reference's load_topsig reads the whole stats file once at
    startup (index_document_topsig.c:31-80) and every query reuses it;
    passing :func:`topsig_global_stats` output here removes the
    per-batch stats lookup jobs."""
    if stemmer == "auto":
        stemmer = _index_stemmer(index)
    qterms: set[str] = set()
    for _, text in queries:
        qterms.update(t for t, _ in parse_query(text, stemmer))
    if cfs is None:
        cfs = {}
        if qterms:
            # filter BEFORE the cf aggregation: the term isin pushes
            # into the postings scan (parquet file pruning) instead of
            # paying a full-table groupBy per query batch
            cfs = {
                r["term"]: int(r["cf"])
                for r in index.postings.filter(
                    F.col("term").isin(list(qterms))
                )
                .groupBy("term")
                .agg(F.max("cf").alias("cf"))
                .collect()
            }
    if coll_len is None:
        coll_len = float(
            index.stats.select("collection_len").collect()[0][0] or 0.0
        )
    masks = _query_masks(queries, cfs, coll_len, width, density, stemmer)
    if not masks:
        return spark.createDataFrame(
            [],
            "query_id long, rank int, docid long, rsv_fixed long, rsv double",
        )
    qvecs = [(qid, qv) for qid, qv in sorted(masks.items())]

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            docids = pdf["docid"].to_numpy(dtype=np.int64)
            words = np.stack(
                [np.asarray(s, dtype=np.int64) for s in pdf["sig"]]
            )
            frames = []
            for qid, qv in qvecs:
                rsv = agreement_scores(words, qv)
                hit = rsv > 0  # untouched accumulators stay out of the
                # results list (is_zero_rsv docs are never added)
                if not np.any(hit):
                    continue
                d, r = docids[hit], rsv[hit]
                if d.size > k:  # partition-local bounded top-k
                    order = np.lexsort((d, r))[::-1][:k]
                    d, r = d[order], r[order]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "docid": d, "rsv_fixed": r}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cand = signatures.mapInPandas(
        part, schema="query_id long, docid long, rsv_fixed long"
    )
    w_ = Window.partitionBy("query_id").orderBy(
        F.col("rsv_fixed").desc(), F.col("docid").desc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w_))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "docid",
            "rsv_fixed",
            F.col("rsv_fixed").cast("double").alias("rsv"),
        )
        .orderBy("query_id", "rank")
    )


def search_topsig_feedback(
    spark: SparkSession,
    signatures: DataFrame,
    index: IndexTables,
    queries: list[tuple[int, str]],
    k: int = 10,
    feedback_docs: int = 5,
    width: int = TOPSIG_WIDTH,
    density: float = TOPSIG_DENSITY,
    stemmer: str | None = "auto",
) -> DataFrame:
    """TopSig blind relevance feedback (atire_api.c:1606-1650 +
    relevance_feedback_topsig.c): the top ``feedback_docs`` documents'
    signature bits are summed into the feedback vector (add_to_index
    increments per set bit, so every nonzero dimension is positive and
    only the positive ranker fires) and that vector replaces the query.

    The reference re-derives each fed-back document's signature from
    its text (add_to_index, with its own running-length artifact); here
    the stored signature rows ARE the signatures, so the feedback pass
    reads them back — the same bits the first pass scored.

    Scale shape: pass 1 is the normal signature scan; the feedback
    vector is built from k·|queries| collected rows (result-sized, like
    every feedback path), then pass 2 is another map-only scan."""
    first = search_topsig(
        spark, signatures, index, queries, feedback_docs, width, density,
        stemmer,
    )
    top = first.select("query_id", "docid").collect()
    if not top:
        return spark.createDataFrame(
            [],
            "query_id long, rank int, docid long, rsv_fixed long, rsv double",
        )
    by_query: dict[int, list[int]] = {}
    for r in top:
        by_query.setdefault(int(r["query_id"]), []).append(int(r["docid"]))
    fb_docids = sorted({d for ds in by_query.values() for d in ds})
    sig_rows = {
        int(r["docid"]): np.asarray(r["sig"], dtype=np.int64)
        for r in signatures.filter(
            F.col("docid").isin(fb_docids)
        ).collect()
    }
    masks: list[tuple[int, np.ndarray]] = []
    for qid in sorted(by_query):
        fv = np.zeros(width, dtype=np.int64)
        for d in by_query[qid]:
            fv += unpack_bits(sig_rows[d][None, :], width)[0]
        if np.any(fv != 0):
            masks.append((qid, fv))
    if not masks:
        return spark.createDataFrame(
            [],
            "query_id long, rank int, docid long, rsv_fixed long, rsv double",
        )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            docids = pdf["docid"].to_numpy(dtype=np.int64)
            words = np.stack(
                [np.asarray(s, dtype=np.int64) for s in pdf["sig"]]
            )
            frames = []
            for qid, fv in masks:
                rsv = agreement_scores(words, fv)
                hit = rsv > 0
                if not np.any(hit):
                    continue
                d, r = docids[hit], rsv[hit]
                if d.size > k:
                    order = np.lexsort((d, r))[::-1][:k]
                    d, r = d[order], r[order]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "docid": d, "rsv_fixed": r}
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cand = signatures.mapInPandas(
        part, schema="query_id long, docid long, rsv_fixed long"
    )
    w_ = Window.partitionBy("query_id").orderBy(
        F.col("rsv_fixed").desc(), F.col("docid").desc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w_))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "docid",
            "rsv_fixed",
            F.col("rsv_fixed").cast("double").alias("rsv"),
        )
        .orderBy("query_id", "rank")
    )


def topsig_global_stats(index: IndexTables) -> tuple[dict[str, int], float]:
    """(term→cf map, collection length) — the reference's
    topsig_globalstats file loaded once (load_topsig,
    atire_api.c:326-341); pass to :func:`search_topsig` to amortize
    the stats lookup across query batches. The full map is
    driver-resident — suitable whenever the vocabulary fits (the
    reference makes the identical assumption, holding the whole stats
    file in a hash table).  At web-scale vocabularies skip this
    preload: the default per-batch path in :func:`search_topsig`
    pushes an ``isin`` filter into the postings scan (file pruning)
    and AQE broadcast-joins the per-query cf rows instead, so no
    driver-resident map is ever required."""
    cfs = {
        r["term"]: int(r["cf"])
        for r in _term_cf(index).collect()
    }
    coll_len = float(index.stats.select("collection_len").collect()[0][0])
    return cfs, coll_len


def signature_stats(signatures: DataFrame) -> DataFrame:
    """(docid, bits_set) — the per-document signature density, the
    cheapest full certification of the signature construction."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            words = np.stack(
                [np.asarray(s, dtype=np.int64) for s in pdf["sig"]]
            )
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"].to_numpy(dtype=np.int64),
                    "bits_set": popcount_rows(words),
                }
            )

    return signatures.mapInPandas(fn, schema="docid long, bits_set long")
