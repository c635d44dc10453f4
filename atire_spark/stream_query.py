"""Structured Streaming query side — standing queries over a turn
stream.

The reference is batch + an interactive server (SURVEY.md §2.5); its
monitoring analogue would be re-running a query set after every index
append. Structured Streaming inverts that loop: the QUERIES stand
still and the DOCUMENTS stream — the classic alerting / routing shape
for a transcript pipeline (notify when a conversation matches a
watched topic). Three operators:

- :func:`standing_query_matches` — stateless per-turn BM25 scoring of
  every arriving turn against a broadcast standing-query set, with the
  engine's exact fixed-point arithmetic (kernels/bm25.py: float32
  length prior, ``1 + trunc(100·rsv)`` per term, signed-short wrap)
  against
  FROZEN collection statistics. Map-only (``mapInPandas``), no state,
  no shuffle — safe in append mode and embarrassingly parallel at any
  input rate. Freezing stats is the reference's own semantics: a
  query answered against a snapshot index; the stream just moves the
  snapshot to the query side.
- :func:`windowed_turn_stats` — event-time windowed collection
  statistics with a watermark for late turns (the -N10000 reporting
  loop, atire/index.c:75-79, recast as event-time windows).
- :func:`running_topk` — ``applyInPandasWithState`` bounded top-k per
  standing query across micro-batches: the search accumulator's
  top-k semantics (rsv desc) maintained as streaming state, emitting
  each query's refreshed top-k whenever it changes. State is O(k) per
  query — the same bounded-accumulator discipline as the batch engine.

Scale: the standing-query set is broadcast in the task closure (query
vocabularies are small); per-turn work is O(tokens); state in
running_topk is k rows per query_id key, hash-partitioned by Spark's
state store. Nothing here scans the index — arriving turns never
touch old postings.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from atire_spark.kernels.bm25 import BM25_B, BM25_K1, accum_value
from atire_spark.kernels.tokenizer import tokenize_flat
from atire_spark.query import parse_query

MATCH_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("query_id", LongType()),
        StructField("n_match_terms", IntegerType()),
        StructField("rsv_fixed", LongType()),
        StructField("rsv", DoubleType()),
    ]
)


def frozen_stats_from_index(
    spark: SparkSession, idx, standing: list[tuple[int, str]]
) -> dict:
    """Snapshot the collection statistics a standing-query matcher
    needs: n_docs, mean_doc_len, and df for exactly the standing
    vocabulary (pushed ``isin`` — the scan reads only the query
    terms' stats rows, never the postings)."""
    srow0 = idx.stats.collect()[0].asDict()
    if (srow0.get("stemmer") or "") not in ("", None):
        # the matcher tokenizes raw query/turn terms; a ~stemmer index's
        # df table is keyed by stems and would silently miss — refuse,
        # like SearchEngine does on a stemmer mismatch
        raise ValueError(
            "standing-query matching over a stemmed index is not "
            "supported (stats record ~stemmer="
            f"{srow0['stemmer']!r}); freeze stats from an unstemmed index"
        )
    vocab = sorted(
        {t for _, q in standing for t, _ in parse_query(q)}
    )
    srow = idx.stats.select("documents", "mean_doc_len").collect()[0]
    dfs = {
        r["term"]: int(r["df"])
        for r in idx.postings.filter(F.col("term").isin(vocab))
        .select("term", "df")
        .distinct()
        .collect()
    }
    return {
        "n_docs": int(srow["documents"]),
        # NULL over an all-empty snapshot (aggregate of zero docmap
        # rows) — the matcher then scores nothing, it must not crash
        "mean_doc_len": float(srow["mean_doc_len"] or 0.0),
        "df": dfs,
    }


def _parse_standing(standing: list[tuple[int, str]]) -> list[tuple[int, dict]]:
    """(query_id, text) → (query_id, {term: multiplicity}) with the
    engine's NEXI CO parse (repeated query terms score repeatedly,
    group_contrib weight semantics; errored queries parse to an empty
    bag and can never alert, like the reference refusing them)."""
    out = []
    for qid, text in standing:
        out.append((int(qid), dict(parse_query(text))))
    return out


def standing_query_matches(
    stream_df: DataFrame,
    standing: list[tuple[int, str]],
    stats: dict,
    threshold: int = 0,
) -> DataFrame:
    """Score every arriving turn against every standing query.

    Exact per-term arithmetic of the batch engine (kernels/bm25.py):
    ``idf = ln(N/df)`` (a df==N term contributes nothing, and an
    UNSEEN term has no df — it cannot contribute, exactly like an
    absent-term query against the snapshot), float32 length prior from
    the ARRIVING turn's own token count, per-term fixed-point
    ``1 + trunc(100·rsv)`` summed mod 2^16. Emits one row per
    (turn, query) with at least one matching term and
    ``rsv_fixed > threshold``. Stateless map — works identically on a
    streaming or a batch DataFrame (the test oracle runs the same
    function in batch)."""
    parsed = _parse_standing(standing)
    n_docs = int(stats["n_docs"])
    mean_len = float(stats["mean_doc_len"])
    term_idf = {
        t: float(np.log(np.float64(n_docs) / np.float64(d)))
        for t, d in stats["df"].items()
        if int(d) > 0
    }

    # flat scoring table: one row per (query_id, term) with weight and
    # idf folded in — df==N (idf 0) and unseen terms are dropped here,
    # so they can never contribute downstream
    qt = pd.DataFrame(
        [
            (qid, term, weight, term_idf[term])
            for qid, bag in parsed
            for term, weight in bag.items()
            if term_idf.get(term, 0.0) != 0.0
        ],
        columns=["query_id", "term", "weight", "idf"],
    )

    standing_terms = frozenset(qt["term"])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty or qt.empty:
                continue
            pdf = pdf.reset_index(drop=True)
            row_idx, flat, doc_len = tokenize_flat(pdf["text"])
            if not flat.size:
                continue
            lens = doc_len.astype(np.float64)
            # float32 prior, double-promoted in the division
            priors = (
                BM25_K1 * (1.0 - BM25_B + BM25_B * (lens / mean_len))
            ).astype(np.float32)
            # (row, term) tf counting on integer keys, restricted to
            # the standing vocabulary BEFORE the unique-count — the
            # routing table has tens of terms, so the count runs over
            # the tiny matched slice, not the whole token stream
            codes, uniq = pd.factorize(flat)
            uniq = np.asarray(uniq, dtype=object)
            umask = np.fromiter(
                (u in standing_terms for u in uniq), bool, len(uniq)
            )
            sel = umask[codes]
            if not sel.any():
                continue
            nu = len(uniq)
            key = row_idx[sel] * nu + codes[sel]
            uk, occ = np.unique(key, return_counts=True)
            # stored tf saturates like the index side
            # (memory_index_hash_node.h:140-143) — the matcher scores
            # what the batch engine would read off the postings
            tf = pd.DataFrame(
                {
                    "row": uk // nu,
                    "term": uniq[uk % nu],
                    "tf": np.minimum(occ, 255).astype(np.int64),
                }
            )
            hits = tf.merge(qt, on="term", how="inner")
            if hits.empty:
                continue
            tf_d = hits["tf"].to_numpy(np.float64)
            prior = priors[hits["row"].to_numpy()].astype(np.float64)
            rsv = hits["idf"].to_numpy() * (
                (tf_d * (BM25_K1 + 1.0)) / (tf_d + prior)
            )
            hits["contrib"] = hits["weight"].to_numpy(np.int64) * (
                1 + (rsv * 100.0).astype(np.int64)
            )
            agg = (
                hits.groupby(["row", "query_id"], sort=False)
                .agg(rsv_fixed=("contrib", "sum"), n_match_terms=("term", "size"))
                .reset_index()
            )
            agg["rsv_fixed"] = accum_value(agg["rsv_fixed"].to_numpy(np.int64))
            agg = agg[agg["rsv_fixed"] > threshold]
            if agg.empty:
                continue
            ridx = agg["row"].to_numpy()
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy()[ridx],
                    "turn_idx": pdf["turn_idx"].to_numpy()[ridx].astype(np.int32),
                    "query_id": agg["query_id"].to_numpy(np.int64),
                    "n_match_terms": agg["n_match_terms"].to_numpy(np.int32),
                    "rsv_fixed": agg["rsv_fixed"].to_numpy(np.int64),
                    "rsv": agg["rsv_fixed"].to_numpy(np.float64) / 100.0,
                }
            )

    return stream_df.mapInPandas(score, schema=MATCH_SCHEMA)


def windowed_turn_stats(
    stream_df: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time windowed turn statistics with late-data handling.

    The indexer's every-N-docs progress report (atire/index.c:75-79)
    as event-time windows: turns, distinct conversations (exact within
    the window state), and token volume per window. The watermark
    bounds state: windows older than it are finalized and dropped."""
    toks = "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0))"
    w = (
        F.window("ts", window, slide)
        if slide
        else F.window("ts", window)
    )
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(w.alias("win"))
        .agg(
            F.count("*").alias("turns"),
            F.approx_count_distinct("conv_id").alias("convs_approx"),
            F.sum(F.expr(toks)).cast("long").alias("tokens"),
            F.sum(F.when(F.col("text") == "", 1).otherwise(0))
            .cast("long")
            .alias("empty_turns"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "turns",
            "convs_approx",
            "tokens",
            "empty_turns",
        )
    )


TOPK_OUT_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("rank", IntegerType()),
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("rsv_fixed", LongType()),
    ]
)
TOPK_STATE_SCHEMA = StructType(
    [
        StructField("conv_ids", StringType()),  # \x1f-joined
        StructField("turn_idxs", StringType()),
        StructField("rsvs", StringType()),
    ]
)
_SEP = "\x1f"


def _topk_merge(
    state_rows: list[tuple[str, int, int]],
    new_rows: list[tuple[str, int, int]],
    k: int,
) -> list[tuple[str, int, int]]:
    """Bounded top-k merge: rsv desc, then (conv_id, turn_idx) asc —
    the accumulator's rsv-desc order with a deterministic stream
    tie-break (stream turns have no global docid until indexed)."""
    merged = {}
    for conv, tidx, rsv in state_rows + new_rows:
        key = (conv, tidx)
        if key not in merged or rsv > merged[key]:
            merged[key] = rsv
    ordered = sorted(
        ((conv, tidx, rsv) for (conv, tidx), rsv in merged.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )
    return ordered[:k]


def running_topk(matches: DataFrame, k: int = 10) -> DataFrame:
    """Streaming bounded top-k per standing query.

    ``applyInPandasWithState`` keyed by query_id: state is the current
    top-k (O(k) rows per key in the state store); each micro-batch
    merges its matches in and emits the key's refreshed top-k. Use
    output mode ``update``. A (conv_id, turn_idx) seen twice keeps its
    best score (idempotent re-delivery)."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        if state.exists:
            conv_s, tidx_s, rsv_s = state.get
            prior = (
                list(
                    zip(
                        conv_s.split(_SEP),
                        [int(x) for x in tidx_s.split(_SEP)],
                        [int(x) for x in rsv_s.split(_SEP)],
                    )
                )
                if conv_s
                else []
            )
        else:
            prior = []
        new = []
        for pdf in pdfs:
            new.extend(
                zip(
                    pdf["conv_id"].tolist(),
                    [int(x) for x in pdf["turn_idx"]],
                    [int(x) for x in pdf["rsv_fixed"]],
                )
            )
        top = _topk_merge(prior, new, k)
        state.update(
            (
                _SEP.join(r[0] for r in top),
                _SEP.join(str(r[1]) for r in top),
                _SEP.join(str(r[2]) for r in top),
            )
        )
        yield pd.DataFrame(
            {
                "query_id": [int(key[0])] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "conv_id": [r[0] for r in top],
                "turn_idx": [r[1] for r in top],
                "rsv_fixed": [r[2] for r in top],
            }
        )

    return matches.groupBy("query_id").applyInPandasWithState(
        fn,
        outputStructType=TOPK_OUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
