"""BM25 top-k search over the segmented postings table.

Spark-first re-expression of the reference's term-at-a-time search
(/root/reference/atire/atire_api.c:843-879, source/search_engine.c:763-1126):

reference                                   → this engine
------------------------------------------- ----------------------------
dictionary B-tree lookup per term            postings.join(query terms)
(search_engine.c:403-518)                    → parquet/Iceberg file prune
read + partial decompress postings           vectorized vbyte decode in
(search_engine.c:845-1084)                   mapInPandas, per segment
per-impact-group score computed once,        group_contrib kernel per
add_rsv per docid                            (segment, impact group)
(ranking_function_bm25.c:111-128)
uint16 fixed-point accumulator array         groupBy(query_id, docid)
(search_engine_accumulator.h:76)             .sum(contrib) % 65536
top-k heap + partial sort, tie larger        row_number() over rsv desc,
docid first (search_engine_accumulator.h)    docid desc → rank <= k

Segments are self-contained (global df on the row, doc lengths inline),
so scoring is embarrassingly parallel: no docmap join, no broadcast of
per-doc state — the property that survives a 1000-executor 10^12-doc
deployment.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atire_spark.build import IndexTables
from atire_spark.kernels.bm25 import ACCUM_MOD, BM25_B, BM25_K1
from atire_spark.kernels.impact import decode_segment
from atire_spark.kernels.tokenizer import tokenize

RESULT_SCHEMA = "query_id long, rank int, docid long, rsv_fixed long, rsv double"


def parse_query(text: str) -> list[tuple[str, int]]:
    """Query string → [(term, multiplicity)].

    The reference parses queries with the same tokenizer as documents
    (NEXI CO grammar, source/nexi.c:434-505; phrases degrade to bags
    because the index stores no positions) and scores a repeated term
    once per occurrence.
    """
    return list(Counter(tokenize(text)).items())


class SearchEngine:
    def __init__(self, spark: SparkSession, index: IndexTables, cache: bool = True):
        self.spark = spark
        self.index = index
        row = index.stats.collect()[0]
        self.n_docs = int(row["documents"])
        self.mean_doc_len = float(row["mean_doc_len"])
        self.postings = index.postings
        if cache:
            # the reference's -M in-memory index mode
            # (search_engine.c:52-55) → executor block-manager cache
            self.postings = self.postings.cache()

    # ------------------------------------------------------------------
    def search_one(self, query: str, k: int = 10) -> DataFrame:
        return self.search_batch([(1, query)], k)

    def search_batch(
        self,
        queries: list[tuple[int, str]],
        k: int = 10,
        ranker: str = "bm25",
        conjunctive: bool = False,
        grouped: bool = True,
    ) -> DataFrame:
        """Run a batch of (query_id, text) → top-k DataFrame.

        Columns: query_id, rank, docid, rsv_fixed, rsv (rsv is the
        fixed-point accumulator scaled back to a display double, the
        rank-identical comparable is rsv_fixed).

        ``ranker``:
        - ``"bm25"`` — the default BM25 fixed-point scorer;
        - ``"termcount"`` — the reference's term-count / boolean-OR
          ranking function (ranking_function_term_count.c via factory
          id, SURVEY §2.4): rsv = number of matching query terms.

        ``conjunctive=True`` is the reference's "allterms" mode
        (search_engine.c:1491-1511): only documents containing *every*
        distinct query term survive, ranked by the chosen scorer.
        """
        terms: list[tuple[int, str, int]] = []
        n_terms_per_q: dict[int, int] = {}
        for qid, text in queries:
            parsed = parse_query(text)
            n_terms_per_q[qid] = len(parsed)
            for term, weight in parsed:
                terms.append((qid, term, weight))
        if not terms:
            return self.spark.createDataFrame([], RESULT_SCHEMA)

        terms_df = self.spark.createDataFrame(
            terms, "query_id long, term string, weight int"
        )
        # term filter prunes postings files; broadcast the tiny query set
        hits = self.postings.join(F.broadcast(terms_df), "term")

        n_docs = self.n_docs
        mean_len = self.mean_doc_len
        k1, b = BM25_K1, BM25_B
        use_bm25 = ranker == "bm25"

        if grouped:
            return self._search_grouped(hits, n_terms_per_q, k, use_bm25, conjunctive)

        def score_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out_qid: list[np.ndarray] = []
                out_doc: list[np.ndarray] = []
                out_contrib: list[np.ndarray] = []
                out_hits: list[np.ndarray] = []
                for row in pdf.itertuples(index=False):
                    df_t = int(row.df)
                    idf = 1.0
                    if use_bm25:
                        idf = float(np.log(np.float64(n_docs) / np.float64(df_t)))
                        if idf == 0.0 and not conjunctive:
                            continue  # df == N contributes nothing (bm25.c:91-92)
                    docids, tfs, lens = decode_segment(
                        np.asarray(row.impacts),
                        np.asarray(row.doc_counts),
                        row.postings,
                        row.doc_lens,
                    )
                    if use_bm25:
                        if idf == 0.0:
                            # conjunctive with a universal term: counts as a
                            # required hit but scores nothing
                            contrib = np.zeros(docids.size, dtype=np.int64)
                        else:
                            priors = (
                                k1
                                * ((1.0 - b) + b * (lens.astype(np.float64) / mean_len))
                            ).astype(np.float32)
                            tf_d = tfs.astype(np.float64)
                            rsv = idf * (
                                (tf_d * (k1 + 1.0)) / (tf_d + priors.astype(np.float64))
                            )
                            contrib = (1 + (rsv * 100.0).astype(np.int64)) * int(
                                row.weight
                            )
                    else:  # termcount: one point per matching term occurrence
                        contrib = np.full(docids.size, int(row.weight), dtype=np.int64)
                    out_qid.append(
                        np.full(docids.size, int(row.query_id), dtype=np.int64)
                    )
                    out_doc.append(docids)
                    out_contrib.append(contrib)
                    out_hits.append(np.ones(docids.size, dtype=np.int64))
                if out_qid:
                    yield pd.DataFrame(
                        {
                            "query_id": np.concatenate(out_qid),
                            "docid": np.concatenate(out_doc),
                            "contrib": np.concatenate(out_contrib),
                            "term_hits": np.concatenate(out_hits),
                        }
                    )

        scored = hits.mapInPandas(
            score_fn,
            schema="query_id long, docid long, contrib long, term_hits long",
        )
        accum = scored.groupBy("query_id", "docid").agg(
            (F.sum("contrib") % ACCUM_MOD).alias("rsv_fixed"),
            F.sum("term_hits").alias("term_hits"),
        )
        if conjunctive:
            # allterms: drop docs matching fewer than all distinct terms
            # (search_engine.c:1491-1511). A distinct term yields at most
            # one posting row per doc per segment-union, so term_hits ==
            # number of distinct query terms present.
            req = self.spark.createDataFrame(
                [(qid, n) for qid, n in n_terms_per_q.items()],
                "query_id long, n_terms long",
            )
            accum = accum.join(F.broadcast(req), "query_id").filter(
                F.col("term_hits") >= F.col("n_terms")
            )
        accum = accum.select("query_id", "docid", "rsv_fixed")
        return self._rank_topk(accum, k)

    # ------------------------------------------------------------------
    def _rank_topk(self, accum: DataFrame, k: int) -> DataFrame:
        """rsv desc, tie larger-docid-first, rank <= k
        (search_engine_accumulator.h:36-50 + top_k_sort)."""
        w = Window.partitionBy("query_id").orderBy(
            F.col("rsv_fixed").desc(), F.col("docid").desc()
        )
        return (
            accum.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "rank",
                "docid",
                "rsv_fixed",
                (F.col("rsv_fixed") / F.lit(100.0)).alias("rsv"),
            )
            .orderBy("query_id", "rank")
        )

    # ------------------------------------------------------------------
    def _search_grouped(
        self,
        hits: DataFrame,
        n_terms_per_q: dict[int, int],
        k: int,
        use_bm25: bool,
        conjunctive: bool,
    ) -> DataFrame:
        """Scale path (default): partition by seg_group so every docid's
        full accumulation completes inside one task, emit only the
        per-partition top-k candidates per query.

        Segments of *all* terms for a given docid share its seg_group
        (the group is a pure function of the docid block), so a hash
        repartition on seg_group co-locates everything a docid needs —
        the reference's accumulator array sliced into disjoint docid
        ranges, one per task. Shuffle volume is the handful of matching
        compressed segments + k·queries candidate rows per partition,
        never one row per posting (the exploded fallback path does that
        and is kept for plan comparison, grouped=False).
        """
        n_docs, mean_len = self.n_docs, self.mean_doc_len
        k1, b = BM25_K1, BM25_B

        def part_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qids: list[np.ndarray] = []
            docs: list[np.ndarray] = []
            contribs: list[np.ndarray] = []
            hit_flags: list[np.ndarray] = []
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    df_t = int(row.df)
                    idf = 1.0
                    if use_bm25:
                        idf = float(np.log(np.float64(n_docs) / np.float64(df_t)))
                        if idf == 0.0 and not conjunctive:
                            continue
                    docids, tfs, lens = decode_segment(
                        np.asarray(row.impacts),
                        np.asarray(row.doc_counts),
                        row.postings,
                        row.doc_lens,
                    )
                    if use_bm25:
                        if idf == 0.0:
                            contrib = np.zeros(docids.size, dtype=np.int64)
                        else:
                            priors = (
                                k1
                                * ((1.0 - b) + b * (lens.astype(np.float64) / mean_len))
                            ).astype(np.float32)
                            tf_d = tfs.astype(np.float64)
                            rsv = idf * (
                                (tf_d * (k1 + 1.0)) / (tf_d + priors.astype(np.float64))
                            )
                            contrib = (1 + (rsv * 100.0).astype(np.int64)) * int(
                                row.weight
                            )
                    else:
                        contrib = np.full(docids.size, int(row.weight), dtype=np.int64)
                    qids.append(np.full(docids.size, int(row.query_id), dtype=np.int64))
                    docs.append(docids)
                    contribs.append(contrib)
                    hit_flags.append(np.ones(docids.size, dtype=np.int64))
            if not qids:
                return
            acc = pd.DataFrame(
                {
                    "query_id": np.concatenate(qids),
                    "docid": np.concatenate(docs),
                    "contrib": np.concatenate(contribs),
                    "hit": np.concatenate(hit_flags),
                }
            )
            agg = (
                acc.groupby(["query_id", "docid"], sort=False)
                .agg(rsv_fixed=("contrib", "sum"), th=("hit", "sum"))
                .reset_index()
            )
            agg["rsv_fixed"] = agg["rsv_fixed"] % ACCUM_MOD
            if conjunctive:
                need = agg["query_id"].map(n_terms_per_q)
                agg = agg[agg["th"] >= need]
            outs = []
            for _, g in agg.groupby("query_id", sort=False):
                if len(g) > k:
                    order = np.lexsort(
                        (-g["docid"].to_numpy(), -g["rsv_fixed"].to_numpy())
                    )[:k]
                    g = g.iloc[order]
                outs.append(g[["query_id", "docid", "rsv_fixed"]])
            if outs:
                yield pd.concat(outs)

        cand = hits.repartition("seg_group").mapInPandas(
            part_fn, schema="query_id long, docid long, rsv_fixed long"
        )
        return self._rank_topk(cand, k)

    # ------------------------------------------------------------------
    def materialize(self, results: DataFrame) -> DataFrame:
        """Join results back to (conv_id, turn_idx) — the reference's
        internal-docid → external-ID step (search_engine.c:1547-1571)."""
        return results.join(self.index.docmap, "docid", "left").select(
            "query_id", "rank", "docid", "conv_id", "turn_idx", "rsv_fixed", "rsv"
        )
