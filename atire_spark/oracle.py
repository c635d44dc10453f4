"""Pure numpy/pandas reference oracle for rank-identity testing.

This is an *independent* implementation of the reference semantics
(SURVEY.md §4.5) — deliberately structured differently from the Spark
engine (dict-of-arrays index, dense accumulator array) so that a bug in
a shared kernel cannot self-verify. It mirrors reference ATIRE's own
architecture at miniature scale:

- docids by stable (conv_id, turn_idx) order, empty docs skipped
  without consuming an id (reference atire/index.c:533-540);
- tf saturated at 255 (memory_index_hash_node.h:140-143);
- BM25 k1=0.9 b=0.4, idf = ln(N/df) with df==N contributing nothing
  (ranking_function_bm25.c:91-92), float32 doc-length prior
  (ranking_function_bm25.c:27-31);
- fixed-point SIGNED-short accumulators (GNUmakefile.defns:94), +1 per hit
  (search_engine_accumulator.h:76);
- final order rsv desc, tie → larger docid first
  (search_engine_accumulator.h:36-42).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from atire_spark.kernels.tokenizer import tokenize


def _query_terms(query: str) -> list[str]:
    """Query-side term extraction — the reference-exact NEXI CO parse
    (nexi.c get_next_token/read_CO, see atire_spark.query.parse_nexi):
    XML-name lexing, case folding with the all-uppercase tag rule,
    inert verbatim phrase terms, and error-refused queries (an errored
    parse yields no terms → zero rows). The DOCUMENT side keeps using
    the index tokenizer — the two lexers intentionally differ, like
    the reference's parser.c vs nexi.c."""
    from atire_spark.query import parse_nexi

    return [t.term for t in parse_nexi(query)]


K1 = 0.9
B = 0.4
TF_CAP = 255
from atire_spark.kernels.bm25 import accum_value  # signed short view

ACCUM_MOD = 1 << 16


@dataclass
class OracleIndex:
    n_docs: int
    collection_len: int
    mean_doc_len: float
    doc_lens: np.ndarray  # int64 per docid
    postings: dict[str, tuple[np.ndarray, np.ndarray]]  # term -> (docids asc, tfs)
    docmap: pd.DataFrame  # docid, conv_id, turn_idx, doc_len
    stemmer: str | None = None  # the index's ~stemmer
    priors: np.ndarray = field(init=False)  # float32 per docid

    def __post_init__(self) -> None:
        lens = self.doc_lens.astype(np.float64)
        self.priors = (K1 * ((1.0 - B) + B * (lens / self.mean_doc_len))).astype(
            np.float32
        )

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls, transcripts: pd.DataFrame, stemmer: str | None = None
    ) -> "OracleIndex":
        """Build from a pandas transcripts frame (conv_id, turn_idx,
        text); ``stemmer`` applies the index-side gate
        (index_document.c:103-111) per token — doc_len counts pre-stem
        tokens."""
        from atire_spark.kernels.stem import index_stem

        df = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        docid = 0
        doc_lens: list[int] = []
        rows: list[tuple[int, str, int, int]] = []
        post: dict[str, tuple[list[int], list[int]]] = {}
        for conv_id, turn_idx, text in zip(
            df["conv_id"], df["turn_idx"], df["text"]
        ):
            toks = tokenize(text)
            if not toks:
                continue  # empty doc: no docid consumed
            if stemmer is not None:
                toks = [index_stem(t, stemmer) for t in toks]
            for term, tf in Counter(toks).items():
                lst = post.setdefault(term, ([], []))
                lst[0].append(docid)
                lst[1].append(min(tf, TF_CAP))
            doc_lens.append(len(toks))
            rows.append((docid, conv_id, int(turn_idx), len(toks)))
            docid += 1

        lens = np.asarray(doc_lens, dtype=np.int64)
        n = int(lens.size)
        total = int(lens.sum())
        postings = {
            t: (np.asarray(d, dtype=np.int64), np.asarray(f, dtype=np.int64))
            for t, (d, f) in post.items()
        }
        docmap = pd.DataFrame(rows, columns=["docid", "conv_id", "turn_idx", "doc_len"])
        return cls(
            n_docs=n,
            collection_len=total,
            mean_doc_len=total / n if n else 0.0,
            doc_lens=lens,
            postings=postings,
            docmap=docmap,
            stemmer=stemmer,
        )

    # ------------------------------------------------------------------
    def search_boolean(self, query: str, k: int = 10) -> pd.DataFrame:
        """Boolean retrieval oracle (atire_api.c:1116-1176): dense
        per-leaf bitstrings + BM25 accumulation, filter, rank."""
        from atire_spark.boolean import assign_leaf_indexes, eval_tree, parse_boolean

        tree = parse_boolean(query)
        empty = pd.DataFrame(columns=["rank", "docid", "rsv_fixed"]).astype(
            {"rank": np.int32, "docid": np.int64, "rsv_fixed": np.int64}
        )
        if tree is None:
            return empty
        leaves = assign_leaf_indexes(tree)
        acc = np.zeros(self.n_docs, dtype=np.int64)
        presence = [np.zeros(self.n_docs, dtype=bool) for _ in leaves]
        for leaf in leaves:
            hit = self.postings.get(leaf.term)
            if hit is None:
                continue
            docids, tfs = hit
            idf = float(np.log(np.float64(self.n_docs) / np.float64(docids.size)))
            if idf == 0.0:
                continue  # df==N: ranker bails before setting bits
            tf_d = tfs.astype(np.float64)
            prior = self.priors[docids].astype(np.float64)
            rsv = idf * ((tf_d * (K1 + 1.0)) / (tf_d + prior))
            acc[docids] += 1 + (rsv * 100.0).astype(np.int64)
            presence[leaf.idx][docids] = True
        mask = eval_tree(tree, presence)
        cand = np.flatnonzero(mask)
        if cand.size == 0:
            return empty
        rsv_fixed = accum_value(acc[cand])
        order = np.lexsort((-cand, -rsv_fixed))[: min(k, cand.size)]
        return pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int32),
                "docid": cand[order],
                "rsv_fixed": rsv_fixed[order],
            }
        )

    # ------------------------------------------------------------------
    def quantize(self, bits: int = 8) -> dict:
        """Quantized (-Q) postings: every posting's raw BM25 rsv
        (idf kept even at 0 — the quantizer does not skip df==N terms,
        ranking_function.c:495-526), global min/max, then
        ``trunc(((rsv-min)/(max-min)) * ((1<<bits)-2) + 1)``.

        The quantizer's prior uses len+1 / mean+1 — the index-side
        ranker reads the memory index's RAW length array, which stores
        length+1 (search subtracts it back); binary-verified, see
        kernels/quantize.raw_rsv."""
        from atire_spark.kernels.bm25 import doc_priors

        qpriors = doc_priors(self.doc_lens + 1, self.mean_doc_len + 1.0)
        rsvs: dict[str, np.ndarray] = {}
        qmin, qmax = np.inf, -np.inf
        for term, (docids, tfs) in self.postings.items():
            idf = float(np.log(np.float64(self.n_docs) / np.float64(docids.size)))
            tf_d = tfs.astype(np.float64)
            prior = qpriors[docids].astype(np.float64)
            rsv = idf * ((tf_d * (K1 + 1.0)) / (tf_d + prior))
            rsvs[term] = rsv
            qmin = min(qmin, float(rsv.min()))
            qmax = max(qmax, float(rsv.max()))
        scale = float((1 << bits) - 2)
        quant = {
            t: (
                self.postings[t][0],
                np.trunc(((r - qmin) / (qmax - qmin)) * scale + 1.0).astype(np.int64)
                if qmax > qmin
                else np.ones(r.size, dtype=np.int64),
            )
            for t, r in rsvs.items()
        }
        return {"postings": quant, "qmin": qmin, "qmax": qmax, "bits": bits}

    def search_quantized(self, query: str, k: int = 10, bits: int = 8) -> pd.DataFrame:
        """Impact-ranker search over the quantized index: rsv = sum of
        stored impacts (add_rsv(long), no +1/x100, no df==N skip)."""
        key = f"_quant_{bits}"
        q = getattr(self, key, None)
        if q is None:
            q = self.quantize(bits)
            object.__setattr__(self, key, q)
        terms = _query_terms(query)
        acc = np.zeros(self.n_docs, dtype=np.int64)
        touched = np.zeros(self.n_docs, dtype=bool)
        for term in terms:
            hit = q["postings"].get(term)
            if hit is None:
                continue
            docids, impacts = hit
            acc[docids] += impacts
            touched[docids] = True
        cand = np.flatnonzero(touched)
        if cand.size == 0:
            return pd.DataFrame(columns=["rank", "docid", "rsv_fixed"]).astype(
                {"rank": np.int32, "docid": np.int64, "rsv_fixed": np.int64}
            )
        rsv_fixed = accum_value(acc[cand])
        order = np.lexsort((-cand, -rsv_fixed))[: min(k, cand.size)]
        return pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int32),
                "docid": cand[order],
                "rsv_fixed": rsv_fixed[order],
            }
        )

    # ------------------------------------------------------------------
    def search(self, query: str, k: int = 10) -> pd.DataFrame:
        """BM25 top-k → DataFrame(rank, docid, rsv_fixed).

        A stemmed index searches through the stem ITERATOR (class
        conflation over the vocabulary), not a direct post-stem lookup
        — atire_api.c:873, binary-verified; see
        SearchEngine.search_batch."""
        from atire_spark.kernels.stem import query_stem

        if self.stemmer is not None:
            return self.search_stemmed_iterator(
                query, stemmer=self.stemmer, k=k
            )
        terms = [query_stem(t, self.stemmer) for t in _query_terms(query)]
        acc = np.zeros(self.n_docs, dtype=np.int64)
        touched = np.zeros(self.n_docs, dtype=bool)
        for term in terms:  # one pass per occurrence, like the reference
            hit = self.postings.get(term)
            if hit is None:
                continue
            docids, tfs = hit
            df_t = docids.size
            idf = float(np.log(np.float64(self.n_docs) / np.float64(df_t)))
            if idf == 0.0:
                continue  # df == N: term contributes nothing
            tf_d = tfs.astype(np.float64)
            prior = self.priors[docids].astype(np.float64)
            rsv = idf * ((tf_d * (K1 + 1.0)) / (tf_d + prior))
            acc[docids] += 1 + (rsv * 100.0).astype(np.int64)
            touched[docids] = True

        cand = np.flatnonzero(touched)
        if cand.size == 0:
            return pd.DataFrame(columns=["rank", "docid", "rsv_fixed"]).astype(
                {"rank": np.int32, "docid": np.int64, "rsv_fixed": np.int64}
            )
        rsv_fixed = accum_value(acc[cand])
        # rsv desc, then docid desc
        order = np.lexsort((-cand, -rsv_fixed))[: min(k, cand.size)]
        out = pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int32),
                "docid": cand[order],
                "rsv_fixed": rsv_fixed[order],
            }
        )
        return out

    # ------------------------------------------------------------------
    def search_stemmed_iterator(
        self,
        query: str,
        stemmer: str = "s",
        k: int = 10,
        similarity: str | None = None,
        value: float = 0.0,
    ) -> pd.DataFrame:
        """Query-side stemmer-iterator search over this (unstemmed)
        index — mirror of SearchEngine.search_stemmed_iterator: stem
        classes are prefix-bounded (stemmer.c:14-48), optionally gated
        (threshold) or tf-weighted (weighted) by the postings-cosine
        similarity, then conflated (sum, bucket-truncate, cap 255, df
        recomputed) and ranked as one BM25 term per class."""
        from atire_spark.kernels.stem import _STEM_FN
        from atire_spark.kernels.termsim import (
            reference_posting_order,
            term_similarity,
        )

        fn = _STEM_FN[stemmer]
        doc_len_of = {i: int(v) for i, v in enumerate(self.doc_lens)}
        acc = np.zeros(self.n_docs, dtype=np.int64)
        touched = np.zeros(self.n_docs, dtype=bool)
        for base in _query_terms(query):  # one pass per occurrence
            use_iter = len(base) >= 3 and "a" <= base[0] <= "z"
            if use_iter:
                st = fn(base)
                # class prefix = stem[:L], L = the ATIRE stem() return
                # value (CLASS_PREFIX_LEN) — shorter than the stem for
                # most families, 1 char for the phonetic codes
                from atire_spark.kernels.stem import class_prefix

                pref = class_prefix(stemmer, st)
                members = sorted(
                    t
                    for t in self.postings
                    if t.startswith(pref) and fn(t) == st
                )
            else:
                members = [base] if base in self.postings else []
            wsum = np.zeros(self.n_docs, dtype=np.float64)
            ok = False
            for m in members:
                w = 1.0
                if similarity is not None and m != base:
                    bd, bt = self.postings.get(
                        base, (np.zeros(0, np.int64), np.zeros(0, np.int64))
                    )
                    cd, ct = self.postings[m]
                    cd, ct = reference_posting_order(cd, ct)
                    s = term_similarity(
                        bd, bt, cd, ct, doc_len_of, self.n_docs,
                        df_a=max(bd.size, 1), df_b=max(cd.size, 1),
                    )
                    if similarity == "threshold":
                        if s < value:  # NaN compares false → kept
                            continue
                    else:
                        w = float(np.power(s, value))
                docids, tfs = self.postings[m]
                wsum[docids] += tfs.astype(np.float64) * w
                ok = True
            if not ok:
                continue
            nz = wsum != 0.0
            tfv = np.where(wsum >= 256.0, 255.0, np.floor(wsum)).astype(
                np.int64
            )
            cand = np.flatnonzero(nz)
            df_t = cand.size
            if df_t == 0 or df_t == self.n_docs:
                continue
            idf = float(np.log(np.float64(self.n_docs) / np.float64(df_t)))
            tf_d = tfv[cand].astype(np.float64)
            prior = self.priors[cand].astype(np.float64)
            rsv = idf * ((tf_d * (K1 + 1.0)) / (tf_d + prior))
            acc[cand] += 1 + (rsv * 100.0).astype(np.int64)
            touched[cand] = True

        cand = np.flatnonzero(touched)
        if cand.size == 0:
            return pd.DataFrame(columns=["rank", "docid", "rsv_fixed"]).astype(
                {"rank": np.int32, "docid": np.int64, "rsv_fixed": np.int64}
            )
        rsv_fixed = accum_value(acc[cand])
        order = np.lexsort((-cand, -rsv_fixed))[: min(k, cand.size)]
        return pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int32),
                "docid": cand[order],
                "rsv_fixed": rsv_fixed[order],
            }
        )

    # ------------------------------------------------------------------
    def search_expanded(self, query: str, thesaurus, k: int = 10) -> pd.DataFrame:
        """Classic thesaurus expansion (nexi.c:484-495): synset terms
        join the query at the same weight, each scored independently."""
        expanded = []
        for t in _query_terms(query):  # expansion on the raw surface token
            expanded.append(t)
            expanded.extend(thesaurus.get_synset(t))
        # reuse the standard loop (it stems each term per occurrence)
        return self.search(" ".join(expanded), k)

    def search_conflated(self, query: str, thesaurus, k: int = 10) -> pd.DataFrame:
        """Synonym conflation (search_engine.c:1369-1461 +
        ranking_function.c:142-154): per query term, the tf vectors of
        the term and its synset members are summed per doc (capped at
        255), df recomputed from the merged vector, and the merge is
        scored as one BM25 term.  Members stemming to the same index
        term add their postings twice, like the reference re-reading
        them."""
        from atire_spark.kernels.stem import query_stem

        acc = np.zeros(self.n_docs, dtype=np.int64)
        touched = np.zeros(self.n_docs, dtype=bool)
        for base in _query_terms(query):  # one pass per occurrence
            members = [query_stem(base, self.stemmer)]
            members += [
                query_stem(s, self.stemmer) for s in thesaurus.get_synset(base)
            ]
            tfvec = np.zeros(self.n_docs, dtype=np.int64)
            for m in members:
                hit = self.postings.get(m)
                if hit is None:
                    continue  # expanded to something not in the vocab
                docids, tfs = hit
                tfvec[docids] += tfs
            np.minimum(tfvec, 255, out=tfvec)  # cap at 255
            cand = np.flatnonzero(tfvec)
            df_t = cand.size
            if df_t == 0:
                continue
            idf = float(np.log(np.float64(self.n_docs) / np.float64(df_t)))
            if idf == 0.0:
                continue  # merged df == N contributes nothing
            tf_d = tfvec[cand].astype(np.float64)
            prior = self.priors[cand].astype(np.float64)
            rsv = idf * ((tf_d * (K1 + 1.0)) / (tf_d + prior))
            acc[cand] += 1 + (rsv * 100.0).astype(np.int64)
            touched[cand] = True

        cand = np.flatnonzero(touched)
        if cand.size == 0:
            return pd.DataFrame(columns=["rank", "docid", "rsv_fixed"]).astype(
                {"rank": np.int32, "docid": np.int64, "rsv_fixed": np.int64}
            )
        rsv_fixed = accum_value(acc[cand])
        order = np.lexsort((-cand, -rsv_fixed))[: min(k, cand.size)]
        return pd.DataFrame(
            {
                "rank": np.arange(1, order.size + 1, dtype=np.int32),
                "docid": cand[order],
                "rsv_fixed": rsv_fixed[order],
            }
        )
