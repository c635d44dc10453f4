"""Distributed index build: transcripts → docmap + postings + stats.

Spark-first re-expression of the reference's indexing pipeline
(/root/reference/atire/index.c:286-616, source/memory_index.c):

reference                                   → this engine
------------------------------------------- ----------------------------
8 indexing threads parse docs in parallel    input partitions; tokenize
(directory_iterator_preindex.c:56-80)        in mapInPandas (Arrow)
per-doc 256-bucket hash of term→tf           vectorized pandas groupby
(memory_index_one.c)                         per batch
serial docno assignment in doclist order     range-partition by
(atire/index.c:507-525)                      (conv_id, turn_idx) + per-
                                             partition offsets (two-pass)
global hash-of-trees posting accumulation    groupBy(term, docid-block)
(memory_index.c:126-308)                     collect_list (JVM-side)
atire_merge per-term concat with docid       second groupBy(term,
offsets (atire_merge.c:563-930)              seg_group) merge in Arrow
impact ordering + vbyte serialisation        impact_order kernel per
(memory_index.c:476-580,804-1042)            segment

Skew: the docid-block key IS the salt — a stop-term's postings are
built in bounded per-block pieces (order-preserving, so the merge is a
concatenation, exactly the reference's own multi-part recipe,
reference README.md:78-93). Terms whose lists exceed one segment group
stay split as multiple segment rows ("stop-term splitting"); the query
side unions segments, which is score-neutral because BM25 needs only
global df (stored per row) and per-posting (tf, doc_len).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atire_spark.kernels.quantize import DEFAULT_QUANT_BITS, quantize_rsv, raw_rsv
from atire_spark.kernels.tokenizer import tokenize_flat

TF_CAP = 255  # memory_index_hash_node.h:140-143

TOKENIZED_SCHEMA = (
    "conv_id string, turn_idx int, doc_len long, terms array<string>, "
    "tfs array<int>, occs array<int>"
)
DOCMAP_SCHEMA = "docid long, conv_id string, turn_idx int, doc_len long"
POSTINGS_SCHEMA = (
    "term string, seg_group long, seg_df long, seg_cf long, first_docid long, "
    "last_docid long, "
    "max_impact int, impacts array<int>, doc_counts array<int>, offsets array<long>, "
    "byte_offsets array<long>, postings binary, doc_lens binary, n_postings long"
)


@dataclass
class IndexTables:
    docmap: DataFrame
    postings: DataFrame  # + global df, cf joined on
    stats: DataFrame  # single row
    build_log: DataFrame | None = None
    cached: list = field(default_factory=list)  # persisted intermediates
    puurula: DataFrame | None = None  # -Ilmp per-doc length vectors
    # staged tokenized rows with docids (docid, doc_len, terms, occs) —
    # present on a fresh build (reads the staging parquet; the token
    # arrays already reflect the build's stem/stop flags) so secondary
    # indexes (TopSig signatures) never re-tokenize the corpus; absent
    # after load_index (staging is not part of the written index)
    tokenized: DataFrame | None = None

    def unpersist(self) -> None:
        """Release the build's persisted intermediates (call after the
        tables have been materialized, e.g. by :func:`write_index`)."""
        for df in self.cached:
            df.unpersist()
        self.cached.clear()


# ----------------------------------------------------------- tokenize
def tokenize_stage(
    transcripts: DataFrame,
    stemmer: str | None = None,
    stop_before_indexing: str | None = None,
    cjk_bigrams: bool = False,
    cjk_segmenter=None,
) -> DataFrame:
    """Per-turn tokenization + per-doc term counts, one Arrow pass.

    ``cjk_bigrams`` switches CJK runs from the parser's unsegmented
    default (one char per token, parser.c:251-258) to
    BIGRAM_SEGMENTATION (parser.c:259-283); ``cjk_segmenter`` is the
    ONFLY plugin slot (a ``str → list[str]`` callable over whole CJK
    runs — :func:`atire_spark.kernels.tokenizer.dict_segmenter` builds
    the dictionary-driven one).

    Output: one row per turn with (terms[], tfs[]) already aggregated
    per document (the reference's memory_index_one per-doc hash) and
    doc_len = surviving WORD+NUMBER token count.

    ``stemmer`` (any kernels.stem.STEMMERS name | None) applies index-side stemming
    (index_document.c:103-111: words > 3 chars only, numbers raw) to
    the batch *vocabulary* — one Python stem call per distinct term
    per batch, then a vectorized code remap; tf/cf then count stems.
    doc_len counts pre-stem tokens (terms_in_document is incremented
    before stemming, index_document.c:85-111).

    ``stop_before_indexing`` ("ncbi" | "puurula") is the reference's
    PRUNE_STOPWORDS_BEFORE_INDEXING mode (index_document.c:100-101):
    stopped tokens get no postings but STILL count toward the document
    length (terms_in_document++ precedes the stop check), and the stop
    check runs on the normalized token BEFORE stemming.
    """
    stops = None
    if stop_before_indexing is not None:
        from atire_spark.kernels.stopwords import stop_set

        stops = stop_set(stop_before_indexing)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            n = len(pdf)
            row_idx, flat, lens = tokenize_flat(
                pdf["text"],
                cjk_bigrams=cjk_bigrams,
                cjk_segmenter=cjk_segmenter,
            )
            if stops is not None and flat.size:
                # length already counted; drop stops from the posting
                # stream only (vectorized membership on the batch)
                keep = ~pd.Series(flat).isin(stops).to_numpy()
                row_idx, flat = row_idx[keep], flat[keep]
            terms: list = [[] for _ in range(n)]
            tfs: list = [[] for _ in range(n)]
            occs: list = [[] for _ in range(n)]
            if flat.size:
                # vectorized per-doc (term, tf) counting: factorize the
                # token stream, count (row, term_code) pairs with one
                # np.unique, split on row boundaries. The reference's
                # per-doc hash (memory_index_one.c) without the hash.
                codes, uniq = pd.factorize(flat)
                if stemmer is not None:
                    from atire_spark.kernels.stem import stem_unique

                    stemmed = stem_unique(
                        np.asarray(uniq, dtype=object), stemmer
                    )
                    codes2, uniq = pd.factorize(stemmed)
                    codes = codes2[codes]
                uniq = np.asarray(uniq, dtype=object)
                nu = len(uniq)
                key = row_idx * nu + codes
                uk, occ = np.unique(key, return_counts=True)
                rows = uk // nu
                terms_flat = uniq[uk % nu]
                # stored tf saturates (memory_index_hash_node.h:140-143);
                # collection frequency keeps counting every occurrence
                # (memory_index_hash_node.h:64-65)
                tf_flat = np.minimum(occ, TF_CAP).astype(np.int32)
                bounds = np.flatnonzero(np.diff(rows)) + 1
                present = rows[np.concatenate(([0], bounds))]
                for i, (t, f, o) in enumerate(
                    zip(
                        np.split(terms_flat, bounds),
                        np.split(tf_flat, bounds),
                        np.split(occ.astype(np.int32), bounds),
                    )
                ):
                    r = int(present[i])
                    terms[r], tfs[r], occs[r] = t, f, o
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "doc_len": lens,
                    "terms": terms,
                    "tfs": tfs,
                    "occs": occs,
                }
            )

    # spread the parse across every core: a small input (one parquet
    # file, a driver-created frame) often arrives with few partitions
    sc = transcripts.sparkSession.sparkContext
    if transcripts.rdd.getNumPartitions() < sc.defaultParallelism:
        transcripts = transcripts.repartition(sc.defaultParallelism)
    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        fn, schema=TOKENIZED_SCHEMA
    )


# ------------------------------------------ single-tokenize build (fast path)
SIDE_TOKENS_SCHEMA = (
    "conv_id string, turn_idx int, doc_len long, terms array<string>, "
    "occs array<int>"
)
KEYS_SCHEMA = "conv_id string, turn_idx int, doc_len long"
# docmaps up to this many rows MAY broadcast in the docid join
# (pass 3); larger corpora fall back to a shuffle join — the same
# single payload shuffle the classic range-staged path pays, so scale
# posture is unchanged, while every corpus under the threshold
# (including each PART of a split+merge build, the reference's own
# recipe for 100 GB+ collections, reference README.md:78-86) skips the
# payload shuffle entirely. The HARD cap below is gated by the actual
# driver heap at build time (:func:`docmap_broadcast_max`): the driver
# must collect + serialize the whole (conv_id, turn_idx, docid) table,
# so a fixed 20M-row constant would OOM a default-memory driver long
# before the cap.
BROADCAST_DOCMAP_MAX = 20_000_000
# conservative serialized row estimate for the broadcast docmap:
# ~24 B conv_id string payload + 2 longs + JVM object/row overhead
_DOCMAP_ROW_BYTES = 96
# never let the broadcast table claim more than this share of the
# driver heap (the same table also exists row-collected during the
# broadcast build, so the true peak is a small multiple of the
# serialized size)
_DOCMAP_HEAP_FRACTION = 0.05


def _parse_jvm_mem(s: str) -> int:
    """``spark.driver.memory``-style size string → bytes (JVM -Xmx
    suffixes: k/m/g/t, case-insensitive; bare number = bytes)."""
    s = s.strip().lower()
    mult = 1
    for suffix, m in (("k", 2**10), ("m", 2**20), ("g", 2**30), ("t", 2**40)):
        if s.endswith(suffix):
            mult, s = m, s[:-1]
            break
    return int(float(s) * mult)


def docmap_broadcast_max(spark: SparkSession) -> int:
    """Row threshold for broadcasting the docmap in the pass-3 docid
    join: at most ``BROADCAST_DOCMAP_MAX`` rows AND at most
    ``_DOCMAP_HEAP_FRACTION`` of the configured driver heap at
    ``_DOCMAP_ROW_BYTES``/row (48g driver → the full 20M cap; a 2g
    default driver → ~1.1M rows, well clear of OOM). Above the
    threshold pass 3 uses a shuffle join (tested path)."""
    try:
        mem = _parse_jvm_mem(spark.conf.get("spark.driver.memory", "2g"))
    except Exception:
        mem = 2 * 2**30
    return int(
        min(
            BROADCAST_DOCMAP_MAX,
            mem * _DOCMAP_HEAP_FRACTION // _DOCMAP_ROW_BYTES,
        )
    )


def _doc_term_counts(
    row_idx: np.ndarray, flat: np.ndarray, stemmer: str | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flat token stream → per-doc (row, term, occ) triples, vectorized
    (the reference's per-doc hash, memory_index_one.c, without the
    hash). Rows come back sorted ascending; ``occ`` is the uncapped
    occurrence count (tf is min(occ, TF_CAP), derived downstream)."""
    codes, uniq = pd.factorize(flat)
    if stemmer is not None:
        from atire_spark.kernels.stem import stem_unique

        stemmed = stem_unique(np.asarray(uniq, dtype=object), stemmer)
        codes2, uniq = pd.factorize(stemmed)
        codes = codes2[codes]
    uniq = np.asarray(uniq, dtype=object)
    nu = len(uniq)
    key = row_idx * nu + codes
    uk, occ = np.unique(key, return_counts=True)
    return uk // nu, uniq[uk % nu], occ


def _tokenize_sidewrite(
    transcripts: DataFrame,
    tokens_dir: str,
    stemmer: str | None = None,
    stop_before_indexing: str | None = None,
    cjk_bigrams: bool = False,
    cjk_segmenter=None,
) -> DataFrame:
    """Pass 1 of the single-tokenize build: tokenize each turn ONCE,
    side-write the per-doc token arrays straight to parquet from the
    worker (pyarrow, no JVM round-trip of the arrays), and emit only
    the NARROW key rows (conv_id, turn_idx, doc_len) back to Spark.

    Rationale: the token arrays are the build's dominant payload; the
    classic staged path moved them through Arrow→JVM, a hash shuffle, a
    JVM sort, a second Arrow round-trip (stamping) and a JVM parquet
    write before stage1 could read them back. Docid assignment only
    needs the KEYS, so this pass parts the payload from the keys: the
    arrays go to ``tokens_dir`` once (written as Arrow list arrays
    directly off the flat token stream — no per-row Python lists), and
    the key rows (tiny) drive the global docid sort.

    Semantics are identical to :func:`tokenize_stage` (stemmer /
    stop_before_indexing / CJK flags included): doc_len counts
    surviving WORD+NUMBER tokens before stopping/stemming, stopped
    tokens get no postings, stems count via the batch vocabulary remap.
    Rows with doc_len == 0 are side-written nowhere (they never get a
    docid) but still emit a key row so the duplicate-key check sees
    EVERY input row, not just the indexable ones. NULL keys fail here,
    exhaustively — acceptance never depends on sampling.

    Each task writes ``part-<partition>.parquet`` via a hidden
    temporary name + rename, so a retried task simply overwrites its
    file and Spark's reader ignores stragglers from failed attempts.
    ``tokens_dir`` must be on storage every executor can reach (on a
    cluster: the same shared filesystem the index itself targets).
    """
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    stops = None
    if stop_before_indexing is not None:
        from atire_spark.kernels.stopwords import stop_set

        stops = stop_set(stop_before_indexing)

    arrow_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("doc_len", pa.int64()),
            ("terms", pa.list_(pa.string())),
            ("occs", pa.list_(pa.int32())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        final = f"{tokens_dir}/part-{pid:05d}.parquet"
        tmp = f"{tokens_dir}/.part-{pid:05d}.{uuid.uuid4().hex}.tmp"
        writer = None
        try:
            for pdf in batches:
                pdf = pdf.reset_index(drop=True)
                n = len(pdf)
                if n == 0:
                    continue
                conv = pdf["conv_id"].to_numpy()
                turn = pdf["turn_idx"].to_numpy()
                if pd.isna(conv).any() or pd.isna(turn).any():
                    raise ValueError(
                        "transcripts key columns (conv_id, turn_idx) "
                        "contain NULLs; every turn needs a non-null key "
                        "for stable docid assignment"
                    )
                row_idx, flat, lens = tokenize_flat(
                    pdf["text"],
                    cjk_bigrams=cjk_bigrams,
                    cjk_segmenter=cjk_segmenter,
                )
                if stops is not None and flat.size:
                    keep = ~pd.Series(flat).isin(stops).to_numpy()
                    row_idx, flat = row_idx[keep], flat[keep]
                kept = lens > 0
                if kept.any():
                    if flat.size:
                        rows, terms_flat, occ = _doc_term_counts(
                            row_idx, flat, stemmer
                        )
                        per_row = np.bincount(rows, minlength=n)
                    else:
                        terms_flat = np.empty(0, dtype=object)
                        occ = np.empty(0, dtype=np.int64)
                        per_row = np.zeros(n, dtype=np.int64)
                    offs = np.zeros(int(kept.sum()) + 1, dtype=np.int64)
                    np.cumsum(per_row[kept], out=offs[1:])
                    offs32 = pa.array(offs, type=pa.int32())
                    table = pa.Table.from_arrays(
                        [
                            pa.array(conv[kept], type=pa.string()),
                            pa.array(turn[kept], type=pa.int32()),
                            pa.array(lens[kept], type=pa.int64()),
                            pa.ListArray.from_arrays(
                                offs32, pa.array(terms_flat, type=pa.string())
                            ),
                            pa.ListArray.from_arrays(
                                offs32,
                                pa.array(
                                    np.minimum(occ, np.iinfo(np.int32).max),
                                    type=pa.int32(),
                                ),
                            ),
                        ],
                        schema=arrow_schema,
                    )
                    if writer is None:
                        writer = pq.ParquetWriter(tmp, arrow_schema)
                    writer.write_table(table)
                yield pd.DataFrame(
                    {
                        "conv_id": pdf["conv_id"],
                        "turn_idx": pdf["turn_idx"],
                        "doc_len": lens,
                    }
                )
        finally:
            if writer is not None:
                writer.close()
        if writer is not None:
            import os as _os

            _os.replace(tmp, final)

    sc = transcripts.sparkSession.sparkContext
    if transcripts.rdd.getNumPartitions() < sc.defaultParallelism:
        transcripts = transcripts.repartition(sc.defaultParallelism)
    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        fn, schema=KEYS_SCHEMA
    )


def _key_bounds(
    keys: DataFrame, n_buckets: int, n_rows: int
) -> list[tuple[str, int]]:
    """Deterministic range-bucket bounds over the narrow key rows:
    a FIXED-seed sample (the input is deterministic, so any lineage
    recompute reproduces the same bounds — unlike repartitionByRange,
    whose per-execution sampling can shift partition boundaries
    between the offset-collect and a later recompute of the same
    frame, silently reassigning docids)."""
    if n_rows == 0:
        return []
    frac = min(1.0, (n_buckets * 128.0) / n_rows)
    rows = (
        keys.select("conv_id", "turn_idx")
        .sample(fraction=frac, seed=13)
        .collect()
    )
    skeys = sorted((r["conv_id"], int(r["turn_idx"])) for r in rows)
    if not skeys:
        return []
    bounds: list[tuple[str, int]] = []
    for i in range(1, n_buckets):
        b = skeys[min(int(len(skeys) * i / n_buckets), len(skeys) - 1)]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def _docids_from_keys(
    keys: DataFrame, n_parts: int, n_rows: int
) -> tuple[DataFrame, DataFrame, int, int]:
    """Pass 2: global docid assignment over the NARROW key rows.

    Bucket ids are DATA-DERIVED (vectorized comparison against the
    fixed-seed sampled bounds), rows hash-shuffle on the bucket and
    sort within partitions — so counting, the exhaustive
    adjacent-duplicate check (equal keys always share a bucket, and
    the check runs on ALL rows including empty-tokenizing turns, so a
    key duplicated between an empty and a non-empty turn fails too)
    and the dense stamping of the doc_len > 0 survivors (empty docs
    never consume an id, reference atire/index.c:533-540) all key off
    the bucket id, never the physical partition id. Every stage is a
    pure deterministic function of the input, so a cache-miss
    recompute of the returned docmap reproduces identical docids.

    Returns (persisted narrow partitions, docmap rows, total docs,
    collection length). The caller keeps the narrow partitions
    persisted while the docmap is in use (registry) — the stamp is a
    cheap vectorized pass over them.
    """
    bnds = _key_bounds(keys, n_parts, n_rows)
    bkeys = [(str(c), int(t)) for c, t in bnds]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            conv = pdf["conv_id"].to_numpy()
            turn = pdf["turn_idx"].to_numpy()
            bucket = np.zeros(len(pdf), dtype=np.int32)
            for c, t in bkeys:
                bucket += ((conv > c) | ((conv == c) & (turn >= t))).astype(
                    np.int32
                )
            pdf = pdf.copy()
            pdf.insert(0, "pid", bucket)
            yield pdf

    parts = (
        keys.mapInPandas(assign, schema="pid int, " + KEYS_SCHEMA)
        .repartition(n_parts, "pid")
        .sortWithinPartitions("pid", "conv_id", "turn_idx")
        .persist()
    )

    def count_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n: dict[int, int] = {}
        dl: dict[int, int] = {}
        prev: tuple | None = None  # (pid, conv, turn) across batches
        for pdf in batches:
            if not len(pdf):
                continue
            pid = pdf["pid"].to_numpy()
            conv = pdf["conv_id"].to_numpy()
            turn = pdf["turn_idx"].to_numpy()
            dup = (
                (pid[1:] == pid[:-1])
                & (conv[1:] == conv[:-1])
                & (turn[1:] == turn[:-1])
            )
            first = prev is not None and (
                (int(pid[0]), conv[0], turn[0]) == prev
            )
            if first or dup.any():
                i = 0 if first else int(np.flatnonzero(dup)[0]) + 1
                raise ValueError(
                    "duplicate transcripts key (conv_id="
                    f"{conv[i]!r}, turn_idx={turn[i]!r}): "
                    "(conv_id, turn_idx) must uniquely identify a "
                    "turn for stable docid assignment"
                )
            prev = (int(pid[-1]), conv[-1], turn[-1])
            lens = pdf["doc_len"].to_numpy(np.int64)
            live = lens > 0
            for b in np.unique(pid):
                m = pid == b
                n[int(b)] = n.get(int(b), 0) + int((m & live).sum())
                dl[int(b)] = dl.get(int(b), 0) + int(lens[m].sum())
        yield pd.DataFrame(
            {
                "pid": list(n),
                "cnt": [n[b] for b in n],
                "dl": [dl[b] for b in n],
            }
        )

    rows = parts.mapInPandas(
        count_fn, schema="pid int, cnt long, dl long"
    ).collect()
    counts: dict[int, int] = {}
    coll_len = 0
    for r in rows:
        counts[int(r["pid"])] = counts.get(int(r["pid"]), 0) + int(r["cnt"])
        coll_len += int(r["dl"] or 0)
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[int, int] = {}
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            if not len(pdf):
                continue
            b = pdf["pid"].to_numpy()
            keep = pdf["doc_len"].to_numpy(np.int64) > 0
            idx = np.zeros(len(pdf), dtype=np.int64)
            change = np.flatnonzero(np.diff(b)) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(b)]))
            for s, e in zip(starts, ends):
                base = seen.get(int(b[s]), offsets.get(int(b[s]), 0))
                kk = keep[s:e]
                nk = int(kk.sum())
                idx[s:e][kk] = base + np.arange(nk, dtype=np.int64)
                seen[int(b[s])] = base + nk
            out = pdf.loc[keep].copy()
            out.insert(0, "docid", idx[keep])
            yield out.drop(columns=["pid"])

    docmap = parts.mapInPandas(stamp, schema="docid long, " + KEYS_SCHEMA)
    return parts, docmap, acc, coll_len


def _stage1_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("term", pa.string()),
            ("block", pa.int64()),
            ("docids", pa.list_(pa.int64())),
            ("tfs", pa.list_(pa.int32())),
            ("lens", pa.list_(pa.int64())),
            ("df_b", pa.int64()),
            ("cf_b", pa.int64()),
        ]
    )


def _stage1_from_tokens(
    tokens: DataFrame, block_bits: int, docid_pdf: pd.DataFrame | None = None
) -> DataFrame:
    """Pass 3 map side: docid-joined token rows → per-(term, block)
    posting-array rows, entirely in Arrow (``mapInArrow``): the token
    list columns are consumed through their offset buffers and the
    term vocabulary is factorized by Arrow's C++ dictionary encode —
    no per-row pandas lists or Python string churn on either side.

    ``docid_pdf`` (a pandas (conv_id, turn_idx, docid) frame) routes
    the docid join through the TASK CLOSURE instead of a JVM broadcast
    join: under the broadcast threshold the docmap is driver-resident
    either way, and an indexed pandas lookup per batch replaces the
    BroadcastExchange + hash-join stage (measured ~0.3 s per 140k-turn
    build). When ``None`` the input rows must already carry ``docid``
    (the at-scale shuffle-join path).

    Batches arrive in arbitrary docid order (the side-written files
    are input-partition-local, not globally sorted); postings are
    docid-sorted within each (term, block) here and the segment merge
    (:func:`kernels.segment.build_segments_flat`) restores the global
    order per quantum, so no cross-batch contiguity is required."""
    lookup = None
    if docid_pdf is not None:
        lookup = docid_pdf.set_index(["conv_id", "turn_idx"])["docid"]

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        schema = _stage1_arrow_schema()
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if lookup is not None:
                conv = batch.column("conv_id").to_pylist()
                turn = batch.column("turn_idx").to_numpy(
                    zero_copy_only=False
                )
                # rows whose key misses (doc_len==0 rows are never in
                # the docmap and never side-written, so misses cannot
                # happen for well-formed input; reindex keeps this
                # total either way)
                docid = (
                    lookup.reindex(
                        pd.MultiIndex.from_arrays([conv, turn])
                    )
                    .to_numpy(np.float64)
                )
                ok = ~np.isnan(docid)
                if not ok.all():
                    raise ValueError(
                        "side-written token rows contain keys absent "
                        "from the docmap — staging is inconsistent"
                    )
                docid = docid.astype(np.int64)
            else:
                docid = batch.column("docid").to_numpy(zero_copy_only=False)
            dlen = batch.column("doc_len").to_numpy(zero_copy_only=False)
            terms_la = batch.column("terms")
            counts = pc.list_value_length(terms_la).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            flat_terms = terms_la.flatten()
            if len(flat_terms) == 0:
                continue
            occ = (
                batch.column("occs")
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            de = flat_terms.dictionary_encode()
            codes = de.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vocab = de.dictionary
            docids_flat = np.repeat(docid.astype(np.int64), counts)
            lens_flat = np.repeat(dlen.astype(np.int64), counts)
            block = docids_flat >> block_bits
            nb = int(block.max()) + 1
            key = codes * nb + block
            order = np.lexsort((docids_flat, key))
            k_s = key[order]
            bounds = np.flatnonzero(np.diff(k_s)) + 1
            starts = np.concatenate(([0], bounds))
            offs = np.concatenate((starts, [k_s.size]))
            d_s = docids_flat[order]
            o_s = occ[order]
            l_s = lens_flat[order]
            # stored tf saturates (memory_index_hash_node.h:140-143);
            # collection frequency keeps counting every occurrence
            tf_s = np.minimum(o_s, TF_CAP).astype(np.int32)
            off32 = pa.array(offs, type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [
                    vocab.take(
                        pa.array(k_s[starts] // nb, type=pa.int64())
                    ),
                    pa.array(k_s[starts] % nb, type=pa.int64()),
                    pa.ListArray.from_arrays(off32, pa.array(d_s)),
                    pa.ListArray.from_arrays(off32, pa.array(tf_s)),
                    pa.ListArray.from_arrays(off32, pa.array(l_s)),
                    pa.array(
                        np.diff(offs).astype(np.int64), type=pa.int64()
                    ),
                    pa.array(
                        np.add.reduceat(o_s, starts).astype(np.int64),
                        type=pa.int64(),
                    ),
                ],
                schema=schema,
            )

    cols = (
        ["conv_id", "turn_idx", "doc_len", "terms", "occs"]
        if lookup is not None
        else ["docid", "doc_len", "terms", "occs"]
    )
    return tokens.select(*cols).mapInArrow(fn, schema=STAGE1_SCHEMA)


# ---------------------------------------------------------- docid assignment
def _sorted_partitions(
    tokenized: DataFrame, num_ranges: int | None = None
) -> tuple[DataFrame, dict[int, int], int]:
    """Range-partition + sort the non-empty tokenized rows by
    (conv_id, turn_idx) and return (cached partitions, per-partition
    docid offsets). Empty docs are dropped first so they never consume
    an id (reference atire/index.c:533-540).

    Scalable two-pass: count per partition, then per-partition offset +
    local index — no global window, no driver collect of data (only P
    partition counts).
    """
    from pyspark import StorageLevel

    # cache the tokenized rows: the range partitioner's sampling pass
    # and the sort would otherwise each re-run the tokenizer UDF.
    # DISK_ONLY on purpose: these rows carry the token arrays, and
    # keeping hundreds of thousands of array objects on the JVM heap
    # turns every later pass into a GC storm — local disk reads are
    # cheaper than the collector.
    non_empty = tokenized.filter(F.col("doc_len") > 0).persist(
        StorageLevel.DISK_ONLY
    )
    n_parts = num_ranges or max(non_empty.sparkSession.sparkContext.defaultParallelism, 4)
    parts = non_empty.repartitionByRange(
        n_parts, "conv_id", "turn_idx"
    ).sortWithinPartitions("conv_id", "turn_idx")
    parts = parts.persist(StorageLevel.DISK_ONLY)

    def count_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame({"pid": [pid], "cnt": [n]})

    counts = {
        int(r["pid"]): int(r["cnt"])
        for r in parts.mapInPandas(count_fn, schema="pid int, cnt long").collect()
    }
    non_empty.unpersist()  # parts now holds the materialized rows
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    return parts, offsets, acc


def _range_bounds(
    transcripts: DataFrame, n_buckets: int
) -> list[tuple[str, int]]:
    """Range-bucket bounds over (conv_id, turn_idx), sampled from the
    RAW transcripts. repartitionByRange on the tokenized frame would
    run its sampling pass over the token arrays (an extra
    materialization of the expensive columns); sampling the two key
    columns of the raw input costs one cheap column-pruned scan."""
    n = transcripts.count()
    if n == 0:
        return []
    frac = min(1.0, (n_buckets * 128.0) / n)
    rows = (
        transcripts.select("conv_id", "turn_idx")
        .sample(fraction=frac, seed=13)
        .collect()
    )
    if any(r["conv_id"] is None or r["turn_idx"] is None for r in rows):
        raise ValueError(
            "transcripts key columns (conv_id, turn_idx) contain NULLs; "
            "every turn needs a non-null key for stable docid assignment"
        )
    keys = sorted((r["conv_id"], int(r["turn_idx"])) for r in rows)
    if not keys:
        return []
    bounds: list[tuple[str, int]] = []
    for i in range(1, n_buckets):
        b = keys[min(int(len(keys) * i / n_buckets), len(keys) - 1)]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def _stage_sorted(
    tokenized: DataFrame,
    stage_dir: str,
    num_ranges: int | None = None,
    bounds: list[tuple[str, int]] | None = None,
) -> tuple[DataFrame, dict[int, int], int, int]:
    """Bucket + sort the non-empty tokenized rows by (conv_id,
    turn_idx) and stage them to parquet with (pid, local_idx) stamped,
    returning (staged frame, per-bucket docid offsets, total docs,
    collection length).

    ``pid`` is an ORDERED range-bucket id (bucket i's keys all sort
    before bucket i+1's), assigned vectorized against the sampled
    ``bounds``; rows hash-shuffle on it (a bucket never splits), sort
    within partitions by (pid, conv_id, turn_idx), and stream to
    parquet in ONE pass — the tokenizer output is materialized exactly
    once, with no repartitionByRange sampling pass or JVM/disk cache
    roundtrip of the token arrays.

    ``docid = offsets[pid] + local_idx`` is then pure columnar
    arithmetic — later passes read the staged parquet (column-pruned,
    GC-free), and the staged directory doubles as a durable build
    checkpoint: tokenize + global sort never re-run.
    """
    spark = tokenized.sparkSession
    n_parts = num_ranges or max(spark.sparkContext.defaultParallelism, 4)
    bnds = bounds or []
    bkeys = [(str(c), int(t)) for c, t in bnds]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            conv = pdf["conv_id"].to_numpy()
            turn = pdf["turn_idx"].to_numpy()
            if pd.isna(conv).any() or pd.isna(turn).any():
                # loud + actionable instead of a TypeError deep in the
                # bucket comparison: a NULL key cannot participate in
                # the stable (conv_id, turn_idx) ordering docids (and
                # the per-turn text-equality invariant) derive from
                raise ValueError(
                    "transcripts key columns (conv_id, turn_idx) "
                    "contain NULLs; every turn needs a non-null key "
                    "for stable docid assignment"
                )
            bucket = np.zeros(len(pdf), dtype=np.int32)
            for c, t in bkeys:
                bucket += ((conv > c) | ((conv == c) & (turn >= t))).astype(
                    np.int32
                )
            pdf = pdf.copy()
            pdf.insert(0, "pid", bucket)
            yield pdf

    # ALL rows (including empty-tokenizing turns) flow through assign
    # and the stamp's duplicate check below: NULL-key and duplicate-key
    # acceptance is exhaustive and deterministic for every input row —
    # never dependent on whether a doc_len==0 row happened to be
    # sampled or filtered first (matching _tokenize_sidewrite /
    # _docids_from_keys on the fast path). Empty rows carry empty token
    # arrays, so shipping them through the key shuffle is ~free; they
    # are dropped AFTER the check, before staging.
    parts = (
        tokenized.mapInPandas(assign, schema="pid int, " + TOKENIZED_SCHEMA)
        .repartition(n_parts, "pid")
        .sortWithinPartitions("pid", "conv_id", "turn_idx")
    )

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-bucket running index; a hash partition may hold several
        # whole buckets and a bucket may span Arrow batches
        seen: dict[int, int] = {}
        prev_key: tuple | None = None  # last (conv, turn) of prior batch
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            b = pdf["pid"].to_numpy()
            # duplicate-key detection is FREE here: rows are sorted by
            # (pid, conv_id, turn_idx) and a key's bucket never splits,
            # so any duplicate is adjacent (possibly across an Arrow
            # batch boundary). A duplicated key would make docid
            # assignment depend on shuffle arrival order — silently
            # breaking the stable-ordering / resume invariant.
            if len(pdf):
                conv_k = pdf["conv_id"].to_numpy()
                turn_k = pdf["turn_idx"].to_numpy()
                dup = (conv_k[1:] == conv_k[:-1]) & (turn_k[1:] == turn_k[:-1])
                first = (
                    prev_key is not None
                    and (conv_k[0], turn_k[0]) == prev_key
                )
                if first or dup.any():
                    i = 0 if first else int(np.flatnonzero(dup)[0]) + 1
                    raise ValueError(
                        "duplicate transcripts key (conv_id="
                        f"{conv_k[i]!r}, turn_idx={turn_k[i]!r}): "
                        "(conv_id, turn_idx) must uniquely identify a "
                        "turn for stable docid assignment"
                    )
                prev_key = (conv_k[-1], turn_k[-1])
            idx = np.zeros(len(pdf), dtype=np.int64)
            keep = np.ones(len(pdf), dtype=bool)
            if len(pdf):
                # empty docs were dup-checked above but never consume a
                # docid (reference atire/index.c:533-540): local_idx is
                # dense over the doc_len > 0 survivors only, and the
                # empty rows are dropped from the staged output here
                keep = pdf["doc_len"].to_numpy(np.int64) > 0
                change = np.flatnonzero(np.diff(b)) + 1
                starts = np.concatenate(([0], change))
                ends = np.concatenate((change, [len(b)]))
                for s, e in zip(starts, ends):
                    base = seen.get(int(b[s]), 0)
                    k = keep[s:e]
                    nk = int(k.sum())
                    idx[s:e][k] = base + np.arange(nk, dtype=np.int64)
                    seen[int(b[s])] = base + nk
            pdf.insert(1, "local_idx", idx)
            yield pdf.loc[keep]

    parts.mapInPandas(
        stamp, schema="pid int, local_idx long, " + TOKENIZED_SCHEMA
    ).write.mode("overwrite").parquet(stage_dir)

    staged = spark.read.parquet(stage_dir)
    # one scalar pass also carries the collection length: the stats
    # row then needs NO further docmap scan (documents / coll_len /
    # mean become literals), saving two jobs per build
    rows = (
        staged.groupBy("pid")
        .agg(F.count("*").alias("cnt"), F.sum("doc_len").alias("dl"))
        .collect()
    )
    counts = {int(r["pid"]): int(r["cnt"]) for r in rows}
    coll_len = sum(int(r["dl"] or 0) for r in rows)
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    return staged, offsets, acc, coll_len


def _docid_batches(
    batches: Iterator[pd.DataFrame], offsets: dict[int, int]
) -> Iterator[pd.DataFrame]:
    """Stamp dense docids onto sorted-partition batches."""
    pid = TaskContext.get().partitionId()
    base = offsets.get(pid, 0)
    seen = 0
    for pdf in batches:
        pdf = pdf.reset_index(drop=True)
        pdf.insert(0, "docid", base + seen + np.arange(len(pdf), dtype=np.int64))
        seen += len(pdf)
        yield pdf


def assign_docids(tokenized: DataFrame, num_ranges: int | None = None) -> DataFrame:
    """Dense 0-based docids by stable (conv_id, turn_idx) order (full
    tokenized rows — the checkpointed build materializes these)."""
    parts, offsets, _ = _sorted_partitions(tokenized, num_ranges)

    def fn(batches):
        yield from _docid_batches(batches, offsets)

    return parts.mapInPandas(fn, schema="docid long, " + TOKENIZED_SCHEMA)


def _stage1_from_staged(
    staged: DataFrame, offsets: dict[int, int], block_bits: int
) -> DataFrame:
    """Partition-local posting construction over the staged parquet:
    docid = offsets[pid] + local_idx computed in numpy, one columnar
    read of the token arrays.

    Batches are processed PER BUCKET (pid), docid-sorted: each emitted
    stage1 row must cover a contiguous docid range disjoint from every
    other row of the same (term, block) — the merge concatenates rows
    in first-docid order and delta-encodes, so interleaved ranges
    would produce negative deltas. A bucket is a contiguous docid
    range by construction; a hash partition (and hence an Arrow batch)
    may hold several non-adjacent buckets, so the batch splits."""
    off = dict(offsets)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            base = pdf["pid"].map(off).to_numpy(dtype=np.int64)
            pdf.insert(0, "docid", base + pdf["local_idx"].to_numpy(np.int64))
            for _pid, sub in pdf.groupby("pid", sort=True):
                sub = sub.sort_values("docid", kind="stable").reset_index(
                    drop=True
                )
                out = _group_posting_batch(sub, block_bits)
                if out is not None:
                    yield out

    return staged.select(
        "pid", "local_idx", "doc_len", "terms", "tfs", "occs"
    ).mapInPandas(fn, schema=STAGE1_SCHEMA)


# ---------------------------------------------------------- postings build
STAGE1_SCHEMA = (
    "term string, block long, docids array<long>, tfs array<int>, "
    "lens array<long>, df_b long, cf_b long"
)


def _stage1(docs: DataFrame, block_bits: int, term_filter=None) -> DataFrame:
    """(docid, terms[], tfs[], occs[], doc_len) rows → per-(term,
    docid-block) posting arrays: **partition-local posting-list
    construction** (the north_star's map side; reference analogue is
    one `memory_index` per indexing part, README.md:78-86).

    Each input partition is a contiguous docid range (assign_docids
    range-partitions by the docid order), so one vectorized numpy pass
    per Arrow batch groups its postings by (term, block) locally and
    emits *compact array rows* — the term-partitioned shuffle then
    moves thousands of array rows, not one row per posting. A
    stop-term's data arrives as many bounded rows (≤ block size each),
    which is exactly the salt that keeps reducers balanced.

    A (term, block) pair may span several batches/partitions; rows
    carry their first docid so the merge re-orders deterministically.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _group_posting_batch(pdf, block_bits)
            if out is not None:
                yield out

    stage1 = docs.select(
        "docid", "doc_len", "terms", "tfs", "occs"
    ).mapInPandas(fn, schema=STAGE1_SCHEMA)
    if term_filter is not None:
        # checkpointed builds process deterministic term-hash chunks
        stage1 = stage1.filter(term_filter("term"))
    return stage1


def _group_posting_batch(pdf: pd.DataFrame, block_bits: int) -> pd.DataFrame | None:
    """One vectorized pass: batch rows (docid, doc_len, terms[], tfs[],
    occs[]) → per-(term, block) posting-array rows."""
    if not len(pdf):
        return None
    counts = pdf["terms"].str.len().to_numpy(dtype=np.int64)
    if counts.sum() == 0:
        return None
    terms = np.concatenate(pdf["terms"].to_numpy())
    occs = np.concatenate(pdf["occs"].to_numpy()).astype(np.int64)
    if "tfs" in pdf.columns:
        tfs = np.concatenate(pdf["tfs"].to_numpy()).astype(np.int64)
    else:
        # side-written token rows carry only the uncapped occurrence
        # counts; the stored tf saturates (memory_index_hash_node.h:
        # 140-143) and is derived here in one vectorized min
        tfs = np.minimum(occs, TF_CAP)
    docids = np.repeat(pdf["docid"].to_numpy(np.int64), counts)
    lens = np.repeat(pdf["doc_len"].to_numpy(np.int64), counts)
    codes, uniq = pd.factorize(terms)
    # group key: (term, block); docids ascending within batch, so a
    # stable sort on the key keeps postings docid-ordered
    block = docids >> block_bits
    nb = int(block.max()) + 1
    key = codes.astype(np.int64) * nb + block
    order = np.argsort(key, kind="stable")
    k_s = key[order]
    bounds = np.flatnonzero(np.diff(k_s)) + 1
    starts = np.concatenate(([0], bounds))
    d_s, t_s, o_s, l_s = docids[order], tfs[order], occs[order], lens[order]
    cf_b = np.add.reduceat(o_s, starts)
    df_b = np.diff(np.concatenate((starts, [k_s.size])))
    return pd.DataFrame(
        {
            "term": np.asarray(uniq, dtype=object)[(k_s[starts] // nb)],
            "block": k_s[starts] % nb,
            "docids": np.split(d_s, bounds),
            "tfs": [a.astype(np.int32) for a in np.split(t_s, bounds)],
            "lens": np.split(l_s, bounds),
            "df_b": df_b.astype(np.int64),
            "cf_b": cf_b.astype(np.int64),
        }
    )


def build_postings(
    docs: DataFrame,
    block_bits: int = 20,
    blocks_per_seg: int = 4096,
    term_filter=None,
) -> tuple[DataFrame, DataFrame]:
    """(docid, terms[], tfs[], doc_len) rows → (postings, term_stats).

    Stage 2 merges each term's blocks (per segment group) in one Arrow
    UDF: concat (blocks are disjoint, ascending docid ranges) + impact
    ordering + vbyte. Terms wider than one segment group become
    multiple postings rows — stop-term splitting.

    Global per-term stats (df, cf) are derived from the *compact*
    segment rows (sum of seg_df/seg_cf), not by re-aggregating the
    exploded posting stream — the expensive stage1 shuffle therefore
    runs exactly once; the stats join is a segments-count-sized
    self-join (AQE broadcasts it when small).
    """
    return segments_from_stage1(
        _stage1(docs, block_bits, term_filter), blocks_per_seg
    )


# target posting-pair count per encode-shuffle partition: large enough
# that per-task overhead amortizes, small enough that a partition's
# decoded arrays stay well inside task memory (3M pairs ≈ 60 MB of
# int64/int32 streams); measured best at both 17.6M pairs / 32 cores
# (→ 1× cores) and 88M pairs / 8 cores (→ 4× cores)
TOKENS_PER_SHUFFLE_PARTITION = 3_000_000


def shuffle_partitions_for_tokens(coll_len: int, parallelism: int) -> int:
    """Partition count for the term-partitioned encode shuffle, sized
    from the collection length (known exactly after the staging pass):
    at least one per core, more when the per-partition pair budget
    demands it — the knob that keeps the big shuffle spill-free at
    10^12 tokens without taxing small corpora with empty tasks."""
    return max(
        parallelism, -(-coll_len // TOKENS_PER_SHUFFLE_PARTITION)
    )


def encode_segments(
    stage1: DataFrame,
    blocks_per_seg: int = 4096,
    registry: list | None = None,
    codec: str = "vbyte",
    stage_dir: str | None = None,
    n_shuffle: int | None = None,
) -> DataFrame:
    """Term-partitioned merge: hash-shuffle the per-(term, block) array
    rows on (term, seg_group), then build every segment of a partition
    in ONE vectorized Arrow pass (mapInPandas + pandas groupby) — the
    per-group Python overhead of applyInPandas would dominate when the
    adaptive segmenting produces 10^5+ segments. Returns the bare
    segment rows (no global df/cf columns — callers that rebuild
    segments but derive df/cf elsewhere, like merge/reorder, stop
    here and skip a useless agg + join).

    ``stage_dir`` (if given) stages the encoded segments to parquet
    instead of a Spark cache. The segment rows carry arrays and a
    binary postings column, which forces the in-memory cache into
    row-based batches — every later projection (the df/cf stats agg,
    the range-layout sampling pass) re-deserializes whole rows,
    measured 2.5-3.9 s per pass at 455k segment rows, while the same
    reads off parquet are column-pruned page scans (~0.3 s). The
    staged file also extends the durable build checkpoint: encode
    never re-runs. ``registry`` (if given) collects the persisted
    intermediate frames so the caller can unpersist once the tables
    are materialized (IndexTables.unpersist / write_index do this)."""
    keyed = stage1.withColumn(
        "seg_group", (F.col("block") / F.lit(blocks_per_seg)).cast("long")
    )
    keyed = (
        keyed.repartition(n_shuffle, "term", "seg_group")
        if n_shuffle
        else keyed.repartition("term", "seg_group")
    )

    def fn(batches):
        import pyarrow as pa

        from atire_spark.kernels.segment import build_segments_arrow

        chunks = list(batches)
        if not chunks:
            return
        rb = build_segments_arrow(pa.Table.from_batches(chunks), codec=codec)
        if rb is not None:
            yield rb

    mapped = keyed.mapInArrow(fn, schema=POSTINGS_SCHEMA)
    if stage_dir is not None:
        path = f"{stage_dir}/segments"
        mapped.write.mode("overwrite").parquet(path)
        return stage1.sparkSession.read.parquet(path)
    stage2 = mapped.persist()
    if registry is not None:
        registry.append(stage2)
    return stage2


def segments_from_stage1(
    stage1: DataFrame,
    blocks_per_seg: int = 4096,
    registry: list | None = None,
    codec: str = "vbyte",
    stage_dir: str | None = None,
    n_shuffle: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """:func:`encode_segments` plus the global df/cf aggregation the
    batch build bakes into every postings row (the reference's
    dictionary cf/df fields travel with the postings here, so the
    scorer reads them without a separate dictionary probe)."""
    stage2 = encode_segments(
        stage1, blocks_per_seg, registry=registry, codec=codec,
        stage_dir=stage_dir, n_shuffle=n_shuffle,
    )
    # the stats row, the range-sampling pass and the join all re-read
    # term_stats — it is tiny (one row per term), so cache it in
    # either mode
    term_stats = stage2.groupBy("term").agg(
        F.sum("seg_df").alias("df"), F.sum("seg_cf").alias("cf")
    ).persist()
    if registry is not None:
        registry.append(term_stats)
    postings = stage2.join(term_stats, "term")
    return postings, term_stats


# ------------------------------------------------- quantized postings (-Q)
QUANT_POSTINGS_SCHEMA = POSTINGS_SCHEMA + ", df long, cf long"


def build_postings_quantized(
    docs: DataFrame,
    n_docs: int,
    mean_doc_len: float,
    block_bits: int = 20,
    blocks_per_seg: int = 4096,
    bits: int = DEFAULT_QUANT_BITS,
    term_filter=None,
) -> tuple[DataFrame, DataFrame, float, float]:
    """Quantized (-Q) build (reference memory_index.c:1541-1589).

    Needs global df per term *before* segment serialisation (the rsv
    depends on it) and the collection-wide min/max rsv, so this path
    runs one extra co-partitioned join (stage1 ⋈ term_stats, both
    already hashed on term — no extra shuffle of the posting payload)
    and one extra scan for the min/max (reference rsv_all_nodes,
    memory_index.c:1570-1580). stage1 is persisted across the two
    passes.
    """
    return quantized_segments_from_stage1(
        _stage1(docs, block_bits, term_filter),
        n_docs,
        mean_doc_len,
        blocks_per_seg,
        bits,
    )


def quantized_segments_from_stage1(
    stage1: DataFrame,
    n_docs: int,
    mean_doc_len: float,
    blocks_per_seg: int = 4096,
    bits: int = DEFAULT_QUANT_BITS,
    registry: list | None = None,
    codec: str = "vbyte",
    qminmax: tuple[float, float] | None = None,
    n_shuffle: int | None = None,
) -> tuple[DataFrame, DataFrame, float, float]:
    # stage1 appears twice in the join DAG (directly and under the
    # stats agg) — persist so it is computed once and served from
    # cache; joined is then consumed by both the min/max pass and the
    # segment build
    stage1 = stage1.persist()
    term_stats = stage1.groupBy("term").agg(
        F.sum("df_b").alias("df"), F.sum("cf_b").alias("cf")
    )
    joined = stage1.join(term_stats.select("term", "df", "cf"), "term").persist()
    if registry is not None:
        registry.extend([stage1, joined])

    if qminmax is not None:
        # precomputed bounds (the checkpointed build computes them in a
        # separate resumable phase, one chunk of terms at a time — the
        # min/max is safely decomposable because term chunking keeps
        # each term's global df inside its chunk)
        qmin, qmax = qminmax
    else:
        mm = _minmax_from_joined(joined, n_docs, mean_doc_len)
        if mm is None:
            # zero postings in the corpus: nothing to quantize; 0/0 keeps
            # quantize_rsv's degenerate single-score path (impact 1)
            qmin = qmax = 0.0
        else:
            qmin, qmax = mm

    keyed = joined.withColumn(
        "seg_group", (F.col("block") / F.lit(blocks_per_seg)).cast("long")
    )
    keyed = (
        keyed.repartition(n_shuffle, "term", "seg_group")
        if n_shuffle
        else keyed.repartition("term", "seg_group")
    )

    k1, b = 0.9, 0.4  # BM25 defaults (ranking_function_bm25.h:14-15)

    def quantizer(tfs: np.ndarray, lens: np.ndarray, dfs: np.ndarray) -> np.ndarray:
        # the quantizer's rank() per posting (ranking_function_bm25.c:
        # 194-209): float32 prior, idf kept even at 0, then trunc-scale.
        # len+1 / mean+1: the index-side ranker reads the memory
        # index's RAW length array, which stores length+1 (the search
        # side subtracts the 1 back) — see kernels/quantize.raw_rsv
        tf_d = tfs.astype(np.float64)
        prior = (
            k1
            * (
                (1.0 - b)
                + b * ((lens.astype(np.float64) + 1.0) / (mean_doc_len + 1.0))
            )
        ).astype(np.float32)
        idf = np.log(np.float64(n_docs) / dfs.astype(np.float64))
        rsv = idf * ((tf_d * (k1 + 1.0)) / (tf_d + prior.astype(np.float64)))
        return quantize_rsv(rsv, qmin, qmax, bits)

    def seg_fn(batches):
        import pyarrow as pa

        from atire_spark.kernels.segment import build_segments_arrow

        chunks = list(batches)
        if not chunks:
            return
        rb = build_segments_arrow(
            pa.Table.from_batches(chunks), quantizer=quantizer, codec=codec
        )
        if rb is not None:
            yield rb

    postings = keyed.mapInArrow(seg_fn, schema=QUANT_POSTINGS_SCHEMA)
    return postings, term_stats, qmin, qmax


def _minmax_from_joined(
    joined: DataFrame, n_docs: int, mean_doc_len: float
) -> tuple[float, float] | None:
    """Collection (min, max) raw rsv over (tfs, lens, df)-joined stage1
    rows (rsv_all_nodes, memory_index.c:1570-1580) — None when empty.
    The single shared kernel behind both the direct -Q build and the
    checkpointed per-chunk phase."""

    def minmax_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mn, mx = np.inf, -np.inf
        for pdf in batches:
            counts = pdf["tfs"].str.len().to_numpy(dtype=np.int64)
            if not counts.sum():
                continue
            # one vectorized rsv over the whole batch's flattened
            # postings (df repeated per posting) — elementwise
            # identical to the per-row evaluation
            rsv = raw_rsv(
                np.concatenate(pdf["tfs"].to_numpy()).astype(np.int64),
                np.concatenate(pdf["lens"].to_numpy()).astype(np.int64),
                np.repeat(pdf["df"].to_numpy(np.int64), counts),
                n_docs,
                mean_doc_len,
            )
            mn = min(mn, float(rsv.min()))
            mx = max(mx, float(rsv.max()))
        if np.isfinite(mn):
            yield pd.DataFrame({"mn": [mn], "mx": [mx]})

    mm = (
        joined.select("tfs", "lens", "df")
        .mapInPandas(minmax_fn, schema="mn double, mx double")
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .collect()[0]
    )
    if mm["mn"] is None:
        return None
    return float(mm["mn"]), float(mm["mx"])


def quant_minmax_from_stage1(
    stage1: DataFrame, n_docs: int, mean_doc_len: float
) -> tuple[float, float] | None:
    """Per-term-chunk (min, max) raw rsv — chunk results compose by
    plain min/max because a term chunk contains every posting of its
    terms (global df stays inside the chunk). stage1 feeds both the
    df aggregation and the probe side of the join, so it is persisted
    across the two consumptions (same shape the direct build caches)."""
    stage1 = stage1.persist()
    try:
        term_stats = stage1.groupBy("term").agg(F.sum("df_b").alias("df"))
        joined = stage1.join(term_stats, "term")
        return _minmax_from_joined(joined, n_docs, mean_doc_len)
    finally:
        stage1.unpersist()


# ---------------------------------------------------------------- build
MAX_SEG_SPAN_DOCS = 1 << 20  # ~1M docs per segment at full scale
MIN_SEG_SPAN_DOCS = 1 << 10


def _adaptive_block_bits(n_docs: int, parallelism: int) -> int:
    """Segment span targets ~parallelism/4 segments for the whole
    corpus at small scale (per-segment fixed costs — row overhead,
    scheduling, impact-header arrays — dominate under ~10^5 docs per
    core; measured at 140k docs / 32 cores: 4-segments-per-core cost
    455k segment rows and was 15-20 % slower to build AND to query
    than this span), capped at ~1M docs so a 10^12-doc collection
    still yields ~10^6 independent docid ranges (the cap, not the
    parallelism floor, governs at cluster scale) and floored so tiny
    corpora don't fragment."""
    target = max(
        MIN_SEG_SPAN_DOCS,
        min(MAX_SEG_SPAN_DOCS, 4 * n_docs // parallelism + 1),
    )
    return max(int(target - 1).bit_length(), 10)


def _cull_predicate(
    n_docs: int,
    cull_cf_singletons: bool,
    cull_df_max: int | None,
    cull_df_proportion: float | None,
    cull_stoplist: str | None,
):
    """Serialise-time term culling (should_prune, memory_index.c:
    782-798): a term is DROPPED when any enabled predicate fires —
    cf == 1 (PRUNE_CF_SINGLETONS), df <= n (PRUNE_DF_SINGLETONS),
    df/N >= p (PRUNE_DF_FREQUENTS), or stop-list membership
    (PRUNE_NCBI_STOPLIST / PRUNE_PUURULA_STOPLIST). Returns a KEEP
    column expression over (term, df, cf), or None if no culling."""
    preds = []
    if cull_cf_singletons:
        preds.append(F.col("cf") == 1)
    if cull_df_max is not None:
        preds.append(F.col("df") <= int(cull_df_max))
    if cull_df_proportion is not None:
        preds.append(
            (F.col("df").cast("double") / F.lit(float(n_docs)))
            >= float(cull_df_proportion)
        )
    if cull_stoplist is not None:
        from atire_spark.kernels.stopwords import stop_set

        preds.append(F.col("term").isin(list(stop_set(cull_stoplist))))
    if not preds:
        return None
    drop = preds[0]
    for p in preds[1:]:
        drop = drop | p
    return ~drop


def puurula_lengths(
    stage1: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    block_bits: int,
    blocks_per_seg: int = 1,
) -> DataFrame:
    """Per-document Puurula length vectors — the reference's -Ilmp /
    -Ilmptfidf serialise step (memory_index.c:1270-1410
    compute_puurula_document_lengths), which stores per-doc aggregates
    as postings of squiggle terms; here they are one row per docid:

    - ``uniq``: distinct terms in the doc (~unique_terms_in_document,
      memory_index.c:1231-1264 — every indexed term counts; the
      reference's "special term" skip only excludes uppercase/tag
      terms, which this engine's lowercasing tokenizer never emits)
    - ``ddl[i]``: floor(1000·Σ_t max(tf − g·tf^g, 0)) for g = i/10
      (~puurula_length_i, memory_index.c:1393-1400; the ×1000 trunc is
      set_puurula_length's 3-decimal quantization, memory_index.h:220)
    - ``tfidf_len``: floor(1000·Σ_t w_t), w_t = ln(1 + tf/uniq)·
      ln(N/df) (~puurula_tfidf_length, memory_index.c:1311-1315)
    - ``tfidf_ddl[i]``: floor(1000·Σ_t max(w_t − gg·w_t^gg, 0)) for
      gg = i/1000 (~puurula_tfidf_powerlaw_length_i — the reference's
      TFIDF powerlaw discount really is g/1000, memory_index.c:1317)

    Sums are rounded to 9 dp before the ×1000 trunc so the engine and
    the DuckDB oracle agree regardless of float addition order (the
    reference's own sum order — hash-table traversal — is not
    reproducible anyway).

    ``seg_group`` is the same pure function of docid the segment
    builder uses, so a cogroup on it co-locates each doc's aux row
    with every segment that can score it.
    """
    ex = stage1.select(
        "term", F.explode(F.arrays_zip("docids", "tfs")).alias("z")
    ).select(
        "term",
        F.col("z.docids").cast("long").alias("docid"),
        F.col("z.tfs").cast("double").alias("tf"),
    )

    def _disc(col, g: float):
        if g == 0.0:
            return col  # max(tf − 0·tf^0, 0) = tf
        return F.greatest(col - g * F.pow(col, F.lit(g)), F.lit(0.0))

    def _q1000(sum_col):
        return F.floor(F.round(sum_col, 9) * 1000.0).cast("long")

    plain = ex.groupBy("docid").agg(
        F.count("*").alias("uniq"),
        *[
            _q1000(F.sum(_disc(F.col("tf"), i / 10.0))).alias(f"ddl_{i}")
            for i in range(10)
        ],
    )
    w = (
        ex.join(term_stats.select("term", "df"), "term")
        .join(plain.select("docid", "uniq"), "docid")
        .withColumn(
            "w",
            F.log(F.lit(1.0) + F.col("tf") / F.col("uniq").cast("double"))
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
        )
    )
    tfidf = w.groupBy("docid").agg(
        _q1000(F.sum("w")).alias("tfidf_len"),
        *[
            _q1000(F.sum(_disc(F.col("w"), i / 1000.0))).alias(f"tddl_{i}")
            for i in range(10)
        ],
    )
    return (
        plain.join(tfidf, "docid")
        .select(
            (F.shiftright("docid", block_bits) / F.lit(blocks_per_seg))
            .cast("long")
            .alias("seg_group"),
            "docid",
            "uniq",
            F.array(*[f"ddl_{i}" for i in range(10)]).alias("ddl"),
            "tfidf_len",
            F.array(*[f"tddl_{i}" for i in range(10)]).alias("tfidf_ddl"),
        )
    )


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    block_bits: int | None = None,
    blocks_per_seg: int = 1,
    quantize_bits: int | str | None = None,
    stage_dir: str | None = None,
    stemmer: str | None = None,
    stop_before_indexing: str | None = None,
    cull_cf_singletons: bool = False,
    cull_df_max: int | None = None,
    cull_df_proportion: float | None = None,
    cull_stoplist: str | None = None,
    puurula: bool = False,
    cjk_bigrams: bool = False,
    cjk_segmenter=None,
    codec: str = "vbyte",
) -> IndexTables:
    """Full build. Returns lazily-evaluated DataFrames; call
    :func:`write_index` to materialize.

    ``block_bits=None`` (default) sizes segments adaptively from the
    corpus size and cluster parallelism (:func:`_adaptive_block_bits`);
    pass an explicit value to pin the layout (tests do).

    ``stage_dir`` holds the per-build staging parquet: the side-written
    token arrays (cleared at the start of every build — they are
    per-run output, not a resume point) and the encoded segment staging
    parquet (written once per build; downstream actions re-read it
    rather than re-encoding). For a RESUMABLE build use
    :func:`atire_spark.checkpoint.build_index_checkpointed`, whose
    workdir is the durable checkpoint. Defaults to a temp dir that must
    outlive the returned lazy DataFrames — after :func:`write_index` it
    can be deleted.

    ``quantize_bits`` switches on the reference's -Q mode (an int bit
    width, or ``"auto"`` for the reference's collection-size formula
    ``(long long)(5.4 + 5.4e-4*sqrt(N))``, memory_index.c:1553-1556):
    postings
    store pre-scored integer impacts instead of saturated tfs, and the
    stats row records (quantized, quant_bits, quant_min, quant_max) —
    the reference's ``~quantized``/``~quantmax``/``~quantmin`` index
    variables (memory_index.c:1562-1580).

    ``stemmer`` (any kernels.stem.STEMMERS name: "s", "porter",
    "paice_husk", "otago", "otago_v2") stems at index time and records the
    stemmer name in the stats row — the reference's ``~stemmer`` index
    variable (memory_index.c:1487-1521); SearchEngine reads it and
    stems query terms with the same stemmer (search_engine.c:775-779).

    ``stop_before_indexing`` removes stop-list tokens before posting
    construction (PRUNE_STOPWORDS_BEFORE_INDEXING — see
    :func:`tokenize_stage` for the doc-length subtlety); the
    ``cull_*`` knobs drop whole terms at serialise time
    (should_prune, memory_index.c:782-798) — doc lengths and
    collection stats are unaffected by culling, exactly like the
    reference where ~length is written before the prune runs.
    """
    import tempfile

    from atire_spark.kernels.stem import STEMMERS

    if stemmer is not None and stemmer not in STEMMERS:
        raise ValueError(
            f"unknown stemmer {stemmer!r} (known: {', '.join(STEMMERS)})"
        )
    if puurula and quantize_bits is not None:
        # the reference's -Q pipeline cannot change ranker afterwards
        # (atire_api.c:472-478), so lmp length vectors would be dead
        raise ValueError("puurula length vectors require an unquantized index")
    from atire_spark.kernels.codecs import CODEC_NAMES

    if codec not in CODEC_NAMES:
        raise ValueError(
            f"unknown postings codec {codec!r}; known: {sorted(CODEC_NAMES)}"
        )
    if stage_dir is None:
        stage_dir = tempfile.mkdtemp(prefix="atire_stage_")

    # ---- pass 1: tokenize ONCE; token arrays go straight to parquet
    # from the workers, only narrow key rows come back to Spark (the
    # payload never crosses Arrow→JVM, never shuffles, never sorts)
    import os as _os

    tokens_dir = f"{stage_dir}/tokens"
    _os.makedirs(tokens_dir, exist_ok=True)
    # a reused stage_dir from a PRIOR build may hold more part files
    # than this run's input has partitions; spark.read.parquet would
    # silently mix the stale parts in (duplicate postings the key
    # check cannot see — the keys table IS overwritten). The token
    # side-write is per-build output, not a resume checkpoint (that is
    # checkpoint.py's workdir), so clear the directory first.
    for stale in _os.listdir(tokens_dir):
        if stale.startswith(("part-", ".part-")):
            _os.remove(f"{tokens_dir}/{stale}")
    from pyspark import StorageLevel

    registry: list = []
    keys = _tokenize_sidewrite(
        transcripts,
        tokens_dir,
        stemmer=stemmer,
        stop_before_indexing=stop_before_indexing,
        cjk_bigrams=cjk_bigrams,
        cjk_segmenter=cjk_segmenter,
    )
    # materialize pass 1 exactly once into the block cache (the rows
    # are three scalar columns — tiny next to the side-written token
    # payload; MEMORY_AND_DISK spills per executor at cluster scale):
    # the range partitioner's sampling pass and the key shuffle then
    # read the cache instead of re-running the tokenizer, with no
    # staging-parquet write+read round-trip on the build's hot path
    keys = keys.persist(StorageLevel.MEMORY_AND_DISK)
    n_keys = keys.count()

    # ---- pass 2: global docid assignment over the narrow keys (a
    # three-scalar-column shuffle; repartitionByRange's sampling pass
    # reads the key cache, not the tokenizer)
    n_parts = max(spark.sparkContext.defaultParallelism, 4)
    key_parts, docmap_rows, n_total, coll_len = _docids_from_keys(
        keys, n_parts, n_keys
    )
    # key_parts (sorted narrow partitions) stays persisted: the docmap
    # is a cheap vectorized stamp over it, recomputed lazily by its
    # two consumers (the pass-3 broadcast collect and the final
    # write_index docmap write) — cheaper than a stage-parquet
    # write+read pair. The pass-1 cache is no longer needed once the
    # sorted partitions are materialized.
    keys.unpersist()
    registry.append(key_parts)
    docmap = docmap_rows

    if block_bits is None:
        block_bits = _adaptive_block_bits(
            max(n_total, 1), spark.sparkContext.defaultParallelism
        )

    # ---- pass 3: join docids onto the side-written token arrays
    # (broadcast under docmap_broadcast_max — no payload shuffle at
    # all; above it, a plain shuffle join = the one payload shuffle
    # any globally-keyed design pays) and build postings
    if n_total == 0:
        tokens = spark.createDataFrame([], SIDE_TOKENS_SCHEMA)
    else:
        tokens = spark.read.parquet(tokens_dir)
    dm_key = docmap.select("conv_id", "turn_idx", "docid")
    if n_total <= docmap_broadcast_max(spark):
        # driver-resident docmap: ship it through the task closure and
        # resolve docids with an indexed pandas lookup inside the
        # stage1 Arrow pass — same rows a JVM broadcast join would
        # build its hash table from, minus the BroadcastExchange and
        # the join stage
        tok_staged = tokens.join(F.broadcast(dm_key), ["conv_id", "turn_idx"]).select(
            "docid", "doc_len", "terms", "occs"
        )
        dm_pdf = dm_key.toPandas()
        stage1 = _stage1_from_tokens(
            tokens.select("conv_id", "turn_idx", "doc_len", "terms", "occs"),
            block_bits,
            docid_pdf=dm_pdf,
        )
    else:
        # at-scale path: the one payload shuffle any globally-keyed
        # design pays
        joined_tokens = tokens.join(dm_key, ["conv_id", "turn_idx"]).select(
            "docid", "doc_len", "terms", "occs"
        )
        tok_staged = joined_tokens
        stage1 = _stage1_from_tokens(joined_tokens, block_bits)

    keep = _cull_predicate(
        max(n_total, 1),
        cull_cf_singletons,
        cull_df_max,
        cull_df_proportion,
        cull_stoplist,
    )
    if quantize_bits is None:
        postings, term_stats = segments_from_stage1(
            stage1,
            blocks_per_seg,
            registry=registry,
            codec=codec,
            stage_dir=stage_dir,
            n_shuffle=shuffle_partitions_for_tokens(
                coll_len, spark.sparkContext.defaultParallelism
            ),
        )
        pre_cull_ts = term_stats
        if keep is not None:
            # culling drops the term's postings AND its dictionary row
            # (serialise skips the node entirely); lengths/stats keep
            # the pre-cull values like the reference's ~length
            postings = postings.filter(keep)
            term_stats = term_stats.filter(keep)
        # documents / collection_len / mean are literals — the staging
        # pass already counted them per bucket, so the stats row costs
        # only the (cached) term_stats count, never a docmap re-scan
        stats = term_stats.agg(F.count("*").alias("unique_terms")).select(
            F.lit(n_total).cast("long").alias("documents"),
            F.lit(coll_len).cast("long").alias("collection_len"),
            F.lit(coll_len / n_total if n_total else 0.0).alias(
                "mean_doc_len"
            ),
            "unique_terms",
            F.lit(0).alias("quantized"),
            F.lit(0).alias("quant_bits"),
            F.lit(0.0).alias("quant_min"),
            F.lit(0.0).alias("quant_max"),
            F.lit(stemmer or "").alias("stemmer"),  # ~stemmer
            F.lit(codec).alias("codec"),
        )
        puu = None
        if puurula:
            # ~uniqueterms + length vectors run before should_prune in
            # the reference serialise (memory_index.c:1538 precedes the
            # per-node prune), so they use the PRE-cull term stats
            puu = puurula_lengths(
                stage1, pre_cull_ts, n_total, block_bits, blocks_per_seg
            )
        return IndexTables(
            docmap=docmap,
            postings=postings,
            stats=stats,
            cached=registry,
            puurula=puu,
            tokenized=tok_staged,
        )

    # the staging pass already counted N and the collection length —
    # the quantizer needs no extra docmap scan; an all-empty corpus
    # has n_docs 0 and the quantizer never runs (no postings)
    n_docs = n_total
    mean_len = coll_len / n_docs if n_docs else 0.0
    if quantize_bits == "auto":
        # memory_index.c:1553-1556: bits = (long long)(5.4 +
        # 5.4e-4*sqrt(df)) where df is the ~length squiggle node's
        # document frequency — i.e. the collection size (Crane,
        # Trotman & O'Keefe, CIKM 2013: maintaining discriminatory
        # power in quantized indexes)
        import math

        quantize_bits = int(5.4 + 5.4e-4 * math.sqrt(n_docs))
    postings, term_stats, qmin, qmax = quantized_segments_from_stage1(
        stage1,
        n_docs,
        mean_len,
        blocks_per_seg,
        quantize_bits,
        registry=registry,
        codec=codec,
        n_shuffle=shuffle_partitions_for_tokens(
            coll_len, spark.sparkContext.defaultParallelism
        ),
    )
    if keep is not None:
        # quantization bounds (min/max rsv) are computed over ALL terms
        # before the prune, as in the reference's serialise order
        # (rsv_all_nodes runs before should_prune per node)
        postings = postings.filter(keep)
        term_stats = term_stats.filter(keep)
    stats = term_stats.agg(F.count("*").alias("unique_terms")).select(
        F.lit(n_docs).cast("long").alias("documents"),
        F.lit(coll_len).cast("long").alias("collection_len"),
        F.lit(mean_len).alias("mean_doc_len"),
        "unique_terms",
        F.lit(1).alias("quantized"),
        F.lit(quantize_bits).alias("quant_bits"),
        F.lit(qmin).alias("quant_min"),
        F.lit(qmax).alias("quant_max"),
        F.lit(stemmer or "").alias("stemmer"),  # ~stemmer
        F.lit(codec).alias("codec"),
    )
    return IndexTables(
        docmap=docmap,
        postings=postings,
        stats=stats,
        cached=registry,
        tokenized=tok_staged,
    )


# ---------------------------------------------------------------- storage
def write_index(tables: IndexTables, path: str, mode: str = "overwrite") -> None:
    """Materialize to a directory of parquet tables.

    Postings are RANGE-partitioned by (term, seg_group), not hashed:
    hash placement makes every file span the whole term range, so
    file-level min/max stats can never exclude a file and a query's
    pushed term filter only prunes row groups after paying a footer
    read per file. Range clustering keeps each term's rows in one or
    a few adjacent files (a head term's segments may straddle a file
    boundary — min/max stays tight either way), which is exactly the
    layout an Iceberg sort-order would give; at 10^12 docs the
    manifest min/max then skips files at planning time instead of at
    scan time. Measured at 140k turns / 10k vocab: 10-20 % lower
    query latency than the hash layout on 1- and 5-term queries.
    """
    tables.docmap.write.mode(mode).parquet(f"{path}/docmap")
    tables.postings.repartitionByRange("term", "seg_group").sortWithinPartitions(
        "term", "seg_group"
    ).write.mode(mode).parquet(f"{path}/postings")
    tables.stats.write.mode(mode).parquet(f"{path}/stats")
    if tables.puurula is not None:
        # clustered on seg_group so the query-side cogroup reads
        # contiguous files per group (Iceberg: partition/sort on it)
        tables.puurula.repartition("seg_group").sortWithinPartitions(
            "seg_group", "docid"
        ).write.mode(mode).parquet(f"{path}/puurula")
    tables.unpersist()  # build intermediates no longer needed


def load_index(spark: SparkSession, path: str) -> IndexTables:
    # existence-probe the optional puurula side table instead of
    # catch-reading it: a read of a missing path makes py4j print a
    # Java stack trace even when the exception is caught, polluting
    # bench/driver output with a failure that isn't one. Probed via
    # the Hadoop FS API so it works on any cluster filesystem, not
    # just local paths.
    puu_path = f"{path}/puurula"
    jpath = spark._jvm.org.apache.hadoop.fs.Path(puu_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    puu = spark.read.parquet(puu_path) if fs.exists(jpath) else None
    return IndexTables(
        docmap=spark.read.parquet(f"{path}/docmap"),
        postings=spark.read.parquet(f"{path}/postings"),
        stats=spark.read.parquet(f"{path}/stats"),
        puurula=puu,
    )
