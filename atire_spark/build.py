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

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atire_spark.kernels.impact import impact_order
from atire_spark.kernels.quantize import DEFAULT_QUANT_BITS, quantize_rsv, raw_rsv
from atire_spark.kernels.tokenizer import tokenize_batch

TF_CAP = 255  # memory_index_hash_node.h:140-143

TOKENIZED_SCHEMA = (
    "conv_id string, turn_idx int, doc_len long, terms array<string>, "
    "tfs array<int>, occs array<int>"
)
DOCMAP_SCHEMA = "docid long, conv_id string, turn_idx int, doc_len long"
POSTINGS_SCHEMA = (
    "term string, seg_group long, seg_df long, seg_cf long, first_docid long, "
    "max_impact int, impacts array<int>, doc_counts array<int>, offsets array<long>, "
    "byte_offsets array<long>, postings binary, doc_lens binary, n_postings long"
)


@dataclass
class IndexTables:
    docmap: DataFrame
    postings: DataFrame  # + global df, cf joined on
    stats: DataFrame  # single row
    build_log: DataFrame | None = None


# ----------------------------------------------------------- tokenize
def tokenize_stage(transcripts: DataFrame) -> DataFrame:
    """Per-turn tokenization + per-doc term counts, one Arrow pass.

    Output: one row per turn with (terms[], tfs[]) already aggregated
    per document (the reference's memory_index_one per-doc hash) and
    doc_len = surviving WORD+NUMBER token count.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            toks, lens = tokenize_batch(pdf["text"])
            flat = toks.explode().dropna()
            if flat.empty:
                terms = [[] for _ in range(len(pdf))]
                tfs = [[] for _ in range(len(pdf))]
                occs = [[] for _ in range(len(pdf))]
            else:
                cnt = (
                    pd.DataFrame({"row": flat.index, "term": flat.to_numpy()})
                    .groupby(["row", "term"], sort=True)
                    .size()
                    .reset_index(name="occ")
                )
                # stored tf saturates (memory_index_hash_node.h:140-143);
                # collection frequency keeps counting every occurrence
                # (memory_index_hash_node.h:64-65)
                cnt["tf"] = np.minimum(cnt["occ"], TF_CAP)
                t_lists = cnt.groupby("row")["term"].agg(list)
                f_lists = cnt.groupby("row")["tf"].agg(list)
                o_lists = cnt.groupby("row")["occ"].agg(list)
                terms = [t_lists.get(i, []) for i in range(len(pdf))]
                tfs = [f_lists.get(i, []) for i in range(len(pdf))]
                occs = [o_lists.get(i, []) for i in range(len(pdf))]
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

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        fn, schema=TOKENIZED_SCHEMA
    )


# ---------------------------------------------------------- docid assignment
def assign_docids(tokenized: DataFrame, num_ranges: int | None = None) -> DataFrame:
    """Dense 0-based docids by stable (conv_id, turn_idx) order; empty
    docs are dropped first so they never consume an id
    (reference atire/index.c:533-540).

    Scalable two-pass: range-partition + sort, count per partition,
    then per-partition offset + local index — no global window, no
    driver collect of data (only P partition counts).
    """
    non_empty = tokenized.filter(F.col("doc_len") > 0)
    n_parts = num_ranges or max(non_empty.sparkSession.sparkContext.defaultParallelism, 4)
    parts = non_empty.repartitionByRange(
        n_parts, "conv_id", "turn_idx"
    ).sortWithinPartitions("conv_id", "turn_idx")
    parts = parts.persist()

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
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def docid_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            pdf.insert(0, "docid", base + seen + np.arange(len(pdf), dtype=np.int64))
            seen += len(pdf)
            yield pdf

    return parts.mapInPandas(docid_fn, schema="docid long, " + TOKENIZED_SCHEMA)


# ---------------------------------------------------------- postings build
def _make_segment_fn(schema_cols: list[str]):
    def make_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, seg_group = key
        pdf = pdf.sort_values("block")
        docids = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["docids"]])
        tfs = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["tfs"]])
        lens = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["lens"]])
        seg = impact_order(docids, tfs, lens)
        row = {
            "term": term,
            "seg_group": seg_group,
            "seg_df": int(docids.size),
            "seg_cf": int(pdf["cf_b"].sum()),  # uncapped occurrences
            "first_docid": int(docids[0]),
            "max_impact": seg.max_impact,
            "impacts": seg.impacts.tolist(),
            "doc_counts": seg.doc_counts.tolist(),
            "offsets": seg.offsets.tolist(),
            "byte_offsets": seg.byte_offsets.tolist(),
            "postings": seg.postings,
            "doc_lens": seg.doc_lens,
            "n_postings": seg.n_postings,
        }
        return pd.DataFrame([row], columns=schema_cols)

    return make_segment


def _stage1(docs: DataFrame, block_bits: int, term_filter=None) -> DataFrame:
    """(docid, terms[], tfs[], doc_len) rows → per-(term, docid-block)
    posting arrays. JVM-side collect_list + sort_array keeps the heavy
    grouping inside whole-stage codegen / Tungsten; per-block lists are
    bounded by 2**block_bits docs so no single reducer sees an
    unbounded stop-term list."""
    tok = docs.select(
        "docid",
        "doc_len",
        F.explode(F.arrays_zip("terms", "tfs", "occs")).alias("p"),
    ).select(
        "docid",
        "doc_len",
        F.col("p.terms").alias("term"),
        F.col("p.tfs").alias("tf"),
        F.col("p.occs").alias("occ"),
    )
    if term_filter is not None:
        # checkpointed builds process deterministic term-hash chunks
        tok = tok.filter(term_filter("term"))
    tok = tok.withColumn("block", F.shiftrightunsigned("docid", block_bits))

    plist = F.sort_array(F.collect_list(F.struct("docid", "tf", "doc_len")))
    stage1 = (
        tok.groupBy("term", "block")
        .agg(
            plist.alias("pl"),
            F.count("*").alias("df_b"),
            F.sum("occ").alias("cf_b"),
        )
        .select(
            "term",
            "block",
            F.expr("transform(pl, x -> x.docid)").alias("docids"),
            F.expr("transform(pl, x -> x.tf)").alias("tfs"),
            F.expr("transform(pl, x -> x.doc_len)").alias("lens"),
            "df_b",
            "cf_b",
        )
    )
    return stage1


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
    """
    stage1 = _stage1(docs, block_bits, term_filter)

    term_stats = stage1.groupBy("term").agg(
        F.sum("df_b").alias("df"), F.sum("cf_b").alias("cf")
    )

    schema_cols = [c.split(" ")[0] for c in POSTINGS_SCHEMA.split(", ")]
    stage2 = (
        stage1.withColumn(
            "seg_group", (F.col("block") / F.lit(blocks_per_seg)).cast("long")
        )
        .groupBy("term", "seg_group")
        .applyInPandas(_make_segment_fn(schema_cols), schema=POSTINGS_SCHEMA)
    )
    postings = stage2.join(term_stats, "term")
    return postings, term_stats


# ------------------------------------------------- quantized postings (-Q)
QUANT_POSTINGS_SCHEMA = POSTINGS_SCHEMA + ", df long, cf long"


def _make_quantized_segment_fn(
    schema_cols: list[str],
    n_docs: int,
    mean_doc_len: float,
    qmin: float,
    qmax: float,
    bits: int,
):
    def make_segment(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, seg_group = key
        pdf = pdf.sort_values("block")
        docids = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["docids"]])
        tfs = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["tfs"]])
        lens = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["lens"]])
        df_t = int(pdf["df"].iloc[0])
        rsv = raw_rsv(tfs, lens, df_t, n_docs, mean_doc_len)
        impacts = quantize_rsv(rsv, qmin, qmax, bits)
        seg = impact_order(docids, impacts, lens)
        row = {
            "term": term,
            "seg_group": seg_group,
            "seg_df": int(docids.size),
            "seg_cf": int(pdf["cf_b"].sum()),
            "first_docid": int(docids[0]),
            "max_impact": seg.max_impact,
            "impacts": seg.impacts.tolist(),
            "doc_counts": seg.doc_counts.tolist(),
            "offsets": seg.offsets.tolist(),
            "byte_offsets": seg.byte_offsets.tolist(),
            "postings": seg.postings,
            "doc_lens": seg.doc_lens,
            "n_postings": seg.n_postings,
            "df": df_t,
            "cf": int(pdf["cf"].iloc[0]),
        }
        return pd.DataFrame([row], columns=schema_cols)

    return make_segment


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
    stage1 = _stage1(docs, block_bits, term_filter).persist()
    term_stats = stage1.groupBy("term").agg(
        F.sum("df_b").alias("df"), F.sum("cf_b").alias("cf")
    )
    joined = stage1.join(term_stats.select("term", "df", "cf"), "term")

    def minmax_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mn, mx = np.inf, -np.inf
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                rsv = raw_rsv(
                    np.asarray(row.tfs, dtype=np.int64),
                    np.asarray(row.lens, dtype=np.int64),
                    int(row.df),
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
    qmin, qmax = float(mm["mn"]), float(mm["mx"])

    schema_cols = [c.split(" ")[0] for c in QUANT_POSTINGS_SCHEMA.split(", ")]
    postings = (
        joined.withColumn(
            "seg_group", (F.col("block") / F.lit(blocks_per_seg)).cast("long")
        )
        .groupBy("term", "seg_group")
        .applyInPandas(
            _make_quantized_segment_fn(
                schema_cols, n_docs, mean_doc_len, qmin, qmax, bits
            ),
            schema=QUANT_POSTINGS_SCHEMA,
        )
    )
    return postings, term_stats, qmin, qmax


# ---------------------------------------------------------------- build
def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    block_bits: int = 20,
    blocks_per_seg: int = 4096,
    quantize_bits: int | None = None,
) -> IndexTables:
    """Full build. Returns lazily-evaluated DataFrames; call
    :func:`write_index` to materialize.

    ``quantize_bits`` switches on the reference's -Q mode: postings
    store pre-scored integer impacts instead of saturated tfs, and the
    stats row records (quantized, quant_bits, quant_min, quant_max) —
    the reference's ``~quantized``/``~quantmax``/``~quantmin`` index
    variables (memory_index.c:1562-1580).
    """
    tokenized = tokenize_stage(transcripts)
    docs = assign_docids(tokenized)
    docs = docs.persist()

    docmap = docs.select("docid", "conv_id", "turn_idx", "doc_len")

    if quantize_bits is None:
        postings, term_stats = build_postings(docs, block_bits, blocks_per_seg)
        stats = (
            docs.agg(
                F.count("*").alias("documents"),
                F.sum("doc_len").alias("collection_len"),
                (F.sum("doc_len") / F.count("*")).alias("mean_doc_len"),
            )
            .crossJoin(term_stats.agg(F.count("*").alias("unique_terms")))
            .select(
                "*",
                F.lit(0).alias("quantized"),
                F.lit(0).alias("quant_bits"),
                F.lit(0.0).alias("quant_min"),
                F.lit(0.0).alias("quant_max"),
            )
        )
        return IndexTables(docmap=docmap, postings=postings, stats=stats)

    # quantized build needs N and mean length up front
    row = docs.agg(
        F.count("*").alias("n"), F.sum("doc_len").alias("s")
    ).collect()[0]
    n_docs, coll_len = int(row["n"]), int(row["s"])
    mean_len = coll_len / n_docs
    postings, term_stats, qmin, qmax = build_postings_quantized(
        docs, n_docs, mean_len, block_bits, blocks_per_seg, quantize_bits
    )
    stats = term_stats.agg(F.count("*").alias("unique_terms")).select(
        F.lit(n_docs).cast("long").alias("documents"),
        F.lit(coll_len).cast("long").alias("collection_len"),
        F.lit(mean_len).alias("mean_doc_len"),
        "unique_terms",
        F.lit(1).alias("quantized"),
        F.lit(quantize_bits).alias("quant_bits"),
        F.lit(qmin).alias("quant_min"),
        F.lit(qmax).alias("quant_max"),
    )
    return IndexTables(docmap=docmap, postings=postings, stats=stats)


# ---------------------------------------------------------------- storage
def write_index(tables: IndexTables, path: str, mode: str = "overwrite") -> None:
    """Materialize to a directory of parquet tables.

    Postings are repartitioned by term so a query's term filter prunes
    files (the Iceberg deployment would instead cluster/bucket on term;
    parquet + min/max stats gives the sandbox equivalent).
    """
    tables.docmap.write.mode(mode).parquet(f"{path}/docmap")
    tables.postings.repartition("term").sortWithinPartitions("term").write.mode(
        mode
    ).parquet(f"{path}/postings")
    tables.stats.write.mode(mode).parquet(f"{path}/stats")


def load_index(spark: SparkSession, path: str) -> IndexTables:
    return IndexTables(
        docmap=spark.read.parquet(f"{path}/docmap"),
        postings=spark.read.parquet(f"{path}/postings"),
        stats=spark.read.parquet(f"{path}/stats"),
    )
