"""Index merge — the reference's ``atire_merge`` binary re-expressed.

ATIRE's recipe for collections too large for one indexing pass is
"index the parts separately, then merge" (reference README.md:78-93;
``atire_merge`` walks the part dictionaries in term order,
concatenates each term's postings with a docid offset and re-serialises,
atire/atire_merge.c:563-930). Here :func:`merge_indexes` merges two
independently built indexes (both docid-0-based) into one:

- the right index's docids shift by the left's document count (the
  merge offset, atire_merge.c's ``docid_offset``);
- its segments are decoded, re-blocked against the shifted docids and
  re-serialised through the SAME vectorized segment builder the batch
  build uses — one shuffle of B's postings, A's segments are reused
  byte-for-byte (the scale path never rewrites the big side);
- a term's merged postings simply coexist as multiple segment rows —
  the query side already unions a term's segments (stop-term
  splitting and streaming appends rely on the same property), so no
  per-term concat pass is needed beyond the block rebuild;
- global df/cf are re-aggregated from the segment stats
  (metadata-sized) and joined back, exactly like the batch build.

Like the reference, merging requires compatible indexes: both
unquantized (``-Q`` bakes collection-wide bounds a merge would
invalidate — the reference re-quantises at merge time via its own
serialise settings; rebuild with -Q instead), same codec, same
stemmer.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from atire_spark.build import (
    STAGE1_SCHEMA,
    IndexTables,
    encode_segments,
)
from atire_spark.kernels.impact import decode_segment


def _stats_row(tables: IndexTables) -> dict:
    return tables.stats.collect()[0].asDict()


def merge_indexes(
    spark: SparkSession,
    a: IndexTables,
    b: IndexTables,
    block_bits: int | None = None,
    blocks_per_seg: int = 1,
    stage_dir: str | None = None,
) -> IndexTables:
    """Merge two independently built indexes; ``b``'s docids follow
    ``a``'s (docid offset = a.documents). ``block_bits`` /
    ``blocks_per_seg`` are the serialise-side geometry for the
    re-blocked right side (the reference's merge likewise re-serialises
    with its own parameter block); ``block_bits=None`` (default) sizes
    the right side's segment span adaptively from the COMBINED doc
    count and cluster parallelism, the same rule as the batch build —
    a fixed coarse span made a fold-merged 10M-turn index serialise
    each term's right half into ONE segment, collapsing query-time
    scoring parallelism (measured: a 5-common-term query at 58.8 s vs
    ~5 s after this change). The left side's segments are kept
    as-is — mixed geometries are safe because every path keys
    accumulation by docid and derives a group's docid span from the
    segment rows themselves. ``stage_dir`` stages the re-encoded right
    side to parquet (same trade as the batch build's segment staging:
    column-pruned re-reads + a durable checkpoint instead of a
    row-based executor cache)."""
    sa, sb = _stats_row(a), _stats_row(b)
    for name, row in (("left", sa), ("right", sb)):
        if int(row.get("quantized", 0) or 0):
            raise ValueError(
                f"cannot merge a quantized {name} index: -Q bakes "
                "collection-wide bounds; rebuild the merged collection "
                "with -Q instead (reference re-quantises at merge time)"
            )
    codec_a = sa.get("codec") or "vbyte"
    codec_b = sb.get("codec") or "vbyte"
    if codec_a != codec_b:
        raise ValueError(f"codec mismatch: {codec_a!r} vs {codec_b!r}")
    stem_a, stem_b = sa.get("stemmer") or "", sb.get("stemmer") or ""
    if stem_a != stem_b:
        raise ValueError(
            f"~stemmer mismatch: {stem_a!r} vs {stem_b!r} — the merged "
            "index would silently miss terms on one side"
        )

    n_a = int(sa["documents"])
    n_b = int(sb["documents"])
    # an all-empty side has documents == 0 and a NULL collection_len
    # (sum over zero docmap rows) — a legal index in the split recipe
    # (a part whose range matched nothing); coalesce, don't crash
    coll = int(sa["collection_len"] or 0) + int(sb["collection_len"] or 0)
    n_docs = n_a + n_b
    if block_bits is None:
        from atire_spark.build import _adaptive_block_bits

        block_bits = _adaptive_block_bits(
            max(n_docs, 1), spark.sparkContext.defaultParallelism
        )

    docmap = a.docmap.unionByName(
        b.docmap.withColumn(
            "docid", (F.col("docid") + F.lit(n_a)).cast("long")
        )
    )

    codec = codec_a

    def reblock(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for row in pdf.itertuples(index=False):
                d, t, l = decode_segment(
                    np.asarray(row.impacts),
                    np.asarray(row.doc_counts),
                    row.postings,
                    row.doc_lens,
                    codec=codec,
                    byte_offsets=np.asarray(row.byte_offsets, dtype=np.int64),
                )
                d = d.astype(np.int64) + n_a
                order = np.argsort(d, kind="stable")
                d, t = d[order], t[order]
                l = l[order]
                blocks = d >> block_bits
                cut = np.flatnonzero(np.diff(blocks)) + 1
                for s, e in zip(
                    np.concatenate(([0], cut)),
                    np.concatenate((cut, [d.size])),
                ):
                    rows.append(
                        (
                            row.term,
                            int(blocks[s]),
                            d[s:e].tolist(),
                            t[s:e].astype(np.int32).tolist(),
                            l[s:e].tolist(),
                            int(e - s),
                            int(t[s:e].sum()),
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "term", "block", "docids", "tfs", "lens",
                        "df_b", "cf_b",
                    ],
                )

    stage1_b = b.postings.mapInPandas(reblock, schema=STAGE1_SCHEMA)
    registry: list = []
    # bare segment rows: global df/cf comes from the sides' ORIGINAL
    # metadata below, so the batch build's df/cf agg + join over the
    # rebuilt rows would be dead work here
    b_segs = encode_segments(
        stage1_b, blocks_per_seg, registry=registry, codec=codec,
        stage_dir=stage_dir,
    )

    # canonical segment columns only: a checkpointed index carries an
    # extra `chunk` hive-partition column the rebuilt side doesn't have
    from atire_spark.build import POSTINGS_SCHEMA

    seg_cols = [c.split(" ")[0] for c in POSTINGS_SCHEMA.split(", ")]
    all_segs = a.postings.select(seg_cols).unionByName(
        b_segs.select(seg_cols)
    )
    # global df/cf from BOTH sides' ORIGINAL segment metadata, never
    # from the rebuilt rows: stored postings carry TF_CAP-saturated
    # tfs (memory_index_hash_node.h:140-143 — the reference's postings
    # lose the same information), so re-deriving cf from decoded tfs
    # would undercount terms with >255 occurrences in one doc. The
    # rebuilt right-side rows' per-SEGMENT seg_cf is therefore
    # saturated-approximate (documented limitation, as in the
    # reference's own merged postings); the global df/cf every ranker
    # consumes is exact.
    term_stats = (
        a.postings.select("term", "seg_df", "seg_cf")
        .unionByName(b.postings.select("term", "seg_df", "seg_cf"))
        .groupBy("term")
        .agg(F.sum("seg_df").alias("df"), F.sum("seg_cf").alias("cf"))
    )
    postings = all_segs.join(term_stats, "term")

    stats = term_stats.agg(F.count("*").alias("unique_terms")).select(
        F.lit(n_docs).cast("long").alias("documents"),
        F.lit(coll).cast("long").alias("collection_len"),
        F.lit(coll / n_docs if n_docs else 0.0).alias("mean_doc_len"),
        "unique_terms",
        F.lit(0).alias("quantized"),
        F.lit(0).alias("quant_bits"),
        F.lit(0.0).alias("quant_min"),
        F.lit(0.0).alias("quant_max"),
        F.lit(stem_a).alias("stemmer"),
        F.lit(codec).alias("codec"),
    )
    return IndexTables(
        docmap=docmap, postings=postings, stats=stats, cached=registry
    )
