"""Docid reassignment — the ``atire_reorder`` binary.

The reference tool takes an index plus a file listing document names
in a NEW order, builds ``mapping[old docid] = new docid``, and
rewrites the whole index — filename index, ``~length`` vector and
every posting list — under the permuted ids
(atire/atire_reorder.c:382-560; the doc-count mismatch guard at
:434-436).  Docid reordering is the classic compression/locality lever:
clustering similar documents shrinks the deltas inside posting groups.

Spark-first shape (no per-posting rows anywhere):

1. decode each stored segment into per-(old-block) array rows — a
   map over the postings table;
2. cogroup those rows with the mapping slice covering the same old
   docid block (``applyInPandas`` cogroup keyed on ``oblock``), apply
   the permutation vectorized, and re-split at NEW block boundaries;
3. rebuild impact-ordered compressed segments with the ordinary
   serialise path (:func:`atire_spark.build.segments_from_stage1`).

Two array-row shuffles total (by old block, then by (term, new
seg_group)) — the unavoidable cost of an arbitrary permutation; the
mapping ships once per docid block, never once per term.  Global
df/cf and the stats row are permutation-invariant and pass through
from the source index's own metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atire_spark.build import (
    POSTINGS_SCHEMA,
    STAGE1_SCHEMA,
    IndexTables,
    encode_segments,
)
from atire_spark.kernels.impact import decode_segment

__all__ = ["reorder_index", "order_from_doclist"]

#: old-docid block width for the mapping cogroup — 2^20 docids per
#: group keeps each Arrow mapping slice ~8 MB at web scale
_OBLOCK_BITS = 20


def order_from_doclist(docmap: DataFrame, doclist: DataFrame) -> DataFrame:
    """Build the (docid, new_docid) mapping from a doclist of external
    ids in the NEW order — the reference's input format (a file of
    document names, one per line, atire_reorder.c:429-460).

    ``doclist`` columns: (conv_id, turn_idx, new_docid).
    """
    return docmap.select("docid", "conv_id", "turn_idx").join(
        doclist, ["conv_id", "turn_idx"]
    ).select("docid", "new_docid")


def reorder_index(
    spark: SparkSession,
    index: IndexTables,
    new_order: DataFrame,
    blocks_per_seg: int = 16,
    block_bits: int = 20,
) -> IndexTables:
    """Rewrite ``index`` under the docid permutation ``new_order``
    ((docid, new_docid) rows).  ``block_bits``/``blocks_per_seg`` are
    the OUTPUT serialise geometry (as in
    :func:`atire_spark.merge.merge_indexes`); the input index's
    geometry is irrelevant — step 1 re-blocks from decoded docids.
    """
    srow = index.stats.collect()[0].asDict()
    if int(srow.get("quantized", 0) or 0):
        raise ValueError(
            "cannot reorder a quantized index: the rebuild path "
            "re-serialises from tf impacts; reorder before -Q (the "
            "scores themselves are permutation-invariant)"
        )
    codec = srow.get("codec") or "vbyte"
    n_docs = int(srow["documents"])

    # permutation guard — the reference exits on a count mismatch
    # (atire_reorder.c:434-436); we also reject non-bijections, which
    # the C silently scrambles
    chk = new_order.agg(
        F.count("*").alias("n"),
        F.countDistinct("new_docid").alias("nd"),
        F.min("new_docid").alias("lo"),
        F.max("new_docid").alias("hi"),
    ).collect()[0]
    if not (
        chk["n"] == n_docs
        and chk["nd"] == n_docs
        and chk["lo"] == 0
        and chk["hi"] == n_docs - 1
    ):
        raise ValueError(
            f"new_order is not a permutation of 0..{n_docs - 1}: "
            f"rows={chk['n']} distinct={chk['nd']} "
            f"range=[{chk['lo']}, {chk['hi']}]"
        )

    docmap = (
        index.docmap.join(new_order, "docid")
        .drop("docid")
        .withColumnRenamed("new_docid", "docid")
        .select("docid", "conv_id", "turn_idx", "doc_len")
    )

    # ---- step 1: segments → per-old-block array rows ----------------
    def explode_blocks(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for row in pdf.itertuples(index=False):
                d, t, l = decode_segment(
                    np.asarray(row.impacts),
                    np.asarray(row.doc_counts),
                    row.postings,
                    row.doc_lens,
                    codec=codec,
                    byte_offsets=np.asarray(
                        row.byte_offsets, dtype=np.int64
                    ),
                )
                d = d.astype(np.int64)
                order = np.argsort(d, kind="stable")
                d, t, l = d[order], t[order], l[order]
                ob = d >> _OBLOCK_BITS
                cut = np.flatnonzero(np.diff(ob)) + 1
                for s, e in zip(
                    np.concatenate(([0], cut)),
                    np.concatenate((cut, [d.size])),
                ):
                    rows.append(
                        (
                            int(ob[s]),
                            row.term,
                            d[s:e].tolist(),
                            t[s:e].astype(np.int32).tolist(),
                            l[s:e].tolist(),
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["oblock", "term", "docids", "tfs", "lens"],
                )

    seg_cols = [c.split(" ")[0] for c in POSTINGS_SCHEMA.split(", ")]
    stage_a = index.postings.select(seg_cols).mapInPandas(
        explode_blocks,
        schema=(
            "oblock long, term string, docids array<long>, "
            "tfs array<int>, lens array<long>"
        ),
    )

    # ---- step 2: cogroup with the mapping slice, permute, re-block --
    def remap(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                columns=[
                    "term", "block", "docids", "tfs", "lens",
                    "df_b", "cf_b",
                ]
            )
        m_old = right["docid"].to_numpy(np.int64)
        m_new = right["new_docid"].to_numpy(np.int64)
        o = np.argsort(m_old)
        m_old, m_new = m_old[o], m_new[o]
        rows: list[tuple] = []
        for row in left.itertuples(index=False):
            d = np.asarray(row.docids, dtype=np.int64)
            t = np.asarray(row.tfs, dtype=np.int64)
            l = np.asarray(row.lens, dtype=np.int64)
            nd = m_new[np.searchsorted(m_old, d)]
            order = np.argsort(nd, kind="stable")
            nd, t, l = nd[order], t[order], l[order]
            blocks = nd >> block_bits
            cut = np.flatnonzero(np.diff(blocks)) + 1
            for s, e in zip(
                np.concatenate(([0], cut)),
                np.concatenate((cut, [nd.size])),
            ):
                rows.append(
                    (
                        row.term,
                        int(blocks[s]),
                        nd[s:e].tolist(),
                        t[s:e].astype(np.int32).tolist(),
                        l[s:e].tolist(),
                        int(e - s),
                        int(t[s:e].sum()),
                    )
                )
        return pd.DataFrame(
            rows,
            columns=["term", "block", "docids", "tfs", "lens", "df_b", "cf_b"],
        )

    mapped = new_order.withColumn(
        "oblock", F.shiftright(F.col("docid"), _OBLOCK_BITS).cast("long")
    )
    stage1 = (
        stage_a.groupBy("oblock")
        .cogroup(mapped.groupBy("oblock"))
        .applyInPandas(remap, schema=STAGE1_SCHEMA)
    )

    # ---- step 3: serialise + permutation-invariant global metadata --
    registry: list = []
    # bare segment rows: df/cf is permutation-invariant and re-joined
    # from the ORIGINAL index metadata below, so skip the batch
    # build's df/cf agg over the rebuilt rows
    segs = encode_segments(
        stage1, blocks_per_seg, registry=registry, codec=codec
    )
    term_stats = (
        index.postings.select("term", "seg_df", "seg_cf")
        .groupBy("term")
        .agg(F.sum("seg_df").alias("df"), F.sum("seg_cf").alias("cf"))
    )
    postings = segs.select(seg_cols).join(term_stats, "term")
    return IndexTables(
        docmap=docmap,
        postings=postings,
        stats=index.stats,
        cached=registry,
    )
