"""Build-side static pruning — the reference's ``-K<n>`` index-time
trim (atire/indexer_param_block.c ``-K``; memory_index.c:536-573).

Semantics (memory_index.c:545-546): each term's impact-ordered
posting list is cut at EXACTLY ``k`` postings — the quantum containing
the k-th posting is truncated mid-group (``pruned_point =
pointer[bucket] + (static_prune_point - sum)``), keeping that
quantum's lowest docids. The global order is (impact desc, docid asc
within an impact), so the kept set is identical to the read-side
``-K`` trim's first-k set — the difference is that this bakes the cut
into the stored index and records the trim point, the reference's
``~trimpoint`` index variable (memory_index.c:1520-1521).

Spark-first shape — header-driven, no full decode:

1. explode the per-segment impact headers to (term, seg_group,
   quantum) rows and run ONE window over each term's quantums in
   global impact order (impact desc, segment first_docid asc — a
   term's segments hold disjoint ascending docid ranges, so that IS
   the reference's global order): ``n_keep = clamp(k − postings
   before this quantum, 0, count)``;
2. segments whose quantums survive intact pass through untouched
   (byte-identical rows — the common case: every term with df ≤ k);
3. a touched segment keeps a PREFIX of its quantums (higher impacts
   survive fully, the cut impact partially, lower impacts drop), so
   the rewrite is array/byte slicing: header arrays sliced, the
   posting stream cut at the partial quantum's value boundary (vbyte:
   stop-bit scan; other codecs: re-encode just that quantum's kept
   delta prefix — per-quantum streams are independent, so the splice
   is safe), the doc-length stream cut the same way.

The dictionary-side ``df``/``cf`` (and each segment's pre-prune
``seg_cf``) are left at their collection values, exactly like the
reference where the prune shortens ``impacted_length`` but the
dictionary keeps the true document/collection frequencies — BM25's
idf over a pruned index therefore uses the TRUE df on both engines.
``last_docid`` keeps its pre-prune value as a conservative docid
upper bound (it sizes accumulator ranges; containment is sufficient).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atire_spark.build import QUANT_POSTINGS_SCHEMA, IndexTables

__all__ = ["static_prune_index"]


def _cut_vbyte(buf: bytes, n_values: int) -> int:
    """Byte length of the first ``n_values`` vbyte values (stop bit
    0x80 on each value's last byte)."""
    if n_values <= 0:
        return 0
    arr = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero(arr & 0x80)
    return int(ends[n_values - 1]) + 1


def static_prune_index(
    spark: SparkSession, index: IndexTables, k: int
) -> IndexTables:
    """Return a new :class:`IndexTables` with every term's postings
    statically pruned to its first ``k`` in global impact order, and
    ``trim_point`` recorded on the stats row (the ``~trimpoint``
    variable)."""
    if k <= 0:
        raise ValueError(f"static prune point must be positive, got {k}")
    srow = index.stats.collect()[0].asDict()
    codec = srow.get("codec") or "vbyte"

    hdr = index.postings.select(
        "term",
        "seg_group",
        "first_docid",
        F.posexplode(F.arrays_zip("impacts", "doc_counts")).alias("qidx", "z"),
    ).select(
        "term",
        "seg_group",
        "qidx",
        F.col("z.impacts").alias("impact"),
        F.col("z.doc_counts").cast("long").alias("cnt"),
        "first_docid",
    )
    w = Window.partitionBy("term").orderBy(
        F.col("impact").desc(), F.col("first_docid").asc()
    )
    cum_before = F.coalesce(
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    keeps = hdr.withColumn(
        "n_keep",
        F.greatest(F.lit(0), F.least(F.col("cnt"), F.lit(int(k)) - cum_before)),
    )
    seg_keeps = keeps.groupBy("term", "seg_group").agg(
        F.sum("n_keep").alias("kept_total"),
        F.sum("cnt").alias("seg_total"),
        F.collect_list(F.struct("qidx", "n_keep")).alias("qkeeps"),
    )
    joined = index.postings.join(seg_keeps, ["term", "seg_group"])
    aux = ["kept_total", "seg_total", "qkeeps"]
    untouched = joined.filter(
        F.col("kept_total") == F.col("seg_total")
    ).drop(*aux)
    touched = joined.filter(
        (F.col("kept_total") < F.col("seg_total")) & (F.col("kept_total") > 0)
    )

    def slice_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from atire_spark.kernels.codecs import get_codec

        cdc = None if codec == "vbyte" else get_codec(codec)
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for row in pdf.itertuples(index=False):
                imp = np.asarray(row.impacts, dtype=np.int64)
                cnts = np.asarray(row.doc_counts, dtype=np.int64)
                boffs = np.asarray(row.byte_offsets, dtype=np.int64)
                poffs = np.asarray(row.offsets, dtype=np.int64)
                nk = np.zeros(imp.size, dtype=np.int64)
                for q in row.qkeeps:
                    nk[int(q["qidx"])] = int(q["n_keep"])
                kept_q = int(np.count_nonzero(nk))
                # global impact order makes the kept set a quantum
                # PREFIX of every segment
                assert kept_q > 0 and (nk[:kept_q] > 0).all()
                last = kept_q - 1
                partial = nk[last] < cnts[last]
                pbytes = bytes(row.postings)
                qstart = int(boffs[last])
                qend = int(boffs[last + 1]) if last + 1 < boffs.size else len(pbytes)
                if not partial:
                    cut = qend
                    new_tail = b""
                elif cdc is None:
                    cut = qstart + _cut_vbyte(
                        pbytes[qstart:qend], int(nk[last])
                    )
                    new_tail = b""
                else:
                    # non-vbyte codecs pack words: re-encode the cut
                    # quantum's kept delta prefix (streams restart per
                    # quantum, so the splice is self-contained)
                    deltas = cdc.decode_group(
                        pbytes[qstart:qend], int(cnts[last])
                    )[: int(nk[last])]
                    blob, _ = cdc.encode_groups(
                        np.asarray(deltas, dtype=np.int64),
                        np.array([0], dtype=np.int64),
                    )
                    cut = qstart
                    new_tail = bytes(blob)
                kept_total = int(nk.sum())
                lbytes = bytes(row.doc_lens)
                lcut = _cut_vbyte(lbytes, kept_total)
                new_counts = cnts[:kept_q].copy()
                new_counts[last] = nk[last]
                out.append(
                    {
                        "term": row.term,
                        "seg_group": row.seg_group,
                        "seg_df": kept_total,
                        "seg_cf": row.seg_cf,  # dictionary semantics
                        "first_docid": row.first_docid,
                        "last_docid": row.last_docid,  # upper bound
                        "max_impact": row.max_impact,
                        "impacts": imp[:kept_q].astype(np.int32).tolist(),
                        "doc_counts": new_counts.astype(np.int32).tolist(),
                        "offsets": poffs[:kept_q].tolist(),
                        "byte_offsets": boffs[:kept_q].tolist(),
                        "postings": pbytes[:cut] + new_tail,
                        "doc_lens": lbytes[:lcut],
                        "n_postings": kept_total,
                        "df": row.df,
                        "cf": row.cf,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    pruned = touched.mapInPandas(slice_fn, schema=QUANT_POSTINGS_SCHEMA)
    postings = untouched.select(*pruned.columns).unionByName(pruned)
    stats = index.stats.withColumn("trim_point", F.lit(int(k)))
    return IndexTables(
        docmap=index.docmap, postings=postings, stats=stats,
        puurula=index.puurula,
    )
