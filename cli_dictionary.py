"""Dictionary dump — the ``atire_dictionary`` binary.

Walks the vocabulary (optionally a ``[-s start, -e end]`` term range,
atire_dictionary.c:126,167-174), printing ``term df cf`` per term
(``--quiet`` drops the counts), optionally the decoded posting list as
``<docid,impact>`` pairs in impact order (``-p``/``-l``,
atire_dictionary.c:62-66) and the soundex / double-metaphone form of
each term (``-x``/``-d``).

Spark shape: the term range is a pushed range filter (term-sorted
postings files prune on min/max stats); postings decode only under
``--postings``.

Usage:
  python cli_dictionary.py --index <workdir> [--start a --end b]
         [--postings] [--per-line] [--quiet] [--soundex] [--metaphone]
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--start", help="first term of the range (-s)")
    ap.add_argument("--end", help="last term of the range (-e)")
    ap.add_argument(
        "--postings", action="store_true",
        help="print <docid,impact> pairs per term (-p)",
    )
    ap.add_argument(
        "--per-line", action="store_true",
        help="one posting pair per line (-l)",
    )
    ap.add_argument(
        "--quiet", action="store_true", help="term only, no df/cf (-q)"
    )
    ap.add_argument(
        "--soundex", action="store_true", help="append soundex form (-x)"
    )
    ap.add_argument(
        "--metaphone", action="store_true",
        help="append double-metaphone form (-d)",
    )
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from atire_spark.build import load_index
    from atire_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app="atire_spark_dictionary")
    idx = load_index(spark, args.index)

    terms = idx.postings
    if args.start:
        terms = terms.filter(F.col("term") >= args.start)
    if args.end:
        terms = terms.filter(F.col("term") <= args.end)

    stats = (
        terms.groupBy("term")
        .agg(F.first("df").alias("df"), F.first("cf").alias("cf"))
        .orderBy("term")
    )
    rows = stats.collect()

    postings_by_term: dict[str, list[tuple[int, int]]] = {}
    if args.postings:
        import numpy as np

        from atire_spark.kernels.impact import decode_segment

        srow = idx.stats.collect()[0].asDict()
        codec = srow.get("codec") or "vbyte"
        segs = terms.select(
            "term", "seg_group", "impacts", "doc_counts",
            "byte_offsets", "postings",
        ).orderBy("term", "seg_group").collect()
        for seg in segs:
            d, t, _ = decode_segment(
                np.asarray(seg["impacts"]),
                np.asarray(seg["doc_counts"]),
                seg["postings"],
                None,
                codec=codec,
                byte_offsets=np.asarray(seg["byte_offsets"], dtype=np.int64),
            )
            postings_by_term.setdefault(seg["term"], []).extend(
                zip(d.tolist(), t.tolist())
            )

    from atire_spark.kernels.phonetic import double_metaphone, soundex

    for r in rows:
        parts = [r["term"]]
        if args.soundex:
            parts.append(soundex(r["term"]))
        if args.metaphone:
            parts.append(double_metaphone(r["term"])[0])
        if not args.quiet:
            parts.append(str(r["df"]))
            parts.append(str(r["cf"]))
        line = " ".join(parts)
        if args.postings:
            pairs = postings_by_term.get(r["term"], [])
            sep = "\n" if args.per_line else ""
            line += " " + sep.join(f"<{d},{i}>" for d, i in pairs)
        print(line)
    spark.stop()


if __name__ == "__main__":
    main()
