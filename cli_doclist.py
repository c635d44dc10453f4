"""Doclist dump — the ``atire_doclist`` binary: print the external
document ids in docid order (atire/atire_doclist.c, "the order in
which they lay in the index").

Usage: python cli_doclist.py --index <workdir> [--output FILE]
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--output", help="write here instead of stdout")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from atire_spark.build import load_index
    from atire_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app="atire_spark_doclist")
    idx = load_index(spark, args.index)
    rows = idx.docmap.orderBy("docid").select(
        "conv_id", "turn_idx"
    ).collect()
    lines = [f"{r['conv_id']}:{r['turn_idx']}" for r in rows]
    if args.output:
        with open(args.output, "w") as fh:
            fh.write("\n".join(lines) + "\n")
    else:
        for ln in lines:
            print(ln)
    spark.stop()


if __name__ == "__main__":
    main()
