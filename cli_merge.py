"""atire_merge analogue CLI: merge two built indexes into one.

    python cli_merge.py --left /idx/a --right /idx/b --out /idx/merged

The right index's docids follow the left's (reference
atire/atire_merge.c docid offset; recipe README.md:78-93). Both
indexes must be unquantized, same codec, same ~stemmer.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--left", required=True, help="left index dir (docids kept)")
    ap.add_argument("--right", required=True, help="right index dir (docids shifted)")
    ap.add_argument("--out", required=True, help="output index dir")
    ap.add_argument("--block-bits", type=int, default=20)
    ap.add_argument("--blocks-per-seg", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from atire_spark.build import load_index, write_index
    from atire_spark.merge import merge_indexes
    from atire_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app="atire_spark_merge")
    t0 = time.monotonic()
    merged = merge_indexes(
        spark,
        load_index(spark, args.left),
        load_index(spark, args.right),
        block_bits=args.block_bits,
        blocks_per_seg=args.blocks_per_seg,
    )
    write_index(merged, args.out)
    row = load_index(spark, args.out).stats.collect()[0].asDict()
    print(
        json.dumps(
            {
                "out": args.out,
                "wall_sec": round(time.monotonic() - t0, 2),
                "documents": int(row["documents"]),
                "unique_terms": int(row["unique_terms"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
