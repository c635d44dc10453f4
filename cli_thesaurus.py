"""WordNet → ANT thesaurus compiler CLI — the reference's
``wordnet_to_ant_thesaurus`` tool (tools/wordnet_to_ant_thesaurus.c:
638-687): four positional WordNet database files (data.noun,
data.verb, data.adj, data.adv), output ``wordnet.aspt`` (the tool's
fixed name; ``-o`` overrides).

Usage::

    python cli_thesaurus.py data.noun data.verb data.adj data.adv \
        [-o wordnet.aspt]

Pure driver-side work (the thesaurus is query metadata, like the
reference keeping it resident in RAM) — no Spark session needed.
"""

from __future__ import annotations

import argparse
import sys

from atire_spark.thesaurus import Thesaurus


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="compile WordNet data files into an ANT .aspt thesaurus"
    )
    ap.add_argument("noun", help="data.noun")
    ap.add_argument("verb", help="data.verb")
    ap.add_argument("adj", help="data.adj")
    ap.add_argument("adv", help="data.adv")
    ap.add_argument(
        "-o", "--output", default="wordnet.aspt",
        help="output path (default: wordnet.aspt, the tool's fixed name)",
    )
    args = ap.parse_args(argv)

    texts = {}
    for pos in ("noun", "verb", "adj", "adv"):
        path = getattr(args, pos)
        try:
            with open(path, "r", encoding="utf-8", errors="replace") as fh:
                texts[pos] = fh.read()
        except OSError as exc:
            # the tool exits "Cannot open file:<name>"
            print(f"Cannot open file:{path} ({exc})", file=sys.stderr)
            return 1

    th = Thesaurus.from_wordnet_source(
        noun=texts["noun"], verb=texts["verb"],
        adj=texts["adj"], adv=texts["adv"],
    )
    th.to_ant_file(args.output)
    print(
        f"{args.output}: {len(th.entries)} headwords, "
        f"{sum(len(v) for v in th.entries.values())} relationship rows"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
