"""spark-submit entry point: BM25 top-k search over a built index.

Usage:
    spark-submit --py-files atire_spark.zip cli_search.py \
        --index /path/index --query "hash join" -k 10

    python cli_search.py --index /tmp/idx --queries-file topics.txt --trec

--queries-file uses the reference's ANT query-file format: one query
per line, ``<id> <terms...>`` (reference atire/atire.c:639-644;
evaluation/topics.51-100.txt is the reference instance). --trec emits a
TREC run file (reference atire_engine_result_set_export_TREC.c).
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="index workdir (from cli_build)")
    ap.add_argument("--query", action="append", default=[], help="query text (repeatable)")
    ap.add_argument("--queries-file", help="ANT-format query file: '<id> <terms...>'")
    ap.add_argument(
        "--topics-format",
        choices=["ant", "trec", "inex"],
        default="ant",
        help="query-file format: raw 'id terms' lines (default), a TREC "
        "topic file, or an INEX topic file (channel_trec/channel_inex)",
    )
    ap.add_argument(
        "--topics-tags",
        default="t",
        help="which topic fields feed the query: combination of "
        "q/t/d/n (TREC) or t/c/d/n (INEX)",
    )
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument(
        "--ranker", choices=["bm25", "termcount", "topsig"], default="bm25"
    )
    ap.add_argument("--conjunctive", action="store_true", help="allterms mode")
    ap.add_argument(
        "--boolean",
        action="store_true",
        help="boolean query mode (AND/OR/NOT/XOR grammar, default op OR)",
    )
    ap.add_argument(
        "--qaat",
        action="store_true",
        help="quantum-at-a-time with block-max DIFF early termination "
        "(quantized index; resets to exact on unquantized)",
    )
    ap.add_argument(
        "--wand",
        action="store_true",
        help="exact block-max WAND: metadata-pass threshold + segment "
        "pivot test, rank-identical to the default path "
        "(quantized index)",
    )
    ap.add_argument("--trec", action="store_true", help="TREC run-file output")
    ap.add_argument(
        "--forum",
        choices=["trec", "inex", "inex_snippet", "inex_efficiency"],
        help="run-file format (the reference's -e): TREC lines, INEX "
        "ad-hoc element XML, INEX snippet XML, INEX efficiency XML",
    )
    ap.add_argument(
        "--output", help="write the run file here (the reference's -o)"
    )
    ap.add_argument("--run-id", default="atire_spark")
    ap.add_argument("--participant-id", default="atire_spark")
    ap.add_argument(
        "--assess",
        help="qrel/assessment file (TREC or INEX format, auto-sniffed) — "
        "evaluate the run like the reference's -a",
    )
    ap.add_argument(
        "--metrics",
        default="MAP,P@10,bpref",
        help="comma-separated metric list for --assess (the -m flags)",
    )
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from atire_spark.build import IndexTables
    from atire_spark.query import SearchEngine
    from atire_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app="atire_spark_search")
    idx = IndexTables(
        docmap=spark.read.parquet(f"{args.index}/docmap"),
        postings=spark.read.parquet(f"{args.index}/postings"),
        stats=spark.read.parquet(f"{args.index}/stats"),
    )
    eng = SearchEngine(spark, idx)

    batch: list[tuple[int, str]] = []
    if args.queries_file:
        if args.topics_format in ("trec", "inex"):
            from atire_spark.topics import (
                read_inex_topics,
                read_trec_topics,
            )

            with open(args.queries_file) as fh:
                text = fh.read()
            reader = (
                read_trec_topics
                if args.topics_format == "trec"
                else read_inex_topics
            )
            batch.extend(reader(text, tags=args.topics_tags))
        else:
            with open(args.queries_file) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    qid, _, terms = line.partition(" ")
                    batch.append((int(qid), terms))
    for i, q in enumerate(args.query, start=len(batch) + 1):
        batch.append((i, q))
    if not batch:
        ap.error("no queries given")

    t0 = time.monotonic()
    if args.ranker == "topsig":
        import json as _json

        from atire_spark.topsig import search_topsig

        with open(f"{args.index}/topsig_meta.json") as fh:
            meta = _json.load(fh)
        sigs = spark.read.parquet(f"{args.index}/topsig")
        res = search_topsig(
            spark, sigs, idx, batch, k=args.k,
            width=meta["width"], density=meta["density"],
        )
    elif args.boolean:
        res = eng.search_boolean(batch, k=args.k)
    elif args.qaat:
        res = eng.search_qaat(batch, k=args.k, early_termination="diff")
    elif args.wand:
        res = eng.search_wand(batch, k=args.k)
    else:
        res = eng.search_batch(
            batch, k=args.k, ranker=args.ranker, conjunctive=args.conjunctive
        )
    mat = eng.materialize(res)
    forum = args.forum or ("trec" if args.trec else None)
    if forum is not None:
        from atire_spark.export import (
            export_inex_efficiency,
            export_inex_element,
            export_inex_snippet,
            export_trec,
        )

        if forum == "trec":
            run = export_trec(mat, run_name=args.run_id).orderBy(
                "query_id", "rank"
            )
        elif forum == "inex":
            run = export_inex_element(
                mat, args.participant_id, args.run_id
            ).orderBy("qid", "r")
        elif forum == "inex_snippet":
            run = export_inex_snippet(
                mat, args.participant_id, args.run_id
            ).orderBy("qid", "r")
        else:
            run = export_inex_efficiency(
                mat, args.participant_id, args.run_id, args.k
            ).orderBy("qid", "r")
        lines = [r["line"] for r in run.select("line").collect()]
        wall = time.monotonic() - t0
        if args.output:
            with open(args.output, "w") as fh:
                fh.write("\n".join(lines) + "\n")
        else:
            for ln in lines:
                print(ln)
    else:
        rows = mat.orderBy("query_id", "rank").collect()
        wall = time.monotonic() - t0
        for r in rows:
            ext_id = f"{r['conv_id']}:{r['turn_idx']}"
            print(
                f"qid={r['query_id']} rank={r['rank']} docid={r['docid']} "
                f"doc={ext_id} rsv_fixed={r['rsv_fixed']} rsv={r['rsv']:.2f}"
            )
    print(f"# {len(batch)} queries in {wall:.3f}s", file=sys.stderr)

    if args.assess:
        from atire_spark.eval import evaluate, qrels_with_docids, read_qrels

        qrels = qrels_with_docids(
            read_qrels(spark, args.assess), idx.docmap
        )
        per_query = evaluate(
            res, qrels, metrics=tuple(args.metrics.split(","))
        ).toPandas()
        for _, row in per_query.iterrows():
            cells = " ".join(
                f"{c}={row[c]:.4f}" for c in per_query.columns if c != "query_id"
            )
            print(f"# eval qid={int(row.query_id)} {cells}", file=sys.stderr)
        means = per_query.drop(columns=["query_id"]).mean()
        print(
            "# eval mean "
            + " ".join(f"{c}={v:.4f}" for c, v in means.items()),
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
