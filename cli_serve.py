"""Long-running search server — the reference's ``atire -p port`` mode.

Loads an index once into a warm SparkSession + SearchEngine and serves
the reference's line-oriented wire dialect over TCP
(atire/atire.c:333-756; see atire_spark/server.py for the protocol).
``atire_broker``-style frontends (atire_spark/broker.py) can fan out
over several of these.

Usage::

    python cli_serve.py --index /path/to/idx [--docstore /path/to/ds]
        [--host 127.0.0.1] [--port 9876] [--cpus 8]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="serve an index over TCP")
    ap.add_argument("--index", required=True, help="write_index directory")
    ap.add_argument("--docstore", default=None, help="docstore parquet dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9876)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from atire_spark.build import load_index
    from atire_spark.query import SearchEngine
    from atire_spark.server import AtireProtocol, serve_tcp
    from atire_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app="atire_serve")
    engine = SearchEngine(spark, load_index(spark, args.index))
    docstore = (
        spark.read.parquet(args.docstore) if args.docstore else None
    )
    proto = AtireProtocol(
        engine, docstore=docstore, index_filename=args.index,
        doclist_filename=args.docstore or "",
    )
    # warm the plans so the first client query doesn't pay JIT
    engine.search_one("warm", k=1).collect()
    srv, (host, port) = serve_tcp(proto, args.host, args.port)
    print(f"serving {args.index} on {host}:{port} (.quit to stop)")
    try:
        import time as _t

        while not proto.closed:
            _t.sleep(0.5)
    except KeyboardInterrupt:
        pass
    srv.shutdown()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
