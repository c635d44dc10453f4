"""The reference broker's scatter-gather client (atire_broker).

``atire_broker`` fronts N ``atire`` servers speaking the
:mod:`atire_spark.server` wire dialect: a search fans out to every
backend, each backend is asked for its TOP ``first + page_length``
hits, the responses are parsed for ``<numhits>`` and ``<hit>`` blocks
(atire_broke.c:146-193), docids shift into a GLOBAL space by the
cumulative ``docnum`` of preceding backends
(atire_broke.c:183 ``virtual_document_id``), and the merged list sorts
by (rsv desc, global id asc) (atire_engine_result_set.c:145-167)
before re-ranking and serialising the requested page
(atire_engine_result_set.c:180-218).

A backend that fails, or answers without ``<numhits>`` (an
``<ATIREerror>``), simply drops out of the merge
(atire_broke.c:175-181) — the broker degrades instead of failing.

This is the TCP face of the DataFrame-level federation certified in
:mod:`atire_spark.federate` — the merge rules are the same; the tests
pin the two against each other.
"""

from __future__ import annotations

import re
import socket

__all__ = ["BrokerClient", "parse_hits", "merge_results", "serialise"]


def parse_hits(answer: str, docid_base: int) -> list[dict]:
    """atire_engine_result_set.c:60-135 ``add()``: pull every
    ``<hit>`` block's rank/id/name/rsv (title/snippet optional),
    shifting ids by ``docid_base``."""
    out = []
    for block in re.findall(r"<hit>(.*?)</hit>", answer, re.S):
        m = re.search(
            r"<rank>(\d+)</rank><id>(\d+)</id><name>(.*?)</name>"
            r"<rsv>([-0-9.]+)</rsv>",
            block,
            re.S,
        )
        if m is None:
            break  # malformed hit ends the parse, like the C scanner
        hit = {
            "rank": int(m.group(1)),
            "id": int(m.group(2)) + docid_base,
            "name": m.group(3),
            "rsv": float(m.group(4)),
        }
        t = re.search(r"<title>(.*?)</title>", block, re.S)
        s = re.search(r"<snippet>(.*?)</snippet>", block, re.S)
        if t:
            hit["title"] = t.group(1)
        if s:
            hit["snippet"] = s.group(1)
        out.append(hit)
    return out


def merge_results(per_engine: list[list[dict]]) -> list[dict]:
    """Highest rsv first, ties to the LOWEST global id
    (atire_engine_result_set.c:145-167)."""
    allhits = [h for hits in per_engine for h in hits]
    allhits.sort(key=lambda h: (-h["rsv"], h["id"]))
    return allhits


def serialise(
    query: str,
    hits: list[dict],
    overall_hits: int,
    time_taken_ms: int,
    first: int,
    page_length: int,
) -> str:
    """atire_engine_result_set.c:180-218: the merged page rendered in
    the same dialect the backends speak (so brokers stack)."""
    lines = [
        "<ATIREsearch>",
        f"<query>{query}</query><numhits>{overall_hits}</numhits>"
        f"<time>{time_taken_ms}</time>",
    ]
    lo = first - 1
    if lo < len(hits):
        hi = min(lo + page_length, len(hits))
        lines.append("<hits>")
        for rank, h in enumerate(hits[lo:hi], start=lo + 1):
            row = (
                f"<hit><rank>{rank}</rank><id>{h['id']}</id>"
                f"<name>{h['name']}</name><rsv>{h['rsv']:0.2f}</rsv>"
            )
            if "title" in h:
                row += f"<title>{h['title']}</title>"
            if "snippet" in h:
                row += f"<snippet>{h['snippet']}</snippet>"
            lines.append(row + "</hit>")
        lines.append("</hits>")
    lines.append("</ATIREsearch>")
    return "\n".join(lines)


class _Backend:
    """One line-oriented connection to an ``atire``-dialect server."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.rfile = self.sock.makefile("rb")
        self.doc_count = 0

    def request(self, line: str, end_tag: str) -> str:
        self.sock.sendall((line + "\n").encode("utf-8"))
        chunks: list[str] = []
        while True:
            raw = self.rfile.readline()
            if not raw:
                break
            chunk = raw.decode("utf-8", errors="replace")
            chunks.append(chunk)
            if end_tag in chunk:
                break
        return "".join(chunks)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class BrokerClient:
    """Scatter-gather over ``endpoints`` = [(host, port), ...].

    On construction each backend is described
    (``<ATIREdescribeindex>``) to learn its ``docnum`` — the global
    docid base of every LATER backend, exactly the broker's
    ``virtual_document_id`` accumulation (atire_broke.c:183)."""

    def __init__(self, endpoints: list[tuple[str, int]]):
        import time as _t

        self._time = _t
        self.backends: list[_Backend] = []
        for host, port in endpoints:
            b = _Backend(host, port)
            desc = b.request(
                "<ATIREdescribeindex>", "</ATIREdescribeindex>"
            )
            m = re.search(r"<docnum>(\d+)</docnum>", desc)
            b.doc_count = int(m.group(1)) if m else 0
            self.backends.append(b)

    def search(
        self, query: str, first: int = 1, page_length: int = 10
    ) -> str:
        """atire_broke.c:146-193: ask every backend for its top
        ``first + page_length``, merge, serialise the page."""
        t0 = self._time.monotonic()
        per_engine: list[list[dict]] = []
        overall = 0
        base = 0
        for b in self.backends:
            try:
                answer = b.request(
                    f"<ATIREsearch><query>{query}</query><top>1</top>"
                    f"<n>{first + page_length}</n></ATIREsearch>",
                    "</ATIREsearch>",
                )
            except OSError:
                answer = ""
            m = re.search(r"<numhits>(\d+)</numhits>", answer)
            if m is not None:  # error/failed backends drop out
                overall += int(m.group(1))
                per_engine.append(parse_hits(answer, base))
            base += b.doc_count
        merged = merge_results(per_engine)
        ms = int(
            round((self._time.monotonic() - t0) * 1000.0)
        )
        return serialise(query, merged, overall, ms, first, page_length)

    def close(self) -> None:
        for b in self.backends:
            b.close()
