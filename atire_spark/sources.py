"""Document sources beyond a ready-made table — the reference's
directory_iterator family re-expressed as DataFrame readers.

Every reader returns the engine's canonical transcripts shape
``(conv_id string, turn_idx int, text string)`` (one document = one
turn-0 row), so any source feeds the same build pipeline unchanged:

- :func:`read_trec`  — TREC ``<DOC>…</DOC>`` collections
  (directory_iterator_trec_recursive.c, file_buffered.c). Spark-first:
  ``spark.read.text`` with ``lineSep="</DOC>"`` splits the stream at
  document boundaries INSIDE the datasource, so a single multi-GB
  collection file parallelizes across input splits — no
  whole-file-in-memory reader (the reference buffers file chunks for
  the same reason);
- :func:`read_warc`  — WARC web archives
  (directory_iterator_warc.c): ``lineSep`` on the WARC version marker,
  header fields and payload extracted with column expressions;
- :func:`read_tar`   — (optionally compressed) tarballs
  (directory_iterator_tar.c + instream_deflate/bz2): one ``binaryFile``
  row per tarball, members streamed out with the stdlib inside
  ``mapInPandas``. A tarball is inherently a serial stream (the
  reference walks it member-by-member too); parallelism comes from
  MANY tarballs — exactly the reference's Wikipedia recipe
  (22 tar.gz parts, README.md:33-37);
- :func:`read_pkzip` — PKZIP members (directory_iterator_pkzip.c),
  same shape as tar;
- MySQL/JDBC (directory_iterator_mysql.c) needs no wrapper:
  ``spark.read.jdbc(url, query, partitionColumn=…)`` already does
  server-side paging in parallel — the reference pages with
  LIMIT/OFFSET on one connection.

Documents with an empty payload are kept here (the build skips
0-token docs itself, atire/index.c:533-540 semantics).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCE_SCHEMA = "conv_id string, turn_idx int, text string"


def read_trec(
    spark: SparkSession,
    path: str,
    doc_tag: str = "DOC",
    id_tag: str = "DOCNO",
) -> DataFrame:
    """TREC reader: one row per ``<DOC>`` element, conv_id = DOCNO.

    The tag pair is configurable like the reference's
    ``-rtrec:<start>:<end>`` (atire/index.c:414-415). Chunks with no
    opening tag (the tail after the last document) are dropped.
    """
    import re as _re

    # lineSep splits on the LITERAL closing tag; the extraction
    # regexes must therefore match the tags literally too
    dt, it = _re.escape(doc_tag), _re.escape(id_tag)
    chunks = spark.read.text(path, lineSep=f"</{doc_tag}>")
    body = F.regexp_replace(  # strip the wrapper + id element
        F.regexp_replace(
            F.col("value"), f"(?s)<{it}>.*?</{it}>", " "
        ),
        f"</?{dt}>",
        " ",
    )
    return (
        chunks.filter(F.col("value").contains(f"<{doc_tag}>"))
        .select(
            F.regexp_extract(
                "value", f"<{it}>\\s*(.*?)\\s*</{it}>", 1
            ).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.trim(F.regexp_replace(body, r"\s+", " ")).alias("text"),
        )
    )


def read_warc(spark: SparkSession, path: str, version: str = "1.0") -> DataFrame:
    """WARC reader: response/resource records become documents,
    conv_id = WARC-Record-ID (falling back to the target URI).

    A record is ``WARC headers CRLF CRLF [HTTP headers CRLF CRLF]
    payload``; splitting on the version marker keeps the headers with
    their payload. Header blocks are fixed per WARC-Type — ONE for
    resource records (WARC headers only), TWO for response records
    (WARC + HTTP headers) — so the payload is everything from the 2nd
    / 3rd blank-line-separated block TO THE RECORD END, rejoined:
    bodies legitimately contain their own blank lines (HTML,
    multipart) and spec-compliant records end with a trailing
    CRLF CRLF, neither of which may truncate the document
    (directory_iterator_warc.c skips warcinfo/request records the
    same way).
    """
    marker = f"WARC/{version}"
    chunks = spark.read.text(path, lineSep=marker)
    rec_type = F.regexp_extract("value", r"WARC-Type:\s*(\S+)", 1)
    rec_id = F.regexp_extract("value", r"WARC-Record-ID:\s*(\S+)", 1)
    uri = F.regexp_extract("value", r"WARC-Target-URI:\s*(\S+)", 1)
    parts = F.split("value", r"\r\n\r\n")

    def _from_block(i: int):
        # blocks i..end rejoined on the separator they were split on
        return F.array_join(
            F.slice(parts, i, F.greatest(F.size(parts) - i + 1, F.lit(0))),
            "\r\n\r\n",
        )

    payload = F.when(rec_type == "response", _from_block(3)).otherwise(
        _from_block(2)
    )
    return (
        chunks.filter(rec_type.isin("response", "resource"))
        .select(
            F.when(rec_id != "", rec_id).otherwise(uri).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.regexp_replace(payload, r"^\s+|\s+$", "").alias("text"),
        )
    )


def _members_reader(extract):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[str, int, str]] = []
            for _, r in pdf.iterrows():
                rows.extend(extract(r["path"], r["content"]))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["conv_id", "turn_idx", "text"]
                )

    return fn


def read_tar(spark: SparkSession, path: str) -> DataFrame:
    """Tar / tar.gz / tar.bz2 / tar.xz reader: one document per regular
    member, conv_id = ``<archive>!<member>``. Compression is sniffed
    by the stdlib (``mode="r:*"``) like the reference's instream
    chain."""
    import tarfile

    def extract(p: str, buf: bytes):
        with tarfile.open(fileobj=io.BytesIO(buf), mode="r:*") as tf:
            for m in tf:
                if not m.isfile():
                    continue
                fh = tf.extractfile(m)
                if fh is None:
                    continue
                yield (
                    f"{p}!{m.name}",
                    0,
                    fh.read().decode("utf-8", errors="replace"),
                )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_members_reader(extract), schema=SOURCE_SCHEMA)


def read_pkzip(spark: SparkSession, path: str) -> DataFrame:
    """PKZIP reader: one document per member, conv_id =
    ``<archive>!<member>``."""
    import zipfile

    def extract(p: str, buf: bytes):
        with zipfile.ZipFile(io.BytesIO(buf)) as zf:
            for name in zf.namelist():
                if name.endswith("/"):
                    continue
                yield (
                    f"{p}!{name}",
                    0,
                    zf.read(name).decode("utf-8", errors="replace"),
                )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_members_reader(extract), schema=SOURCE_SCHEMA)


def read_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Deflated-TSV reader — the reference's ``-rtsv`` ingestion path
    (atire/index.c:423-433): the input file is one zlib/gzip DEFLATE
    stream (``ANT_instream_deflate`` inflates with window 15+32 —
    zlib/gzip header auto-detect, instream_deflate.c:60) whose
    decompressed content is ``<docname>\\t<url>\\t<anchor>\\t...`` lines
    (directory_iterator_tsv.c:84-117): the document NAME is field 1,
    the document TEXT is everything after the SECOND tab (the url is
    skipped; remaining tabs stay in the text — they tokenize as
    separators either way).

    Spark-first: a deflate stream is inherently serial (no
    split-points), exactly like the reference's single instream —
    one ``binaryFile`` row per file, inflated with stdlib zlib in the
    worker; parallelism comes from MANY files, the same recipe as the
    tar/PKZIP sources. Plain uncompressed TSV falls through untouched
    (header sniff), so the reader covers both ``-rtsv`` and a raw
    anchors file.
    """
    import zlib

    def extract(p: str, buf: bytes):
        data = bytes(buf)
        # zlib (0x78 CMF) or gzip (1f 8b) magic → inflate; else raw
        if data[:2] == b"\x1f\x8b" or (
            len(data) >= 2
            and data[0] == 0x78
            and (data[0] * 256 + data[1]) % 31 == 0
        ):
            data = zlib.decompressobj(wbits=15 + 32).decompress(data)
        text = data.decode("utf-8", errors="replace")
        for line in text.split("\n"):
            if not line:
                continue
            first = line.find("\t")
            if first < 0:
                # directory_iterator_tsv.c:101 — next() returns NULL on
                # a line with no name field, which ENDS iteration of
                # the whole file in the reference; match that (a skip
                # would index a different document set on bad input)
                return
            second = line.find("\t", first + 1)
            if second < 0:
                return  # :104 (no url field) — same NULL/stop semantics
            yield (line[:first], 0, line[second + 1 :])

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_members_reader(extract), schema=SOURCE_SCHEMA)
