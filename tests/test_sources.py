"""Alternative sources feed the same build pipeline — the reference's
CSV reader (directory_iterator_csv.c) maps to spark.read.csv; the
index built from a CSV dump must be identical to one built from the
in-memory frame."""

import os
import tempfile

import pandas as pd


TRANSCRIPTS = pd.DataFrame(
    {
        "conv_id": ["c0", "c0", "c1", "c1"],
        "turn_idx": [0, 1, 0, 1],
        "text": [
            "alpha bravo charlie",
            "bravo delta",
            "alpha alpha echo",
            "charlie delta echo foxtrot",
        ],
    }
)


def test_csv_source_builds_identical_index(spark):
    from pyspark.sql import functions as F

    from atire_spark.build import build_index

    with tempfile.TemporaryDirectory() as tmp:
        csv_path = os.path.join(tmp, "transcripts.csv")
        TRANSCRIPTS.to_csv(csv_path, index=False)
        csv_df = spark.read.csv(
            csv_path,
            header=True,
            schema="conv_id string, turn_idx int, text string",
        )
        idx_csv = build_index(spark, csv_df)
        idx_mem = build_index(spark, spark.createDataFrame(TRANSCRIPTS))

        def decoded(idx):
            import numpy as np

            from atire_spark.kernels.impact import decode_segment

            out = []
            for row in idx.postings.collect():
                d, t, _ = decode_segment(
                    np.asarray(row["impacts"]),
                    np.asarray(row["doc_counts"]),
                    row["postings"],
                    None,
                )
                out.extend(
                    (row["term"], int(x), int(y)) for x, y in zip(d, t)
                )
            return sorted(out)

        assert decoded(idx_csv) == decoded(idx_mem)
        dm_csv = idx_csv.docmap.orderBy("docid").collect()
        dm_mem = idx_mem.docmap.orderBy("docid").collect()
        assert [tuple(r) for r in dm_csv] == [tuple(r) for r in dm_mem]


def test_multimodal_frame_sample_explodes_long_payloads(spark, tmp_path):
    """A payload longer than one sampling window yields multiple frame
    rows (frame every MM_FPS*MM_SAMPLE_EVERY_S frames of
    MM_BYTES_PER_FRAME bytes), clamped to the final frame."""
    import pandas as pd

    from atire_spark.corpus import (
        MM_BYTES_PER_FRAME,
        MM_FPS,
        MM_SAMPLE_EVERY_S,
        multimodal_frame_sample,
    )

    step = MM_FPS * MM_SAMPLE_EVERY_S
    n_frames = int(step * 2.5)  # → 3 samples: 0, step, 2*step
    rows = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["x" * (n_frames * MM_BYTES_PER_FRAME), "short"],
        }
    )
    d = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
    out = (
        multimodal_frame_sample(spark, d)
        .toPandas()
        .sort_values(["doc_id", "frame_idx"])
    )
    long_doc = out[out.doc_id == 0]
    assert list(long_doc.frame_idx) == [0, step, 2 * step]
    assert list(long_doc.ts_ms) == [0, MM_SAMPLE_EVERY_S * 1000,
                                    2 * MM_SAMPLE_EVERY_S * 1000]
    assert (long_doc.total_frames == n_frames).all()
    short_doc = out[out.doc_id == 1]
    assert list(short_doc.frame_idx) == [0]


def test_media_header_parser_roundtrip():
    """parse_media_header really parses container bytes: synth PNG/BMP
    payloads round-trip their dimensions, a hand-built top-down BMP
    (negative height) normalizes, and unknown magic raises."""
    import struct

    import pytest

    from atire_spark.corpus import _synth_media_payloads, parse_media_header

    payloads = _synth_media_payloads([0, 1, 2, 3], ["a", "bb", "ccc", "d"])
    for d, buf in zip([0, 1, 2, 3], payloads):
        fmt, w, h, ch = parse_media_header(buf)
        assert fmt == ("png" if d % 2 == 0 else "bmp")
        assert (w, h, ch) == (16 + d % 509, 16 + (d * 7) % 277, 3)
    topdown = (
        b"BM"
        + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHH", 40, 640, -480, 1, 32)
        + b"\x00" * 24
    )
    assert parse_media_header(topdown) == ("bmp", 640, 480, 4)
    with pytest.raises(ValueError):
        parse_media_header(b"ICO?unknown-magic")


def test_parse_gif_and_wav_headers():
    """GIF logical-screen and canonical RIFF/WAVE fmt-chunk parsing
    against independently-constructed byte strings."""
    import struct

    from atire_spark.corpus import (
        _synth_av_payloads,
        parse_media_header,
        parse_wav_header,
    )

    gif = b"GIF87a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00;"
    assert parse_media_header(gif) == ("gif", 320, 200, 3)

    data = b"\x00" * (48000 * 2 * 2)  # one second, stereo 16-bit
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 48000,
                                48000 * 4, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert parse_wav_header(wav) == (48000, 48000, 2)

    # generator parity: parameters restated from the doc_id rule
    bufs = _synth_av_payloads([4, 9])
    assert parse_media_header(bufs[0]) == ("gif", 16 + 4, 16 + 28, 3)
    assert parse_wav_header(bufs[1]) == (8000 * 5, 100 + 9, 2)


def test_trec_source(spark, tmp_path):
    from atire_spark.sources import read_trec

    (tmp_path / "part1.xml").write_text(
        "<DOC>\n<DOCNO> WSJ870324-0001 </DOCNO>\n"
        "alpha bravo charlie\n</DOC>\n"
        "<DOC>\n<DOCNO>WSJ870324-0002</DOCNO>\ndelta echo\n</DOC>\n"
    )
    (tmp_path / "part2.xml").write_text(
        "<DOC><DOCNO>D3</DOCNO>foxtrot golf</DOC>trailing junk"
    )
    df = read_trec(spark, str(tmp_path / "*.xml")).orderBy("conv_id")
    rows = [(r.conv_id, r.turn_idx, r.text) for r in df.collect()]
    assert rows == [
        ("D3", 0, "foxtrot golf"),
        ("WSJ870324-0001", 0, "alpha bravo charlie"),
        ("WSJ870324-0002", 0, "delta echo"),
    ]
    # feeds the standard build unchanged
    from atire_spark.build import build_index

    idx = build_index(spark, df)
    assert idx.docmap.count() == 3


def test_warc_source(spark, tmp_path):
    from atire_spark.sources import read_warc

    # response body with an INTERNAL blank line and the spec-mandated
    # trailing CRLF CRLF — neither may truncate the document
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Record-ID: <urn:uuid:abc-1>\r\n"
        "WARC-Target-URI: http://example.com/a\r\n"
        "\r\n"
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        "\r\n"
        "hello warc world\r\n\r\nsecond paragraph"
        "\r\n\r\n"
    )
    skip = (
        "WARC/1.0\r\n"
        "WARC-Type: request\r\n"
        "WARC-Record-ID: <urn:uuid:abc-2>\r\n"
        "\r\n"
        "GET / HTTP/1.1"
    )
    resource = (
        "WARC/1.0\r\n"
        "WARC-Type: resource\r\n"
        "WARC-Record-ID: <urn:uuid:abc-3>\r\n"
        "\r\n"
        "plain resource payload"
    )
    (tmp_path / "f.warc").write_text(rec + skip + resource)
    df = read_warc(spark, str(tmp_path / "f.warc")).orderBy("conv_id")
    rows = [(r.conv_id, r.text) for r in df.collect()]
    assert rows == [
        ("<urn:uuid:abc-1>", "hello warc world\r\n\r\nsecond paragraph"),
        ("<urn:uuid:abc-3>", "plain resource payload"),
    ]


def test_tar_and_pkzip_sources(spark, tmp_path):
    import tarfile
    import zipfile

    from atire_spark.sources import read_pkzip, read_tar

    tar_path = tmp_path / "docs.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        for name, body in [("a.txt", "alpha text"), ("sub/b.txt", "bravo text")]:
            data = body.encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, __import__("io").BytesIO(data))
    tdf = read_tar(spark, str(tar_path)).orderBy("conv_id")
    assert [r.text for r in tdf.collect()] == ["alpha text", "bravo text"]
    assert all(r.conv_id.endswith((".txt",)) for r in tdf.collect())

    zip_path = tmp_path / "docs.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("x.txt", "xray text")
        zf.writestr("dir/", "")
        zf.writestr("y.txt", "yankee text")
    zdf = read_pkzip(spark, str(zip_path)).orderBy("conv_id")
    assert [r.text for r in zdf.collect()] == ["xray text", "yankee text"]


class TestTsvDeflate:
    """-rtsv ingestion (directory_iterator_tsv.c + instream_deflate.c):
    a zlib- or gzip-compressed file of name\\turl\\tanchors lines; the
    document text is everything after the second tab."""

    LINES = [
        "doc-a\thttp://x/a\talpha bravo\tcharlie",
        "doc-b\thttp://x/b\tbravo delta",
        "doc-c\thttp://x/c\talpha alpha echo",
        "doc-e\thttp://x/e\tcharlie delta echo foxtrot",
    ]

    def _expected(self):
        return pd.DataFrame(
            {
                "conv_id": ["doc-a", "doc-b", "doc-c", "doc-e"],
                "turn_idx": [0] * 4,
                "text": [
                    "alpha bravo\tcharlie",
                    "bravo delta",
                    "alpha alpha echo",
                    "charlie delta echo foxtrot",
                ],
            }
        )

    def _roundtrip(self, spark, payload: bytes, name: str):
        from atire_spark.sources import read_tsv

        with tempfile.TemporaryDirectory() as tmp:
            p = os.path.join(tmp, name)
            with open(p, "wb") as fh:
                fh.write(payload)
            got = (
                read_tsv(spark, p)
                .toPandas()
                .sort_values("conv_id")
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(
            got, self._expected(), check_dtype=False
        )

    def test_zlib_stream(self, spark):
        import zlib

        raw = ("\n".join(self.LINES) + "\n").encode()
        self._roundtrip(spark, zlib.compress(raw), "anchors.tsv.z")

    def test_gzip_stream(self, spark):
        import gzip

        raw = ("\n".join(self.LINES) + "\n").encode()
        self._roundtrip(spark, gzip.compress(raw, mtime=0), "anchors.tsv.gz")

    def test_plain_tsv_falls_through(self, spark):
        raw = ("\n".join(self.LINES) + "\n").encode()
        self._roundtrip(spark, raw, "anchors.tsv")

    def test_malformed_line_stops_the_file(self, spark):
        """A line missing the name or url tab ENDS iteration of that
        file — directory_iterator_tsv.c:101,104 return NULL there, and
        NULL terminates the reference's read loop, so documents after
        the malformed line must not be indexed (a skip would make the
        two engines index different document sets on bad input)."""
        from atire_spark.sources import read_tsv

        for bad in ("noname-line-without-tabs", "doc-x-only-name\thttp://x/x"):
            lines = self.LINES[:2] + [bad] + self.LINES[2:]
            with tempfile.TemporaryDirectory() as tmp:
                p = os.path.join(tmp, "anchors.tsv")
                with open(p, "wb") as fh:
                    fh.write(("\n".join(lines) + "\n").encode())
                got = sorted(
                    r.conv_id for r in read_tsv(spark, p).collect()
                )
            assert got == ["doc-a", "doc-b"]

    def test_tsv_source_builds_identical_index(self, spark):
        """The deflated-TSV corpus builds the same postings as the
        equivalent in-memory frame (the CSV test's contract)."""
        import zlib

        import numpy as np

        from atire_spark.build import build_index
        from atire_spark.kernels.impact import decode_segment
        from atire_spark.sources import read_tsv

        raw = ("\n".join(self.LINES) + "\n").encode()
        with tempfile.TemporaryDirectory() as tmp:
            p = os.path.join(tmp, "anchors.tsv.z")
            with open(p, "wb") as fh:
                fh.write(zlib.compress(raw))
            idx_tsv = build_index(spark, read_tsv(spark, p))
            idx_mem = build_index(
                spark, spark.createDataFrame(self._expected())
            )

            def decoded(idx):
                out = []
                for row in idx.postings.collect():
                    d, t, _ = decode_segment(
                        np.asarray(row["impacts"]),
                        np.asarray(row["doc_counts"]),
                        row["postings"],
                        None,
                    )
                    out.extend(
                        (row["term"], int(x), int(y)) for x, y in zip(d, t)
                    )
                return sorted(out)

            assert decoded(idx_tsv) == decoded(idx_mem)


def test_jdbc_source_builds_identical_index(spark, tmp_path):
    """The JDBC ingestion path (directory_iterator_mysql.c analogue):
    transcripts written to an embedded Derby database via
    spark.write.jdbc, read back with spark.read.jdbc, and built into
    an index identical to the in-memory build — exercising the one §2
    source that is a Spark builtin end to end."""
    import numpy as np

    from atire_spark.build import build_index
    from atire_spark.kernels.impact import decode_segment

    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.createDataFrame(TRANSCRIPTS)
    src.write.jdbc(url, "transcripts", mode="overwrite", properties=props)
    jdf = spark.read.jdbc(
        url,
        "transcripts",
        properties=props,
        column="turn_idx",  # server-side partitioned read
        lowerBound=0,
        upperBound=2,
        numPartitions=2,
    ).select("conv_id", "turn_idx", "text")
    idx_jdbc = build_index(spark, jdf)
    idx_mem = build_index(spark, spark.createDataFrame(TRANSCRIPTS))

    def decoded(idx):
        out = []
        for row in idx.postings.collect():
            d, t, _ = decode_segment(
                np.asarray(row["impacts"]),
                np.asarray(row["doc_counts"]),
                row["postings"],
                None,
            )
            out.extend((row["term"], int(x), int(y)) for x, y in zip(d, t))
        return sorted(out)

    assert decoded(idx_jdbc) == decoded(idx_mem)
    dm_a = idx_jdbc.docmap.orderBy("docid").collect()
    dm_b = idx_mem.docmap.orderBy("docid").collect()
    assert [tuple(r) for r in dm_a] == [tuple(r) for r in dm_b]


class TestPixelDecode:
    """Real raster decode (corpus.decode_pixels): PNG zlib IDAT +
    all five standard row filters, BMP bottom-up padded BGR rows —
    checked against the closed-form pixel formula, and the
    nearest-neighbour resample grid against a numpy derivation."""

    def test_roundtrip_all_filters_and_formats(self):
        import numpy as np

        from atire_spark.corpus import (
            _pix_dims,
            _pix_raster,
            _synth_pixel_payloads,
            decode_pixels,
        )

        # d=0..9 covers PNG rows using every filter type and BMPs of
        # varying width (row padding 0..3 bytes)
        for d in range(10):
            img = decode_pixels(_synth_pixel_payloads([d])[0])
            w, h = _pix_dims(d)
            assert img.shape == (h, w, 3)
            assert (img == _pix_raster(d)).all(), f"pixel mismatch d={d}"

    def test_resample_nearest_grid(self):
        import numpy as np

        from atire_spark.corpus import resample_nearest

        img = np.arange(12 * 9 * 3, dtype=np.uint8).reshape(9, 12, 3)
        out = resample_nearest(img, 8, 8)
        ys = (np.arange(8) * 9) // 8
        xs = (np.arange(8) * 12) // 8
        assert (out == img[np.ix_(ys, xs)]).all()
