"""Compressed document repository (-C / get_document)."""

import pytest

from atire_spark.build import build_index
from atire_spark.docstore import SCHEMES, build_docstore, fetch_documents
from atire_spark.synth import make_transcripts


@pytest.fixture(scope="module")
def setup(spark):
    pdf = make_transcripts(40)
    idx = build_index(spark, spark.createDataFrame(pdf))
    return pdf, spark.createDataFrame(pdf), idx


class TestDocstore:
    @pytest.mark.parametrize("scheme", ["uncompressed", "deflate", "bz2"])
    def test_roundtrip(self, spark, setup, scheme):
        pdf, tdf, idx = setup
        store = build_docstore(tdf, idx.docmap, scheme=scheme)
        got = fetch_documents(store, [0, 1, 5]).toPandas()
        assert len(got) == 3
        want = (
            idx.docmap.filter("docid in (0, 1, 5)")
            .join(tdf, ["conv_id", "turn_idx"])
            .select("docid", "text")
            .toPandas()
        )
        merged = got.merge(want, on="docid", suffixes=("_got", "_want"))
        assert (merged.text_got == merged.text_want).all()

    def test_deflate_actually_compresses(self, spark, setup):
        pdf, tdf, idx = setup
        store = build_docstore(tdf, idx.docmap, scheme="deflate").toPandas()
        raw = build_docstore(
            tdf, idx.docmap, scheme="uncompressed"
        ).toPandas()
        assert store.payload.map(len).sum() < raw.payload.map(len).sum()

    def test_unknown_scheme_rejected(self, spark, setup):
        pdf, tdf, idx = setup
        with pytest.raises(ValueError, match="unknown document"):
            build_docstore(tdf, idx.docmap, scheme="lzma")

    def test_snappy_gates_on_missing_package(self):
        comp, _ = SCHEMES["snappy"]
        try:
            import snappy  # type: ignore # noqa: F401
        except ImportError:
            with pytest.raises(ImportError, match="python-snappy"):
                comp(b"hello")
