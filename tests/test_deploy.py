"""Deployment-path tests: the --py-files zip and the Iceberg gate."""

import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


class TestPyFilesZip:
    def test_zip_builds_and_imports(self, tmp_path, monkeypatch):
        import package

        out = package.build_zip()
        assert out.exists()
        with zipfile.ZipFile(out) as zf:
            names = zf.namelist()
        assert "atire_spark/build.py" in names
        assert "atire_spark/query.py" in names
        assert not any("__pycache__" in n for n in names)
        # executors import from the zip exactly like this
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                f"import sys; sys.path.insert(0, {str(out)!r}); "
                "import atire_spark.query; print('ok')",
            ],
            capture_output=True,
            text=True,
            cwd=tmp_path,  # not the repo root: the zip must be enough
        )
        assert r.stdout.strip() == "ok", r.stderr

    def test_zip_deterministic(self):
        import package

        a = package.build_zip().read_bytes()
        b = package.build_zip().read_bytes()
        assert a == b


class TestIcebergGate:
    """The sandbox has no Iceberg runtime; the sink must fail fast with
    the spark-submit recipe, not with a ClassNotFound stack trace."""

    def test_write_requires_catalog(self, spark):
        from atire_spark.build import build_index
        from atire_spark.iceberg import write_index_iceberg
        from atire_spark.synth import make_transcripts

        idx = build_index(spark, spark.createDataFrame(make_transcripts(20)))
        with pytest.raises(RuntimeError, match="spark-submit"):
            write_index_iceberg(spark, idx, "cat.db.index")

    def test_load_requires_catalog(self, spark):
        from atire_spark.iceberg import load_index_iceberg

        with pytest.raises(RuntimeError, match="no Iceberg catalog"):
            load_index_iceberg(spark, "cat.db.index")
