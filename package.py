"""Build dist/atire_spark.zip for spark-submit --py-files.

The north_rule deployment is ``spark-submit --py-files`` on a
multi-executor cluster; executors import the package from the shipped
zip. Usage:

    python package.py
    spark-submit --py-files dist/atire_spark.zip cli_build.py --help

Pure stdlib, deterministic member order (sorted), no timestamps beyond
what zipfile requires — rebuilding from the same tree produces the
same archive, so the artifact is cacheable/diffable.
"""

from __future__ import annotations

import pathlib
import zipfile

ROOT = pathlib.Path(__file__).resolve().parent
DIST = ROOT / "dist"


def build_zip() -> pathlib.Path:
    DIST.mkdir(exist_ok=True)
    out = DIST / "atire_spark.zip"
    members = sorted(
        p
        for p in (ROOT / "atire_spark").rglob("*.py")
        if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in members:
            info = zipfile.ZipInfo(str(p.relative_to(ROOT)))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    path = build_zip()
    with zipfile.ZipFile(path) as zf:
        n = len(zf.namelist())
    print(f"{path} ({n} modules)")
