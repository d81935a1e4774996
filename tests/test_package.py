"""The spark-submit deliverable: dist/crawler_spark.zip builds
deterministically and the package imports from the zip alone (what
--py-files does on every executor)."""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "crawler_spark.zip")


def _build() -> bytes:
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")],
        check=True, capture_output=True,
    )
    with open(ZIP, "rb") as f:
        return f.read()


def test_package_zip_deterministic_and_importable(tmp_path):
    h1 = hashlib.md5(_build()).hexdigest()
    h2 = hashlib.md5(_build()).hexdigest()
    assert h1 == h2  # byte-identical rebuilds (cluster cache keys)

    # import from the zip ONLY: cwd outside the repo, zip first on path
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import crawler_spark.functions.urlfeat as u; "
        "import crawler_spark.engine, crawler_spark.rules; "
        "assert 'crawler_spark.zip' in u.__file__, u.__file__; "
        "print('zip-import-ok')" % ZIP
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(tmp_path), capture_output=True, text=True, check=True,
    )
    assert "zip-import-ok" in res.stdout
