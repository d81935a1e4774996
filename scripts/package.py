#!/usr/bin/env python3
"""Build dist/crawler_spark.zip for spark-submit --py-files.

Deterministic zip (sorted entries, zeroed timestamps) so repeated
builds are byte-identical — convenient for cluster cache keys.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "crawler_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    entries = []
    pkg = os.path.join(REPO, "crawler_spark")
    for root, _dirs, files in os.walk(pkg):
        for name in files:
            if name.endswith(".py"):
                p = os.path.join(root, name)
                entries.append((os.path.relpath(p, REPO), p))
    entries.sort()
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, p in entries:
            zi = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            with open(p, "rb") as f:
                z.writestr(zi, f.read(), zipfile.ZIP_DEFLATED)
    print(f"{OUT}: {len(entries)} files, {os.path.getsize(OUT)} bytes")


if __name__ == "__main__":
    main()
