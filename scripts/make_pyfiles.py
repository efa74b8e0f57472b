#!/usr/bin/env python
"""Package the engine for spark-submit --py-files.

Writes dist/tiny_search_engine_spark.zip containing the package sources
(no tests, no caches). Deterministic: fixed timestamps + sorted entries,
so re-runs on the same tree produce byte-identical zips (content-addressed
deploy caches stay warm).

Usage: python scripts/make_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "tiny_search_engine_spark"


def build_zip(out_path: str) -> list[str]:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    entries: list[str] = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append(os.path.relpath(full, REPO))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in entries:
            zi = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            with open(os.path.join(REPO, rel), "rb") as fh:
                z.writestr(zi, fh.read(), zipfile.ZIP_DEFLATED)
    return entries


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", PKG + ".zip")
    entries = build_zip(out)
    print(f"{out}: {len(entries)} files")
