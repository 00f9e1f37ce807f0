#!/usr/bin/env python3
"""Package the tokenlake library as a spark-submit --py-files zip.

Usage: python tools/make_pyfiles.py [out_zip]
Default output: dist/tokenlake-pyfiles.zip (repo-relative). Prints the path.

The zip holds the `tokenlake/` package at its root so executors can
`import tokenlake` once spark-submit ships it (the north-rule deploy path:
`spark-submit --py-files dist/tokenlake-pyfiles.zip jobs/submit_encode.py ...`).
Bytecode caches are excluded; the archive is deterministic (sorted entries,
fixed timestamps) so re-packing an unchanged tree is byte-identical —
lineage-friendly for deploy provenance.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str | None = None) -> str:
    out = out_zip or os.path.join(REPO, "dist", "tokenlake-pyfiles.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "tokenlake")
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(root, f)
            entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
