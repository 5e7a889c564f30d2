"""Build the spark-submit deployment artifact: a deterministic zip of the
``codeclone_spark`` package for ``--py-files``.

    python scripts/package_pyfiles.py            # -> dist/codeclone_spark.zip
    spark-submit --py-files dist/codeclone_spark.zip scripts/submit_main.py \
        run --data-dir ... --out-dir ...

Deterministic (fixed timestamps, sorted entries) so repeated builds of the
same tree are byte-identical — the artifact can be content-addressed by
the deployment system.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "codeclone_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                entries.append((rel, full))
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, full in sorted(entries):
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                z.writestr(info, f.read())
    os.replace(tmp, out_path)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "codeclone_spark.zip"
    )
    print(build(out))
