"""Build the --py-files artifact for spark-submit deployment.

The north rule's production invocation is ``spark-submit --py-files``
on a multi-executor cluster (BASELINE.json); this produces the zip:

    python tools/package.py            # -> dist/datatest_spark.zip
    spark-submit --py-files dist/datatest_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path=None):
    out_path = out_path or os.path.join(REPO, "dist", "datatest_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "datatest_spark")
    entries = []
    for root, dirs, files in os.walk(pkg):
        dirs.sort()
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO).replace(os.sep, "/"), full))
    # deterministic output: sorted entry order + pinned timestamp, so two
    # builds of the same tree are byte-identical regardless of mtimes —
    # the artifact-freshness test byte-compares against the tree
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, full in sorted(entries):
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
