"""The spark-submit artifact must match the source tree byte-for-byte.

dist/datatest_spark.zip is the production deployment unit (north rule:
``spark-submit --py-files``). It drifted from source once — the r2 final
commit changed sources/io.py after the last rebuild — so freshness is now
pinned: every .py under datatest_spark/ must appear in the zip with
identical bytes, and the zip must contain nothing the tree doesn't.
bench.py rebuilds the artifact at the start of every run, so the per-round
driver flow cannot ship a stale zip.
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "datatest_spark.zip")


def _tree_files():
    out = {}
    pkg = os.path.join(REPO, "datatest_spark")
    for root, _dirs, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                with open(full, "rb") as fh:
                    out[rel.replace(os.sep, "/")] = fh.read()
    return out


def _build_zip():
    import sys

    sys.path.insert(0, REPO)
    from tools.package import build

    return build


def test_artifact_matches_tree():
    if not os.path.exists(ZIP):
        # fresh clone: dist/ is gitignored — build the artifact rather
        # than fail on a missing file that says nothing about freshness
        _build_zip()(ZIP)
    tree = _tree_files()
    with zipfile.ZipFile(ZIP) as z:
        names = set(z.namelist())
        assert names == set(tree), (
            "zip/tree entry mismatch: only-in-zip=%s only-in-tree=%s"
            % (sorted(names - set(tree)), sorted(set(tree) - names))
        )
        stale = [n for n in sorted(names) if z.read(n) != tree[n]]
        assert not stale, "stale zip entries (rebuild via tools/package.py): %s" % stale


def test_packager_is_deterministic(tmp_path):
    build = _build_zip()

    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read(), (
            "two builds of the same tree differ byte-for-byte - the "
            "freshness check in test_artifact_matches_tree relies on "
            "deterministic output"
        )
    with zipfile.ZipFile(a) as z:
        assert "datatest_spark/__init__.py" in z.namelist()
