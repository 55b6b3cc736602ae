"""The committed spark-submit --py-files artifact (graphiti_spark.zip)
must byte-match the package sources at HEAD — a stale zip makes the
documented deployment path ImportError on newer registry entries.
Regenerate with `python tools/make_pyfiles.py` when this fails."""

from __future__ import annotations

import os
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(ROOT, "graphiti_spark.zip")


def _source_files() -> dict[str, bytes]:
    pkg = os.path.join(ROOT, "graphiti_spark")
    out = {}
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                with open(full, "rb") as f:
                    out[os.path.relpath(full, ROOT)] = f.read()
    return out


@pytest.mark.skipif(not os.path.exists(ZIP), reason="zip not built")
def test_zip_matches_sources():
    src = _source_files()
    with zipfile.ZipFile(ZIP) as zf:
        members = {n: zf.read(n) for n in zf.namelist() if n.endswith(".py")}
    missing = sorted(set(src) - set(members))
    extra = sorted(set(members) - set(src))
    assert not missing, f"zip missing {missing} — rerun tools/make_pyfiles.py"
    assert not extra, f"zip has stale members {extra} — rerun tools/make_pyfiles.py"
    stale = sorted(n for n in src if src[n] != members[n])
    assert not stale, f"zip content stale for {stale} — rerun tools/make_pyfiles.py"
