"""Shared cache key for sf-derived fixture directories.

The dump/snapshot fixture builders (``ingest.py``, ``snapchanges.py``,
``snapddl.py``, ``export.py``) materialize derived artifacts under /tmp
once per sf directory, marker-guarded.  Keying those dirs on the sf
PATH alone is a staleness hazard: regenerating the test data in place
(e.g. ``scripts/make_sf1.py`` rewriting /tmp/es_sf1_v1) leaves the old
fixtures masked behind their markers, and every downstream read silently
serves the previous corpus.  The key therefore folds in a content
fingerprint — per-file size and mtime of every parquet in the dir — so
a rebuilt dataset invalidates its fixtures automatically.
"""
from __future__ import annotations

import hashlib
import os


def fixture_key(sf: str) -> str:
    h = hashlib.md5(os.path.abspath(sf).encode())
    if os.path.isdir(sf):
        for name in sorted(os.listdir(sf)):
            if name.endswith(".parquet"):
                st = os.stat(os.path.join(sf, name))
                h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:10]
