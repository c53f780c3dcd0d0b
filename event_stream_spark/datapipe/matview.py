"""Session-scoped materialized relations (the engine's tiny mat-view layer).

Several datapipe operators reference the same derived relation repeatedly —
the shingle table (signature + sizes + both verify-join sides) and the
simhash table (both sides of the block self-join; exchange reuse does NOT
fire across the aliased sides — verified: 0 ReusedExchange, 2 FileScans).

A one-time parquet round-trip per (session, tag) is the cluster-correct
"materialize it as a table" step and keeps AQE fully effective: parquet
scans carry size stats, unlike ``.persist()`` whose InMemoryRelation hides
them and demotes downstream broadcast joins to sort-merge (measured 2×
slower end-to-end; see git history).
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str], DataFrame] = {}

_ROOT = os.path.join(tempfile.gettempdir(), f"es_matview_{os.getpid()}")


@atexit.register
def _cleanup() -> None:
    """Remove this process's materialized parquet at interpreter exit (the
    per-pid dir would otherwise accumulate across sessions)."""
    _CACHE.clear()
    shutil.rmtree(_ROOT, ignore_errors=True)


def materialized(
    spark: SparkSession, tag: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the parquet-materialized form of ``build()``, computed once per
    (session, tag)."""
    from event_stream_spark.queries import _session_key

    key = (_session_key(spark), tag)
    cached = _CACHE.get(key)
    if cached is None:
        digest = hashlib.md5(tag.encode()).hexdigest()[:12]
        path = os.path.join(_ROOT, digest)
        build().write.mode("overwrite").parquet(path)
        cached = spark.read.parquet(path)
        _CACHE[key] = cached
    return cached
