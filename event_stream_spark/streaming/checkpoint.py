"""Checkpoint introspection — parity with the reference's `Checkpoint`
surface (es-core/.../stream/Checkpoint.kt:6-34).

The reference exposes ``lastCheckpoint(): Long`` (resume height) written
every ``checkEvery=20`` blocks.  Structured Streaming's offset log under
``checkpointLocation`` subsumes the mechanism (written per microbatch,
atomically, resumed automatically); this module provides the equivalent
*read* surface for operators/tools that want the resume position without
starting a query.
"""

from __future__ import annotations

import json
import os


def last_committed_batch(checkpoint_dir: str) -> int | None:
    """Highest batch id whose offsets are fully committed (commits/ log)."""
    commits = os.path.join(checkpoint_dir, "commits")
    if not os.path.isdir(commits):
        return None
    ids = [int(f) for f in os.listdir(commits) if f.isdigit()]
    return max(ids) if ids else None


def last_checkpoint(checkpoint_dir: str, source_index: int = 0) -> int | None:
    """Resume offset of ``source_index`` at the last committed batch — the
    ``lastCheckpoint()`` analog (for the blockstream source this is the next
    height to read).  Returns None with no committed batch (fresh start,
    like the reference's ``checkpoint.lastCheckpoint() ?: from``)."""
    batch = last_committed_batch(checkpoint_dir)
    if batch is None:
        return None
    path = os.path.join(checkpoint_dir, "offsets", str(batch))
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        # offset-log format: v1 line, metadata line, then one offset per source
        lines = [l.strip() for l in fh if l.strip()]
    offsets = lines[2:]
    if source_index >= len(offsets):
        return None
    raw = offsets[source_index]
    try:
        val = json.loads(raw)
    except json.JSONDecodeError:
        return None
    # the blockstream source serializes its offset as an integer height (or
    # {"height": N}); accept both
    if isinstance(val, dict):
        val = val.get("height")
    return int(val) if isinstance(val, (int, float)) else None
