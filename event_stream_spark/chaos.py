"""Fault-injection seam for task-retry chaos proofs.

Spark retries a failed task (``spark.task.maxFailures`` > 1, or the
``local[N, F]`` master form); an exactly-once sink must tolerate a task
that dies MID-WRITE and is re-attempted — no duplicate rows, no torn
files.  The writers accept an optional ``chaos_flag`` path threaded into
their executor-side bodies; ``scripts/chaos_sinks.py`` drives each sink
with a flag under a retry-enabled session and asserts the output is
byte-identical to an unchaosed run.

The claim is an atomic ``os.rename``, so across every task and every
attempt EXACTLY ONE caller wins and raises; its retry (and every other
task) finds the flag gone and proceeds.
"""

from __future__ import annotations

import os


def claim_once(flag: str | None) -> None:
    """Raise RuntimeError exactly once across all callers of ``flag``."""
    if flag is None:
        return
    try:
        os.rename(flag, flag + ".claimed")
    except FileNotFoundError:
        return  # already claimed (or never armed): proceed normally
    raise RuntimeError("chaos: injected task failure (flag claimed)")
