"""Streaming funnel tracking — the live twin of batch q29 (ordered
view → click → purchase with a per-step conversion window), expressed as a
custom arbitrary-stateful operator (``applyInPandasWithState``).

State per user is three epoch-micros scalars (t1, t2, t3) — the achieved
timestamp of each funnel step — exactly the three conditional minima the
batch query computes, so for in-order (watermark-respecting) arrival the
streamed result equals the batch result on the same events: the first view
is the min view, the first qualifying click after it is the min qualifying
click, and so on.  Every state transition emits the user's new furthest
step, so downstream sees a change-log of funnel progress.

Scale shape: state is O(#users) × 24 bytes in the state store, partitioned
by user_id — the same key the events shuffle on, one exchange.  A user that
finishes the funnel stops transitioning, so steady-state updates track
active users only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: step conversion window, microseconds (mirrors queries.FUNNEL_WINDOW_US)
WINDOW_US = 3_600_000_000

OUTPUT_SCHEMA = "user_id bigint, funnel_step int, at_us bigint"
STATE_SCHEMA = "t1 bigint, t2 bigint, t3 bigint"

_STEPS = ("view", "click", "purchase")


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    t1, t2, t3 = state.get if state.exists else (None, None, None)
    events: list[tuple[int, str]] = []
    for pdf in pdfs:
        events.extend(zip((int(u) for u in pdf["us"]), pdf["event_type"]))
    out: list[tuple[int, int, int]] = []
    for us, et in sorted(events):
        if et == _STEPS[0] and t1 is None:
            t1 = us
            out.append((key[0], 1, us))
        elif et == _STEPS[1] and t1 is not None and t2 is None and t1 < us <= t1 + WINDOW_US:
            t2 = us
            out.append((key[0], 2, us))
        elif et == _STEPS[2] and t2 is not None and t3 is None and t2 < us <= t2 + WINDOW_US:
            t3 = us
            out.append((key[0], 3, us))
    state.update((t1, t2, t3))
    yield pd.DataFrame(out, columns=["user_id", "funnel_step", "at_us"])


def funnel_progress(events: DataFrame) -> DataFrame:
    """Change-log of funnel advancement per user.  ``events`` needs columns
    (user_id, us, event_type) with ``us`` in epoch micros; feed it
    ``F.unix_micros(ts)`` from the decoded stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
