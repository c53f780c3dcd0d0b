"""Streaming funnel tracking — the live twin of batch q29 (ordered
view → click → purchase with a per-step conversion window), expressed as a
custom arbitrary-stateful operator (``applyInPandasWithState``).

Late/out-of-order contract (two policies, chosen by ``late_policy``):

- ``"arrival"`` — transitions are applied in arrival order (event-time
  sorted only *within* each microbatch).  Batch parity holds for STRICTLY
  in-order arrival across batches; a step event arriving before its
  predecessor (a click in batch N, its view in batch N+1) is dropped, not
  revisited — the predecessor still records its own step, but the dropped
  successor never resurrects.  This is the reference's own stance: its live
  path assumes per-chain monotonic order and only heals *height gaps*, not
  reordering (MultiplexFlow.kt:117-155, ContiguousFlow.kt:17-30).

- ``"buffer"`` — full out-of-order tolerance up to the watermark: events
  buffer in state and are applied in event-time order (ties by step rank)
  only once the watermark passes them, so the streamed result equals batch
  q29 on the delivered events for ANY arrival order within the allowed
  lateness.  Emission is therefore delayed by the watermark.  The operator
  applies ``withWatermark(delay)`` internally on ``timestamp_micros(us)``
  and uses event-time timeouts to flush buffered events even when a user
  receives no further input.

State retention: q29's "first view EVER" minima make exact parity
inherently unbounded — a user's decided funnel (completed, or with a
conversion window the watermark closed unconverted) must be remembered
forever, else a returning user restarts the funnel and emits steps batch
q29 would not.  Default is exact parity (decided state is retained, 24
bytes + empty buffer per user).  ``expire_decided=True`` trades that for
bounded state: decided users are dropped at the watermark, so steady-state
size is proportional to users inside an open conversion window or with
buffered events — with the documented caveat that a user returning after
expiry re-enters the funnel fresh (re-emission).  At 100 TB the knob is
per-pipeline policy; both contracts are tested.

Every transition emits the user's new furthest step (a change-log of
funnel progress).  Scale shape: state is keyed by user_id — the same key
the events shuffle on, one exchange; the ``"buffer"`` pending buffer holds
only events the watermark has not yet finalized (bounded by the allowed
lateness × per-user rate).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: step conversion window, microseconds (mirrors queries.FUNNEL_WINDOW_US)
WINDOW_US = 3_600_000_000

OUTPUT_SCHEMA = "user_id bigint, funnel_step int, at_us bigint"
STATE_SCHEMA = "t1 bigint, t2 bigint, t3 bigint"
BUFFER_STATE_SCHEMA = (
    "t1 bigint, t2 bigint, t3 bigint, pend_us array<bigint>, pend_step array<int>"
)

_STEPS = ("view", "click", "purchase")
_STEP_INDEX = {et: i for i, et in enumerate(_STEPS)}


def _transition(uid, t1, t2, t3, us, step_idx, out):
    """One q29 conditional-min transition; returns the updated (t1,t2,t3)."""
    if step_idx == 0 and t1 is None:
        t1 = us
        out.append((uid, 1, us))
    elif step_idx == 1 and t1 is not None and t2 is None and t1 < us <= t1 + WINDOW_US:
        t2 = us
        out.append((uid, 2, us))
    elif step_idx == 2 and t2 is not None and t3 is None and t2 < us <= t2 + WINDOW_US:
        t3 = us
        out.append((uid, 3, us))
    return t1, t2, t3


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """``"arrival"`` policy (see module docstring for the contract)."""
    t1, t2, t3 = state.get if state.exists else (None, None, None)
    events: list[tuple[int, str]] = []
    for pdf in pdfs:
        events.extend(zip((int(u) for u in pdf["us"]), pdf["event_type"]))
    out: list[tuple[int, int, int]] = []
    for us, et in sorted(events):
        si = _STEP_INDEX.get(et)
        if si is not None:
            t1, t2, t3 = _transition(key[0], t1, t2, t3, us, si, out)
    state.update((t1, t2, t3))
    yield pd.DataFrame(out, columns=["user_id", "funnel_step", "at_us"])


def _make_buffered_tracker(expire_decided: bool):
    def _track_buffered(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """``"buffer"`` policy: watermark-ordered application (+ optional
        watermark GC of decided funnels)."""
        if state.exists:
            t1, t2, t3, pus, pstep = state.get
            pending = list(zip(pus or (), pstep or ()))
        else:
            t1 = t2 = t3 = None
            pending = []
        for pdf in pdfs:
            for us, et in zip(pdf["us"], pdf["event_type"]):
                si = _STEP_INDEX.get(et)
                if si is not None:
                    pending.append((int(us), si))

        wm_us = state.getCurrentWatermarkMs() * 1000
        ready = sorted(e for e in pending if e[0] <= wm_us)
        pending = [e for e in pending if e[0] > wm_us]

        out: list[tuple[int, int, int]] = []
        for us, si in ready:  # event-time order, ties by step rank
            t1, t2, t3 = _transition(key[0], t1, t2, t3, us, si, out)

        # "decided": no future event can change this user's funnel outcome —
        # completed, or an open step whose conversion window the watermark
        # has closed (later events can't qualify; earlier ones are dropped
        # as late by the watermark before reaching the operator)
        decided = t3 is not None or (
            not pending
            and (
                (t1 is not None and t2 is None and wm_us > t1 + WINDOW_US)
                or (t2 is not None and t3 is None and wm_us > t2 + WINDOW_US)
            )
        )
        if decided and expire_decided and not pending:
            state.remove()  # bounded-state contract (see module docstring)
        elif decided and expire_decided:
            # expire the decision but never discard buffered events: the
            # user re-enters the funnel fresh and the pending events drive
            # the new pass once the watermark finalizes them
            t1 = t2 = t3 = None
            state.update(
                (None, None, None, [us for us, _ in pending], [si for _, si in pending])
            )
            state.setTimeoutTimestamp(
                max(
                    min(us for us, _ in pending) // 1000 + 1,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        elif t1 is None and not pending:
            state.remove()  # nothing learned, nothing buffered: no state
        else:
            state.update(
                (t1, t2, t3, [us for us, _ in pending], [si for _, si in pending])
            )
            # wake this key when the watermark reaches its next decision
            # point: the earliest buffered event or the conversion deadline
            deadlines = [us for us, _ in pending]
            if t1 is not None and t2 is None:
                deadlines.append(t1 + WINDOW_US + 1)
            if t2 is not None and t3 is None:
                deadlines.append(t2 + WINDOW_US + 1)
            if deadlines:
                state.setTimeoutTimestamp(
                    max(
                        min(deadlines) // 1000 + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        yield pd.DataFrame(out, columns=["user_id", "funnel_step", "at_us"])

    return _track_buffered


def funnel_progress(
    events: DataFrame,
    *,
    late_policy: str = "arrival",
    watermark_delay: str = "1 hour",
    expire_decided: bool = False,
) -> DataFrame:
    """Change-log of funnel advancement per user.  ``events`` needs columns
    (user_id, us, event_type) with ``us`` in epoch micros; feed it
    ``F.unix_micros(ts)`` from the decoded stream.  See the module
    docstring for the ``late_policy`` contracts; ``watermark_delay`` is
    the allowed lateness and ``expire_decided`` the state-retention knob
    under ``"buffer"``."""
    if late_policy == "arrival":
        return events.groupBy("user_id").applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    if late_policy != "buffer":
        raise ValueError(f"unknown late_policy: {late_policy!r}")
    with_wm = events.withColumn(
        "event_ts", F.timestamp_micros(F.col("us"))
    ).withWatermark("event_ts", watermark_delay)
    return with_wm.groupBy("user_id").applyInPandasWithState(
        _make_buffered_tracker(expire_decided),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=BUFFER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
