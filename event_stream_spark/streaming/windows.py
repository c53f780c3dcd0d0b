"""Event-time windowed aggregation with watermarks — the capability extension
declared in SURVEY.md §2.9 (the reference processes purely by height and has
no event-time windowing; Structured Streaming gives it natively).

Shared batch/streaming semantics: the same expression works on a bounded
DataFrame (batch analytics over the block lake) and on the live stream (the
watermark bounds state and emits finalized windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream_blocks: DataFrame,
    *,
    window: str = "1 minute",
    watermark: str | None = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tx-event counts per (event-time window, event_type).

    ``watermark=None`` → batch mode (no state bound needed).  ``slide``
    turns the tumbling window into a sliding one (O5's time-based analog).
    At scale this is the canonical partial-agg + shuffle-on-(window, type)
    plan; the watermark keeps the state store bounded on the live tail.
    """
    df = stream_blocks
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("block_ts", watermark)
    events = df.select(
        "block_ts", F.explode_outer("tx_events").alias("ev")
    ).select("block_ts", F.col("ev.event_type").alias("event_type"))
    win = (
        F.window("block_ts", window, slide)
        if slide is not None
        else F.window("block_ts", window)
    )
    return (
        events.groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def sessionized_counts(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Gap-based sessions via ``F.session_window``: a session extends while
    consecutive events per key arrive within ``gap`` of each other; the
    watermark lets Structured Streaming finalize (and evict) closed sessions.

    The batch/oracle twin is ``queries.q25`` (lag + cumulative-sum session
    assignment) — same gap semantics, exact microsecond arithmetic.  At scale
    the plan is a single shuffle on ``key_col`` with session merge handled by
    the native ``MergingSessionsExec``; no Python in the loop.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("sess"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("total_value"),
        )
        .select(
            key_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "15 minutes",
    suffix: str = "_r",
    watermark: str = "0 seconds",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream time-interval join: each left row pairs with the right
    rows of the same key whose timestamp falls in
    ``[left_ts - lookback, left_ts]`` — the streaming counterpart of the
    batch as-of join (``operators/asof.py``), relaxed from "latest match
    only" to "all matches in the window" because latest-only needs
    unbounded-past state a watermarked stream cannot keep.

    Works unchanged on batch frames (watermarks are skipped).  In streaming
    both sides get event-time watermarks and the interval condition bounds
    the join state: Spark evicts right-side rows older than
    ``watermark + lookback`` — state is O(rate × lookback), not O(history).
    One shuffle per side on the key.  ``join_type='leftOuter'`` emits
    unmatched left rows once the watermark passes their window.
    """
    r = right.select([F.col(c).alias(f"{c}{suffix}") for c in right.columns])
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{right_ts}{suffix}", watermark)
    cond = (
        (F.col(on) == F.col(f"{on}{suffix}"))
        & (
            F.col(f"{right_ts}{suffix}")
            >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}")
        )
        & (F.col(f"{right_ts}{suffix}") <= F.col(left_ts))
    )
    return left.join(r, cond, join_type)
