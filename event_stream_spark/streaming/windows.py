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
