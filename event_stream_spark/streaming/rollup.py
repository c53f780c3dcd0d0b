"""Incremental time-rollup maintenance (hypertable-style continuous
aggregate): a streaming query keeps a partitioned parquet rollup table up to
date as events arrive.

The reference has no event-time analytics at all (it processes by height);
this is the §2.9 capability extension pattern: batch expression ≡ streaming
expression, plus an idempotent materialization strategy.

Design:

- ``hourly_rollup`` is the shared aggregate — per (hour, event_type) counts
  and value sums.  Batch: run it on the lake.  Streaming: the watermark
  finalizes an hour once event time passes its end, and append mode emits
  each finalized window exactly once.
- ``maintain_rollup`` materializes those finalized windows with
  ``foreachBatch`` + dynamic partition overwrite: each micro-batch
  OVERWRITES exactly the ``hour_key`` partitions it touches.  A batch
  replayed after a crash rewrites the same partitions with the same rows —
  idempotent, so the table is exactly-once even though foreachBatch is
  at-least-once.

Scale shape: the aggregate is partial-agg + one shuffle on
(window, event_type); state is bounded by the watermark; the sink writes
only the partitions finalized in the batch (O(hours-per-batch), not a full
table rewrite).  At 100 TB this is the standard continuous-aggregate layout:
readers hit the small rollup table, never the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(
    events: DataFrame, *, watermark: str | None = "1 hour"
) -> DataFrame:
    """Per (hour, event_type) event count and value sum.  Works on batch
    frames (watermark skipped) and streams (append mode emits finalized
    hours only)."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            F.date_format("win.start", "yyyy-MM-dd-HH").alias("hour_key"),
            "event_type",
            "n",
            "total_value",
        )
    )


def write_rollup_batch(batch_df: DataFrame, out_dir: str) -> None:
    """Overwrite exactly the hour partitions present in this batch (dynamic
    partition overwrite) — replaying the batch is a no-op rewrite."""
    (
        batch_df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("hour_key")
        .parquet(out_dir)
    )


def maintain_rollup(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    *,
    watermark: str = "1 hour",
):
    """writeStream handle maintaining the rollup table at ``out_dir``."""
    agg = hourly_rollup(events_stream, watermark=watermark)
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda df, _id: write_rollup_batch(df, out_dir))
    )
