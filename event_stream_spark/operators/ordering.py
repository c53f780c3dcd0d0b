"""Ordering, range planning, windows (O1–O6, SURVEY.md §2.6).

The reference's chunking/batching constants (batch 128, RPC page 20 —
EventStream.kt:66-73) are partition-planning concerns here: ``spark.range``
with an explicit partition count models the fan-out, and AQE coalesces at
runtime.  Count/sliding windows map to window functions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def sort_by_height(df: DataFrame, *, within_partitions: bool = False) -> DataFrame:
    """O1/O2: global order (range-exchange) or per-partition order (no
    shuffle) — the reference's ordered-vs-concurrent flag (EventStream.kt:121-127).
    """
    if within_partitions:
        return df.sortWithinPartitions("height")
    return df.orderBy("height")


def height_range(
    spark: SparkSession, lo: int, hi: int, *, batch_size: int = 128
) -> DataFrame:
    """O3: the [lo, hi] height driving table, one partition per fetch batch
    (reference DEFAULT_BATCH_SIZE=128, EventStream.kt:66)."""
    span = hi - lo + 1
    parts = max(1, math.ceil(span / batch_size))
    return spark.range(lo, hi + 1, numPartitions=parts).withColumnRenamed("id", "height")


def count_windows(
    df: DataFrame, size: int, order_col: str = "height", agg_cols: list | None = None
) -> DataFrame:
    """O4: tumbling count windows (Flow.chunked(size), es-core/.../flow/
    Extensions.kt:70-81): assign ``window_id = floor(seq/size)``.

    Note: a global row_number is a single-partition bottleneck at scale — the
    reference's chunking is inherently sequential too.  For height-contiguous
    data prefer ``floor(height / size)`` which is embarrassingly parallel;
    that's what we use when the order column is the height itself.
    """
    if order_col == "height":
        win = (F.col("height") / size).cast("long")
        out = df.withColumn("window_id", win)
    else:
        w = Window.orderBy(order_col)
        out = df.withColumn(
            "window_id", ((F.row_number().over(w) - 1) / size).cast("long")
        )
    return out


def sliding_window(
    df: DataFrame,
    size: int,
    value_col: str,
    order_col: str,
    partition_cols: list[str] | None = None,
    agg: str = "avg",
):
    """O5: sliding window of ``size`` rows ending at current (ring-buffer
    ``windowed``, es-core/.../flow/Extensions.kt:152-257) as an analytic fn."""
    parts = partition_cols or []
    w = (
        (Window.partitionBy(*parts) if parts else Window.partitionBy(F.lit(1)))
        .orderBy(order_col)
        .rowsBetween(-(size - 1), 0)
    )
    fn = getattr(F, agg)
    return fn(F.col(value_col)).over(w)


def bounded_to(df: DataFrame, end_height: int) -> DataFrame:
    """O6: close the stream at ``endHeight`` (chunked(maxSize, endHeight),
    flow/Extensions.kt:91-117) — batch form is a pushdown-able range filter."""
    return df.filter(F.col("height") <= end_height)
