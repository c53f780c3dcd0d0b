"""Stream-assembly joins/merges on the height key (J1–J3, U1, SURVEY.md §2.5).

The reference's only joins are height-keyed stream assembly:
- J1 pairs /block with /block_results per height (TendermintBlockFetcher.kt:36-46)
- J2 gap-fills missed heights (ContiguousFlow.kt:17-30)
- J3 seamlessly concatenates historical backfill with the live tail, deduping
  on height with history winning (MultiplexFlow.kt:61-158)

Batch forms live here; the streaming forms (microbatch union + watermark dedup)
are in streaming/combined.py and reuse these.

Scale notes: J1 is broadcast-able only when one side is tiny — at 100 TB both
sides are huge, so the plan to want is a shuffle-free sort-merge join from
height-bucketed storage, or at minimum an AQE-planned SMJ on the height key.
The gap-fill driving table is ``spark.range`` (no data movement) and the
anti-join broadcasts the *received-heights* side only if small.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def join_block_results(blocks: DataFrame, block_results: DataFrame) -> DataFrame:
    """J1: equi-join on height (inner: both RPCs must exist for an enriched
    block, BlockFetcher.kt:26-63)."""
    return blocks.join(block_results, on="height", how="inner")


def missing_heights(
    spark: SparkSession, received: DataFrame, lo: int, hi: int, height_col: str = "height"
) -> DataFrame:
    """J2 detection: heights in [lo, hi] absent from ``received``.

    ``spark.range`` is a generated leaf (no scan); the anti-join keys on the
    received side only need the height column → column-pruned.
    """
    want = spark.range(lo, hi + 1).withColumnRenamed("id", "height")
    have = received.select(F.col(height_col).alias("height"))
    return want.join(have, on="height", how="left_anti")


def gap_fill(
    spark: SparkSession,
    received: DataFrame,
    lo: int,
    hi: int,
    fetch: Callable[[DataFrame], DataFrame],
    height_col: str = "height",
) -> DataFrame:
    """J2: fill gaps by fetching missing heights and unioning in order.

    ``fetch`` maps a DataFrame of missing heights → rows with the same schema
    as ``received`` (the reference fetches in chunks of 10 from the fallback
    fetcher; our chunking is partitioning of the missing-heights frame).
    """
    gaps = missing_heights(spark, received, lo, hi, height_col)
    fetched = fetch(gaps)
    return received.unionByName(fetched).orderBy(height_col)


def combine_historical_live(historical: DataFrame, live: DataFrame) -> DataFrame:
    """J3/U1 batch form: history ∪ live, deduped on height (history wins —
    the reference drops live blocks at heights history already emitted,
    MultiplexFlow.kt:123-148), height-ordered.
    """
    from event_stream_spark.operators.filters import dedup_heights

    unioned = historical.unionByName(live, allowMissingColumns=True)
    return dedup_heights(unioned, prefer="historical").orderBy("height")
