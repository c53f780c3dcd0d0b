"""Filter/predicate operators (F1–F7, SURVEY.md §2.4).

All pure Column predicates → predicate pushdown + codegen for free.  The
scale-relevant trick the reference hand-codes — applying ``skipEmptyBlocks``
on the cheap ``numTxs`` metadata *before* the expensive full fetch
(MetadataStream.kt:111-117) — falls out of Catalyst filter pushdown when the
blocks table carries a ``num_txs``/``txs`` column in parquet.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skip_empty_blocks(df: DataFrame, txs_col: str = "txs") -> DataFrame:
    """F1: drop blocks with no txs (StreamBlock.isEmpty, StreamBlock.kt:14;
    EventStream.kt:129-130)."""
    return df.filter(F.size(F.coalesce(F.col(txs_col), F.array())) > 0)


def filter_by_events(
    stream_blocks: DataFrame,
    tx_event_types: Iterable[str] = (),
    block_event_types: Iterable[str] = (),
) -> DataFrame:
    """F2: keep a block if ANY tx/block event type is in the configured sets;
    both sets empty ⇒ keep everything (keepBlock, EventStream.kt:135-149).

    Expressed over the wide row's array columns with ``exists`` — no explode,
    no shuffle.  (The exploded-table equivalent is a left-semi join against
    the type set; used by queries.py Q18.)
    """
    txs = list(tx_event_types)
    blks = list(block_event_types)
    if not txs and not blks:
        return stream_blocks
    preds = []
    if txs:
        preds.append(F.exists("tx_events", lambda e: e["event_type"].isin(txs)))
    if blks:
        preds.append(F.exists("block_events", lambda e: e["event_type"].isin(blks)))
    cond = preds[0]
    for p in preds[1:]:
        cond = cond | p
    return stream_blocks.filter(cond)


def tri_state_predicate(
    value: Column, predicate: Column | None, *, empty: Column | None = None
) -> Column:
    """F3: legacy tri-state event predicate (StreamBlockImplT.kt:62-84) —
    null predicate ⇒ pass; optional ``empty`` condition overrides."""
    if predicate is None:
        return F.lit(True)
    base = F.when(value.isNull(), F.lit(True)).otherwise(predicate)
    if empty is not None:
        base = F.when(empty, F.lit(True)).otherwise(base)
    return base


def dedup_heights(df: DataFrame, *, prefer: str | None = "historical") -> DataFrame:
    """F5: one row per height.  With ``prefer``, the row with that boolean
    column true wins (history beats live at the merge point,
    MultiplexFlow.kt:123-148); otherwise arbitrary-first like dropDuplicates.
    """
    if prefer is None:
        return df.dropDuplicates(["height"])
    w = Window.partitionBy("height").orderBy(F.col(prefer).desc_nulls_last())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def distinct_until_changed(
    df: DataFrame, value_col: str, order_col: str, partition_cols: Iterable[str] = ()
) -> DataFrame:
    """F6: suppress consecutive repeats of ``value_col`` in ``order_col`` order
    (GrpcBlockFlow.kt:32-34 distinctUntilChanged)."""
    parts = list(partition_cols)
    w = (Window.partitionBy(*parts) if parts else Window.partitionBy(F.lit(1))).orderBy(
        order_col
    )
    prev = F.lag(F.col(value_col)).over(w)
    return (
        df.withColumn("__prev", prev)
        .filter(~F.col(value_col).eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )


def sample_nth(df: DataFrame, nth: int, col: str = "height") -> DataFrame:
    """F7: the console observer's every-nth gate (ConsoleObserver.kt:42-44)."""
    if nth <= 1:
        return df
    return df.filter(F.col(col) % nth == 0)
