"""Streaming assembly: live tail, historical backfill, and the seamless
combined flow (S11/J3/U1/F5, SURVEY.md §2.5, §2.9).

The reference's flagship `blockDataFlow` (MultiplexBlockDataFlow.kt:180-269 +
MultiplexFlow.kt:61-158) hand-codes: buffer live into a channel, drain history
first, then live with lastSeen dedup.  The Spark restatement:

    historical (bounded stream from the same source / the block lake)
        UNION live (unbounded blockstream)
        → dropDuplicates("height")            # F5, history wins by arrival
        → shared enrichment transforms        # identical to the batch path

The offset log under ``checkpointLocation`` replaces `Checkpoint` —
kill/restart resumes from the last committed height with no dupes or gaps
(tested in tests/test_streaming.py).

At 100 TB scale: dedup state is height-keyed; with a watermark on block_ts
(`dedup_heights_stream(..., watermark="10 minutes")`) the state store evicts
old heights instead of growing forever — heights are monotonic, so any
out-of-order window is bounded by the backfill/live handoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.functions import header_datetime
from event_stream_spark.operators.flatten import assemble_stream_blocks
from event_stream_spark.schemas import BLOCK_RESULTS_RPC_RESPONSE, BLOCK_RPC_RESPONSE


def parse_source_rows(df: DataFrame) -> DataFrame:
    """(height, block_json, block_results_json) → flat paired columns.

    Shared by batch and streaming reads of the `blockstream` source."""
    b = F.from_json(F.col("block_json"), BLOCK_RPC_RESPONSE)["result"]["block"]
    r = F.from_json(F.col("block_results_json"), BLOCK_RESULTS_RPC_RESPONSE)["result"]
    return df.select(
        "height",
        b["header"]["chain_id"].alias("chain_id"),
        header_datetime(b["header"]["time"]).alias("block_ts"),
        b["data"]["txs"].alias("txs"),
        b.alias("block"),
        r["txs_results"].alias("txs_results"),
        r["begin_block_events"].alias("begin_block_events"),
    )


def _source(
    spark: SparkSession, *, streaming: bool, historical: bool, decode_tx_meta: bool, **options
) -> DataFrame:
    from event_stream_spark.sources import blockstream

    blockstream.register(spark)
    reader = spark.readStream if streaming else spark.read
    raw = reader.format("blockstream").options(
        **{k: str(v) for k, v in options.items() if v is not None}
    ).load()
    return assemble_stream_blocks(
        parse_source_rows(raw), historical=historical, decode_tx_meta=decode_tx_meta
    )


def live_stream(
    spark: SparkSession, *, decode_tx_meta: bool = True, **options
) -> DataFrame:
    """S1–S4 live tail as a streaming DataFrame of STREAM_BLOCK rows."""
    return _source(
        spark, streaming=True, historical=False, decode_tx_meta=decode_tx_meta, **options
    )


def historical_stream(
    spark: SparkSession,
    from_height: int,
    to_height: int | None,
    *,
    streaming: bool = True,
    decode_tx_meta: bool = True,
    **options,
) -> DataFrame:
    """S5 backfill.  ``streaming=True`` yields a bounded stream (unions with
    the live tail); ``streaming=False`` is the plain batch scan."""
    return _source(
        spark,
        streaming=streaming,
        historical=True,
        decode_tx_meta=decode_tx_meta,
        from_height=from_height,
        to_height=to_height,
        **options,
    )


def dedup_heights_stream(df: DataFrame, *, watermark: str | None = None) -> DataFrame:
    """F5 streaming dedup on height.  With ``watermark`` the state store
    evicts (needs block_ts); without, state is unbounded (bounded runs only).
    """
    if watermark is not None:
        return df.withWatermark("block_ts", watermark).dropDuplicatesWithinWatermark(
            ["height"]
        )
    return df.dropDuplicates(["height"])


def combined_block_stream(
    spark: SparkSession,
    from_height: int,
    to_height: int | None = None,
    *,
    live_from: int | None = None,
    watermark: str | None = None,
    decode_tx_meta: bool = True,
    **options,
) -> DataFrame:
    """J3: historical backfill ∪ live tail, deduped on height.

    ``live_from`` is where the live tail starts (defaults to the backfill
    upper bound + 1 — contiguous handoff); overlap between the two legs is
    resolved by the height dedup exactly like the reference's lastSeen skip
    (MultiplexFlow.kt:142-145).
    """
    if to_height is None:
        raise ValueError("bounded backfill needs to_height (head at plan time)")
    hist = historical_stream(
        spark, from_height, to_height, decode_tx_meta=decode_tx_meta, **options
    )
    live = live_stream(
        spark,
        from_height=(live_from if live_from is not None else to_height + 1),
        decode_tx_meta=decode_tx_meta,
        **options,
    )
    return dedup_heights_stream(hist.unionByName(live), watermark=watermark)
