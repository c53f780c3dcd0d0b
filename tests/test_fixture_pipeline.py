"""End-to-end golden-fixture replay — reproduces the reference's own test
oracle counts (Constants.kt:12-43, StreamTests.kt:278-400, BlockDataFlowTest.kt).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import (
    EXPECTED_HISTORICAL_BLOCK_COUNT,
    EXPECTED_LIVE_COUNT,
    EXPECTED_NONEMPTY_BLOCKS,
    MAX_HIST_HEIGHT,
    MIN_HIST_HEIGHT,
    MIN_LIVE_HEIGHT,
    MAX_LIVE_HEIGHT,
)


@pytest.fixture(scope="module")
def hist_stream_blocks(spark, templates_dir):
    from event_stream_spark.operators import enrich_stream_blocks
    from event_stream_spark.sources import (
        read_block_fixtures,
        read_block_results_fixtures,
    )

    blocks = read_block_fixtures(spark, templates_dir).filter(
        F.col("height").between(MIN_HIST_HEIGHT, MAX_HIST_HEIGHT)
    )
    results = read_block_results_fixtures(spark, templates_dir).filter(
        F.col("height").between(MIN_HIST_HEIGHT, MAX_HIST_HEIGHT)
    )
    sb = enrich_stream_blocks(blocks, results, historical=True).cache()
    yield sb
    sb.unpersist()


def test_historical_block_count(hist_stream_blocks):
    # EXPECTED_HISTORICAL_BLOCK_COUNT = 100 (Constants.kt:31)
    assert hist_stream_blocks.count() == EXPECTED_HISTORICAL_BLOCK_COUNT


def test_nonempty_block_count(hist_stream_blocks):
    # EXPECTED_NONEMPTY_BLOCKS = 29 (Constants.kt:33); F1 skip-empty filter
    from event_stream_spark.operators import skip_empty_blocks

    nonempty = skip_empty_blocks(
        hist_stream_blocks.withColumn("txs", F.col("block.data.txs"))
    )
    assert nonempty.count() == EXPECTED_NONEMPTY_BLOCKS


def test_historical_flag(hist_stream_blocks):
    # P13: backfill path marks historical=true (EventStream.kt:156-160)
    assert hist_stream_blocks.filter(~F.col("historical")).count() == 0


def test_block_events_nonzero_and_typed(hist_stream_blocks):
    from event_stream_spark.operators import explode_block_events

    be = explode_block_events(hist_stream_blocks)
    assert be.count() > 0
    types = {r["event_type"] for r in be.select("event_type").distinct().collect()}
    # fixture corpus event families (FIXTURES.md §2)
    assert "transfer" in types and "message" in types


def test_tx_events_only_on_nonempty_blocks(hist_stream_blocks):
    from event_stream_spark.operators import explode_tx_events

    te = explode_tx_events(hist_stream_blocks)
    heights_with_tx_events = te.select("block_height").distinct().count()
    assert 0 < heights_with_tx_events <= EXPECTED_NONEMPTY_BLOCKS
    # tx hashes are 64-char uppercase hex (X4)
    bad = te.filter(~F.col("tx_hash").rlike("^[0-9A-F]{64}$")).count()
    assert bad == 0


def test_tx_meta_decoded(hist_stream_blocks):
    # P5: the protobuf wire-format walker extracts fee/denom on real cosmos txs
    from event_stream_spark.operators import explode_tx_events

    te = explode_tx_events(hist_stream_blocks)
    with_fee = te.filter(F.col("fee").isNotNull())
    assert with_fee.count() > 0
    denoms = {r["denom"] for r in with_fee.select("denom").distinct().collect()}
    assert "nhash" in denoms  # Provenance testnet fee denom, visible in fixtures


def test_live_fixture_decode(spark, templates_dir):
    from event_stream_spark import decode
    from event_stream_spark.sources import read_live_fixtures

    decoded = decode.decode_messages(read_live_fixtures(spark, templates_dir))
    assert decoded.count() == EXPECTED_LIVE_COUNT
    assert (
        decoded.filter(F.col("msg_class") == decode.MSG_NEW_BLOCK).count()
        == EXPECTED_LIVE_COUNT
    )
    heights = decode.new_blocks(decoded).select(
        F.col("block.header.height").cast("long").alias("h")
    )
    rows = sorted(r["h"] for r in heights.collect())
    assert rows == list(range(MIN_LIVE_HEIGHT, MAX_LIVE_HEIGHT + 1))


def test_new_block_header_decode(spark, templates_dir):
    """P10: NewBlockHeader messages classify and project to header rows
    (WsBlockHeaderFlow.kt:26 data.value.header) — synthesized from the live
    fixture corpus by rewriting each NewBlock message into its header-only
    twin, so heights/chain match the golden constants."""
    import json

    from event_stream_spark import decode
    from event_stream_spark.sources import read_live_fixtures

    raw = [
        r["payload"] for r in read_live_fixtures(spark, templates_dir).collect()
    ]
    header_msgs = []
    for payload in raw:
        m = json.loads(payload)
        block = m["result"]["data"]["value"]["block"]
        m["result"]["data"]["type"] = "tendermint/event/NewBlockHeader"
        m["result"]["data"]["value"] = {"header": block["header"]}
        header_msgs.append((json.dumps(m),))
    df = spark.createDataFrame(header_msgs, "payload string")
    decoded = decode.decode_messages(df)
    assert (
        decoded.filter(
            F.col("msg_class") == decode.MSG_NEW_BLOCK_HEADER
        ).count()
        == EXPECTED_LIVE_COUNT
    )
    headers = decode.new_block_headers(decoded)
    rows = sorted(r["height"] for r in headers.collect())
    assert rows == list(range(MIN_LIVE_HEIGHT, MAX_LIVE_HEIGHT + 1))
    sample = headers.orderBy("height").head()
    assert sample["header"]["proposer_address"] and sample["chain_id"]
    # header-only rows: no block body / txs anywhere in the output schema
    assert "txs" not in headers.schema.simpleString()


def test_combined_historical_live_count(spark, templates_dir, hist_stream_blocks):
    # combined = 100 + 6 (BlockDataFlowTest.kt:195-200)
    from event_stream_spark import decode
    from event_stream_spark.operators import combine_historical_live
    from event_stream_spark.sources import read_live_fixtures

    live_blocks = decode.new_blocks(
        decode.decode_messages(read_live_fixtures(spark, templates_dir))
    ).select(
        F.col("block.header.height").cast("long").alias("height"),
        F.lit(False).alias("historical"),
    )
    hist = hist_stream_blocks.select("height", "historical")
    merged = combine_historical_live(hist, live_blocks)
    assert merged.count() == EXPECTED_HISTORICAL_BLOCK_COUNT + EXPECTED_LIVE_COUNT


def test_gap_fill(spark):
    # J2: feeding only first+last heights must still yield the full range
    # (missed-block catch-up, BlockDataFlowTest.kt:159-172)
    from event_stream_spark.operators import gap_fill, missing_heights

    received = spark.createDataFrame(
        [(MIN_LIVE_HEIGHT,), (MAX_LIVE_HEIGHT,)], "height long"
    )
    gaps = missing_heights(spark, received, MIN_LIVE_HEIGHT, MAX_LIVE_HEIGHT)
    assert sorted(r["height"] for r in gaps.collect()) == list(
        range(MIN_LIVE_HEIGHT + 1, MAX_LIVE_HEIGHT)
    )
    filled = gap_fill(
        spark, received, MIN_LIVE_HEIGHT, MAX_LIVE_HEIGHT, fetch=lambda g: g
    )
    assert [r["height"] for r in filled.collect()] == list(
        range(MIN_LIVE_HEIGHT, MAX_LIVE_HEIGHT + 1)
    )
