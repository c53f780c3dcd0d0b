"""Real Kafka wire protocol (S9): message-set codec, broker/client
protocol exchange, and the Spark streaming source end-to-end with corrupt
routing and throttling.

Parity targets: es-kafka/.../KafkaBlockSource.kt:15-30 (consume + decode),
KafkaSourceTests.kt:37-286 (SerializationException → corrupt routing).
"""

from __future__ import annotations

import json
import time

import pytest

from event_stream_spark.sources.kafkawire import (
    TS_EARLIEST,
    TS_LATEST,
    KafkaWireBroker,
    KafkaWireClient,
    KafkaWireError,
    decode_message_set,
    encode_message_set,
    kafka_wire_block_source,
)


def test_message_set_roundtrip_and_crc():
    records = [
        (0, 1650000000000, b"k0", b"v0"),
        (1, 1650000000001, None, b"null-key"),
        (2, 1650000000002, b"k2", None),
    ]
    blob = encode_message_set(records)
    assert decode_message_set(blob) == records

    # corrupt a payload byte → CRC catches it
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(KafkaWireError, match="crc"):
        decode_message_set(bytes(bad))

    # partial trailing message (a mid-message fetch cut) parses the prefix
    assert decode_message_set(blob[:len(blob) - 3]) == records[:2]


def test_broker_client_protocol_exchange():
    broker = KafkaWireBroker(num_partitions=2)
    client = KafkaWireClient(broker.host, broker.port)
    try:
        versions = client.api_versions()
        assert versions[0] == (0, 2) and versions[1] == (0, 2)

        md = client.metadata("blocks")
        assert md["brokers"] == [(0, broker.host, broker.port)]
        assert len(md["topics"]["blocks"]["partitions"]) == 2

        base = client.produce(
            "blocks", 0,
            [(b"k1", b"v1", 1000), (None, b"v2", 2000)],
        )
        assert base == 0
        assert client.produce("blocks", 0, [(b"k3", b"v3", 3000)]) == 2
        assert client.produce("blocks", 1, [(b"p1", b"pv", 4000)]) == 0

        assert client.list_offsets("blocks", 0, TS_EARLIEST) == 0
        assert client.list_offsets("blocks", 0, TS_LATEST) == 3
        assert client.list_offsets("blocks", 1, TS_LATEST) == 1

        hw, records = client.fetch("blocks", 0, 1)
        assert hw == 3
        assert records == [(1, 2000, None, b"v2"), (2, 3000, b"k3", b"v3")]

        hw, records = client.fetch("blocks", 0, 3)  # at the head: empty
        assert (hw, records) == (3, [])
        # one TCP connection served every request
        assert broker.connections == 1
    finally:
        client.close()
        broker.close()


def _stream_block(height: int) -> bytes:
    return json.dumps({
        "height": height,
        "historical": True,
        "block_events": [],
        "tx_events": [],
        "tx_errors": [],
    }).encode()


def _pump_query(q, done, timeout_s: float = 30.0) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if done():
            return True
        time.sleep(0.05)
    return False


def test_kafka_wire_spark_source_end_to_end(spark):
    """S9 over the real wire: StreamBlock JSON produced through the Kafka
    protocol arrives via the kafkawire source, decodes with the stock
    fixed-schema path, routes corrupt bytes, and picks up mid-stream
    produces (the poll loop advancing the offset ledger)."""
    broker = KafkaWireBroker()
    client = KafkaWireClient(broker.host, broker.port)
    servers = f"{broker.host}:{broker.port}"
    client.produce("blocks", 0, [
        (f"chain-1.{h}".encode(), _stream_block(h), 1650000000000 + h)
        for h in range(1, 6)
    ])
    client.produce("blocks", 0, [(b"chain-1.x", b"\x00 not json", 1)])

    seen: list[tuple] = []
    df = kafka_wire_block_source(spark, servers, "blocks")
    q = (
        df.select("record_key", "corrupt", "block.height")
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _id: seen.extend(
            (r["record_key"], r["corrupt"], r["height"]) for r in b.collect()
        ))
        .start()
    )
    try:
        assert _pump_query(q, lambda: len(seen) >= 6), "initial records missing"
        client.produce("blocks", 0, [
            (b"chain-1.7", _stream_block(7), 1650000000007)
        ])
        assert _pump_query(q, lambda: len(seen) >= 7), "mid-stream produce missing"
    finally:
        q.stop()
        client.close()
        broker.close()

    heights = sorted(h for _k, c, h in seen if not c)
    assert heights == [1, 2, 3, 4, 5, 7]
    corrupt = [k for k, c, _h in seen if c]
    assert corrupt == ["chain-1.x"]


def test_kafka_wire_throttle_caps_batches(spark):
    """O7 over the wire: max_offsets_per_trigger bounds each microbatch."""
    broker = KafkaWireBroker()
    client = KafkaWireClient(broker.host, broker.port)
    servers = f"{broker.host}:{broker.port}"
    client.produce("blocks", 0, [
        (str(h).encode(), _stream_block(h), 1000 + h) for h in range(10)
    ])
    batches: list[int] = []
    df = kafka_wire_block_source(
        spark, servers, "blocks", max_offsets_per_trigger=3
    )
    q = (
        df.writeStream.outputMode("append")
        .foreachBatch(lambda b, _id: batches.append(b.count()))
        .start()
    )
    try:
        assert _pump_query(q, lambda: sum(batches) >= 10)
    finally:
        q.stop()
        client.close()
        broker.close()
    assert max(b for b in batches if b) <= 3
