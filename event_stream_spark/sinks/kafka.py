"""K4/K6: Kafka sink (KafkaBlockSink.kt:16-38, serde Extensions.kt:19-36).

Record contract: key = ``"<chainId>.<height>"``, value = JSON bytes of the
StreamBlock.  Expressed as a (key, value) projection ready for
``format("kafka")``; the ack semantics (K6, at-least-once commit after the
callback) are provided by Structured Streaming's offset log: a batch's offsets
commit only after the sink write succeeds.

No broker exists in the test environment, so tests validate the frame; the
writer itself is the stock kafka sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_frame(stream_blocks: DataFrame, chain_id_col: str = "chain_id") -> DataFrame:
    """(key, value) kafka record frame.

    Key chain-id comes from ``block.header.chain_id`` when the block struct
    is present (KafkaBlockSink.kt:30 ``block.block.header!!.chainId``), else
    from ``chain_id_col``.  The value serializes the STREAM_BLOCK fields only
    — the reference writes StreamBlockImpl, so engine-side convenience
    columns (chain_id, block_ts) stay out of the record and the S9 decode
    round-trips byte-identically."""
    from event_stream_spark.schemas import STREAM_BLOCK

    cols = stream_blocks.columns
    cid_sources = []
    if "block" in cols:
        cid_sources.append(F.col("block.header.chain_id"))
    if chain_id_col in cols:
        cid_sources.append(F.col(chain_id_col))
    if not cid_sources:
        raise ValueError(
            "kafka_frame needs a chain id: neither a 'block' struct nor a "
            f"'{chain_id_col}' column is present"
        )
    key = F.concat_ws(".", F.coalesce(*cid_sources), F.col("height").cast("string"))
    value_fields = [f.name for f in STREAM_BLOCK.fields if f.name in cols] or cols
    value = F.to_json(F.struct(*value_fields))
    return stream_blocks.select(
        key.cast("binary").alias("key"), value.cast("binary").alias("value")
    )


def kafka_sink(
    stream_blocks: DataFrame, servers: str, topic: str, checkpoint: str
):
    return (
        kafka_frame(stream_blocks)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def write_kafka_wire_txn_batch(
    records: DataFrame,
    host: str,
    port: int,
    topic: str,
    *,
    txn_prefix: str,
    codec: str = "none",
    batch_rows: int = 500,
    _crash_before_commit: bool = False,
    chaos_flag: str | None = None,
) -> None:
    """Write one (key, value) batch through the wire-protocol transport
    as KIP-98 TRANSACTIONS — one transactional producer PER SPARK
    PARTITION (``transactional.id = f"{txn_prefix}-p{partition}"``), all
    records of a task produced inside a single transaction committed at
    task end.  This is the Flink-KafkaSink shape: executor tasks dial the
    broker themselves (nothing moves through the driver), and per-task
    transactional ids make crash recovery self-fencing.

    Guarantee: ATOMIC PER-TASK VISIBILITY.  A task that dies between
    produce and EndTxn leaves an open transaction that read_committed
    consumers never see; its retry (or the next batch run) re-initializes
    the same transactional.id, which fences the dead incarnation and
    aborts its orphan — consumers observe each task's output exactly once
    or not at all, never partially.  Cross-RESTART exactly-once (a whole
    replayed microbatch) still composes with the K6 offset-log contract,
    exactly as for the idempotent producer (the reference's own sink is
    at-least-once; KafkaBlockSink.kt:16-38).

    ``_crash_before_commit`` is the chaos hook: produce everything, then
    die without EndTxn (test/validation use only).

    Scale shape: O(1) driver work; per-task one connection, one txn,
    ``batch_rows``-sized produce calls; Kafka partition = spark partition
    id mod the topic's partition count."""
    from event_stream_spark.sources.kafkawire import (
        KafkaWireClient,
        TransactionalProducer,
    )

    def _sink(rows) -> None:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        client = KafkaWireClient(host, port)
        try:
            md = client.metadata(topic)
            kparts = len(md["topics"][topic]["partitions"])
            prod = TransactionalProducer(
                client, topic, f"{txn_prefix}-p{pid}", codec=codec
            )
            target = pid % kparts
            buf: list = []
            wrote = False
            for row in rows:
                key = bytes(row.key) if row.key is not None else None
                value = bytes(row.value) if row.value is not None else None
                buf.append((key, value, 0))
                if len(buf) >= batch_rows:
                    prod.send(target, buf)
                    buf, wrote = [], True
            if buf:
                prod.send(target, buf)
                wrote = True
            if _crash_before_commit:
                raise RuntimeError("injected crash between produce and EndTxn")
            # task-retry chaos seam: dies AFTER produce, BEFORE EndTxn —
            # the retried attempt's InitProducerId fences this incarnation
            # and aborts its open transaction (see scripts/chaos_sinks.py)
            from event_stream_spark.chaos import claim_once

            claim_once(chaos_flag)
            if wrote:
                prod.commit()
        finally:
            client.close()

    records.select("key", "value").foreachPartition(_sink)
