"""S9: Kafka block source (KafkaBlockSource.kt:15-30, KafkaStreamBlock.kt:12-26).

The reference consumes StreamBlock JSON bytes from a topic with *lazy*
deserialization (KafkaStreamBlock.kt:15-21 ``by lazy``) and per-record acks
after the user callback (Extensions.kt:10-17).  Spark-side:

- transport is the stock ``format("kafka")`` reader (broker config here);
- lazy decode is free: Catalyst defers ``from_json`` until a downstream
  operator references a decoded column, and column pruning skips it entirely
  for key-only flows — the same laziness, done by the optimizer;
- the ack contract (at-least-once) is Structured Streaming's offset log:
  a microbatch's offsets commit only after the sink/foreachBatch succeeds.

No broker exists in the test environment, so ``decode_kafka_records`` (pure
column transform, the part with semantics) is tested against in-memory frames
shaped like Kafka output; ``kafka_block_source`` itself is stock-reader wiring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.schemas import STREAM_BLOCK


def decode_kafka_records(records: DataFrame, *, drop_corrupt: bool = False) -> DataFrame:
    """Kafka (key, value, topic, partition, offset, …) → decoded stream blocks.

    Mirrors KafkaStreamBlock's lazy JSON decode: ``block`` is a struct column
    parsed with the fixed STREAM_BLOCK schema (no inference).  Garbage bytes
    yield a null struct — the SerializationException path in the reference's
    tests (KafkaSourceTests.kt:37-286) becomes a filterable null instead of a
    thrown error; ``drop_corrupt=True`` applies that filter.
    """
    decoded = records.select(
        F.col("key").cast("string").alias("record_key"),
        F.from_json(F.col("value").cast("string"), STREAM_BLOCK).alias("block"),
        F.col("value").isNotNull().alias("has_payload"),
    )
    # PERMISSIVE from_json yields an all-null struct (not a null struct) on
    # malformed input; `height` is required in every valid StreamBlock, so a
    # payload whose decoded height is null is the SerializationException case.
    decoded = decoded.withColumn(
        "corrupt", F.col("has_payload") & F.col("block.height").isNull()
    ).drop("has_payload")
    if drop_corrupt:
        decoded = decoded.filter(~F.col("corrupt"))
    return decoded


def kafka_block_source(
    spark: SparkSession,
    servers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming reader for StreamBlock JSON on a Kafka topic.

    ``max_offsets_per_trigger`` is the rate knob standing in for the
    reference's bounded consumer buffers (O7).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return decode_kafka_records(reader.load())
