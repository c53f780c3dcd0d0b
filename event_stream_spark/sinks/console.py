"""K2: sampled console sink (ConsoleObserver.kt:16-52).

Every nth block logged (`height % nth == 0`); verbose mode adds the
repeat-base64-decoded attribute dump (X8) as extra columns — done as column
expressions BEFORE the console format so the codegen path does the decoding,
not a Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_stream_spark.functions import repeat_decode_base64
from event_stream_spark.operators.filters import sample_nth


def console_observer(
    stream_blocks: DataFrame, *, nth: int = 100, verbose: bool = False
):
    """Returns a DataStreamWriter; caller adds checkpoint/trigger and starts."""
    df = sample_nth(stream_blocks, nth)
    if verbose:
        df = df.withColumn(
            "decoded_block_events",
            F.transform(
                F.col("block_events"),
                lambda e: F.struct(
                    e["event_type"].alias("event_type"),
                    F.transform(
                        e["attributes"],
                        lambda a: F.struct(
                            repeat_decode_base64(a["key"]).alias("key"),
                            repeat_decode_base64(a["value"]).alias("value"),
                        ),
                    ).alias("attributes"),
                ),
            ),
        )
    return df.writeStream.format("console").option("truncate", "true")
