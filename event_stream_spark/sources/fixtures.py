"""Golden-fixture replay sources (test strategy, SURVEY.md §5).

The reference replays captured Tendermint JSON (es-core/src/testFixtures/
resources/templates/) through mock services.  Our replay is simpler and more
Spark-native: whole-file text read → one row per raw message → the same
decode/enrich operators as production.  The fixture directory layout:

    block/<height>.json          /block RPC responses
    block_results/<height>.json  /block_results RPC responses
    live/<height>.json           NewBlock websocket messages
    rpc/responses/<name>.json    decode corpus (empty/error/panic/unknown/malformed)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_dir(spark: SparkSession, path: str) -> DataFrame:
    """One row per file: (path, payload).  wholetext keeps each fixture file
    a single raw message string, exactly what the decode layer expects."""
    return (
        spark.read.text(f"{path}/*.json", wholetext=True)
        .withColumn("path", F.input_file_name())
        .withColumnRenamed("value", "payload")
    )


def read_block_fixtures(spark: SparkSession, templates_dir: str) -> DataFrame:
    from event_stream_spark.operators.flatten import blocks_from_rpc

    return blocks_from_rpc(read_json_dir(spark, f"{templates_dir}/block"))


def read_block_results_fixtures(spark: SparkSession, templates_dir: str) -> DataFrame:
    from event_stream_spark.operators.flatten import block_results_from_rpc

    return block_results_from_rpc(read_json_dir(spark, f"{templates_dir}/block_results"))


def read_live_fixtures(spark: SparkSession, templates_dir: str) -> DataFrame:
    """Raw NewBlock websocket messages (templates/live/)."""
    return read_json_dir(spark, f"{templates_dir}/live")


def read_rpc_response_fixtures(spark: SparkSession, templates_dir: str) -> DataFrame:
    """The decode-classification corpus (templates/rpc/responses/)."""
    return read_json_dir(spark, f"{templates_dir}/rpc/responses")
