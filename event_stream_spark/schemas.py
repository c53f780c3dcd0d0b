"""Canonical Spark schemas for the event-stream data model (SURVEY.md §1.3).

The reference fixes its schema at compile time via OpenAPI-generated Kotlin
data classes (es-api-model/build.gradle.kts:44-60); we fix ours as explicit
``StructType`` constants — no ``inferSchema`` anywhere.  Unparseable input is
routed to dead-letter/unknown classification (see ``decode.py``) mirroring the
reference's ``MessageType.Unknown`` (es-core/.../rpc/response/MessageType.kt:44).

Normative row schemas (FIXTURES.md §3):
- ``attribute``: key/value are base64-encoded strings, value nullable
  (real fixtures contain nulls), per the Tendermint OpenAPI ``Event`` schema.
- ``tx_event`` / ``block_event`` / ``tx_error``: the exploded event tables,
  per es-api-model models TxEvent.kt:12-21, BlockEvent.kt:10-15, TxError.kt:11-19.
- ``stream_block``: the wide enriched row, per StreamBlock.kt:5-15.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Leaf schemas
# ---------------------------------------------------------------------------

#: STRUCT<key: STRING, value: STRING, index: BOOLEAN> — base64-encoded k/v.
ATTRIBUTE = StructType(
    [
        StructField("key", StringType(), True),
        StructField("value", StringType(), True),
        StructField("index", BooleanType(), True),
    ]
)

#: STRUCT<type: STRING, attributes: ARRAY<attribute>> — raw abci event.
ABCI_EVENT = StructType(
    [
        StructField("type", StringType(), True),
        StructField("attributes", ArrayType(ATTRIBUTE), True),
    ]
)

#: Fee type: the reference uses unbounded BigInteger (InnerCoin.kt:6-8);
#: DECIMAL(38,0) is the Spark-native cap (documented deviation, SURVEY §7).
FEE = DecimalType(38, 0)

# ---------------------------------------------------------------------------
# Exploded event tables (normative outputs)
# ---------------------------------------------------------------------------

BLOCK_EVENT = StructType(
    [
        StructField("block_height", LongType(), False),
        StructField("block_ts", TimestampType(), True),
        StructField("event_type", StringType(), True),
        StructField("attributes", ArrayType(ATTRIBUTE), True),
    ]
)

TX_EVENT = StructType(
    [
        StructField("block_height", LongType(), False),
        StructField("block_ts", TimestampType(), True),
        StructField("tx_hash", StringType(), True),
        StructField("event_type", StringType(), True),
        StructField("attributes", ArrayType(ATTRIBUTE), True),
        StructField("fee", FEE, True),
        StructField("denom", StringType(), True),
        StructField("note", StringType(), True),
    ]
)

TX_ERROR = StructType(
    [
        StructField("block_height", LongType(), False),
        StructField("block_ts", TimestampType(), True),
        StructField("code", LongType(), True),
        StructField("info", StringType(), True),
        StructField("tx_hash", StringType(), True),
        StructField("fee", FEE, True),
        StructField("denom", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Raw RPC / websocket wire schemas (subset we consume; extra JSON keys are
# simply not projected — same effect as the reference's ignored fields)
# ---------------------------------------------------------------------------

BLOCK_ID = StructType([StructField("hash", StringType(), True)])

BLOCK_HEADER = StructType(
    [
        StructField("chain_id", StringType(), True),
        StructField("height", StringType(), True),  # wire sends strings OR ints; cast later
        StructField("time", StringType(), True),
        StructField("last_commit_hash", StringType(), True),
        StructField("data_hash", StringType(), True),
        StructField("validators_hash", StringType(), True),
        StructField("next_validators_hash", StringType(), True),
        StructField("consensus_hash", StringType(), True),
        StructField("app_hash", StringType(), True),
        StructField("last_results_hash", StringType(), True),
        StructField("evidence_hash", StringType(), True),
        StructField("proposer_address", StringType(), True),
    ]
)

BLOCK = StructType(
    [
        StructField("header", BLOCK_HEADER, True),
        StructField(
            "data",
            StructType([StructField("txs", ArrayType(StringType()), True)]),
            True,
        ),
    ]
)

#: /block RPC response (templates/block/*.json)
BLOCK_RPC_RESPONSE = StructType(
    [
        StructField("jsonrpc", StringType(), True),
        StructField(
            "result",
            StructType(
                [
                    StructField("block_id", BLOCK_ID, True),
                    StructField("block", BLOCK, True),
                ]
            ),
            True,
        ),
    ]
)

TX_RESULT = StructType(
    [
        StructField("code", LongType(), True),
        StructField("log", StringType(), True),
        StructField("gas_wanted", StringType(), True),
        StructField("gas_used", StringType(), True),
        StructField("events", ArrayType(ABCI_EVENT), True),
    ]
)

#: /block_results RPC response (templates/block_results/*.json)
BLOCK_RESULTS_RPC_RESPONSE = StructType(
    [
        StructField("jsonrpc", StringType(), True),
        StructField(
            "result",
            StructType(
                [
                    StructField("height", StringType(), True),
                    StructField("txs_results", ArrayType(TX_RESULT), True),
                    StructField("begin_block_events", ArrayType(ABCI_EVENT), True),
                    StructField("end_block_events", ArrayType(ABCI_EVENT), True),
                ]
            ),
            True,
        ),
    ]
)

#: tm.event='NewBlock' websocket message (templates/live/*.json).
NEW_BLOCK_MESSAGE = StructType(
    [
        StructField("jsonrpc", StringType(), True),
        StructField(
            "result",
            StructType(
                [
                    StructField(
                        "data",
                        StructType(
                            [
                                StructField("type", StringType(), True),
                                StructField(
                                    "value",
                                    StructType(
                                        [
                                            StructField(
                                                "result_begin_block",
                                                StructType(
                                                    [
                                                        StructField(
                                                            "events",
                                                            ArrayType(ABCI_EVENT),
                                                            True,
                                                        )
                                                    ]
                                                ),
                                                True,
                                            ),
                                            StructField(
                                                "result_end_block",
                                                StructType(
                                                    [
                                                        StructField(
                                                            "events",
                                                            ArrayType(ABCI_EVENT),
                                                            True,
                                                        )
                                                    ]
                                                ),
                                                True,
                                            ),
                                            StructField("block", BLOCK, True),
                                            # NewBlockHeader messages carry the
                                            # header directly (WsBlockHeaderFlow
                                            # .kt:26 data.value.header)
                                            StructField("header", BLOCK_HEADER, True),
                                        ]
                                    ),
                                    True,
                                ),
                            ]
                        ),
                        True,
                    ),
                    # error / panic / empty variants (rpc/responses/*.json)
                    StructField("code", LongType(), True),
                    StructField("message", StringType(), True),
                    StructField(
                        "response",
                        StructType(
                            [
                                StructField("code", LongType(), True),
                                StructField("message", StringType(), True),
                                StructField("log", StringType(), True),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
    ]
)

#: Header-only /block parse schema (S6/S8 header flows): from_json with THIS
#: schema never materializes data.txs — the nested-schema pruning happens at
#: the parse, so the header path moves no tx payloads at any point.
BLOCK_HEADER_RPC_RESPONSE = StructType(
    [
        StructField(
            "result",
            StructType(
                [
                    StructField(
                        "block",
                        StructType([StructField("header", BLOCK_HEADER, True)]),
                        True,
                    )
                ]
            ),
            True,
        ),
    ]
)

#: Flat "blocks" ingest table (FIXTURES.md §1) — what a fully ingested chain
#: looks like at rest: one parquet row per block, partitionable by height range.
BLOCKS_TABLE = StructType(
    [
        StructField("height", LongType(), False),
        StructField("chain_id", StringType(), True),
        StructField("block_ts", TimestampType(), True),
        StructField("data_hash", StringType(), True),
        StructField("proposer_address", StringType(), True),
        StructField("txs", ArrayType(StringType()), True),
        StructField("historical", BooleanType(), True),
    ]
)

#: Flat "block_results" ingest table (FIXTURES.md §2).
BLOCK_RESULTS_TABLE = StructType(
    [
        StructField("height", LongType(), False),
        StructField("txs_results", ArrayType(TX_RESULT), True),
        StructField("begin_block_events", ArrayType(ABCI_EVENT), True),
    ]
)

#: The enriched wide row (StreamBlock.kt:5-15).
STREAM_BLOCK = StructType(
    [
        StructField("height", LongType(), False),
        StructField("block", BLOCK, True),
        StructField("block_events", ArrayType(BLOCK_EVENT), True),
        StructField("tx_events", ArrayType(TX_EVENT), True),
        StructField("tx_errors", ArrayType(TX_ERROR), True),
        StructField("historical", BooleanType(), True),
    ]
)
