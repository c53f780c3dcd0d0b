"""Message decode/classification layer (X14 priority multi-decoder, S2).

The reference tries decoders by priority (MessageType.kt:18-39): NewBlock /
NewBlockHeader (100) → Error / Panic (99) → Empty (1) → Unknown fallback;
invalid JSON surfaces as a decode failure.  We restate the cascade as ONE
declarative classification column over ``from_json`` with the fixed wire
schema — Catalyst evaluates the ``from_json`` once and the CASE WHEN router
is pure codegen.

Classes (FIXTURES.md §4 oracle labels): ``new_block`` | ``new_block_header`` |
``error`` | ``panic`` | ``empty`` | ``unknown`` | ``malformed``.

Panic semantics: an RPC error whose message/log contains "panic" must abort
the whole stream (RpcError.isPanic, rpc/response/RpcError.kt:10-11;
WebSocketFlow.kt:46-48) — see ``streaming/control.py`` for the abort hook.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from event_stream_spark.schemas import NEW_BLOCK_MESSAGE

MSG_NEW_BLOCK = "new_block"
MSG_NEW_BLOCK_HEADER = "new_block_header"
MSG_ERROR = "error"
MSG_PANIC = "panic"
MSG_EMPTY = "empty"
MSG_UNKNOWN = "unknown"
MSG_MALFORMED = "malformed"

_TYPE_NEW_BLOCK = "tendermint/event/NewBlock"
_TYPE_NEW_BLOCK_HEADER = "tendermint/event/NewBlockHeader"


def classify_expr(payload: Column) -> Column:
    """Classification column for a raw JSON message string."""
    parsed = F.from_json(payload, NEW_BLOCK_MESSAGE)
    # Raw $.result JSON text: distinguishes {} (empty ack) from unexpected
    # scalars/shapes (unknown).  get_json_object returns NULL on invalid JSON.
    res_raw = F.get_json_object(payload, "$.result")
    # Spark's JSON readers are lenient about trailing garbage where the
    # reference's Moshi decoder throws (malformed.json is a valid object
    # followed by junk).  Guard: a wire message must be exactly one JSON
    # object — trimmed payload starts '{', ends '}', and parses.
    trimmed = F.regexp_replace(payload, r"^\s+|\s+$", "")  # trim incl. newlines
    valid_json = (
        trimmed.startswith("{")
        & trimmed.endswith("}")
        & F.get_json_object(payload, "$.jsonrpc").isNotNull()
    )

    err_code = F.coalesce(parsed["result"]["response"]["code"], parsed["result"]["code"])
    err_text = F.concat_ws(
        " ",
        parsed["result"]["message"],
        parsed["result"]["response"]["message"],
        parsed["result"]["response"]["log"],
    )
    data_type = parsed["result"]["data"]["type"]

    return (
        F.when(~valid_json, F.lit(MSG_MALFORMED))
        .when(data_type == _TYPE_NEW_BLOCK, F.lit(MSG_NEW_BLOCK))
        .when(data_type == _TYPE_NEW_BLOCK_HEADER, F.lit(MSG_NEW_BLOCK_HEADER))
        .when(err_code.isNotNull() & F.lower(err_text).contains("panic"), F.lit(MSG_PANIC))
        .when(err_code.isNotNull(), F.lit(MSG_ERROR))
        .when(res_raw.isNull() | (res_raw == "{}"), F.lit(MSG_EMPTY))
        .otherwise(F.lit(MSG_UNKNOWN))
    )


def decode_messages(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S2/X14: raw message strings → parsed struct + ``msg_class`` column.

    Mirrors ``decodeMessages`` (WebSocketFlow.kt:36-56) minus the control-flow
    side effects (drop/throw), which are separate filter/abort operators so the
    parse stays a pure, pushdown-friendly projection.
    """
    payload = F.col(payload_col)
    return df.withColumn("msg", F.from_json(payload, NEW_BLOCK_MESSAGE)).withColumn(
        "msg_class", classify_expr(payload)
    )


def route_messages(decoded: DataFrame) -> DataFrame:
    """F8 message routing: Error → drop (logged upstream), Empty/Unknown/
    Malformed → drop, Panic → kept for the abort check, blocks pass through.

    The reference does this imperatively (WebSocketFlow.kt:36-56,
    LiveMetaDataStream.kt:47-74); declaratively it is a single filter that
    Catalyst can push into the scan.
    """
    return decoded.filter(
        F.col("msg_class").isin(MSG_NEW_BLOCK, MSG_NEW_BLOCK_HEADER, MSG_PANIC)
    )


def new_blocks(decoded: DataFrame) -> DataFrame:
    """P9: NewBlock messages → block rows (select result.data.value.block)."""
    return (
        decoded.filter(F.col("msg_class") == MSG_NEW_BLOCK)
        .select(
            F.col("msg.result.data.value.block").alias("block"),
            F.col("msg.result.data.value.result_begin_block.events").alias(
                "begin_block_events"
            ),
            F.col("msg.result.data.value.result_end_block.events").alias(
                "end_block_events"
            ),
        )
    )


def new_block_headers(decoded: DataFrame) -> DataFrame:
    """P10: NewBlockHeader messages → header rows.

    Mirrors ``mapLiveBlockHeader`` (WsBlockHeaderFlow.kt:26:
    ``it.header.data.value!!.header!!``) plus the height/time projections the
    downstream flows key on.  Only the header struct is touched — no block
    body, no txs."""
    h = F.col("msg.result.data.value.header")
    return decoded.filter(F.col("msg_class") == MSG_NEW_BLOCK_HEADER).select(
        h["height"].cast("long").alias("height"),
        h["chain_id"].alias("chain_id"),
        h.alias("header"),
    )


def check_no_panic(decoded: DataFrame) -> None:
    """Panic → abort (F8): raise if any panic message is present.

    Batch form of the reference's stream-cancel; the streaming form runs this
    per microbatch inside foreachBatch (streaming/control.py).
    """
    n = decoded.filter(F.col("msg_class") == MSG_PANIC).limit(1).count()
    if n:
        raise RuntimeError("panic message received — aborting stream (F8)")
