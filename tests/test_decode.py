"""Decode-classification matrix over the reference's rpc/responses corpus —
mirrors StreamTests.kt:53-103 (empty/unknown/malformed/error wrapped+unwrapped/
panic/NewBlock).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_stream_spark import decode

EXPECTED = {
    "empty.json": decode.MSG_EMPTY,
    "error_unwrapped.json": decode.MSG_ERROR,
    "error_wrapped.json": decode.MSG_ERROR,
    "malformed.json": decode.MSG_MALFORMED,
    "panic.json": decode.MSG_PANIC,
    "unknown.json": decode.MSG_UNKNOWN,
}


def test_rpc_response_matrix(spark, templates_dir):
    from event_stream_spark.sources import read_rpc_response_fixtures

    decoded = decode.decode_messages(read_rpc_response_fixtures(spark, templates_dir))
    got = {
        r["path"].rsplit("/", 1)[-1]: r["msg_class"]
        for r in decoded.select("path", "msg_class").collect()
    }
    assert got == EXPECTED


def test_panic_aborts(spark, templates_dir):
    from event_stream_spark.sources import read_rpc_response_fixtures

    decoded = decode.decode_messages(read_rpc_response_fixtures(spark, templates_dir))
    with pytest.raises(RuntimeError, match="panic"):
        decode.check_no_panic(decoded)


def test_route_drops_noise(spark, templates_dir):
    from event_stream_spark.sources import read_rpc_response_fixtures

    decoded = decode.decode_messages(read_rpc_response_fixtures(spark, templates_dir))
    routed = decode.route_messages(decoded)
    classes = {r["msg_class"] for r in routed.select("msg_class").collect()}
    # of the noise corpus only panic survives routing (it must reach the abort)
    assert classes == {decode.MSG_PANIC}
