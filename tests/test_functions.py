"""Scalar-function parity (SURVEY §2.8 X1–X13): the reference's exact edge
semantics, asserted per function — especially the odd ones (decode failure
returns input unchanged, repeat-decode fixpoint/printability stops, coin
parse defaults ZERO)."""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import functions as F


def one(spark, col):
    return spark.range(1).select(col.alias("v")).head()["v"]


def test_sha256_and_hex(spark):
    """X1/X2/X3: sha256 hex digest; concat-then-hash; uppercase hex."""
    from event_stream_spark.functions.hashing import (
        sha256_concat,
        sha256_hex,
        to_hex_upper,
    )

    expect = hashlib.sha256(b"abc").hexdigest()
    assert one(spark, sha256_hex(F.lit("abc"))) == expect
    assert one(spark, sha256_hex(F.lit("abc"), upper=True)) == expect.upper()
    # X2: concat non-null inputs then hash (null skipped, concat_ws semantics)
    assert one(
        spark, sha256_concat(F.lit("a"), F.lit(None).cast("string"), F.lit("bc"))
    ) == expect
    assert one(spark, to_hex_upper(F.lit("az"))) == "617A"


def test_tx_hash(spark):
    """X4: base64-decode then sha256 then UPPER hex — the tx-hash function."""
    from event_stream_spark.functions.hashing import tx_hash

    payload = b"\x01\x02protobuf-ish"
    b64 = base64.b64encode(payload).decode()
    assert one(spark, tx_hash(F.lit(b64))) == hashlib.sha256(payload).hexdigest().upper()


def test_decode_base64_failure_returns_input(spark):
    """X5: invalid base64 → the input string unchanged (Extensions.kt:25-26)."""
    from event_stream_spark.functions.encoding import decode_base64

    assert one(spark, decode_base64(F.lit("aGVsbG8="))) == "hello"
    assert one(spark, decode_base64(F.lit("%%not-base64%%"))) == "%%not-base64%%"


def test_decode_base64_unpadded(spark):
    """Java's Base64.getDecoder() accepts UNPADDED input (len%4 in {2,3}) —
    'aGk' decodes to 'hi' — but still throws on a dangling single char or
    wrong padding; mirror both sides."""
    import base64 as b64mod

    from event_stream_spark.functions.encoding import decode_base64

    assert one(spark, decode_base64(F.lit("aGk"))) == "hi"       # 3-char tail
    assert one(spark, decode_base64(F.lit("aGVsbG8"))) == "hello"  # 7 chars
    assert one(spark, decode_base64(F.lit("aGVsbA"))) == "hell"  # 2-char tail
    # Java throws on these → input returned unchanged
    assert one(spark, decode_base64(F.lit("aGVsbimpossible!"))) == "aGVsbimpossible!"
    assert one(spark, decode_base64(F.lit("aGVsb"))) == "aGVsb"  # dangling 1 char
    assert one(spark, decode_base64(F.lit("aGVsbA="))) == "aGVsbA="  # bad padding
    # sanity: the python decoder agrees on the positive cases
    assert b64mod.b64decode("aGk" + "=").decode() == "hi"


def test_strip_quotes_and_printable(spark):
    """X6/X7."""
    from event_stream_spark.functions.encoding import is_ascii_printable, strip_quotes

    assert one(spark, strip_quotes(F.lit('"quoted"'))) == "quoted"
    assert one(spark, strip_quotes(F.lit('no"inner"kept'))) == 'no"inner"kept'
    assert one(spark, is_ascii_printable(F.lit("plain text!"))) is True
    assert one(spark, is_ascii_printable(F.lit("tab\there"))) is False
    assert one(spark, is_ascii_printable(F.lit(None).cast("string"))) is False


def test_repeat_decode_base64(spark):
    """X8: iterate decode+strip ≤10 rounds, stop at fixpoint or first
    non-printable, return last good value."""
    from event_stream_spark.functions.encoding import repeat_decode_base64

    double = base64.b64encode(base64.b64encode(b"target").decode().encode()).decode()
    assert one(spark, repeat_decode_base64(F.lit(double))) == "target"
    # already-plain strings come back unchanged (decode fails → input)
    assert one(spark, repeat_decode_base64(F.lit("plain words"))) == "plain words"
    # decoding that yields non-printable bytes keeps the last printable form
    binary_b64 = base64.b64encode(b"\x01\x02\x03").decode()
    assert one(spark, repeat_decode_base64(F.lit(binary_b64))) == binary_b64


def test_attributes_to_map(spark):
    """X9: base64-decoded attribute keys → map."""
    from event_stream_spark.functions.encoding import attributes_to_map

    key = base64.b64encode(b"denom").decode()
    val = base64.b64encode(b"nhash").decode()
    df = spark.createDataFrame(
        [([{"key": key, "value": val, "index": True}],)],
        "attrs array<struct<key:string,value:string,index:boolean>>",
    )
    m = df.select(attributes_to_map("attrs").alias("m")).head()["m"]
    assert m == {"denom": "nhash"}


def test_iso_timestamps(spark):
    """X10/P7: ISO-8601 format; unparseable header time → null."""
    from event_stream_spark.functions.timeutil import header_datetime, to_iso_string

    ts = one(spark, header_datetime(F.lit("2021-03-02T10:15:30.123456789Z")))
    assert ts is not None and ts.year == 2021 and ts.microsecond == 123456
    assert one(spark, header_datetime(F.lit("not a time"))) is None
    iso = one(spark, to_iso_string(header_datetime(F.lit("2021-03-02T10:15:30Z"))))
    assert iso.startswith("2021-03-02T10:15:30")


def test_splay_path(spark):
    """K3 path contract: first-4 sha256 hex dir + zero-padded-10 filename."""
    from event_stream_spark.functions.hashing import splay_filename, splay_key

    expect_dir = hashlib.sha256(b"42").hexdigest()[:4]
    assert one(spark, splay_key(F.lit(42).cast("bigint"))) == expect_dir
    assert one(spark, splay_filename(F.lit(42).cast("bigint"))) == "0000000042"


def test_tx_memo_default_empty():
    """P5 memo parity: proto3 omits empty strings on the wire and the
    reference does `body.memo ?: ""` — a PARSEABLE tx with no memo field
    yields note="" (None is only for undecodable payloads)."""
    import base64 as b64mod

    from event_stream_spark.operators.txmeta import decode_tx_meta

    no_memo = b64mod.b64encode(b"\x0a\x00").decode()  # Tx{body: {}}
    assert decode_tx_meta(no_memo) == (None, None, "")
    with_memo = b64mod.b64encode(b"\x0a\x04\x12\x02hi").decode()
    assert decode_tx_meta(with_memo) == (None, None, "hi")
    # tx parses but has no body field at all → still "" (empty TxBody default)
    auth_only = b64mod.b64encode(b"\x12\x00").decode()  # Tx{auth_info: {}}
    assert decode_tx_meta(auth_only) == (None, None, "")
    assert decode_tx_meta("%%%") == (None, None, None)
    assert decode_tx_meta(None) == (None, None, None)


def test_coin_parse(spark):
    """X13: string amount → DECIMAL(38,0), ZERO on unparseable (InnerCoin.kt:6-8)."""
    from event_stream_spark.functions.coins import parse_coin_amount

    assert int(one(spark, parse_coin_amount(F.lit("12345")))) == 12345
    assert int(one(spark, parse_coin_amount(F.lit("garbage")))) == 0
    assert int(one(spark, parse_coin_amount(F.lit(None).cast("string")))) == 0
    big = "9" * 38
    assert int(one(spark, parse_coin_amount(F.lit(big)))) == int(big)


def test_as_of_join_semantics(spark):
    """Generic as-of join: inclusive vs strict boundary, atomic struct carry
    (matched attrs all from ONE right row), no-match nulls, tiebreak winner."""
    from event_stream_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 20), (3, "k", 5), (4, "x", 50)],
        "lid long, key string, ts long",
    )
    right = spark.createDataFrame(
        [("k", 10, 100, None), ("k", 15, 101, "b"), ("k", 15, 102, "c")],
        "key string, ts long, rid long, tag string",
    )
    out = {
        r["lid"]: r
        for r in as_of_join(
            left, right, on="key", right_cols=["rid", "tag"], tiebreak=["rid"]
        ).collect()
    }
    # inclusive: lid=1 at ts=10 sees the ts=10 right row — whose tag is NULL;
    # the struct carry must NOT fall through to an earlier row's tag
    assert out[1]["rid_r"] == 100 and out[1]["tag_r"] is None
    # two right rows tie at ts=15: tiebreak picks the larger rid (last in order)
    assert out[2]["rid_r"] == 102 and out[2]["tag_r"] == "c"
    assert out[3]["rid_r"] is None  # nothing at-or-before ts=5
    assert out[4]["rid_r"] is None  # no right rows for key x
    assert len(out) == 4  # every left row exactly once

    strict = {
        r["lid"]: r
        for r in as_of_join(
            left, right, on="key", right_cols=["rid"], strict=True, tiebreak=["rid"]
        ).collect()
    }
    assert strict[1]["rid_r"] is None  # ts=10 excluded under strict <
    assert strict[2]["rid_r"] == 102


def test_sketch_profile_accuracy(spark):
    """HLL distinct count within 5% of exact; approx median within 5% of the
    exact median — the accuracy contract behind the rows-only registry
    entry."""
    from event_stream_spark.queries import sketch_profile
    from tests.conftest import SF_CORRECT

    for r in sketch_profile(spark, SF_CORRECT).collect():
        assert abs(r.n_users_hll - r.n_users_exact) <= 0.05 * r.n_users_exact, r
        assert abs(r.p50_approx - r.p50_exact) <= 0.05 * abs(r.p50_exact) + 1e-9, r


def test_fuzzy_match_finds_all_edit_types(spark):
    """PassJoin blocking must catch substitution, insertion, AND deletion
    neighbors (shifted segments), and nothing at distance 2 when k=1."""
    from event_stream_spark.operators.fuzzy import fuzzy_match

    master = spark.createDataFrame(
        [(1, "hello world"), (2, "hellp world"), (3, "helo world"),
         (4, "hello worlds"), (5, "hello wrold"), (6, "completely different")],
        "id long, name string",
    )
    probes = master.filter("id = 1")
    got = {(r.p_key, r.m_key, r.dist)
           for r in fuzzy_match(master, probes, text="name", key="id", k=1).collect()}
    # sub (2), deletion (3), insertion (4) are dist 1; transposition (5) is
    # dist 2 and must be excluded at k=1
    assert got == {(1, 2, 1), (1, 3, 1), (1, 4, 1)}


def test_fuzzy_match_short_strings_complete(spark):
    """Masters of length <= k break the pigeonhole guarantee (empty
    segments); the bounded-domain direct pass must still find them —
    including the empty master (ADVICE r3: master 'a' vs probe 'bc' at
    k=2 was unreachable)."""
    from event_stream_spark.operators.fuzzy import fuzzy_match

    master = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, "ab"), (4, "xyz")], "id long, name string"
    )
    probes = spark.createDataFrame(
        [(10, "bc"), (11, "a"), (12, "xy")], "id long, name string"
    )
    got = {(r.p_key, r.m_key, r.dist)
           for r in fuzzy_match(master, probes, text="name", key="id", k=2).collect()}
    # probe 'bc': lev to 'a'=2, ''=2, 'ab'=2 ('xyz'=3 excluded)
    # probe 'a':  lev to ''=1, 'ab'=1 (master 'a' same text but different key
    #             -> dist 0; 'xyz'=3 excluded)
    # probe 'xy': lev to 'xyz'=1, 'a'=2, ''=2, 'ab'=2
    assert got == {
        (10, 1, 2), (10, 2, 2), (10, 3, 2),
        (11, 1, 0), (11, 2, 1), (11, 3, 1),
        (12, 4, 1), (12, 1, 2), (12, 2, 2), (12, 3, 2),
    }
