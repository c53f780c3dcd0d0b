"""Base64/attribute decode functions (X5–X9).

Reference semantics (es-core/.../Extensions.kt and models/Extensions.kt):
- ``decodeBase64``: decode; **on failure return the input unchanged**
  (Extensions.kt:25-26 ``runCatching { ... }.getOrDefault(this)``)
- ``stripQuotes``: remove surrounding ``"`` (Extensions.kt:20)
- ``isAsciiPrintable``: every char in 32..126; null → false (Extensions.kt:29-31)
- ``repeatDecodeBase64``: iteratively decode+strip ≤10 times, stopping at a
  fixpoint or when the decode result is not ascii-printable; return last good
  value (Extensions.kt:42-53)
- ``Event.toDecodedMap``: base64-decode attribute keys and values into a map
  (models/Extensions.kt:178-190)

Everything stays a Column expression.  ``repeat_decode_base64`` unrolls the
bounded loop (max 10 rounds) into nested CASE WHEN — still codegen'd JVM-side,
no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: Base64 shapes Java's Base64.getDecoder() accepts: standard alphabet, whole
#: 4-char groups, and a final unit that is either 2 chars (+ optional ``==``)
#: or 3 chars (+ optional ``=``) — i.e. padding is OPTIONAL ("aGk" == "aGk=" ==
#: "hi"), but a dangling single char or wrong padding throws.  Spark's unbase64
#: is lenient (best-effort decode of garbage); the RLIKE guard reproduces the
#: reference's throw-→-keep-original semantics (Extensions.kt:25-26).
_B64_RE = "^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}(?:==)?|[A-Za-z0-9+/]{3}=?)?$"


def is_ascii_printable(c: Column | str) -> Column:
    """X7: all chars in [0x20, 0x7e]; null/empty-ok per reference (null→false)."""
    cc = _col(c)
    return F.when(cc.isNull(), F.lit(False)).otherwise(cc.rlike(r"^[\x20-\x7e]*$"))


def strip_quotes(c: Column | str) -> Column:
    """X6: remove surrounding double quotes."""
    return F.regexp_replace(_col(c), '^"|"$', "")


def decode_base64(c: Column | str) -> Column:
    """X5: base64 → UTF-8 string; on malformed input return input unchanged.

    Decode is ``cast(binary AS string)`` + ``make_valid_utf8`` — NOT
    ``F.decode(_, 'UTF-8')``, which throws MALFORMED_CHARACTER_CODING in
    Spark 4; the reference's ``String(bytes, UTF_8)`` substitutes U+FFFD for
    invalid sequences, which is exactly ``make_valid_utf8``'s contract.
    """
    cc = _col(c)
    decoded = F.make_valid_utf8(F.unbase64(cc).cast("string"))
    return F.when(cc.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(cc.rlike(_B64_RE), F.coalesce(decoded, cc)).otherwise(cc)
    )


def repeat_decode_base64(c: Column | str, max_rounds: int = 10) -> Column:
    """X8: iteratively base64-decode + strip quotes until fixpoint, non-base64,
    or non-printable result; at most ``max_rounds`` rounds; return last good.

    The reference loop (Extensions.kt:42-53): while decodable and the decoded
    value is ascii-printable and differs from the current value, keep decoding.

    Implemented as ``F.aggregate`` over a ``max_rounds``-element dummy array:
    the round body is stored ONCE in the plan and the accumulator is a lambda
    variable, so the whole bounded loop runs JVM-side with O(1) plan size (a
    naive unroll duplicates the subtree exponentially and blows up Catalyst).
    """
    def one_round(acc: Column, _: Column) -> Column:
        candidate = strip_quotes(decode_base64(acc))
        good = candidate.isNotNull() & is_ascii_printable(candidate) & (candidate != acc)
        return F.when(good, candidate).otherwise(acc)

    return F.aggregate(
        F.array_repeat(F.lit(1), max_rounds),
        strip_quotes(_col(c)),
        one_round,
    )


def attributes_to_map(attrs: Column | str, *, decode_values: bool = True) -> Column:
    """X9: ARRAY<STRUCT<key,value,index>> → MAP<decoded key, decoded value>.

    Mirrors ``EncodedBlockchainEvent.toDecodedMap()``
    (es-api-model/.../EncodedBlockchainEvent.kt:77, models/Extensions.kt:188-190).
    Null values stay null (real fixtures contain ``value: null``).
    """
    a = _col(attrs)
    value_expr = (
        (lambda x: decode_base64(x["value"])) if decode_values else (lambda x: x["value"])
    )
    return F.map_from_entries(
        F.transform(
            a,
            lambda x: F.struct(
                decode_base64(x["key"]).alias("key"),
                value_expr(x).alias("value"),
            ),
        )
    )


def has_attribute(attrs: Column | str, key_b64_or_plain: Column | str) -> Column:
    """F4: TxEvent.hasAttribute(key) — true if any attribute's *decoded* key
    matches (models/Extensions.kt:171)."""
    a = _col(attrs)
    k = F.lit(key_b64_or_plain) if isinstance(key_b64_or_plain, str) else key_b64_or_plain
    return F.exists(a, lambda x: decode_base64(x["key"]) == k)
