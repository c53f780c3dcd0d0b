"""Hashing + splay-path functions (X1–X4, K3 path expression).

Reference semantics:
- ``sha256`` over bytes → digest (es-core/.../utils/Hash.kt:12-18)
- vararg form concatenates non-null strings then hashes (Hash.kt:26-29)
- ``ByteArray.toHexString()`` is UPPERCASE hex (models/Extensions.kt:16)
- ``String.hash()`` = base64-decode → sha256 → uppercase hex — the tx-hash
  function (models/Extensions.kt:35)
- splayed file sink path = first 4 hex chars of sha256(height-string) /
  zero-padded-10 height (es-core/.../observers/FileOutput.kt:16-37)

All pure Column expressions → whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def sha256_hex(c: Column | str, *, upper: bool = False) -> Column:
    """X1: SHA-256 of the input (string or binary), hex digest."""
    h = F.sha2(_col(c), 256)
    return F.upper(h) if upper else h


def sha256_concat(*cols: Column | str, upper: bool = False) -> Column:
    """X2: concat non-null inputs (null-skipping, like the Kotlin vararg
    filterNotNull) then SHA-256."""
    return sha256_hex(F.concat_ws("", *[_col(c) for c in cols]), upper=upper)


def to_hex_upper(c: Column | str) -> Column:
    """X3: uppercase hex of binary."""
    return F.upper(F.hex(_col(c)))


def tx_hash(tx_b64: Column | str) -> Column:
    """X4: the tx-hash function — base64-decode the tx payload, SHA-256,
    uppercase hex (models/Extensions.kt:35)."""
    return F.upper(F.sha2(F.unbase64(_col(tx_b64)), 256))


def splay_key(height: Column | str) -> Column:
    """K3: first 4 hex chars of sha256(str(height)) — the fan-out directory."""
    return F.substring(F.sha2(F.col(height).cast("string") if isinstance(height, str) else height.cast("string"), 256), 1, 4)


def splay_filename(height: Column | str) -> Column:
    """K3: height zero-padded to 10 chars (FileOutput.kt:23)."""
    h = _col(height)
    return F.lpad(h.cast("string"), 10, "0")
