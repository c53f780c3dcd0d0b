"""Scalar function surface (SURVEY.md §2.8, X1–X14).

All implemented as JVM-side Column expressions (whole-stage-codegen friendly)
except ``repeat_decode_base64`` which is a *bounded unrolled* column expression
(10 iterations, mirroring the reference's loop cap) so even that stays off the
Python slow path.
"""

from event_stream_spark.functions.hashing import (  # noqa: F401
    sha256_hex,
    sha256_concat,
    to_hex_upper,
    tx_hash,
    splay_key,
    splay_filename,
)
from event_stream_spark.functions.encoding import (  # noqa: F401
    decode_base64,
    strip_quotes,
    is_ascii_printable,
    repeat_decode_base64,
    attributes_to_map,
    has_attribute,
)
from event_stream_spark.functions.timeutil import (  # noqa: F401
    header_datetime,
    to_iso_string,
    now_iso,
)
from event_stream_spark.functions.coins import parse_coin_amount  # noqa: F401
