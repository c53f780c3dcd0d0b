"""Timestamp functions (P7, X10, X11).

Reference semantics:
- header ``time`` (ISO-8601, nanosecond precision) → OffsetDateTime, null on
  unparseable (models/Extensions.kt:64-72, runCatching → getOrNull)
- ``OffsetDateTime.toISOString()`` ISO format (Extensions.kt:58)
- ``timestamp()``: now as ISO string (es-core/.../utils/Time.kt:9)

Spark ``to_timestamp`` without a format already parses ISO-8601 and returns
null on failure (non-ANSI) — identical null-on-unparseable semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def header_datetime(c: Column | str) -> Column:
    """P7: ISO-8601 string → timestamp, null if invalid."""
    return F.try_to_timestamp(_col(c))


def to_iso_string(c: Column | str) -> Column:
    """X10: timestamp → ISO-8601 string (microsecond precision, Spark's cap)."""
    return F.date_format(_col(c), ISO_FMT)


def now_iso() -> Column:
    """X11: current time as ISO string."""
    return F.date_format(F.current_timestamp(), ISO_FMT)
