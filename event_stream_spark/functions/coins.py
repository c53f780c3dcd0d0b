"""Coin/fee parsing (X13).

Reference: ``InnerCoin.amount`` is a decimal string parsed to BigInteger with
ZERO on failure (es-api-model/.../InnerCoin.kt:6-8).  DECIMAL(38,0) caps at 38
digits where BigInteger is unbounded — documented deviation (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_coin_amount(c: Column | str) -> Column:
    """string amount → DECIMAL(38,0), 0 on unparseable/null."""
    cc = F.col(c) if isinstance(c, str) else c
    return F.coalesce(cc.try_cast("decimal(38,0)"), F.lit(0).cast("decimal(38,0)"))
