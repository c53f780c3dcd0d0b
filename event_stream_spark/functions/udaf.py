"""User-defined aggregate surface (§2.10).

The reference exposes no UDAF/UDTF; our engine inherits them from Spark:
GROUPED_AGG pandas UDFs (Arrow-batched, JVM-planned partial aggregation is
NOT available — grouped-agg UDFs see whole groups, so they shuffle the full
group; use built-ins when an algebraic aggregate exists).  ``fee_p90`` is the
worked example: an exact per-group percentile, something Spark's builtin
``percentile_approx`` only approximates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@F.pandas_udf("double")
def fee_p90(fees: pd.Series) -> float:
    """Exact 90th-percentile fee of a group (linear interpolation)."""
    clean = fees.dropna()
    if clean.empty:
        return float("nan")
    return float(np.percentile(clean.astype("float64"), 90.0))


def tx_fee_p90_by_type(tx_events: DataFrame) -> DataFrame:
    """Exact p90 fee per event_type over the exploded tx_events table.

    Scale note: a grouped-agg UDF ships each whole group through Arrow — fine
    for percentile-per-type (group count is small, rows per group large); for
    an algebraic stat use the codegen'd builtin instead.
    """
    return (
        tx_events.groupBy("event_type")
        .agg(fee_p90(F.col("fee").cast("double")).alias("fee_p90"))
        .orderBy("event_type")
    )
