"""As-of join (point-in-time lookup): for each left row, attach the latest
right row with ``right.ts <= left.ts`` (inclusive; ``strict=True`` for
``<``) sharing the join key.

Neither stock Spark nor the reference has this as a primitive (the
reference's closest shape is the live-block lookup absorbed into its source,
es-core/.../MultiplexBlockDataFlow.kt:82-92); it is the standard time-series
enrichment operator (quotes→trades, config→events), so it lives here as a
first-class generic operator.

Implementation — the union + window formulation, NOT an inequality range
join:

- tag right rows side=0 and left rows side=1 (swapped for ``strict``),
- union on aligned schemas,
- one window per key ordered by ``(ts, side, *tiebreak)``:
  ``last(match_struct, ignorenulls=True)`` over unbounded-preceding rows.

The matched right attributes are packed into ONE struct column before the
window so the carried value is atomic — per-column ``last(ignorenulls)``
would mix attributes from different right rows when some are null.

Scale shape: exactly one shuffle (on the join key) over n_left + n_right
rows and a linear single-pass sort-window — never the O(n_left · n_right)
pair fan-out a ``BETWEEN``-style range join risks, and no driver-side
state.  Skewed keys can reuse ``operators.skew.with_salt`` upstream because
the window is per-key independent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_MATCH = "__asof_match"


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    strict: bool = False,
    tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """Left as-of join.  Every left row is returned once, with
    ``<col><suffix>`` columns holding the matched right row's attributes
    (nulls when no right row is at-or-before it).

    ``tiebreak`` names right-side columns ordering duplicate
    ``(key, right_ts)`` rows (last one wins); without it the winner among
    exact right-side ts ties is unspecified.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    right_cols = list(right_cols)
    tiebreak = list(tiebreak or [])

    match = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(1 if strict else 0).alias(_SIDE),
        match.alias(_MATCH),
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreak],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(0 if strict else 1).alias(_SIDE),
        F.lit(None).cast(r.schema[_MATCH].dataType).alias(_MATCH),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{c}")
            for c in tiebreak
        ],
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _SIDE, *[f"__tb_{c}" for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_MATCH, ignorenulls=True).over(w)
    left_side = F.col(_SIDE) == (0 if strict else 1)
    return (
        u.withColumn(_MATCH, carried)
        .filter(left_side)
        .select(
            *[c for c in left.columns],
            *[F.col(_MATCH)[c].alias(f"{c}{suffix}") for c in right_cols],
        )
    )
