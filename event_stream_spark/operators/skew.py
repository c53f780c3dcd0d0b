"""Skew mitigation for hot join keys (the 100 TB concern, SURVEY.md §4).

First line of defense is AQE's skew-join splitting (on in session.py) — it
handles skewed *shuffle partitions* transparently.  Salting is the manual
fallback for the case AQE cannot fix: a single key so hot that one task
still drowns (e.g. a stop-shingle band bucket, a zero-fee denom, one chain
in a multi-chain feed).

``salted_join`` implements the standard replicate-the-small-side scheme:
the skewed side gets a random salt in [0, n); the other side is exploded n×
with every salt value; the join key becomes (key, salt).  Exact same rows as
the plain join, fan-out n on the replicated side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, n: int, col_name: str = "_salt", *, spread_duplicates: bool = False
) -> DataFrame:
    """Deterministic-per-row salt in [0, n): hash of all columns mod n —
    reproducible (no RNG state) and uniform enough to split a hot key.

    ``spread_duplicates=True`` additionally mixes in the row position
    (``monotonically_increasing_id``) so byte-identical copies of a hot row
    land in different buckets.  Caveat: position is NONDETERMINISTIC under
    partial stage recomputation when the upstream is a shuffle (task retry
    can reorder rows), and a salt that doubles as a join key must not change
    between attempts — so only enable it when the salted side is read
    directly from stable storage (file scans re-execute identically), which
    is exactly the hot-duplicated-fact-table case that needs it."""
    cols = [*df.columns]
    if spread_duplicates:
        cols.append(F.monotonically_increasing_id())
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*cols), F.lit(n)).cast("int")
    )


def replicate_salts(df: DataFrame, n: int, col_name: str = "_salt") -> DataFrame:
    """Explode the build side n× — one copy per salt value."""
    return df.withColumn(
        col_name, F.explode(F.array(*[F.lit(i) for i in range(n)]))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    *,
    n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the skewed side salted and ``other`` replicated n×.

    Result is row-identical to ``skewed.join(other, on, how)``; the hot key's
    rows spread across n tasks instead of one.  Supported ``how``: inner /
    left joins (the replicated side must be the non-preserved side).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    keys = [on] if isinstance(on, str) else list(on)
    s = with_salt(skewed, n)
    r = replicate_salts(other, n)
    out = s.join(r, keys + ["_salt"], how)
    return out.drop("_salt")
