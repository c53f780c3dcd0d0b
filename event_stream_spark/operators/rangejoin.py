"""Interval-overlap (range) join: pair every left interval with every right
interval it overlaps — `l.start <= r.end AND r.start <= l.end` — optionally
per equality key.

Neither stock Spark nor the reference has this primitive (the reference's
nearest shape is the height-span chunker, es-core/.../EventStream.kt:66-73,
which windows ONE stream; this joins TWO interval sets).  It is the standard
temporal-overlap operator (outage windows × request spans, ad slots ×
sessions).

Implementation — bin blocking, NOT an inequality theta-join:

- pick a bin width W (microseconds); every interval is exploded to the bins
  it covers via ``sequence(floor(s/W), floor(e/W))`` — pure codegen, no UDF;
- equi-join on (bin, *keys) with the overlap predicate as a residual filter;
- keep a pair only in the single bin containing the overlap's START
  (``bin == floor(greatest(l.s, r.s) / W)``) so no post-join dedup pass is
  needed — each overlapping pair survives exactly once.

Scale shape: the only shuffle is the hash exchange on the bin key, the same
as any equi-join — never the BroadcastNestedLoopJoin a raw inequality join
plans to (O(n·m) comparisons regardless of time locality).  Cost is
candidate pairs per bin: with W ≈ the typical interval length, each interval
lands in ≤2 bins and candidates stay near the true-overlap count.  Skewed
bins (a hot hour) split under AQE skew-join handling; W is the sole knob and
plays the role of the reference's chunk size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__rj_bin"


def _explode_bins(df: DataFrame, start: str, end: str, width_us: int) -> DataFrame:
    lo = F.floor(F.col(start) / width_us)
    hi = F.floor(F.col(end) / width_us)
    return df.withColumn(_BIN, F.explode(F.sequence(lo, hi)))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width_us: int,
    on: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join intervals on overlap (inclusive endpoints), optionally also on
    equality ``on`` keys.  Start/end columns are epoch-microsecond longs;
    both relations must already use distinct column names (rename before the
    call — the operator does not suffix).
    """
    if how != "inner":
        raise ValueError("interval_overlap_join supports inner joins only")
    keys = list(on)
    l = _explode_bins(left, left_start, left_end, bin_width_us)
    r = _explode_bins(right, right_start, right_end, bin_width_us)
    overlap: Column = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    once = F.col(_BIN) == F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / bin_width_us
    )
    # name-list join form: the shuffle co-partitions on (bin, *keys) and the
    # shared key columns collapse to one copy in the output
    joined = l.join(r, on=[_BIN, *keys], how="inner").filter(overlap & once)
    return joined.drop(_BIN)
