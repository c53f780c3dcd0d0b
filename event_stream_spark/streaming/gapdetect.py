"""Stateful gap detection over the live stream — the detection half of the
reference's `contiguous` operator (es-common/.../flows/ContiguousFlow.kt:17-30:
"if incoming height jumps past lastSeen+1, fetch [lastSeen+1, h)"), expressed
as a custom arbitrary-stateful streaming operator (`applyInPandasWithState`).

The blockstream source already *emits* contiguous offsets (gap-fill lives in
the source, SURVEY §7 "keep it in the source to stay simple"), so in the
normal pipeline this operator observes external feeds — e.g. a Kafka topic
written by a third party — where contiguity is NOT guaranteed and missed
heights must be detected and backfilled (J2's anti-join consumes the output).

State = one long per chain (lastSeen): O(#chains), the same scalar state the
reference keeps (MultiplexFlow.kt:70-71).  Cross-microbatch persistence comes
from the state store; eviction is unnecessary at this cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "chain_id string, gap_start bigint, gap_end bigint"
STATE_SCHEMA = "last_seen bigint"


def _detect(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    gaps: list[tuple[str, int, int]] = []
    heights: list[int] = []
    for pdf in pdfs:
        heights.extend(int(h) for h in pdf["height"])
    for h in sorted(heights):
        if last is not None and h > last + 1:
            gaps.append((key[0], last + 1, h - 1))
        if last is None or h > last:
            last = h
    if last is not None:
        state.update((last,))
    yield pd.DataFrame(gaps, columns=["chain_id", "gap_start", "gap_end"])


def detect_gaps(stream_blocks: DataFrame, group_col: str = "chain_id") -> DataFrame:
    """(chain_id, gap_start, gap_end) per detected jump, exactly once per gap.

    Duplicate or out-of-order heights *within* a batch are tolerated (sorted,
    dupes ≤ lastSeen ignored — F5's semantics); a height below lastSeen
    arriving in a *later* batch is a late replay, already emitted, ignored.
    """
    return stream_blocks.groupBy(group_col).applyInPandasWithState(
        _detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
