"""Streaming rolling z-score anomaly scoring — the live twin of batch
``queries.ts_anomaly``, as a custom stateful operator
(``applyInPandasWithState``).

Contract (the funnel's ``"arrival"`` stance, streaming/funnel.py): events
are applied in event-time order *within* each microbatch and parity with
the batch operator holds for in-order (cross-batch monotone) arrival — the
reference's own assumption for its live path (heights monotone per chain,
MultiplexFlow.kt:117-155).  An out-of-order arrival is scored against the
trailing window as of its ARRIVAL, which may differ from the batch score;
the batch operator remains the ground truth for replayed data.

State is a hard-bounded ring of the last ``ANOMALY_LOOKBACK`` values per
key (≤ 20 doubles — no growth with stream length, no watermark needed for
boundedness), and the scoring arithmetic — trailing mean / sample stddev
over the strictly-preceding window, z rounded to 6 dp, flag from the
rounded score — is byte-for-byte the batch semantics, so a microbatch
replay after checkpoint restart reproduces identical output rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from event_stream_spark.queries import ANOMALY_LOOKBACK, ANOMALY_MIN_OBS

OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, us bigint, value double, "
    "zscore double, is_anomaly boolean"
)
STATE_SCHEMA = "vals array<double>"


def _score(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    vals: list[float] = list(state.get[0] or ()) if state.exists else []
    events: list[tuple[int, int, float]] = []
    for pdf in pdfs:
        events.extend(
            zip(
                (int(x) for x in pdf["us"]),
                (int(i) for i in pdf["event_id"]),
                (float(v) for v in pdf["value"]),
            )
        )
    out = []
    for us, eid, v in sorted(events):
        z = flag = None
        if len(vals) >= ANOMALY_MIN_OBS:
            arr = np.asarray(vals)
            sd = float(arr.std(ddof=1))
            if sd > 0:
                z = round(float((v - float(arr.mean())) / sd), 6)
                flag = abs(z) > 3
        out.append((key[0], eid, us, v, z, flag))
        vals.append(v)
        if len(vals) > ANOMALY_LOOKBACK:
            vals.pop(0)
    state.update((vals,))
    yield pd.DataFrame(
        out,
        columns=["user_id", "event_id", "us", "value", "zscore", "is_anomaly"],
    )


def anomaly_scores(events: DataFrame) -> DataFrame:
    """Score a stream with columns (user_id, event_id, us, value); ``us``
    is epoch micros (feed ``F.unix_micros(ts)`` from the decoded stream).
    One exchange on ``user_id`` — the same key the state store shards on."""
    return events.groupBy("user_id").applyInPandasWithState(
        _score,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
