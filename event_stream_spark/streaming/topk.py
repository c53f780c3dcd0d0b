"""Streaming heavy hitters — the live twin of batch
``datapipe.splits.heavy_hitters``, as a custom stateful operator
(``applyInPandasWithState``) maintaining a Space-Saving summary per hash
bucket.

Batch finds exact >n/k tokens with a Misra-Gries candidate pass + verify
recount; a stream cannot recount the past, so the live operator keeps the
sketch itself as state and emits its summary after every microbatch:

- **Sharding**: tokens shuffle once on ``bucket = hash(word) % n_buckets``
  — the same key the state store shards on, so each bucket's summary sees
  ALL occurrences of its words (sketch error never comes from sharding,
  only from capacity).
- **Space-Saving** (Metwally et al., the standard streaming top-k sketch):
  capacity ``c`` entries per bucket; a hit increments, a miss evicts the
  min-count entry and inherits its count as the new entry's error bound.
  Invariants carried per word: ``count_ub`` (the sketch count, a true
  upper bound) and ``count_lb = count_ub − err`` (a true lower bound);
  any word with true bucket frequency > bucket_total/c is GUARANTEED
  present in the summary.
- **State bound**: ≤ ``c`` (word, count, err) triples per bucket — no
  growth with stream length, no watermark needed; a checkpoint replay of a
  microbatch reproduces identical summaries (the fold is deterministic in
  arrival order within the batch: events are applied in input order).

At 100 TB scale: state is O(n_buckets × c) regardless of corpus size; the
single shuffle carries (bucket, word) pairs.  Emission is the full summary
of every bucket touched by the batch (update semantics — downstream dedups
on (bucket, word) keeping the latest batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOPK_OUTPUT_SCHEMA = (
    "bucket int, word string, count_ub bigint, count_lb bigint, "
    "bucket_total bigint"
)
TOPK_STATE_SCHEMA = (
    "words array<string>, counts array<long>, errs array<long>, total long"
)


def _space_saving(capacity: int):
    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            words, counts, errs, total = state.get
            summary: dict[str, list[int]] = {
                w: [c, e] for w, c, e in zip(words, counts, errs)
            }
            total = int(total)
        else:
            summary, total = {}, 0
        for pdf in pdfs:
            for w in pdf["word"]:
                total += 1
                ent = summary.get(w)
                if ent is not None:
                    ent[0] += 1
                elif len(summary) < capacity:
                    summary[w] = [1, 0]
                else:
                    # evict the min-count entry (ties: lexicographic for
                    # determinism); inherit its count as the error bound
                    victim = min(summary, key=lambda x: (summary[x][0], x))
                    vcount = summary.pop(victim)[0]
                    summary[w] = [vcount + 1, vcount]
        ws = sorted(summary)
        state.update((
            ws,
            [summary[w][0] for w in ws],
            [summary[w][1] for w in ws],
            total,
        ))
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(ws),
                "word": ws,
                "count_ub": [summary[w][0] for w in ws],
                "count_lb": [summary[w][0] - summary[w][1] for w in ws],
                "bucket_total": [total] * len(ws),
            }
        )

    return fold


def heavy_hitters_stream(
    words: DataFrame, *, capacity: int = 64, n_buckets: int = 8
) -> DataFrame:
    """Sketch a stream with a ``word string`` column.  One exchange on the
    bucket key; per-bucket state hard-bounded at ``capacity`` entries."""
    bucketed = words.withColumn(
        "bucket", F.pmod(F.xxhash64("word"), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _space_saving(capacity),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
