"""Corpus-dump DIRECTORY as a streaming source — ``format("dumpfeed")``.

The crawl front door at scale: shard files (``.jsonl.zst``) land in a
directory as the crawler uploads them, and a streaming query ingests each
shard exactly once — typically straight into a snapshot table via
``streaming/snapsink.py`` (txn-guarded), giving the full loop
crawler → shards → snap table → change feed → downstream views with
every stage exactly-once.

Offset design: shard names must sort in arrival order (``crawl-00042``…
— the layout every sharded uploader produces); the offset is simply the
highest shard name ingested, so the checkpoint is O(1) regardless of
history length (Spark's own FileStreamSource keeps an ever-growing seen-
file log for the general unordered case — the monotone-name contract is
what buys the constant-size offset).  A file that appears BELOW the
checkpointed name would be silently skippable, so ``latestOffset`` fails
LOUDLY when it sees one (the uploader broke the contract; resync).

Scale shape: one input partition per new shard — decode + parse run in
executors, parallelism = shard arrival rate, zero shuffles in the
source.  ``max_files_per_trigger`` bounds catch-up microbatches (same
caveat as snapstream: pair it with processing-time triggers, not
``Trigger.AvailableNow``).
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class DumpShard(InputPartition):
    def __init__(self, path: str, names: list[str]):
        self.path = path
        self.names = names


class DumpFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema):
        self.dir = options["path"]
        self.suffix = options.get("suffix", ".jsonl.zst")
        self.names = schema.fieldNames()
        from event_stream_spark.sources.snapstream import _arrow_schema

        self.arrow_fields = _arrow_schema(schema)
        self.max_per_trigger = (
            int(options.get("max_files_per_trigger", 0)) or None
        )
        # tail-only consumers skip history: shards named <= this start
        # ingested (the from="latest" analogue of the block sources).
        # _start is IMMUTABLE — initialOffset may be called after
        # latestOffset has already advanced the watermark
        self._start = options.get("starting_after", "")
        self._last = self._start
        self._below: set[str] | None = None  # files <= watermark, last poll

    def _shards(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(self.suffix)
        )

    def initialOffset(self) -> dict:
        return {"name": self._start}

    def latestOffset(self) -> dict:
        shards = self._shards()
        below = {f for f in shards if f <= self._last}
        if self._below is not None:
            late = below - self._below
            if late:
                # a file APPEARED below the watermark during this run: the
                # uploader broke the monotone-name contract and the file
                # would otherwise be silently skipped.  (Across a restart
                # the same violation is indistinguishable from an ingested
                # file without a seen-log — the contract, not the check,
                # is the real guarantee; this trips the common case.)
                raise ValueError(
                    f"out-of-order shard(s) {sorted(late)} arrived below "
                    f"the ingested watermark {self._last!r}: resync"
                )
        self._below = below
        fresh = [f for f in shards if f > self._last]
        if self.max_per_trigger is not None:
            # The clamp is safe ONLY because _last can never sit below a
            # committed offset when this runs: on a fresh checkpoint
            # nothing is committed, and on a RESTART Spark always re-plans
            # the last offset-log batch — partitions(start, committed_end)
            # — before its first latestOffset call (verified against the
            # engine; the e2e restart test pins it), which advances _last
            # to the committed end below.  Without that advance, a clamp
            # from the reset watermark would return an offset BELOW the
            # checkpoint; Spark commits whatever this returns as a batch
            # end, and a later batch would re-plan (regressed, head]
            # shards that were already ingested before the restart —
            # duplicates the txn sink cannot catch, since the replays
            # arrive under NEW batch ids.
            fresh = fresh[: self.max_per_trigger]
        if fresh:
            self._last = fresh[-1]
            self._below |= set(fresh)
        return {"name": self._last}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["name"], end["name"]
        if hi > self._last:
            # a replayed (restart-recovered) batch teaches the fresh reader
            # instance the committed watermark — never regress below it
            self._last = hi
            self._below = None  # stale below-set; re-baseline next poll
        names = [f for f in self._shards() if lo < f <= hi]
        missing = [f for f in names if not os.path.exists(os.path.join(self.dir, f))]
        if missing:
            raise ValueError(f"shards vanished mid-plan: {missing}")
        return [DumpShard(os.path.join(self.dir, f), self.names) for f in names]

    def read(self, partition: DumpShard) -> Iterator:
        import json

        import pyarrow as pa

        from event_stream_spark.sources.snapstream import _project_arrow
        from event_stream_spark.sources.zstdcodec import zstd_decompress_fast

        with open(partition.path, "rb") as fh:
            raw = fh.read()
        if partition.path.endswith(".warc.gz"):
            # the crawl-capture variant: gzip members → WARC response
            # records surface under their standard field names
            import zlib

            from event_stream_spark.sources.dumps import _parse_warc

            parts = []
            while raw:
                d = zlib.decompressobj(wbits=31)
                parts.append(d.decompress(raw))
                raw = d.unused_data
            recs = _parse_warc(b"".join(parts))
        else:
            text = zstd_decompress_fast(raw).decode("utf-8")
            recs = [json.loads(l) for l in text.splitlines() if l]
        cols = {
            n: [r.get(n) for r in recs] for n in partition.names
        }
        tbl = pa.table(cols)
        if self.arrow_fields is not None:
            yield from _project_arrow(tbl, self.arrow_fields)
            return
        yield from zip(*[cols[n] for n in partition.names])

    def commit(self, end: dict) -> None:
        # offsets live in the consumer's checkpoint; mirror the committed
        # end locally so the watermark can never regress below it
        if end["name"] > self._last:
            self._last = end["name"]
            self._below = None


class DumpFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dumpfeed"

    def streamReader(self, schema) -> DumpFeedStreamReader:
        return DumpFeedStreamReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(DumpFeedDataSource)
