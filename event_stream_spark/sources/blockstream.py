"""`blockstream` — a PySpark Python DataSource for block ingestion
(S1–S6/S10 restated Spark-natively, SURVEY.md §2.1).

The reference's sources are hand-rolled coroutine loops: poll head → plan
height ranges → fetch pages of ≤20 → emit (PollingFlow.kt:32-49,
HistoricalBlockFlow.kt:26-41, GrpcBlockFlow.kt:26-66).  Structured Streaming's
source contract IS that loop, formalized:

- ``initialOffset``    = the ``from`` height (reference: resolved once up
                         front, MultiplexBlockDataFlow.kt:207-215)
- ``latestOffset``     = current chain head (reference: pollingFlow tick)
- ``partitions(a, b)`` = page-size height ranges fetched in parallel
                         (reference: chunking + bounded concurrency — here the
                         cluster scheduler does the fan-out)
- ``read(partition)``  = the per-page RPC fetch (two calls per height, J1)
- checkpointed offsets subsume `Checkpoint(checkEvery=20)` (Checkpoint.kt:6-34)

Rows are raw JSON pairs ``(height, block_json, block_results_json)`` — the
same decode/enrich DataFrame transforms serve batch and streaming unchanged.

Batch mode (``spark.read.format("blockstream")``) covers the bounded
historical scan (S5); streaming mode covers polling live tail (S3/S4/S10).

Node backends are pluggable like the reference's NetAdapter (NetAdapter.kt:13-30):
``fixtures`` replays the golden template corpus; ``synthetic`` generates
deterministic blocks for scale/soak tests; ``http`` speaks real HTTP RPC
(two GETs per height + /status head probe, 502-retry with backoff — the
TendermintServiceOpenApiClient fetch model) via ``sources/rpcnode.py``.
"""

from __future__ import annotations

import base64
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "height BIGINT, block_json STRING, block_results_json STRING"

#: reference TENDERMINT_MAX_QUERY_RANGE (EventStream.kt:73)
DEFAULT_PAGE_SIZE = 20


class HeightRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


# ---------------------------------------------------------------------------
# Node backends
# ---------------------------------------------------------------------------

class FixtureNode:
    """Replays the golden fixture corpus from a directory with
    ``block/<height>.json`` and ``block_results/<height>.json``."""

    def __init__(self, root: str):
        self.root = root

    def head(self) -> int:
        heights = [
            int(f[:-5])
            for f in os.listdir(os.path.join(self.root, "block"))
            if f.endswith(".json")
        ]
        return max(heights)

    def fetch(self, height: int) -> tuple[str | None, str | None]:
        def rd(sub: str) -> str | None:
            p = os.path.join(self.root, sub, f"{height}.json")
            if not os.path.exists(p):
                return None
            with open(p) as fh:
                return fh.read()

        return rd("block"), rd("block_results")


#: default synthetic chain length — finite so head()-derived planning
#: (open ``to``, ``from="latest"``, unbounded live polls) stays bounded;
#: raise via the ``synthetic_head`` option for longer runs
DEFAULT_SYNTHETIC_HEAD = 10_000


class SyntheticNode:
    """Deterministic fake chain: every height yields a valid block/results
    JSON pair; ~1 in 3 blocks carries txs (mirroring the 29% non-empty golden
    corpus).  The chain is ``head`` blocks long — a finite head, because an
    "infinite" sentinel head makes any head-resolved plan (open ``to`` /
    unbounded live tail) enumerate ~2^62 heights on the driver."""

    def __init__(self, chain_id: str = "synthetic-1", head: int = DEFAULT_SYNTHETIC_HEAD):
        self.chain_id = chain_id
        self._head = int(head)

    def head(self) -> int:
        return self._head

    def fetch(self, height: int) -> tuple[str, str]:
        n_txs = height % 3 if height % 3 != 2 else 0
        txs = [
            base64.b64encode(f"tx-{height}-{i}".encode()).decode()
            for i in range(n_txs)
        ]
        ts = f"2021-01-01T00:{(height // 60) % 60:02d}:{height % 60:02d}Z"
        block = {
            "jsonrpc": "2.0",
            "result": {
                "block": {
                    "header": {
                        "chain_id": self.chain_id,
                        "height": str(height),
                        "time": ts,
                        "proposer_address": f"{height:040X}"[:40],
                    },
                    "data": {"txs": txs},
                }
            },
        }
        results = {
            "jsonrpc": "2.0",
            "result": {
                "height": str(height),
                "txs_results": [
                    {
                        "code": 0 if (height + i) % 10 else 1,
                        "log": "" if (height + i) % 10 else "synthetic error",
                        "events": [
                            {
                                "type": "transfer",
                                "attributes": [
                                    {
                                        "key": base64.b64encode(b"amount").decode(),
                                        "value": base64.b64encode(
                                            str(100 * height + i).encode()
                                        ).decode(),
                                        "index": False,
                                    }
                                ],
                            }
                        ],
                    }
                    for i in range(n_txs)
                ],
                "begin_block_events": [
                    {
                        "type": "mint",
                        "attributes": [
                            {
                                "key": base64.b64encode(b"amount").decode(),
                                "value": base64.b64encode(str(height).encode()).decode(),
                                "index": False,
                            }
                        ],
                    }
                ],
            },
        }
        return json.dumps(block), json.dumps(results)


def _make_node(options: dict):
    """The NetAdapter seam (NetAdapter.kt:13-30): resolve the node backend.

    Besides the built-ins, ``backend="pkg.module:ClassName"`` imports a
    custom adapter class and instantiates it with the options dict — the
    plug point for alternate transports (the reference's gRPC fetcher,
    es-grpc/.../GrpcBlockFlow.kt:26-66, plugs in exactly here; see
    sources/grpcmock.py).  A dotted path — not a runtime registry — because
    ``read()`` runs in executor worker processes that must re-resolve the
    backend by import."""
    backend = options.get("backend", "synthetic")
    if backend == "fixtures":
        # single option name; the CLI's --templates-dir flag maps to it
        root = options.get("fixtures_dir")
        if not root:
            raise ValueError("fixtures backend needs fixtures_dir")
        return FixtureNode(root)
    if backend == "synthetic":
        return SyntheticNode(
            options.get("chain_id", "synthetic-1"),
            int(options.get("synthetic_head", DEFAULT_SYNTHETIC_HEAD)),
        )
    if backend == "http":
        # real-wire HTTP RPC (two GETs per height + /status head probe),
        # with 502/transient-fault retry — sources/rpcnode.py
        from event_stream_spark.sources.rpcnode import HttpNode

        return HttpNode(options)
    if ":" in backend:
        import importlib

        mod_name, _, cls_name = backend.partition(":")
        cls = getattr(importlib.import_module(mod_name), cls_name)
        return cls(options)
    raise ValueError(f"unknown blockstream backend: {backend}")


def _plan(lo: int, hi: int, page: int) -> Sequence[HeightRange]:
    """[lo, hi] inclusive → page-size ranges (reference range chunking,
    MetadataStream.kt:59-77)."""
    out = []
    h = lo
    while h <= hi:
        out.append(HeightRange(h, min(h + page - 1, hi)))
        h += page
    return out


def _read_range(node, part: HeightRange) -> Iterator[tuple]:
    for h in range(part.lo, part.hi + 1):
        block_json, results_json = node.fetch(h)
        if block_json is None:
            continue  # missing block: skipped (gap-fill is the reader's union)
        yield (h, block_json, results_json)


# ---------------------------------------------------------------------------
# Readers
# ---------------------------------------------------------------------------

class BlockBatchReader(DataSourceReader):
    """S5 bounded historical scan."""

    def __init__(self, options: dict):
        self.options = options
        if "to_height" not in options:
            raise ValueError(
                "batch blockstream scan is bounded: pass to_height "
                "(use the streaming reader for an open-ended tail)"
            )
        self.lo = int(options["from_height"])
        self.hi = int(options["to_height"])
        if self.lo > self.hi:
            raise ValueError(f"from ({self.lo}) must be <= to ({self.hi})")
        self.page = int(options.get("page_size", DEFAULT_PAGE_SIZE))

    def partitions(self) -> Sequence[InputPartition]:
        return _plan(self.lo, self.hi, self.page)

    def read(self, partition: HeightRange) -> Iterator[tuple]:
        return _read_range(_make_node(self.options), partition)


class BlockStreamReader(DataSourceStreamReader):
    """S3/S4/S10 polling live source with height offsets.

    ``latestOffset`` reports the (optionally ``to``-bounded) chain head, so
    a query restarted from its checkpoint plans exactly the uncommitted
    [committed+1, head] span: no dupes, no gaps.  The optional
    ``max_heights_per_trigger`` throttle (O7) keeps a cursor; it is re-seeded
    from the committed offset in ``partitions()`` so a restarted reader never
    reports a capped head below the checkpoint for more than one poll.
    """

    def __init__(self, options: dict):
        self.options = options
        self.start = int(options.get("from_height", 1))
        self.to = int(options["to_height"]) if "to_height" in options else None
        self.page = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        # O7 throttle (the reference's buffer caps, EventStream.kt:239 /
        # MultiplexFlow.kt:74): bound each microbatch's height span so a
        # deep backlog drains in rate-limited steps instead of one giant
        # batch (same knob as Kafka's maxOffsetsPerTrigger)
        self.max_per_trigger = int(options.get("max_heights_per_trigger", 0)) or None
        self._last = self.start - 1
        self._node = _make_node(options)

    def initialOffset(self) -> dict:
        return {"height": self.start - 1}

    def latestOffset(self) -> dict:
        head = self._node.head()
        if self.to is not None:
            head = min(head, self.to)
        if self.max_per_trigger is not None:
            head = min(head, self._last + self.max_per_trigger)
        self._last = max(self._last, head)
        return {"height": head}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # re-seed the throttle cursor from the committed offset: a restarted
        # reader would otherwise report capped heads below the checkpoint
        # for a few empty triggers before catching up
        self._last = max(self._last, start["height"])
        lo, hi = start["height"] + 1, end["height"]
        if lo > hi:
            return []
        return _plan(lo, hi, self.page)

    def read(self, partition: HeightRange) -> Iterator[tuple]:
        return _read_range(self._node, partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint log


class BlockStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "blockstream"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return BlockBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return BlockStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(BlockStreamDataSource)
