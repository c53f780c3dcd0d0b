"""S10: gRPC-shaped node adapter (mock transport).

The reference's gRPC flow (es-grpc/.../flows/grpc/GrpcBlockFlow.kt:26-66)
is the same polling composition as S3/S4 — poll current height → dedupe →
gap-fill the height span → fetch each block — with only the FETCHER swapped
(``pbClient.tendermintService.getBlockByHeight`` instead of the RPC/ws
client).  In this engine that composition lives in ``BlockStreamReader``
(offset planning) and the fetcher is the node backend behind the
``_make_node`` seam, so "gRPC support" is precisely: a backend class whose
``fetch`` speaks the alternate protocol.

No gRPC runtime exists in this container, so this adapter deterministically
synthesizes ``GetBlockByHeightResponse``-shaped data and converts it to the
wire JSON the shared decode path expects — proving the plug point (options →
channel config; fetch → per-height unary call) without the transport.  A
real deployment replaces the body of ``fetch`` with the stub call; nothing
else in the engine changes.
"""

from __future__ import annotations

import base64
import json


class GrpcMockNode:
    """Mock of the gRPC block service client, pluggable as
    ``backend="event_stream_spark.sources.grpcmock:GrpcMockNode"``.

    Options (all strings, as data-source options arrive):
    - ``grpc_target``: the channel target a real client would dial (recorded,
      unused by the mock).
    - ``grpc_head``: the current chain height the service reports (default
      500) — standing in for ``getLatestBlock``.
    """

    def __init__(self, options: dict):
        self.target = options.get("grpc_target", "localhost:9090")
        self._head = int(options.get("grpc_head", 500))
        self.chain_id = options.get("chain_id", "grpc-mock-1")

    def head(self) -> int:
        """getLatestBlock().block.header.height (GrpcBlockFlow.kt:33)."""
        return self._head

    def fetch(self, height: int) -> tuple[str, str]:
        """getBlockByHeight(height) → the same (block_json,
        block_results_json) wire pair every other backend yields, so the
        decode/enrich operators are transport-agnostic."""
        n_txs = height % 2  # every other block carries one tx
        txs = [
            base64.b64encode(f"grpc-tx-{height}-{i}".encode()).decode()
            for i in range(n_txs)
        ]
        ts = f"2022-06-01T00:{(height // 60) % 60:02d}:{height % 60:02d}Z"
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
                        "code": 0,
                        "log": "",
                        "events": [
                            {
                                "type": "transfer",
                                "attributes": [
                                    {
                                        "key": base64.b64encode(b"sender").decode(),
                                        "value": base64.b64encode(
                                            f"addr{height}".encode()
                                        ).decode(),
                                        "index": False,
                                    }
                                ],
                            }
                        ],
                    }
                    for _ in range(n_txs)
                ],
                "begin_block_events": [],
            },
        }
        return json.dumps(block), json.dumps(results)
