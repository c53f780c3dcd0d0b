"""Real gRPC transport for the polling block source (S10) — unary calls
over actual HTTP/2 framing on a localhost socket.

The reference's gRPC flow (es-grpc/.../flows/grpc/GrpcBlockFlow.kt:26-66)
is the S3/S4 polling composition with the FETCHER swapped to a protobuf
service client (``pbClient.tendermintService.getBlockByHeight``).  Here the
fetcher is a node backend behind ``blockstream._make_node``
(``backend="event_stream_spark.sources.grpcwire:GrpcNode"``), and this
module makes the transport real:

- **HTTP/2**: connection preface, SETTINGS exchange + ACK, HEADERS/DATA/
  trailers per stream, odd client stream ids, PING answered, GOAWAY
  honored — ``sources/http2.py`` (RFC 7540/7541 subset, stdlib only).
- **gRPC framing**: each message is the 5-byte length-prefix (compression
  flag + u32 length) around a protobuf payload; request headers are
  ``:method POST, :path /<service>/<method>, content-type
  application/grpc, te trailers``; the response ends with trailers
  carrying ``grpc-status`` (0 = OK, 12 = UNIMPLEMENTED) per the public
  gRPC-over-HTTP/2 spec.
- **Protobuf**: hand-rolled varint/length-delimited wire coding (same
  wire-format layer as ``operators/txmeta.py``'s reader) over a pragmatic
  subset of the Tendermint block protos — Header{chain_id=1, height=2,
  time=3, proposer_address=4}, Data{txs=1 repeated bytes},
  Block{header=1, data=2}, plus results messages mirroring
  ``abci.TxResult``/events.  The full Tendermint proto tree is out of
  scope; the subset carries exactly the fields the shared decode path
  reads, and the conversion to the canonical (block_json,
  block_results_json) wire pair is tested byte-equal against the
  ``grpcmock`` generator.

Service surface (mirrors the cometbft BlockService shape):
``/es.BlockService/GetLatestHeight`` (Empty → {height=1}) and
``/es.BlockService/GetBlockByHeight`` ({height=1} → {block=1, results=2}).

``GrpcNode`` keeps ONE HTTP/2 connection per instance and multiplexes
calls as new streams — per-executor-task connection reuse; tasks planned
over many heights pay one dial, not one per height.
"""

from __future__ import annotations

import base64
import json
import socket
import struct
import threading

from event_stream_spark.sources.http2 import (
    FLAG_ACK,
    FLAG_END_HEADERS,
    FLAG_END_STREAM,
    FRAME_DATA,
    FRAME_GOAWAY,
    FRAME_HEADERS,
    FRAME_PING,
    FRAME_RST_STREAM,
    FRAME_SETTINGS,
    FRAME_WINDOW_UPDATE,
    PREFACE,
    FrameReader,
    H2ProtocolError,
    HpackDecoder,
    HpackEncoder,
    encode_frame,
)

GRPC_OK = 0
GRPC_UNIMPLEMENTED = 12


# ---------------------------------------------------------------------------
# protobuf wire coding (writer side of the txmeta.py reader)
# ---------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def pb_varint(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v) if v else b""  # proto3 default elision


def pb_bytes(field: int, v: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(v)) + v if v else b""


def pb_str(field: int, v: str) -> bytes:
    return pb_bytes(field, v.encode("utf-8"))


def pb_msg(field: int, v: bytes) -> bytes:
    """Nested message — emitted even when empty (presence matters)."""
    return _tag(field, 2) + _varint(len(v)) + v


def pb_fields(data: bytes) -> list[tuple[int, int, int | bytes]]:
    """Decode a message into (field, wire_type, value) triples."""
    out: list[tuple[int, int, int | bytes]] = []
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            v, pos = _read_varint(data, pos)
            out.append((field, wire, v))
        elif wire == 2:
            n, pos = _read_varint(data, pos)
            out.append((field, wire, data[pos:pos + n]))
            pos += n
        elif wire == 5:
            out.append((field, wire, struct.unpack_from("<I", data, pos)[0]))
            pos += 4
        elif wire == 1:
            out.append((field, wire, struct.unpack_from("<Q", data, pos)[0]))
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return out


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, pos


def grpc_frame(message: bytes) -> bytes:
    """The 5-byte gRPC message prefix: compression flag 0 + u32 length."""
    return b"\x00" + len(message).to_bytes(4, "big") + message


def grpc_unframe(data: bytes) -> list[bytes]:
    msgs, pos = [], 0
    while pos < len(data):
        if data[pos] != 0:
            raise ValueError("compressed gRPC message not supported")
        n = int.from_bytes(data[pos + 1:pos + 5], "big")
        msgs.append(data[pos + 5:pos + 5 + n])
        pos += 5 + n
    return msgs


# ---------------------------------------------------------------------------
# the block service messages (pragmatic Tendermint subset)
# ---------------------------------------------------------------------------

def _encode_block_response(height: int, chain_id: str) -> bytes:
    """Build GetBlockByHeightResponse for the deterministic synthetic chain
    — the same generator values as ``grpcmock.GrpcMockNode`` (n_txs =
    height % 2, tx bytes ``grpc-tx-{h}-{i}``), so the client-side JSON is
    comparable byte-for-byte."""
    n_txs = height % 2
    ts = f"2022-06-01T00:{(height // 60) % 60:02d}:{height % 60:02d}Z"
    header = (
        pb_str(1, chain_id)
        + pb_varint(2, height)
        + pb_str(3, ts)
        + pb_str(4, f"{height:040X}"[:40])
    )
    data = b"".join(
        pb_bytes(1, f"grpc-tx-{height}-{i}".encode()) for i in range(n_txs)
    )
    block = pb_msg(1, header) + pb_msg(2, data)

    attr = pb_bytes(1, b"sender") + pb_bytes(2, f"addr{height}".encode())
    event = pb_str(1, "transfer") + pb_msg(2, attr)
    tx_result = pb_varint(1, 0) + pb_str(3, "") + pb_msg(7, event)
    results = pb_varint(1, height) + b"".join(
        pb_msg(2, tx_result) for _ in range(n_txs)
    )
    return pb_msg(1, block) + pb_msg(2, results)


def _decode_block_response(payload: bytes, height_hint: int) -> tuple[str, str]:
    """Proto → the canonical (block_json, block_results_json) wire pair —
    identical construction (key order included) to ``grpcmock``."""
    block_pb = results_pb = b""
    for field, _w, v in pb_fields(payload):
        if field == 1:
            block_pb = v
        elif field == 2:
            results_pb = v

    chain_id = ""
    height = height_hint
    ts = ""
    proposer = ""
    txs: list[str] = []
    for field, _w, v in pb_fields(block_pb):
        if field == 1:  # header
            for f2, _w2, v2 in pb_fields(v):
                if f2 == 1:
                    chain_id = v2.decode()
                elif f2 == 2:
                    height = v2
                elif f2 == 3:
                    ts = v2.decode()
                elif f2 == 4:
                    proposer = v2.decode()
        elif field == 2:  # data
            for f2, _w2, v2 in pb_fields(v):
                if f2 == 1:
                    txs.append(base64.b64encode(v2).decode())

    txs_results = []
    for field, _w, v in pb_fields(results_pb):
        if field != 2:
            continue
        code, log, events = 0, "", []
        for f2, _w2, v2 in pb_fields(v):
            if f2 == 1:
                code = v2
            elif f2 == 3:
                log = v2.decode()
            elif f2 == 7:
                etype, attrs = "", []
                for f3, _w3, v3 in pb_fields(v2):
                    if f3 == 1:
                        etype = v3.decode()
                    elif f3 == 2:
                        key = value = b""
                        for f4, _w4, v4 in pb_fields(v3):
                            if f4 == 1:
                                key = v4
                            elif f4 == 2:
                                value = v4
                        attrs.append({
                            "key": base64.b64encode(key).decode(),
                            "value": base64.b64encode(value).decode(),
                            "index": False,
                        })
                events.append({"type": etype, "attributes": attrs})
        txs_results.append({"code": code, "log": log, "events": events})

    block = {
        "jsonrpc": "2.0",
        "result": {
            "block": {
                "header": {
                    "chain_id": chain_id,
                    "height": str(height),
                    "time": ts,
                    "proposer_address": proposer,
                },
                "data": {"txs": txs},
            }
        },
    }
    results = {
        "jsonrpc": "2.0",
        "result": {
            "height": str(height),
            "txs_results": txs_results,
            "begin_block_events": [],
        },
    }
    return json.dumps(block), json.dumps(results)


# ---------------------------------------------------------------------------
# server
# ---------------------------------------------------------------------------

SERVICE = "es.BlockService"


class GrpcBlockServer:
    """A gRPC service over real HTTP/2 frames serving the deterministic
    synthetic chain.  Thread-per-connection; streams on a connection are
    served in arrival order (unary calls — no long-lived streams)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, *,
                 head: int = 500, chain_id: str = "grpc-wire-1"):
        self._srv = socket.create_server((host, port))
        self.host, self.port = self._srv.getsockname()[:2]
        self.head_height = head
        self.chain_id = chain_id
        self.connections = 0
        self.calls = 0
        self.unimplemented = 0
        self._stopped = threading.Event()
        self._socks: list[socket.socket] = []
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self) -> None:
        while not self._stopped.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return
            self.connections += 1
            self._socks.append(sock)
            threading.Thread(target=self._serve, args=(sock,), daemon=True).start()

    def _serve(self, sock: socket.socket) -> None:
        try:
            # client preface then frames
            buf = b""
            while len(buf) < len(PREFACE):
                chunk = sock.recv(65536)
                if not chunk:
                    return
                buf += chunk
            if not buf.startswith(PREFACE):
                sock.close()
                return
            sock.sendall(encode_frame(FRAME_SETTINGS, 0, 0, b""))
            reader = FrameReader()
            dec = HpackDecoder()
            enc = HpackEncoder()
            streams: dict[int, dict] = {}
            frames = reader.feed(buf[len(PREFACE):])
            while not self._stopped.is_set():
                for ftype, flags, sid, payload in frames:
                    if ftype == FRAME_SETTINGS and not flags & FLAG_ACK:
                        sock.sendall(encode_frame(FRAME_SETTINGS, FLAG_ACK, 0, b""))
                    elif ftype == FRAME_PING and not flags & FLAG_ACK:
                        sock.sendall(encode_frame(FRAME_PING, FLAG_ACK, 0, payload))
                    elif ftype == FRAME_GOAWAY:
                        sock.close()
                        return
                    elif ftype == FRAME_HEADERS:
                        if not flags & FLAG_END_HEADERS:
                            raise H2ProtocolError("CONTINUATION not implemented")
                        streams[sid] = {
                            "headers": dict(dec.decode(payload)),
                            "data": b"",
                        }
                        if flags & FLAG_END_STREAM:
                            self._respond(sock, enc, sid, streams.pop(sid))
                    elif ftype == FRAME_DATA:
                        st = streams.get(sid)
                        if st is None:
                            continue
                        st["data"] += payload
                        if flags & FLAG_END_STREAM:
                            self._respond(sock, enc, sid, streams.pop(sid))
                    elif ftype in (FRAME_WINDOW_UPDATE, FRAME_RST_STREAM):
                        pass
                chunk = sock.recv(65536)
                if not chunk:
                    return
                frames = reader.feed(chunk)
        except (OSError, H2ProtocolError, ValueError):
            pass
        finally:
            sock.close()

    def _respond(self, sock, enc: HpackEncoder, sid: int, st: dict) -> None:
        self.calls += 1
        path = st["headers"].get(":path", "")
        msgs = grpc_unframe(st["data"])
        request = msgs[0] if msgs else b""
        if path == f"/{SERVICE}/GetLatestHeight":
            body = pb_varint(1, self.head_height)
        elif path == f"/{SERVICE}/GetBlockByHeight":
            height = 0
            for field, _w, v in pb_fields(request):
                if field == 1:
                    height = v
            body = _encode_block_response(height, self.chain_id)
        else:
            self.unimplemented += 1
            trailers = enc.encode([
                (":status", "200"),
                ("content-type", "application/grpc"),
                ("grpc-status", str(GRPC_UNIMPLEMENTED)),
                ("grpc-message", f"unknown method {path}"),
            ])
            sock.sendall(encode_frame(
                FRAME_HEADERS, FLAG_END_HEADERS | FLAG_END_STREAM, sid, trailers
            ))
            return
        resp_headers = enc.encode([
            (":status", "200"),
            ("content-type", "application/grpc"),
        ])
        trailers = enc.encode([("grpc-status", str(GRPC_OK))])
        sock.sendall(
            encode_frame(FRAME_HEADERS, FLAG_END_HEADERS, sid, resp_headers)
            + encode_frame(FRAME_DATA, 0, sid, grpc_frame(body))
            + encode_frame(FRAME_HEADERS, FLAG_END_HEADERS | FLAG_END_STREAM,
                           sid, trailers)
        )

    def close(self) -> None:
        self._stopped.set()
        self._srv.close()
        for sock in self._socks:
            try:
                sock.close()
            except OSError:
                pass


# ---------------------------------------------------------------------------
# client / node backend
# ---------------------------------------------------------------------------

class GrpcStatusError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"grpc-status {status}: {message}")
        self.status = status


class GrpcNode:
    """Node backend speaking real gRPC, pluggable as
    ``backend="event_stream_spark.sources.grpcwire:GrpcNode"``.

    Options: ``grpc_target`` (``host:port``), ``chain_id``.  One HTTP/2
    connection per instance (executor tasks re-instantiate by import →
    one dial per task, streams multiplexed per call)."""

    def __init__(self, options: dict):
        target = options.get("grpc_target", "localhost:50051")
        host, _, port = target.rpartition(":")
        self.host, self.port = host or "localhost", int(port)
        self.chain_id = options.get("chain_id", "grpc-wire-1")
        self._sock: socket.socket | None = None
        self._reader = FrameReader()
        self._dec = HpackDecoder()
        self._enc = HpackEncoder()
        self._next_stream = 1
        self._lock = threading.Lock()

    def _connect(self) -> socket.socket:
        if self._sock is None:
            sock = socket.create_connection((self.host, self.port), timeout=10)
            sock.sendall(PREFACE + encode_frame(FRAME_SETTINGS, 0, 0, b""))
            self._sock = sock
            self._reader = FrameReader()
            self._dec = HpackDecoder()
        return self._sock

    def _call(self, method: str, request: bytes) -> bytes:
        """One unary exchange on a fresh odd stream id.  SETTINGS/PING
        bookkeeping is handled inline; response DATA is collected until the
        trailers frame, then grpc-status is enforced."""
        with self._lock:
            sock = self._connect()
            sid = self._next_stream
            self._next_stream += 2
            headers = self._enc.encode([
                (":method", "POST"),
                (":scheme", "http"),
                (":path", f"/{SERVICE}/{method}"),
                (":authority", f"{self.host}:{self.port}"),
                ("content-type", "application/grpc"),
                ("te", "trailers"),
            ])
            sock.sendall(
                encode_frame(FRAME_HEADERS, FLAG_END_HEADERS, sid, headers)
                + encode_frame(FRAME_DATA, FLAG_END_STREAM, sid,
                               grpc_frame(request))
            )
            data = b""
            status: int | None = None
            message = ""
            done = False
            while not done:
                chunk = sock.recv(65536)
                if not chunk:
                    self._sock = None
                    raise OSError("connection closed mid-call")
                for ftype, flags, fsid, payload in self._reader.feed(chunk):
                    if ftype == FRAME_SETTINGS and not flags & FLAG_ACK:
                        sock.sendall(encode_frame(FRAME_SETTINGS, FLAG_ACK, 0, b""))
                    elif ftype == FRAME_PING and not flags & FLAG_ACK:
                        sock.sendall(encode_frame(FRAME_PING, FLAG_ACK, 0, payload))
                    elif fsid != sid:
                        continue
                    elif ftype == FRAME_HEADERS:
                        hdrs = dict(self._dec.decode(payload))
                        if "grpc-status" in hdrs:
                            status = int(hdrs["grpc-status"])
                            message = hdrs.get("grpc-message", "")
                        if flags & FLAG_END_STREAM:
                            done = True
                    elif ftype == FRAME_DATA:
                        data += payload
                        if flags & FLAG_END_STREAM:
                            done = True
            if status is None or status != GRPC_OK:
                raise GrpcStatusError(status if status is not None else -1, message)
            msgs = grpc_unframe(data)
            return msgs[0] if msgs else b""

    def head(self) -> int:
        """GetLatestHeight — getLatestBlock().block.header.height
        (GrpcBlockFlow.kt:33)."""
        body = self._call("GetLatestHeight", b"")
        for field, _w, v in pb_fields(body):
            if field == 1:
                return v
        return 0

    def fetch(self, height: int) -> tuple[str, str]:
        """GetBlockByHeight(height) → the canonical (block_json,
        block_results_json) pair every backend yields."""
        body = self._call("GetBlockByHeight", pb_varint(1, height))
        return _decode_block_response(body, height)

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.sendall(encode_frame(FRAME_GOAWAY, 0, 0, b"\x00" * 8))
            except OSError:
                pass
            self._sock.close()
            self._sock = None
