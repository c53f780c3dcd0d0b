"""Real Kafka wire protocol for the block topic source (S9) — an in-memory
broker and a client speaking the public Kafka binary protocol over a
localhost socket, plus a Structured Streaming source producing stock-
Kafka-shaped rows.

The reference consumes StreamBlock JSON from a topic through a real
consumer (es-kafka/.../KafkaBlockSource.kt:15-30, acks
Extensions.kt:10-17).  The engine's decode/ack semantics already live in
``sources/kafka.py`` (``decode_kafka_records`` + the offset-log ack
contract); this module makes the TRANSPORT real where no broker binary or
Spark Kafka connector jar exists:

- **Framing**: 4-byte length-prefixed request/response; request header
  v1 (api_key, api_version, correlation_id, nullable client_id) —
  responses matched to requests by correlation id.
- **APIs** (public protocol, versions pinned and advertised honestly):
  ApiVersions v0 (key 18), Metadata v0 (key 3), Produce v2 (key 0),
  Fetch v2 (key 1), ListOffsets v1 (key 2, -1 latest / -2 earliest).
- **Record format**: message-set v1 — per record ``offset • size • crc32
  (over magic..value) • magic=1 • attributes • timestamp(ms) • key •
  value`` with nullable (-1) key/value.  CRCs are verified on read.
  (RecordBatch v2/varint framing is out of scope; v1 is the wire format
  Fetch/Produce v2 officially carry.)
- **Spark source** (``format("kafkawire")``): offsets are per-partition
  next-positions ``{partition: n}`` — exactly Kafka's model, so the
  checkpointed offset log gives the same at-least-once ack contract as
  the stock reader; ``max_offsets_per_trigger`` throttles per poll (O7).
  Executor tasks dial the broker themselves (one connection per task) —
  reads happen cluster-side, never through the driver.

Rows match the stock Kafka reader's schema (key/value binary, topic,
partition, offset, timestamp, timestampType), so ``decode_kafka_records``
composes unchanged — the transport and the semantics stay orthogonal.
"""

from __future__ import annotations

import datetime as dt
import socket
import struct
import threading
import zlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_VERSIONS = 18

ERR_NONE = 0
ERR_UNKNOWN_TOPIC = 3
ERR_OFFSET_OUT_OF_RANGE = 1

TS_LATEST = -1
TS_EARLIEST = -2


class KafkaWireError(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# primitive codec
# ---------------------------------------------------------------------------

def _i8(v: int) -> bytes:
    return struct.pack(">b", v)


def _i16(v: int) -> bytes:
    return struct.pack(">h", v)


def _i32(v: int) -> bytes:
    return struct.pack(">i", v)


def _i64(v: int) -> bytes:
    return struct.pack(">q", v)


def _string(s: str | None) -> bytes:
    if s is None:
        return _i16(-1)
    raw = s.encode("utf-8")
    return _i16(len(raw)) + raw


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return _i32(-1)
    return _i32(len(b)) + b


class _Cursor:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def i8(self) -> int:
        v = struct.unpack_from(">b", self.data, self.pos)[0]
        self.pos += 1
        return v

    def i16(self) -> int:
        v = struct.unpack_from(">h", self.data, self.pos)[0]
        self.pos += 2
        return v

    def i32(self) -> int:
        v = struct.unpack_from(">i", self.data, self.pos)[0]
        self.pos += 4
        return v

    def i64(self) -> int:
        v = struct.unpack_from(">q", self.data, self.pos)[0]
        self.pos += 8
        return v

    def string(self) -> str | None:
        n = self.i16()
        if n < 0:
            return None
        s = self.data[self.pos:self.pos + n].decode("utf-8")
        self.pos += n
        return s

    def bytes(self) -> bytes | None:
        n = self.i32()
        if n < 0:
            return None
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def remaining(self) -> bool:
        return self.pos < len(self.data)


# ---------------------------------------------------------------------------
# message-set v1
# ---------------------------------------------------------------------------

def encode_message_set(
    records: list[tuple[int, int, bytes | None, bytes | None]]
) -> bytes:
    """``(offset, timestamp_ms, key, value)`` entries → wire message set.
    crc32 covers magic..value (everything after the crc field)."""
    out = bytearray()
    for offset, ts, key, value in records:
        body = _i8(1) + _i8(0) + _i64(ts) + _bytes(key) + _bytes(value)
        # crc32 is an UNSIGNED 32-bit value carried in the int32 slot
        # (two's-complement wraparound), per the wire format
        msg = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body
        out += _i64(offset) + _i32(len(msg)) + msg
    return bytes(out)


def decode_message_set(
    data: bytes,
) -> list[tuple[int, int, bytes | None, bytes | None]]:
    out = []
    pos = 0
    while pos + 12 <= len(data):
        offset = struct.unpack_from(">q", data, pos)[0]
        size = struct.unpack_from(">i", data, pos + 8)[0]
        pos += 12
        if pos + size > len(data):
            break  # partial trailing message (legal in Kafka fetches)
        msg = data[pos:pos + size]
        pos += size
        crc = struct.unpack_from(">I", msg, 0)[0]
        body = msg[4:]
        if crc != zlib.crc32(body) & 0xFFFFFFFF:
            raise KafkaWireError(f"crc mismatch at offset {offset}")
        c = _Cursor(body)
        magic = c.i8()
        c.i8()  # attributes (no compression support)
        ts = c.i64() if magic >= 1 else -1
        key = c.bytes()
        value = c.bytes()
        out.append((offset, ts, key, value))
    return out


# ---------------------------------------------------------------------------
# broker
# ---------------------------------------------------------------------------

class KafkaWireBroker:
    """Single-node in-memory broker: auto-created topics, configurable
    partition count, append-only logs.  Thread-per-connection."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, *,
                 num_partitions: int = 1):
        self._srv = socket.create_server((host, port))
        self.host, self.port = self._srv.getsockname()[:2]
        self.num_partitions = num_partitions
        # topic → partition → list[(timestamp_ms, key, value)]
        self._logs: dict[str, list[list[tuple[int, bytes | None, bytes | None]]]] = {}
        self._lock = threading.Lock()
        self._stopped = threading.Event()
        self._socks: list[socket.socket] = []
        self.connections = 0
        self.requests: dict[int, int] = {}  # api_key → count
        threading.Thread(target=self._accept_loop, daemon=True).start()

    # -- log primitives ----------------------------------------------------
    def _partition(self, topic: str, partition: int):
        log = self._logs.setdefault(
            topic, [[] for _ in range(self.num_partitions)]
        )
        if not 0 <= partition < len(log):
            raise KafkaWireError(f"no partition {partition} for {topic}")
        return log[partition]

    def append(self, topic: str, partition: int, ts: int,
               key: bytes | None, value: bytes | None) -> int:
        with self._lock:
            plog = self._partition(topic, partition)
            plog.append((ts, key, value))
            return len(plog) - 1

    def high_watermark(self, topic: str, partition: int) -> int:
        with self._lock:
            return len(self._partition(topic, partition))

    # -- wire loop ---------------------------------------------------------
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
            buf = b""
            while not self._stopped.is_set():
                while len(buf) < 4:
                    chunk = sock.recv(65536)
                    if not chunk:
                        return
                    buf += chunk
                n = struct.unpack_from(">i", buf, 0)[0]
                while len(buf) < 4 + n:
                    chunk = sock.recv(65536)
                    if not chunk:
                        return
                    buf += chunk
                req, buf = buf[4:4 + n], buf[4 + n:]
                sock.sendall(self._dispatch(req))
        except (OSError, KafkaWireError, struct.error):
            pass
        finally:
            sock.close()

    def _dispatch(self, req: bytes) -> bytes:
        c = _Cursor(req)
        api_key, api_version = c.i16(), c.i16()
        corr = c.i32()
        c.string()  # client_id
        self.requests[api_key] = self.requests.get(api_key, 0) + 1
        if api_key == API_VERSIONS:
            body = _i16(ERR_NONE) + _i32(5) + b"".join(
                _i16(k) + _i16(lo) + _i16(hi)
                for k, lo, hi in [
                    (API_PRODUCE, 0, 2), (API_FETCH, 0, 2),
                    (API_LIST_OFFSETS, 0, 1), (API_METADATA, 0, 0),
                    (API_VERSIONS, 0, 0),
                ]
            )
        elif api_key == API_METADATA:
            body = self._metadata(c)
        elif api_key == API_PRODUCE:
            body = self._produce(c, api_version)
        elif api_key == API_FETCH:
            body = self._fetch(c, api_version)
        elif api_key == API_LIST_OFFSETS:
            body = self._list_offsets(c, api_version)
        else:
            raise KafkaWireError(f"unsupported api key {api_key}")
        resp = _i32(corr) + body
        return _i32(len(resp)) + resp

    def _metadata(self, c: _Cursor) -> bytes:
        n = c.i32()
        names = [c.string() for _ in range(n)]
        with self._lock:
            if not names:
                names = sorted(self._logs)
        brokers = _i32(1) + _i32(0) + _string(self.host) + _i32(self.port)
        topics = bytearray(_i32(len(names)))
        for name in names:
            self._logs.setdefault(
                name, [[] for _ in range(self.num_partitions)]
            )
            parts = b"".join(
                _i16(ERR_NONE) + _i32(p) + _i32(0)
                + _i32(1) + _i32(0) + _i32(1) + _i32(0)  # replicas=[0] isr=[0]
                for p in range(self.num_partitions)
            )
            topics += (
                _i16(ERR_NONE) + _string(name)
                + _i32(self.num_partitions) + parts
            )
        return brokers + bytes(topics)

    def _produce(self, c: _Cursor, version: int) -> bytes:
        c.i16()  # acks
        c.i32()  # timeout
        n_topics = c.i32()
        topics = bytearray(_i32(n_topics))
        for _ in range(n_topics):
            name = c.string()
            n_parts = c.i32()
            parts = bytearray(_i32(n_parts))
            for _ in range(n_parts):
                pid = c.i32()
                mset = c.bytes() or b""
                base = self.high_watermark(name, pid)
                for _off, ts, key, value in decode_message_set(mset):
                    self.append(name, pid, ts, key, value)
                parts += _i32(pid) + _i16(ERR_NONE) + _i64(base)
                if version >= 2:
                    parts += _i64(-1)  # log_append_time (producer time kept)
            topics += _string(name) + bytes(parts)
        out = bytes(topics)
        if version >= 1:
            out += _i32(0)  # throttle_time_ms
        return out

    def _fetch(self, c: _Cursor, version: int) -> bytes:
        c.i32()  # replica_id
        c.i32()  # max_wait
        c.i32()  # min_bytes
        n_topics = c.i32()
        topics = bytearray(_i32(n_topics))
        for _ in range(n_topics):
            name = c.string()
            n_parts = c.i32()
            parts = bytearray(_i32(n_parts))
            for _ in range(n_parts):
                pid, off = c.i32(), c.i64()
                max_bytes = c.i32()
                with self._lock:
                    plog = list(self._partition(name, pid))
                hw = len(plog)
                records, size = [], 0
                for o in range(max(0, off), hw):
                    ts, key, value = plog[o]
                    records.append((o, ts, key, value))
                    size += 26 + len(key or b"") + len(value or b"")
                    if size >= max_bytes:
                        break
                mset = encode_message_set(records)
                parts += (
                    _i32(pid) + _i16(ERR_NONE) + _i64(hw) + _bytes(mset)
                )
            topics += _string(name) + bytes(parts)
        head = _i32(0) if version >= 1 else b""  # throttle_time_ms
        return head + bytes(topics)

    def _list_offsets(self, c: _Cursor, version: int) -> bytes:
        c.i32()  # replica_id
        n_topics = c.i32()
        topics = bytearray(_i32(n_topics))
        for _ in range(n_topics):
            name = c.string()
            n_parts = c.i32()
            parts = bytearray(_i32(n_parts))
            for _ in range(n_parts):
                pid = c.i32()
                ts = c.i64()
                if version == 0:
                    c.i32()  # max_num_offsets
                hw = self.high_watermark(name, pid)
                offset = hw if ts == TS_LATEST else 0
                if version == 0:
                    parts += (
                        _i32(pid) + _i16(ERR_NONE) + _i32(1) + _i64(offset)
                    )
                else:
                    parts += (
                        _i32(pid) + _i16(ERR_NONE) + _i64(-1) + _i64(offset)
                    )
            topics += _string(name) + bytes(parts)
        return bytes(topics)

    def close(self) -> None:
        self._stopped.set()
        self._srv.close()
        for sock in self._socks:
            try:
                sock.close()
            except OSError:
                pass


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

class KafkaWireClient:
    """Minimal protocol client: one connection, correlation-id matched
    request/response, the five APIs the broker advertises."""

    def __init__(self, host: str, port: int, client_id: str = "es-spark"):
        self.host, self.port = host, port
        self.client_id = client_id
        self._sock: socket.socket | None = None
        self._corr = 0
        self._lock = threading.Lock()

    def _connect(self) -> socket.socket:
        if self._sock is None:
            self._sock = socket.create_connection(
                (self.host, self.port), timeout=10
            )
        return self._sock

    def _request(self, api_key: int, api_version: int, body: bytes) -> _Cursor:
        with self._lock:
            sock = self._connect()
            self._corr += 1
            corr = self._corr
            req = (
                _i16(api_key) + _i16(api_version) + _i32(corr)
                + _string(self.client_id) + body
            )
            sock.sendall(_i32(len(req)) + req)
            buf = b""
            while len(buf) < 4:
                chunk = sock.recv(65536)
                if not chunk:
                    self._sock = None
                    raise KafkaWireError("connection closed")
                buf += chunk
            n = struct.unpack_from(">i", buf, 0)[0]
            while len(buf) < 4 + n:
                chunk = sock.recv(65536)
                if not chunk:
                    self._sock = None
                    raise KafkaWireError("connection closed")
                buf += chunk
            c = _Cursor(buf[4:4 + n])
            got = c.i32()
            if got != corr:
                raise KafkaWireError(f"correlation mismatch {got} != {corr}")
            return c

    def api_versions(self) -> dict[int, tuple[int, int]]:
        c = self._request(API_VERSIONS, 0, b"")
        err = c.i16()
        if err:
            raise KafkaWireError(f"ApiVersions error {err}")
        return {
            k: (lo, hi)
            for k, lo, hi in (
                (c.i16(), c.i16(), c.i16()) for _ in range(c.i32())
            )
        }

    def metadata(self, topic: str) -> dict:
        c = self._request(API_METADATA, 0, _i32(1) + _string(topic))
        n_brokers = c.i32()
        brokers = [
            (c.i32(), c.string(), c.i32()) for _ in range(n_brokers)
        ]
        n_topics = c.i32()
        topics = {}
        for _ in range(n_topics):
            err, name = c.i16(), c.string()
            parts = []
            for _ in range(c.i32()):
                perr, pid, leader = c.i16(), c.i32(), c.i32()
                replicas = [c.i32() for _ in range(c.i32())]
                isr = [c.i32() for _ in range(c.i32())]
                parts.append(
                    {"error": perr, "id": pid, "leader": leader,
                     "replicas": replicas, "isr": isr}
                )
            topics[name] = {"error": err, "partitions": parts}
        return {"brokers": brokers, "topics": topics}

    def produce(self, topic: str, partition: int,
                records: list[tuple[bytes | None, bytes | None, int]]) -> int:
        """``(key, value, timestamp_ms)`` records → base offset assigned."""
        mset = encode_message_set(
            [(i, ts, key, value) for i, (key, value, ts) in enumerate(records)]
        )
        body = (
            _i16(1) + _i32(10000)  # acks=1, timeout
            + _i32(1) + _string(topic)
            + _i32(1) + _i32(partition) + _bytes(mset)
        )
        c = self._request(API_PRODUCE, 2, body)
        c.i32()  # topic count (1)
        c.string()
        c.i32()  # partition count (1)
        c.i32()  # partition id
        err = c.i16()
        if err:
            raise KafkaWireError(f"produce error {err}")
        return c.i64()

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20
              ) -> tuple[int, list[tuple[int, int, bytes | None, bytes | None]]]:
        """→ (high_watermark, [(offset, timestamp, key, value), …])."""
        body = (
            _i32(-1) + _i32(0) + _i32(0)
            + _i32(1) + _string(topic)
            + _i32(1) + _i32(partition) + _i64(offset) + _i32(max_bytes)
        )
        c = self._request(API_FETCH, 2, body)
        c.i32()  # throttle_time
        c.i32()  # topic count
        c.string()
        c.i32()  # partition count
        c.i32()  # partition id
        err = c.i16()
        if err:
            raise KafkaWireError(f"fetch error {err}")
        hw = c.i64()
        mset = c.bytes() or b""
        return hw, decode_message_set(mset)

    def list_offsets(self, topic: str, partition: int, ts: int = TS_LATEST) -> int:
        body = (
            _i32(-1) + _i32(1) + _string(topic)
            + _i32(1) + _i32(partition) + _i64(ts)
        )
        c = self._request(API_LIST_OFFSETS, 1, body)
        c.i32()  # topic count
        c.string()
        c.i32()  # partition count
        c.i32()  # partition id
        err = c.i16()
        if err:
            raise KafkaWireError(f"list_offsets error {err}")
        c.i64()  # timestamp
        return c.i64()

    def close(self) -> None:
        if self._sock is not None:
            self._sock.close()
            self._sock = None


# ---------------------------------------------------------------------------
# Spark streaming source
# ---------------------------------------------------------------------------

SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


class _FetchRange(InputPartition):
    def __init__(self, host: str, port: int, topic: str, partition: int,
                 start: int, end: int):
        self.host, self.port = host, port
        self.topic, self.partition = topic, partition
        self.start, self.end = start, end


class KafkaWireStreamReader(DataSourceStreamReader):
    """Per-partition next-offset tracking — Kafka's own offset model, so
    the checkpoint log carries the same at-least-once ack contract as the
    stock reader (commit happens only after the sink succeeds)."""

    def __init__(self, options: dict):
        servers = options.get("bootstrap") or options.get(
            "kafka.bootstrap.servers"
        )
        if not servers:
            raise ValueError("kafkawire needs bootstrap (host:port)")
        host, _, port = servers.rpartition(":")
        self.host, self.port = host or "localhost", int(port)
        self.topic = options.get("topic") or options.get("subscribe")
        if not self.topic:
            raise ValueError("kafkawire needs topic")
        self.starting = options.get("starting_offsets", "earliest")
        self.max_per_trigger = int(options.get("max_offsets_per_trigger", 0)) or None
        self._client: KafkaWireClient | None = None
        self._n_parts: int | None = None
        self._last: dict[str, int] = {}  # last offsets reported to the planner

    def _c(self) -> KafkaWireClient:
        if self._client is None:
            self._client = KafkaWireClient(self.host, self.port)
        return self._client

    def _partitions(self) -> int:
        if self._n_parts is None:
            md = self._c().metadata(self.topic)
            self._n_parts = len(md["topics"][self.topic]["partitions"])
        return self._n_parts

    def initialOffset(self) -> dict:
        ts = TS_EARLIEST if self.starting == "earliest" else TS_LATEST
        self._last = {
            str(p): self._c().list_offsets(self.topic, p, ts)
            for p in range(self._partitions())
        }
        return dict(self._last)

    def latestOffset(self) -> dict:
        """Head per partition — THROTTLED here, not in partitions():
        the planner checkpoints whatever this returns as the batch end, so
        clamping later would silently skip the gap (an offset is an ack)."""
        for p in range(self._partitions()):
            head = self._c().list_offsets(self.topic, p, TS_LATEST)
            prev = self._last.get(str(p), 0)
            if self.max_per_trigger is not None:
                head = min(head, prev + self.max_per_trigger)
            self._last[str(p)] = max(prev, head)
        return dict(self._last)

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        out = []
        for p_str, lo in start.items():
            hi = end.get(p_str, lo)
            if hi > lo:
                out.append(_FetchRange(
                    self.host, self.port, self.topic, int(p_str), lo, hi
                ))
        return out

    def read(self, partition: _FetchRange) -> Iterator[tuple]:
        client = KafkaWireClient(partition.host, partition.port)
        try:
            offset = partition.start
            while offset < partition.end:
                _hw, records = client.fetch(
                    partition.topic, partition.partition, offset
                )
                if not records:
                    return  # log truncated below the requested span
                for off, ts, key, value in records:
                    if off >= partition.end:
                        return
                    stamp = dt.datetime.fromtimestamp(
                        max(ts, 0) / 1000.0, dt.timezone.utc
                    ).replace(tzinfo=None)
                    yield (
                        key, value, partition.topic, partition.partition,
                        off, stamp, 0,
                    )
                    offset = off + 1
        finally:
            client.close()

    def commit(self, end: dict) -> None:
        pass  # the checkpoint offset log is the ack ledger


class KafkaWireDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafkawire"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> DataSourceStreamReader:
        return KafkaWireStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(KafkaWireDataSource)


def kafka_wire_block_source(
    spark,
    servers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    drop_corrupt: bool = False,
):
    """S9 over the real wire: stream the topic through the kafkawire
    source and decode with the same fixed-schema path as the stock reader
    (KafkaBlockSource.kt:15-30 parity, transport included)."""
    from event_stream_spark.sources.kafka import decode_kafka_records

    register(spark)
    reader = (
        spark.readStream.format("kafkawire")
        .option("bootstrap", servers)
        .option("topic", topic)
        .option("starting_offsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "max_offsets_per_trigger", str(max_offsets_per_trigger)
        )
    return decode_kafka_records(reader.load(), drop_corrupt=drop_corrupt)
