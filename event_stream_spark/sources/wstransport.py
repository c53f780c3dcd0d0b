"""Localhost-TCP live transport for the push path (S1) — a real socket
connection under the ``wsfeed`` reader.

The reference's live path is a managed websocket: subscribe, receive pushed
frames, and survive the open/close/fail lifecycle with reconnect backoff
(es-core/.../stream/flows/WebSocketFlow.kt:65-115, lifecycle
EventStreamService.kt:36-73, backoff Defaults.kt:51-67).  This module gives
the Spark source the same lifecycle over a byte stream:

- ``WsFeedServer`` — a line-framed JSON-over-TCP node stand-in.  Handshake:
  the client's first line is ``{"subscribe": <subscription>}``; the server
  validates it against the same set ``nodeEventStream`` accepts
  (NodeEventStream.kt:28-46) and answers ``{"ok": ...}`` or an error line +
  close.  After the ack it replays its retained log, then pushes new
  messages as they arrive — durable-log resubscribe semantics, so transport
  delivery is at-least-once and the combined flow's height dedup (F5,
  MultiplexFlow.kt:142-145) makes it exactly-once downstream.
  ``drop_connections()`` injects a mid-stream failure (socket hard-closed).

- ``WsSocketRelay`` — the client half of the websocket lifecycle: connect,
  subscribe, validate the ack, then bridge received frames into the wsfeed
  buffer (``open_connection`` per socket connect, so the stream reader sees
  each TCP session as a resubscribed channel and re-bases its offsets).  On
  EOF or a socket error it reconnects with exponential backoff
  (``streaming.retry.backoff_millis`` — Backoff.kt:30-41 parity) until
  ``stop()``; a handshake *refusal* is terminal, mirroring the
  ``require`` in nodeEventStream rather than a transient fault.

The bridge-to-buffer shape is deliberate: Structured Streaming sources are
offset-replayable, a raw socket is not, so every real deployment puts a
buffer between the push transport and the engine (the reference's own
10k-slot channel, MultiplexFlow.kt:73-80, is exactly that buffer).  The
relay owns the socket lifecycle; the unchanged ``wsfeed`` reader owns
offsets, throttle, and restart semantics.
"""

from __future__ import annotations

import json
import socket
import threading
import time

from event_stream_spark.sources.wsfeed import (
    SUBSCRIPTION_NEW_BLOCK,
    _VALID_SUBSCRIPTIONS,
    append_messages,
    live_message_stream,
    open_connection,
)
from event_stream_spark.streaming.retry import backoff_millis


class WsFeedServer:
    """Line-framed JSON push server (the node's websocket endpoint
    stand-in).  Thread-per-connection; retained log replayed on subscribe."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.create_server((host, port))
        self.host, self.port = self._srv.getsockname()[:2]
        self._log: list[str] = []
        self._clients: list[tuple[socket.socket, object]] = []
        self._lock = threading.Lock()
        self._stopped = threading.Event()
        self.subscriptions = 0
        self.refused = 0
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self) -> None:
        while not self._stopped.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return  # server socket closed
            threading.Thread(target=self._handshake, args=(sock,), daemon=True).start()

    def _handshake(self, sock: socket.socket) -> None:
        try:
            fh = sock.makefile("rw", encoding="utf-8")
            req = json.loads(fh.readline() or "{}")
            sub = req.get("subscribe")
            if sub not in _VALID_SUBSCRIPTIONS:
                self.refused += 1
                fh.write(
                    json.dumps({"error": f"unsupported subscription type: {sub!r}"})
                    + "\n"
                )
                fh.flush()
                sock.close()
                return
            fh.write(json.dumps({"ok": True}) + "\n")
            with self._lock:
                # replay the retained log inside the lock so a concurrent
                # push() cannot interleave (no lost or reordered frames)
                for line in self._log:
                    fh.write(line + "\n")
                fh.flush()
                self._clients.append((sock, fh))
                self.subscriptions += 1
        except (OSError, ValueError):
            sock.close()

    def push(self, messages: list[str | dict]) -> None:
        """Append to the retained log and push to every live subscriber."""
        lines = [
            json.dumps(
                json.loads(m) if isinstance(m, str) else m, separators=(",", ":")
            )
            for m in messages
        ]
        with self._lock:
            self._log.extend(lines)
            alive = []
            for sock, fh in self._clients:
                try:
                    for line in lines:
                        fh.write(line + "\n")
                    fh.flush()
                    alive.append((sock, fh))
                except OSError:
                    sock.close()
            self._clients = alive

    def drop_connections(self) -> None:
        """Failure injection: hard-close every live client socket (the
        mid-stream websocket drop of BlockDataFlowTest.kt:145-187)."""
        with self._lock:
            for sock, _fh in self._clients:
                try:
                    sock.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                sock.close()
            self._clients = []

    def close(self) -> None:
        self._stopped.set()
        self.drop_connections()
        self._srv.close()


class WsSocketRelay:
    """Client lifecycle: connect → subscribe → ack → pump frames into the
    feed buffer; reconnect with backoff on drop; terminal on refusal."""

    def __init__(
        self,
        host: str,
        port: int,
        feed_path: str,
        *,
        subscription: str = SUBSCRIPTION_NEW_BLOCK,
        base_backoff_millis: float = 50.0,
        max_backoff_millis: float = 1000.0,
        connect_timeout_s: float = 5.0,
    ):
        self.host, self.port = host, port
        self.feed_path = feed_path
        self.subscription = subscription
        self.base_backoff_millis = base_backoff_millis
        self.max_backoff_millis = max_backoff_millis
        self.connect_timeout_s = connect_timeout_s
        self.connections = 0  # successful subscribes; reconnects = n-1
        self.error: Exception | None = None  # terminal handshake refusal
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    @property
    def reconnects(self) -> int:
        return max(0, self.connections - 1)

    def start(self) -> "WsSocketRelay":
        self._thread.start()
        return self

    def _run(self) -> None:
        attempt = 0
        while not self._stop.is_set():
            sock = None
            try:
                sock = socket.create_connection(
                    (self.host, self.port), timeout=self.connect_timeout_s
                )
                sock.sendall(
                    (json.dumps({"subscribe": self.subscription}) + "\n").encode()
                )
                # Raw recv + manual line buffering throughout: a buffered
                # file object over a socket with a timeout can drop a
                # partially-read line, and its read-ahead would swallow
                # frames the server sends right after the ack.
                buf = b""
                while b"\n" not in buf:
                    chunk = sock.recv(65536)
                    if not chunk:
                        raise OSError("connection closed during handshake")
                    buf += chunk
                ack_line, buf = buf.split(b"\n", 1)
                ack = json.loads(ack_line)
                if "error" in ack:
                    # refusal = the nodeEventStream require(), not a fault
                    self.error = ValueError(ack["error"])
                    return
                # subscribed: a new TCP session is a new channel span for
                # the reader (fresh connection id in the feed header)
                open_connection(self.feed_path)
                self.connections += 1
                attempt = 0
                sock.settimeout(0.1)  # poll the stop flag between frames
                while not self._stop.is_set():
                    while b"\n" in buf:
                        line, buf = buf.split(b"\n", 1)
                        text = line.strip().decode("utf-8", "replace")
                        if text:
                            append_messages(self.feed_path, [text])
                    try:
                        chunk = sock.recv(65536)
                    except TimeoutError:
                        continue  # idle tick, keep the connection
                    if chunk == b"":
                        break  # EOF: server closed → reconnect path
                    buf += chunk
            except (OSError, ValueError):
                pass  # connect/read fault → backoff + reconnect below
            finally:
                if sock is not None:
                    sock.close()
            if self._stop.is_set():
                return
            time.sleep(
                min(
                    backoff_millis(attempt, self.base_backoff_millis),
                    self.max_backoff_millis,
                )
                / 1000.0
            )
            attempt += 1

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)


def live_socket_stream(
    spark,
    host: str,
    port: int,
    feed_path: str,
    *,
    subscription: str = SUBSCRIPTION_NEW_BLOCK,
    **options,
):
    """S1 over a real socket: start the relay, return (stream, relay).
    The DataFrame is the same ``wsfeed`` stream — decode/throttle/dedup
    operators compose unchanged; the caller owns ``relay.stop()``."""
    relay = WsSocketRelay(host, port, feed_path, subscription=subscription).start()
    df = live_message_stream(spark, feed_path, subscription=subscription, **options)
    return df, relay
