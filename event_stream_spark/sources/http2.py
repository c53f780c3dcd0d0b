"""Minimal HTTP/2 (RFC 7540) framing and HPACK (RFC 7541) header coding —
the transport substrate for the real gRPC backend (S10, ``grpcwire``).

Scope: exactly the subset a gRPC unary exchange needs, implemented from the
public RFCs with stdlib only:

- Frame layer (§4.1): 9-byte header (24-bit length, type, flags, 31-bit
  stream id) + payload; DATA, HEADERS, RST_STREAM, SETTINGS, PING, GOAWAY,
  WINDOW_UPDATE; incremental ``FrameReader`` (byte-at-a-time parses
  identically to one chunk).
- HPACK: integer prefix coding (§5.1), plain string literals (§5.2,
  Huffman bit rejected — our encoder never emits it), indexed fields
  against the full RFC 7541 Appendix A static table, literal with/without
  incremental indexing + a dynamic table on the decode side, dynamic table
  size updates.  The encoder emits only "literal without indexing — new
  name", which every conforming decoder accepts.

Not implemented (documented, not silently wrong): CONTINUATION (our header
blocks fit one frame — an oversized block raises), padding, priority,
server push, and flow-control accounting (gRPC messages here are far below
the 65 535-byte initial window; WINDOW_UPDATE frames are read and ignored).
"""

from __future__ import annotations

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

FRAME_DATA = 0x0
FRAME_HEADERS = 0x1
FRAME_PRIORITY = 0x2
FRAME_RST_STREAM = 0x3
FRAME_SETTINGS = 0x4
FRAME_PING = 0x6
FRAME_GOAWAY = 0x7
FRAME_WINDOW_UPDATE = 0x8
FRAME_CONTINUATION = 0x9

FLAG_END_STREAM = 0x1
FLAG_ACK = 0x1  # SETTINGS / PING
FLAG_END_HEADERS = 0x4
FLAG_PADDED = 0x8

MAX_FRAME_SIZE = 16384  # SETTINGS_MAX_FRAME_SIZE default (§6.5.2)


class H2ProtocolError(ValueError):
    """A frame or header block outside the implemented RFC subset."""


def encode_frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    if len(payload) > MAX_FRAME_SIZE:
        raise H2ProtocolError("frame exceeds SETTINGS_MAX_FRAME_SIZE")
    return (
        len(payload).to_bytes(3, "big")
        + bytes([ftype, flags])
        + (stream_id & 0x7FFFFFFF).to_bytes(4, "big")
        + payload
    )


class FrameReader:
    """Incremental frame parser: ``feed(bytes)`` → list of complete
    ``(type, flags, stream_id, payload)`` tuples."""

    def __init__(self) -> None:
        self._buf = bytearray()

    def feed(self, data: bytes) -> list[tuple[int, int, int, bytes]]:
        self._buf += data
        out = []
        while len(self._buf) >= 9:
            n = int.from_bytes(self._buf[:3], "big")
            if n > MAX_FRAME_SIZE:
                raise H2ProtocolError("oversized frame announced")
            if len(self._buf) < 9 + n:
                break
            ftype, flags = self._buf[3], self._buf[4]
            sid = int.from_bytes(self._buf[5:9], "big") & 0x7FFFFFFF
            payload = bytes(self._buf[9:9 + n])
            del self._buf[:9 + n]
            if flags & FLAG_PADDED and ftype in (FRAME_DATA, FRAME_HEADERS):
                raise H2ProtocolError("padding not implemented")
            out.append((ftype, flags, sid, payload))
        return out


# ---------------------------------------------------------------------------
# HPACK (RFC 7541)
# ---------------------------------------------------------------------------

#: Appendix A — the complete static table (public protocol constants).
STATIC_TABLE: list[tuple[str, str]] = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]


def _enc_int(value: int, prefix_bits: int, first: int) -> bytes:
    """Integer with an N-bit prefix (§5.1); ``first`` carries the pattern
    bits above the prefix."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([first | value])
    out = bytearray([first | limit])
    value -= limit
    while value >= 128:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def _dec_int(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    value = data[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        if pos >= len(data):
            raise H2ProtocolError("truncated HPACK integer")
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return value, pos


def _enc_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _enc_int(len(raw), 7, 0x00) + raw  # no Huffman bit


def _dec_str(data: bytes, pos: int) -> tuple[str, int]:
    if data[pos] & 0x80:
        raise H2ProtocolError("Huffman-coded literal not implemented")
    n, pos = _dec_int(data, pos, 7)
    if pos + n > len(data):
        raise H2ProtocolError("truncated HPACK string")
    return data[pos:pos + n].decode("utf-8"), pos + n


class HpackEncoder:
    """Emits every field as "literal without indexing — new name" (§6.2.2):
    stateless, and any conforming decoder accepts it."""

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            out += b"\x00" + _enc_str(name.lower()) + _enc_str(value)
        return bytes(out)


class HpackDecoder:
    """Full §6 instruction set minus Huffman: indexed (static + dynamic),
    literal with incremental indexing (grows the dynamic table), literal
    without indexing / never indexed, dynamic table size update."""

    def __init__(self, max_table_size: int = 4096):
        self._dyn: list[tuple[str, str]] = []  # newest first
        self._max = max_table_size

    def _lookup(self, idx: int) -> tuple[str, str]:
        if idx == 0:
            raise H2ProtocolError("HPACK index 0")
        if idx <= len(STATIC_TABLE):
            return STATIC_TABLE[idx - 1]
        d = idx - len(STATIC_TABLE) - 1
        if d >= len(self._dyn):
            raise H2ProtocolError(f"HPACK index {idx} out of table")
        return self._dyn[d]

    def _insert(self, name: str, value: str) -> None:
        self._dyn.insert(0, (name, value))
        # entry size = name + value + 32 (§4.1); evict from the oldest end
        while (
            sum(len(n) + len(v) + 32 for n, v in self._dyn) > self._max
            and self._dyn
        ):
            self._dyn.pop()

    def decode(self, block: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        pos = 0
        while pos < len(block):
            b = block[pos]
            if b & 0x80:  # indexed field
                idx, pos = _dec_int(block, pos, 7)
                out.append(self._lookup(idx))
            elif b & 0x40:  # literal with incremental indexing
                idx, pos = _dec_int(block, pos, 6)
                name = self._lookup(idx)[0] if idx else None
                if name is None:
                    name, pos = _dec_str(block, pos)
                value, pos = _dec_str(block, pos)
                self._insert(name, value)
                out.append((name, value))
            elif b & 0x20:  # dynamic table size update
                self._max, pos = _dec_int(block, pos, 5)
                while (
                    sum(len(n) + len(v) + 32 for n, v in self._dyn) > self._max
                    and self._dyn
                ):
                    self._dyn.pop()
            else:  # literal without indexing (0000) / never indexed (0001)
                idx, pos = _dec_int(block, pos, 4)
                name = self._lookup(idx)[0] if idx else None
                if name is None:
                    name, pos = _dec_str(block, pos)
                value, pos = _dec_str(block, pos)
                out.append((name, value))
        return out
