"""Pure-python Kafka compression codecs: snappy and LZ4.

The reference uses a stock Kafka client, so codec support is transport
realism, not query semantics (es-kafka/src/main/kotlin/tech/figure/kafka/
stream/KafkaBlockSource.kt:15-30 — the broker/client negotiate codecs
underneath it).  This container ships no snappy/lz4/zstd libraries, so
both codecs are implemented here from their PUBLIC format specifications:

- **snappy** (google/snappy format_description.txt): raw block format —
  uvarint uncompressed length, then tagged elements (literals and copies
  with 1/2/4-byte offsets).  Both directions, plus the **xerial**
  stream framing snappy-java wraps around blocks inside Kafka v0/v1
  message sets (8-byte magic, two version i32s, [i32 length][block]…).
- **LZ4** (lz4_Block_format.md / lz4_Frame_format.md): block
  token/literal/match sequences, and the frame format (magic
  0x184D2204, FLG/BD, xxHash-32 header checksum, size-prefixed blocks).
  Kafka message format v0 shipped a BROKEN frame header checksum (it
  hashed the magic bytes too — KAFKA-3160); the frame reader here
  accepts both, the writer emits the spec-correct one.
- **xxHash-32** (Cyan4973/xxHash spec) — needed by the LZ4 frame header.

zstd (compression type 4) lives in its own module (``zstdcodec``):
a full RFC 8878 decoder (FSE + Huffman entropy coding, ground-truthed
against the reference CLI) plus a store-mode writer.  Compressors
here are greedy hash-match (snappy: 4-byte hash +
copy-2 elements; LZ4: 4-byte hash + token sequences) — format-compliant
output any conformant decoder accepts, trading ratio for simplicity.
"""

from __future__ import annotations

import struct

_M32 = 0xFFFFFFFF


class CodecError(ValueError):
    """Malformed compressed payload."""


# ---------------------------------------------------------------------------
# xxHash-32 (public spec; LZ4 frame header checksum)
# ---------------------------------------------------------------------------

_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i + 16 <= n:
            for _lane in range(4):
                (w,) = struct.unpack_from("<I", data, i)
                if _lane == 0:
                    v1 = (_rotl32((v1 + w * _P2) & _M32, 13) * _P1) & _M32
                elif _lane == 1:
                    v2 = (_rotl32((v2 + w * _P2) & _M32, 13) * _P1) & _M32
                elif _lane == 2:
                    v3 = (_rotl32((v3 + w * _P2) & _M32, 13) * _P1) & _M32
                else:
                    v4 = (_rotl32((v4 + w * _P2) & _M32, 13) * _P1) & _M32
                i += 4
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (w,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + w * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# snappy — raw block format
# ---------------------------------------------------------------------------

def _uvarint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if pos >= len(data):
            raise CodecError("truncated varint")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise CodecError("varint overflow")


def _snappy_emit_literal(out: bytearray, lit: bytes) -> None:
    pos = 0
    while pos < len(lit):
        run = lit[pos:pos + (1 << 16)]  # keep length encodings small
        n = len(run) - 1
        if n < 60:
            out.append(n << 2)
        elif n < (1 << 8):
            out.append(60 << 2)
            out.append(n)
        else:
            out.append(61 << 2)
            out += struct.pack("<H", n)
        out += run
        pos += len(run)


def snappy_compress(data: bytes) -> bytes:
    """Greedy 4-byte-hash matcher emitting copy-2 elements (offset ≤ 64 KiB,
    length ≤ 64 per element — longer matches chain elements)."""
    out = bytearray(_uvarint(len(data)))
    n = len(data)
    table: dict[int, int] = {}
    i = lit_start = 0
    while i + 4 <= n:
        key = struct.unpack_from("<I", data, i)[0]
        cand = table.get(key)
        table[key] = i
        if (
            cand is not None
            and i - cand <= 0xFFFF
            and data[cand:cand + 4] == data[i:i + 4]
        ):
            length = 4
            while (
                i + length < n
                and data[cand + length] == data[i + length]
            ):
                length += 1
            _snappy_emit_literal(out, data[lit_start:i])
            offset = i - cand
            rem = length
            while rem > 0:
                chunk = min(rem, 64)
                if chunk < 4:  # copy-2 length floor is 1, but stay canonical
                    chunk = rem
                out.append(((chunk - 1) << 2) | 0x02)
                out += struct.pack("<H", offset)
                rem -= chunk
            i += length
            lit_start = i
        else:
            i += 1
    _snappy_emit_literal(out, data[lit_start:])
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    want, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                if pos + nbytes > n:
                    raise CodecError("truncated literal length")
                ln = int.from_bytes(data[pos:pos + nbytes], "little")
                pos += nbytes
            ln += 1
            if pos + ln > n:
                raise CodecError("truncated literal")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            if pos >= n:
                raise CodecError("truncated copy-1")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise CodecError("truncated copy-2")
            (offset,) = struct.unpack_from("<H", data, pos)
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise CodecError("truncated copy-4")
            (offset,) = struct.unpack_from("<I", data, pos)
            pos += 4
        if offset == 0 or offset > len(out):
            raise CodecError(f"copy offset {offset} out of range")
        start = len(out) - offset
        for k in range(ln):  # may overlap its own output — byte-at-a-time
            out.append(out[start + k])
    if len(out) != want:
        raise CodecError(f"length mismatch: {len(out)} != declared {want}")
    return bytes(out)


# xerial snappy-java stream framing (Kafka v0/v1 message-set payloads)
_XERIAL_MAGIC = b"\x82SNAPPY\x00"


def xerial_frame(data: bytes, block_size: int = 32 * 1024) -> bytes:
    out = bytearray(_XERIAL_MAGIC)
    out += struct.pack(">ii", 1, 1)  # version, compatible version
    for i in range(0, len(data), block_size):
        block = snappy_compress(data[i:i + block_size])
        out += struct.pack(">i", len(block)) + block
    if not data:
        # empty payload still carries one (empty) block, as snappy-java does
        block = snappy_compress(b"")
        out += struct.pack(">i", len(block)) + block
    return bytes(out)


def xerial_unframe(data: bytes) -> bytes:
    if not data.startswith(_XERIAL_MAGIC):
        # snappy-java also accepts raw blocks; mirror that leniency
        return snappy_decompress(data)
    pos = len(_XERIAL_MAGIC) + 8
    out = bytearray()
    while pos < len(data):
        if pos + 4 > len(data):
            raise CodecError("truncated xerial block header")
        (ln,) = struct.unpack_from(">i", data, pos)
        pos += 4
        if ln < 0 or pos + ln > len(data):
            raise CodecError("truncated xerial block")
        out += snappy_decompress(data[pos:pos + ln])
        pos += ln
    return bytes(out)


# ---------------------------------------------------------------------------
# LZ4 — block format
# ---------------------------------------------------------------------------

def lz4_block_decompress(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise CodecError("truncated literal length")
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise CodecError("truncated literals")
        out += data[pos:pos + lit]
        pos += lit
        if pos == n:
            break  # last sequence carries no match
        if pos + 2 > n:
            raise CodecError("truncated match offset")
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise CodecError(f"match offset {offset} out of range")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise CodecError("truncated match length")
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        for k in range(mlen):  # overlapping copies are the RLE idiom
            out.append(out[start + k])
    return bytes(out)


def _lz4_lengths(base: int) -> bytes:
    """Extension bytes for a length field whose nibble was 15."""
    out = bytearray()
    rem = base
    while rem >= 255:
        out.append(255)
        rem -= 255
    out.append(rem)
    return bytes(out)


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy 4-byte-hash matcher honouring the end-of-block rules (last
    5 bytes literal; no match starting within 12 bytes of the end)."""
    n = len(data)
    out = bytearray()
    table: dict[int, int] = {}
    i = anchor = 0
    limit = n - 12  # spec: last match must start before end-12
    while i <= limit and i + 4 <= n:
        key = struct.unpack_from("<I", data, i)[0]
        cand = table.get(key)
        table[key] = i
        if (
            cand is not None
            and i - cand <= 0xFFFF
            and data[cand:cand + 4] == data[i:i + 4]
        ):
            length = 4
            while i + length < n - 5 and data[cand + length] == data[i + length]:
                length += 1
            lit = i - anchor
            token_lit = min(lit, 15)
            token_mat = min(length - 4, 15)
            out.append((token_lit << 4) | token_mat)
            if token_lit == 15:
                out += _lz4_lengths(lit - 15)
            out += data[anchor:i]
            out += struct.pack("<H", i - cand)
            if token_mat == 15:
                out += _lz4_lengths(length - 4 - 15)
            i += length
            anchor = i
        else:
            i += 1
    lit = n - anchor
    token_lit = min(lit, 15)
    out.append(token_lit << 4)
    if token_lit == 15:
        out += _lz4_lengths(lit - 15)
    out += data[anchor:]
    return bytes(out)


# ---------------------------------------------------------------------------
# LZ4 — frame format (what Kafka wraps blocks in)
# ---------------------------------------------------------------------------

_LZ4_MAGIC = 0x184D2204
_LZ4_BLOCK_MAX = 64 * 1024  # BD code 4


def lz4_frame_compress(data: bytes) -> bytes:
    flg = 0x60  # version 01, block-independence, no checksums/size/dict
    bd = 0x40   # 64 KiB max block size
    header = bytes((flg, bd))
    out = bytearray(struct.pack("<I", _LZ4_MAGIC))
    out += header
    out.append((xxh32(header) >> 8) & 0xFF)
    for i in range(0, len(data), _LZ4_BLOCK_MAX):
        chunk = data[i:i + _LZ4_BLOCK_MAX]
        block = lz4_block_compress(chunk)
        if len(block) < len(chunk):
            out += struct.pack("<I", len(block)) + block
        else:  # incompressible: store, high bit set
            out += struct.pack("<I", len(chunk) | 0x80000000) + chunk
    out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    if len(data) < 7:
        raise CodecError("truncated lz4 frame")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _LZ4_MAGIC:
        raise CodecError(f"bad lz4 frame magic {magic:#x}")
    flg, bd = data[4], data[5]
    if (flg >> 6) != 0b01:
        raise CodecError(f"unsupported lz4 frame version in FLG {flg:#x}")
    pos = 6
    if flg & 0x08:  # content size present
        pos += 8
    if flg & 0x01:  # dict id present
        pos += 4
    hc = data[pos]
    pos += 1
    correct = (xxh32(data[4:pos - 1]) >> 8) & 0xFF
    # Kafka message-format-v0 framing hashed the magic too (KAFKA-3160);
    # accept either so a mixed-version broker replay still reads
    legacy = (xxh32(data[0:pos - 1]) >> 8) & 0xFF
    if hc not in (correct, legacy):
        raise CodecError(f"lz4 frame header checksum {hc:#x} invalid")
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise CodecError("missing lz4 EndMark")
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:
            break
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if pos + bsize > len(data):
            raise CodecError("truncated lz4 block")
        chunk = data[pos:pos + bsize]
        pos += bsize
        out += chunk if stored else lz4_block_decompress(chunk)
        if flg & 0x10:  # per-block checksum present
            pos += 4
    if flg & 0x04:  # content checksum
        pos += 4
    return bytes(out)
