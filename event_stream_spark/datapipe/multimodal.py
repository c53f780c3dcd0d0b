"""Multimodal column plumbing: image/audio/video as opaque BINARY + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio/video codec libraries, so the SAMPLE
decodes whose entropy coding the repo does not own (mp4/h264 and other
inter-coded video) are STUBBED (NotImplementedError as marked, real
container metadata around them) — but every format whose spec is
implementable with stdlib+numpy decodes for REAL end-to-end:

- image: binary NetPBM (P6) header parse + pixel decode, a full PNG codec
  (zlib inflate, CRC-checked chunks, all five filters), a full GIF codec
  (variable-width LZW, interlace de-weave), and a full JPEG codec —
  baseline SOF0/1 AND progressive SOF2 (spectral selection, successive
  approximation, EOB runs, AC refinement), huffman decode + float IDCT,
  4:4:4/4:2:2/4:2:0, restart markers; lossless/arithmetic SOFn variants
  declared-unsupported — all four feed nearest-neighbor resize +
  per-channel stats (``decode_ppm``/``decode_png``/``decode_gif``/
  ``decode_jpeg``/``image_pixel_stats``);
- audio: RIFF/WAVE PCM — container walk, raw-sample numpy math
  (``parse_wav``/``audio_pcm_stats``) — and MPEG-1 Layer I subband
  sample decode + encode (``datapipe.mpegaudio``: near-PR pseudo-QMF
  filterbank, closed-form scalefactors; Layer II decodes too (r9, B.2a/b
  tables + closed-form requantizer); Layer III decodes end-to-end since
  r11 — Huffman spectrum, IMDCT, synthesis — with five declared-
  unverified code tables that raise by id);
- video: YUV4MPEG2 — stream walk, planar frame decode, grid frame-sampling
  with per-frame luma (``parse_y4m``/``video_frame_stats``) — and, since
  r11, COMPRESSED video via MJPEG-in-AVI: the RIFF container walk
  (``parse_avi``) indexes the ``movi`` chunks and the in-repo JPEG codec
  decodes exactly the grid-sampled frames (``encode_avi_mjpeg`` writes
  fixture clips); inter-coded codecs (AVC/HEVC) stay declared out of
  scope.

Everything Spark-side is real for every format: schemas, the mapInPandas
batch contract, partition sizing, and the metadata fast paths (magic-byte
sniffing, header dimension parse).

Scale design: media rows are wide (MBs) — ``maxPartitionBytes`` counts bytes,
so partitions stay balanced; the decode is a mapInPandas pipeline stage that
streams Arrow batches (never materializes a partition of images in memory);
metadata-only queries never touch the binary column thanks to column pruning.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media row: opaque payload + typed metadata
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("format", StringType(), True),  # sniffed container format
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", StringType(), True),
        StructField("value", StringType(), True),
    ]
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"P6": "ppm",  # binary NetPBM — decodable with no codec library
    b"RIFF": "riff",  # wav/avi container
    b"YUV4MPEG2": "y4m",  # uncompressed video — decodable with no codec
    b"\x00\x00\x00": "mp4",  # ftyp boxes start with size; loose sniff
    b"ID3": "mp3",  # ID3v2-tagged MPEG audio
    b"\xff\xfb": "mp3",  # bare MPEG1 Layer III sync (CRC bit set)
    b"\xff\xfa": "mp3",  # bare MPEG1 Layer III sync (CRC-protected)
}


def sniff_format(content: bytes | None) -> str | None:
    """Magic-byte container sniffing — pure metadata, no codec needed."""
    if not content:
        return None
    for magic, fmt in _MAGIC.items():
        if content.startswith(magic):
            if fmt == "riff":
                if content[8:12] == b"WAVE":
                    return "wav"
                if content[8:12] == b"AVI ":
                    return "avi"
            return fmt
    return "unknown"


def parse_wav(content: bytes | None):
    """RIFF/WAVE chunk walk — codec-free like the P6 path: PCM is raw
    samples behind a fixed container, so ``struct`` + numpy decode it
    fully.  Handles integer PCM at 8 (unsigned, re-centered), 16, 24
    (packed LE), and 32 bits, plus IEEE-float PCM (format 3, 32/64-bit).
    Returns (sample_rate, channels, bits, frames, samples) — int16 for the
    16-bit fast path (byte-identical to the original contract), int32 for
    24/32-bit, float64 for float — or None for compressed/malformed
    input."""
    import struct

    import numpy as np

    if not content or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    pos, fmt_info, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt not in (1, 3):  # integer or IEEE-float PCM only
                return None
            fmt_info = (audio_fmt, rate, ch, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_info is None or data is None:
        return None
    audio_fmt, rate, ch, bits = fmt_info
    if audio_fmt == 3:
        if bits == 32:
            pcm = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4").astype(
                np.float64
            )
        elif bits == 64:
            pcm = np.frombuffer(data[: len(data) // 8 * 8], dtype="<f8")
        else:
            return None
    elif bits == 16:
        pcm = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    elif bits == 8:
        # 8-bit WAV is UNSIGNED; center to signed
        pcm = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
        ).astype(np.int32)
    elif bits == 24:
        raw = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8)
        raw = raw.reshape(-1, 3).astype(np.int32)
        pcm = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        pcm = np.where(pcm >= 1 << 23, pcm - (1 << 24), pcm).astype(np.int32)
    elif bits == 32:
        pcm = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4")
    else:
        return None
    frames = len(pcm) // max(ch, 1)
    return rate, ch, bits, frames, pcm


def parse_y4m(content: bytes | None):
    """YUV4MPEG2 stream walk — the codec-free VIDEO path, mirroring P6 for
    images and PCM WAV for audio: uncompressed planar YUV behind a text
    header, so ``bytes`` + numpy decode it fully.  Returns
    (width, height, fps_num, fps_den, [Y planes as uint8 (h, w) arrays]) or
    None for malformed / non-4:2:0-4:2:2-4:4:4 input."""
    import numpy as np

    if not content or not content.startswith(b"YUV4MPEG2"):
        return None
    nl = content.find(b"\x0a")
    if nl < 0:
        return None
    w = h = None
    num, den, chroma = 30, 1, "420"
    for tok in content[10:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = (int(x) for x in val.split(b":"))
        elif tag == b"C":
            chroma = val.decode("ascii", "replace")
    if not w or not h or num <= 0 or den <= 0:
        return None
    if chroma.startswith("420"):
        chroma_bytes = (w // 2) * (h // 2) * 2
    elif chroma.startswith("422"):
        chroma_bytes = (w // 2) * h * 2
    elif chroma.startswith("444"):
        chroma_bytes = w * h * 2
    else:
        return None  # mono/alpha variants need per-variant layouts
    ysz, pos, frames = w * h, nl + 1, []
    while pos < len(content):
        if not content.startswith(b"FRAME", pos):
            return None
        fnl = content.find(b"\x0a", pos)
        if fnl < 0 or fnl + 1 + ysz + chroma_bytes > len(content):
            return None
        y = np.frombuffer(content[fnl + 1 : fnl + 1 + ysz], dtype=np.uint8)
        frames.append(y.reshape(h, w))
        pos = fnl + 1 + ysz + chroma_bytes
    return w, h, num, den, frames


def y4m_dimensions(content: bytes | None) -> tuple[int | None, int | None]:
    """Header-only width/height — metadata fast path, no frame walk."""
    if not content or not content.startswith(b"YUV4MPEG2"):
        return (None, None)
    nl = content.find(b"\x0a")
    if nl < 0:
        return (None, None)
    w = h = None
    for tok in content[10:nl].split(b" "):
        if tok[:1] == b"W" and tok[1:].isdigit():
            w = int(tok[1:])
        elif tok[:1] == b"H" and tok[1:].isdigit():
            h = int(tok[1:])
    return (w, h)


def gif_dimensions(content: bytes | None) -> tuple[int | None, int | None]:
    """GIF logical-screen width/height — metadata fast path, no decode."""
    if content is None or len(content) < 10 or content[:4] != b"GIF8":
        return (None, None)
    return (
        int.from_bytes(content[6:8], "little"),
        int.from_bytes(content[8:10], "little"),
    )


def png_dimensions(content: bytes | None) -> tuple[int | None, int | None]:
    """PNG IHDR width/height from the fixed header layout (public spec) —
    real metadata extraction with zero decoding."""
    if content is None or len(content) < 24 or not content.startswith(b"\x89PNG"):
        return (None, None)
    w = int.from_bytes(content[16:20], "big")
    h = int.from_bytes(content[20:24], "big")
    return (w, h)


def ppm_tokens(content: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` integer header tokens of a NetPBM file (after the magic),
    honoring '#' comments; returns (tokens, offset_past_header)."""
    toks: list[int] = []
    i = 2  # past the 2-byte magic
    while len(toks) < n and i < len(content):
        c = content[i:i + 1]
        if c == b"#":
            i = content.find(b"\n", i)
            i = len(content) if i < 0 else i + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(content) and not content[j:j + 1].isspace():
                j += 1
            toks.append(int(content[i:j]))
            i = j
    return toks, i + 1  # +1: the single whitespace after maxval


def decode_ppm(content: bytes):
    """REAL pixel decode for binary NetPBM (P6) — the one raster format
    parseable with no codec library (public spec: magic, width, height,
    maxval, raw RGB bytes).  Returns an (h, w, 3) uint8 ndarray."""
    import numpy as np

    if not content or not content.startswith(b"P6"):
        raise ValueError("not a P6 NetPBM payload")
    (w, h, maxval), off = ppm_tokens(content, 3)
    if maxval != 255:
        raise NotImplementedError("only 8-bit P6 supported")
    data = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=off)
    return data.reshape(h, w, 3)


def resize_nearest(img, out_w: int, out_h: int):
    """Nearest-neighbor resize via pure index arithmetic (no codec)."""
    import numpy as np

    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# PNG codec — pure stdlib (zlib) + numpy; the public W3C PNG spec only
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


#: Adam7 pass grid: (row_start, row_step, col_start, col_step) per pass
#: (W3C PNG spec §8.2 — the passes partition the pixel grid exactly)
_ADAM7 = (
    (0, 8, 0, 8),
    (0, 8, 4, 8),
    (4, 8, 0, 4),
    (0, 4, 2, 4),
    (2, 4, 0, 2),
    (0, 2, 1, 2),
    (1, 2, 0, 1),
)


def _png_unfilter(raw: bytes, w: int, h: int, channels: int):
    """Reconstruct one (sub-)image from its filtered scanlines (spec §9):
    returns an (h, w*channels) uint8 array.  Filters 0/2 vectorized, 1 is a
    per-lane prefix sum, 3/4 run sequential in x."""
    import numpy as np

    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        row = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        )
        ftype = raw[y * (stride + 1)]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = row
        elif ftype == 1:  # Sub: per-lane prefix sum mod 256
            lanes = row.reshape(-1, bpp).astype(np.int64)
            out[y] = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            out[y] = row + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average
            cur = out[y]
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + (left + int(prev[i])) // 2) % 256
        elif ftype == 4:  # Paeth
            cur = out[y]
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + _paeth(a, int(prev[i]), c)) % 256
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
    return out


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(content: bytes):
    """REAL PNG decode: chunk walk (CRC-verified), IHDR, zlib-inflated IDAT,
    per-scanline unfilter (all five filter types of the W3C spec §9), for
    8-bit gray / RGB / palette / RGBA, progressive (Adam7, seven
    independently-filtered sub-images scattered back onto the grid) or
    not.  Returns an h×w×3 uint8 RGB ndarray (gray replicated, alpha
    dropped, palette resolved).  16-bit images raise NotImplementedError —
    sniffed and skipped upstream like the codec-absent formats.

    Filters 0 (None) and 2 (Up) reconstruct vectorized; 1 (Sub) is a
    per-byte-lane prefix sum mod 256 (cumsum); 3 (Average) and 4 (Paeth)
    are inherently sequential in x and run as per-byte loops — scanlines
    are short, and the mapInPandas stage parallelizes across rows/batches,
    not within one image.
    """
    import zlib

    import numpy as np

    if not content or not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, ihdr, idat, plte = len(_PNG_SIG), None, b"", None
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        if pos + 12 + length > len(content):
            raise ValueError("truncated PNG chunk")
        data = content[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", content[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if comp or filt:
        raise ValueError("invalid PNG compression/filter method")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color} unsupported")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:  # header-only / garbled IDAT
        raise ValueError(f"PNG IDAT undecodable: {e}") from e
    if interlace == 0:
        sub = _png_unfilter(raw, w, h, channels)
        px = sub.reshape(h, w, channels)
    else:
        # Adam7: seven independently-filtered sub-images, scattered back
        # onto the (row, col) grid each pass covers
        px = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for (r0, rs, c0, cs) in _ADAM7:
            pw = (w - c0 + cs - 1) // cs
            ph = (h - r0 + rs - 1) // rs
            if pw == 0 or ph == 0:
                continue
            span = ph * (pw * channels + 1)
            sub = _png_unfilter(raw[pos : pos + span], pw, ph, channels)
            px[r0::rs, c0::cs] = sub.reshape(ph, pw, channels)
            pos += span
        if pos != len(raw):
            raise ValueError("PNG pixel payload size mismatch")
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        if int(px.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[px[:, :, 0]]
    return px[:, :, :3]  # RGBA → drop alpha


def _png_filter_rows(px, bpp: int, filters) -> bytearray:
    """Filter one (sub-)image's rows (the unfilter inverse); ``px`` is an
    (h, w*bpp) int64 array, ``filters`` an int or per-row list."""
    import numpy as np

    h, stride = px.shape
    rowfilters = [filters] * h if isinstance(filters, int) else list(filters)
    raw = bytearray()
    for y in range(h):
        row, prev = px[y], (px[y - 1] if y else np.zeros(stride, dtype=np.int64))
        f = rowfilters[y % len(rowfilters)]
        raw.append(f)
        if f == 0:
            enc = row % 256
        elif f == 1:
            enc = (row - np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])) % 256
        elif f == 2:
            enc = (row - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
            enc = (row - (left + prev) // 2) % 256
        elif f == 4:
            enc = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                c = int(prev[i - bpp]) if i >= bpp else 0
                enc[i] = (int(row[i]) - _paeth(a, int(prev[i]), c)) % 256
        else:
            raise ValueError(f"filter {f}")
        raw += bytes(enc.astype(np.uint8))
    return raw


def encode_png(img, *, color: int = 2, filters=None, interlace: bool = False) -> bytes:
    """Minimal PNG encoder (the decoder's inverse): 8-bit gray/RGB/RGBA,
    one IDAT, per-row filter selection via ``filters`` (int or cycled
    list, default 0), optional Adam7 interlacing — exists so fixtures can
    exercise every unfilter path with stdlib-only tooling, and so
    thumbnail export needs no codec lib."""
    import zlib

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[0], img.shape[1]
    channels = {0: 1, 2: 3, 6: 4}[color]
    bpp = channels
    if filters is None:
        filters = 0
    if interlace:
        raw = bytearray()
        for (r0, rs, c0, cs) in _ADAM7:
            sub = img[r0::rs, c0::cs]
            ph, pw = sub.shape[0], sub.shape[1]
            if ph == 0 or pw == 0:
                continue
            raw += _png_filter_rows(
                sub.reshape(ph, pw * channels).astype(np.int64), bpp, filters
            )
    else:
        raw = _png_filter_rows(
            img.reshape(h, w * channels).astype(np.int64), bpp, filters
        )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, int(interlace))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_image(content: bytes) -> "object":
    """Pixel decode dispatch: PPM, PNG, GIF, and baseline JPEG all decode
    for REAL (stdlib+numpy, from the public specs).  Progressive JPEG and
    the other SOFn variants stay declared-unsupported.  The Spark-side
    contract (mapInPandas over binary) is identical either way."""
    if content and content.startswith(b"P6"):
        return decode_ppm(content)
    if content and content.startswith(_PNG_SIG):
        return decode_png(content)
    if content and content.startswith(b"GIF8"):
        return decode_gif(content)
    if content and content.startswith(b"\xff\xd8"):
        return decode_jpeg(content)
    raise NotImplementedError("image codec not available in this environment")


def ppm_dimensions(content: bytes | None) -> tuple[int | None, int | None]:
    """P6 width/height from the text header — metadata without decoding."""
    if not content or not content.startswith(b"P6"):
        return (None, None)
    try:
        (w, h), _ = ppm_tokens(content, 2)
        return (w, h)
    except (ValueError, IndexError):
        return (None, None)


def with_sniffed_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas stage: fill format/width/height from headers.

    Arrow-batched; each batch is a pandas DataFrame slice of rows — payloads
    stream through, nothing driver-side."""

    def sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, widths, heights, durs = [], [], [], []
            have_dur = "duration_ms" in pdf.columns
            olddur = pdf["duration_ms"] if have_dur else [None] * len(pdf)
            for content, d0 in zip(pdf["content"], olddur):
                b = bytes(content) if content is not None else None
                fmt = sniff_format(b)
                fmts.append(fmt)
                w, h = png_dimensions(b)
                if w is None:
                    w, h = ppm_dimensions(b)
                if w is None:
                    w, h = y4m_dimensions(b)
                if w is None:
                    w, h = gif_dimensions(b)
                if w is None:
                    w, h = jpeg_dimensions(b)
                if w is None and fmt == "mp4":
                    w, h = mp4_dimensions(b)
                if w is None and fmt == "avi":
                    w, h = avi_dimensions(b)
                widths.append(w)
                heights.append(h)
                d = d0 if (d0 is not None and not pd.isna(d0)) else None
                if d is None and fmt == "mp4":
                    d = mp4_duration_ms(b)
                if d is None and fmt == "avi":
                    d = avi_duration_ms(b)
                if d is None and fmt == "mp3":
                    d = mp3_duration_ms(b)
                durs.append(d)
            pdf = pdf.assign(format=fmts, width=widths, height=heights)
            if have_dur:
                pdf = pdf.assign(duration_ms=pd.array(durs, dtype="Int64"))
            yield pdf

    return df.mapInPandas(sniff, schema=df.schema)


PIXEL_STATS_SCHEMA = (
    "media_id long, mean_r double, mean_g double, mean_b double, "
    "thumb_digest string"
)


def image_pixel_stats(df: DataFrame, thumb: tuple[int, int] = (8, 8)) -> DataFrame:
    """mapInPandas decode → resize → feature stage, REAL end-to-end for
    codec-free formats (P6): per-channel means over the full raster and a
    digest of the nearest-neighbor thumbnail.  Rows whose format needs a
    codec are skipped (their path is the stubbed ``decode_image``).

    Scale shape: streaming Arrow batches; each row's work is O(pixels) with
    no shuffle — the canonical wide-row media pipeline stage."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else None
                if not b or not (
                    b.startswith(b"P6")
                    or b.startswith(_PNG_SIG)
                    or b.startswith(b"GIF8")
                    or b.startswith(b"\xff\xd8")
                ):
                    continue
                try:
                    img = decode_image(b)
                except (ValueError, NotImplementedError):
                    # header-only / truncated synthetics and codec-absent
                    # variants sniff as images but carry no raster
                    continue
                t = resize_nearest(img, thumb[0], thumb[1])
                means = img.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (
                        int(mid),
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                        hashlib.sha256(t.tobytes()).hexdigest()[:16],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "mean_r", "mean_g", "mean_b", "thumb_digest"],
            )

    return df.mapInPandas(run, PIXEL_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "media_id long, sample_rate int, channels int, pcm_frames long, "
    "audio_ms double, rms double, peak int"
)


def audio_pcm_stats(df: DataFrame) -> DataFrame:
    """mapInPandas decode → feature stage for audio, REAL end-to-end for
    PCM WAV and MPEG-1 Layer I (``datapipe.mpegaudio`` — full subband
    sample decode; Layer III remains frame-walk metadata only, see
    that module's scope note): container walk + sample math give
    duration, RMS level and peak amplitude.

    Scale shape: streaming Arrow batches, O(samples) per row, no shuffle —
    identical plumbing to ``image_pixel_stats``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else None
                parsed = parse_wav(b)
                if parsed is None and b is not None and (
                    b[:3] == b"ID3" or (len(b) > 1 and b[0] == 0xFF)
                ):
                    try:
                        from event_stream_spark.datapipe.mpegaudio import (
                            mpeg_audio_decode,
                        )

                        mrate, _mch, mpcm = mpeg_audio_decode(b)
                        parsed = (
                            mrate, mpcm.shape[1], 16, mpcm.shape[0],
                            mpcm.reshape(-1),
                        )
                    except (NotImplementedError, ValueError):
                        parsed = None  # Layer III or not MPEG audio
                if parsed is None:
                    continue
                rate, ch, bits, frames, pcm = parsed
                # report levels in int16-equivalent FULL-SCALE units for
                # every sample format, so rms/peak compare across files:
                # 16-bit is identity (contract unchanged); 8/24/32-bit
                # rescale by their depth; float ([-1,1]) maps to ±32767
                if pcm.dtype.kind == "f":
                    x = pcm * 32767.0
                else:
                    x = pcm.astype("f8") * (2.0 ** (16 - bits))
                rows.append(
                    (
                        int(mid),
                        int(rate),
                        int(ch),
                        int(frames),
                        float(frames / rate * 1000.0),
                        float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                        int(round(np.max(np.abs(x)))) if len(x) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "channels",
                    "pcm_frames",
                    "audio_ms",
                    "rms",
                    "peak",
                ],
            )

    return df.mapInPandas(run, AUDIO_STATS_SCHEMA)


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms long, mean_y double"
)


def _grid_sample(n_frames: int, frame_ms: float, every_ms: int):
    """Yield (frame_idx, grid_ts_ms) for the nearest frame at each
    ``every_ms`` grid point within the clip, each frame at most once —
    the sampling contract shared by the y4m and MJPEG/AVI decode paths."""
    dur_ms = frame_ms * n_frames
    seen: set[int] = set()
    ts = 0.0
    while ts < dur_ms:
        idx = min(int(ts / frame_ms), n_frames - 1)
        if idx not in seen:
            seen.add(idx)
            yield idx, int(ts)
        ts += every_ms


def video_frame_stats(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """mapInPandas decode → frame-sample → feature stage for video, REAL
    end-to-end for YUV4MPEG2 (the codec-free format) AND MJPEG-in-AVI
    (r11 — every frame is a JPEG the repo's own codec decodes): one row
    per sampled frame (nearest frame at each ``every_ms`` grid point
    within the clip) with its mean luma — the Y plane directly for y4m,
    BT.601 luma of the decoded RGB for MJPEG.  Inter-coded containers
    (mp4/h264, webm) would hit an absent codec and are skipped here.

    Scale shape: streaming Arrow batches, no shuffle — identical plumbing
    to ``image_pixel_stats``/``audio_pcm_stats``; frame sampling bounds
    emitted rows to duration/every_ms per clip, and the AVI path decodes
    ONLY the sampled frames' byte ranges (O(sampled), not O(clip))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else None
                parsed = parse_y4m(b)
                if parsed is not None:
                    w, h, num, den, frames = parsed
                    if not frames:
                        continue
                    for idx, ts in _grid_sample(
                        len(frames), 1000.0 * den / num, every_ms
                    ):
                        rows.append(
                            (int(mid), idx, ts, float(frames[idx].mean()))
                        )
                    continue
                avi = parse_avi(b)
                if avi is None or not avi["frames"]:
                    continue
                frame_ms = 1000.0 * avi["scale"] / avi["rate"]
                for idx, ts in _grid_sample(
                    len(avi["frames"]), frame_ms, every_ms
                ):
                    off, sz, _kf = avi["frames"][idx]
                    try:
                        img = decode_jpeg(b[off : off + sz])
                    except (ValueError, NotImplementedError):
                        continue  # torn/foreign-codec frame: skip, not crash
                    y = (
                        0.299 * img[..., 0].astype("float64")
                        + 0.587 * img[..., 1]
                        + 0.114 * img[..., 2]
                    )
                    rows.append((int(mid), idx, ts, float(y.mean())))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "mean_y"]
            )

    return df.mapInPandas(run, VIDEO_FRAME_SCHEMA)


def extract_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction.  ``fake=True`` emits a deterministic
    digest-based pseudo-feature (plumbing test); ``fake=False`` would call the
    real codec (stubbed → NotImplementedError)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                if not fake:
                    decode_image(bytes(content))
                digest = hashlib.sha256(bytes(content)).hexdigest()[:16]
                rows.append((int(mid), "content_digest", digest))
            yield pd.DataFrame(rows, columns=["media_id", "feature", "value"])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) —
    the timestamps are computed JVM-side from duration metadata without
    touching the payload.  The actual frame grab happens in
    ``video_frame_stats`` (real for y4m, codec-stubbed otherwise)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.coalesce(F.col("duration_ms"), F.lit(0)),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_ts_ms"),
        )
    )


# ---------------------------------------------------------------------------
# registry query: deterministic media derived from the documents table
# ---------------------------------------------------------------------------


def _avi_fixture() -> tuple[bytes, bytes, int, int]:
    """The deterministic MJPEG/AVI building blocks for the codegen media
    synthesis: ``(dc_chunk, hdrl_for_0_frames, frame_count_pos1,
    frame_count_pos2)``.  The chunk holds one 8×8 JPEG from the repo's own
    encoder; the two positions are the byte offsets of the frame-count u32
    fields (avih dwTotalFrames, strh dwLength) inside the hdrl template,
    located by diffing the 0-frame and 1-frame renderings.  Cached — the
    encoder runs once per process."""
    global _AVI_FIXTURE
    if _AVI_FIXTURE is not None:
        return _AVI_FIXTURE
    import numpy as np

    yy, xx = np.mgrid[0:8, 0:8]
    frame = np.stack(
        [xx * 32 % 256, yy * 32 % 256, (xx + yy) * 16 % 256], axis=-1
    ).astype(np.uint8)
    payload = encode_jpeg(frame, quality=90)
    chunk = (
        b"00dc" + struct.pack("<I", len(payload)) + payload
        + b"\x00" * (len(payload) & 1)
    )

    def hdrl(nf: int) -> bytes:
        def ck(fcc, d):
            return fcc + struct.pack("<I", len(d)) + d + b"\x00" * (len(d) & 1)

        avih = struct.pack(
            "<14I", 1_000_000, 0, 0, 0, nf, 0, 1, 0, 8, 8, 0, 0, 0, 0
        )
        strh = b"vidsMJPG" + struct.pack(
            "<IHH8I4h", 0, 0, 0, 0, 1, 1, 0, nf, 0, 0, 0, 0, 0, 8, 8
        )
        strf = struct.pack(
            "<IiiHH4sIiiII", 40, 8, 8, 1, 24, b"MJPG", 8 * 8 * 3, 0, 0, 0, 0
        )
        return ck(
            b"LIST",
            b"hdrl" + ck(b"avih", avih)
            + ck(b"LIST", b"strl" + ck(b"strh", strh) + ck(b"strf", strf)),
        )

    h0, h1 = hdrl(0), hdrl(1)
    fc_pos = [i for i in range(len(h0)) if h0[i] != h1[i]]
    assert len(fc_pos) == 2  # dwTotalFrames (avih) + dwLength (strh) LSBs
    _AVI_FIXTURE = (chunk, h0, fc_pos[0], fc_pos[1])
    return _AVI_FIXTURE


_AVI_FIXTURE: tuple[bytes, bytes, int, int] | None = None


def avi_fixture_geometry() -> tuple[int, int, int]:
    """Byte geometry of the synthesized AVI carve-out, for SQL oracle
    twins: ``(first_payload_offset, chunk_stride, payload_len)`` — frame
    ``i`` of any clip lives at ``first_payload_offset + i·chunk_stride``
    with ``payload_len`` bytes.  Pure arithmetic once the deterministic
    encoder output is fixed."""
    chunk, h0, _, _ = _avi_fixture()
    (payload_len,) = struct.unpack_from("<I", chunk, 4)
    # RIFF hdr (12) + hdrl + movi LIST hdr (8) + 'movi' (4) + chunk hdr (8)
    return 12 + len(h0) + 12 + 8, len(chunk), payload_len


def media_from_documents(spark, sf: str) -> DataFrame:
    """Synthesize a deterministic media table from ``documents`` (the test
    corpus has no binary columns): content bytes are built JVM-side —
    doc_id % 3 == 0 → a real PNG header (IHDR width/height derived from
    doc_id), % 3 == 1 → jpeg magic + text bytes (with a real PCM WAV
    carve-out at % 12 == 7), % 3 == 2 → a real YUV4MPEG2 clip (with a
    real MJPEG-in-AVI carve-out at % 12 == 2, r11), each decodable
    end-to-end with a frame count matching the duration metadata.
    Everything is a codegen'd column expression; the binary column is
    exactly what a real lake would carry opaquely."""
    from event_stream_spark.queries import t

    d = t(spark, sf, "documents").select("doc_id", "text")
    w = (F.col("doc_id") % 640 + 1).cast("int")
    h = (F.col("doc_id") % 480 + 1).cast("int")
    hex4 = lambda c: F.lpad(F.hex(c), 8, "0")
    png = F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A" + "0000000D49484452"),  # sig + IHDR len/type
            hex4(w),
            hex4(h),
        )
    )
    jpeg = F.concat(F.unhex(F.lit("FFD8FF")), F.encode("text", "UTF-8"))
    # a VALID 16-bit mono PCM WAV, entirely in codegen: 44-byte canonical
    # header with little-endian length fields (payload is < 256 bytes so a
    # u32le is just `lpad(hex(n),2,'0') || '000000'`), PCM bytes from md5 —
    # arbitrary bytes are legal samples, and the real parse_wav/numpy path
    # decodes them like any recorded clip
    n_bytes = ((F.col("doc_id") % 16 + 4) * 2).cast("int")  # 8..38, even
    u32le_small = lambda c: F.concat(F.lpad(F.hex(c), 2, "0"), F.lit("000000"))
    wav = F.unhex(
        F.concat(
            F.lit("52494646"),                      # 'RIFF'
            u32le_small(n_bytes + 36),              # riff size
            F.lit("57415645" + "666D7420"),         # 'WAVE' 'fmt '
            F.lit("10000000" + "0100" + "0100"),    # len 16, PCM, mono
            F.lit("401F0000" + "803E0000"),         # 8000 Hz, 16000 B/s
            F.lit("0200" + "1000"),                 # block align 2, 16 bit
            F.lit("64617461"),                      # 'data'
            u32le_small(n_bytes),
            F.substring(
                F.repeat(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":pcm"))), 3),
                1,
                n_bytes * 2,
            ),
        )
    )
    # a VALID YUV4MPEG2 clip, entirely in codegen: text header (4×2, 1 fps,
    # 4:2:0), then `n_frames` FRAME blocks of 12 payload bytes (Y 8 + U 2 +
    # V 2) from md5 — arbitrary bytes are legal samples, and the real
    # parse_y4m/numpy path decodes them like any captured clip.  1 fps makes
    # n_frames consistent with duration_ms below.
    n_frames = (F.col("doc_id") % 10 + 1).cast("int")
    y4m_header_hex = b"YUV4MPEG2 W4 H2 F1:1 Ip A1:1 C420\x0a".hex().upper()
    frame_hex = F.concat(
        F.lit("4652414D450A"),  # 'FRAME\n'
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":y4m"))), 1, 24
        ),
    )
    y4m = F.unhex(F.concat(F.lit(y4m_header_hex), F.repeat(frame_hex, n_frames)))
    # a VALID MJPEG-in-AVI clip (r11), still entirely codegen: one constant
    # pre-encoded 8×8 JPEG (the repo's own encoder, deterministic) repeated
    # n_frames times as 00dc chunks at 1 fps (duration stays n×1000 ms);
    # the RIFF/movi sizes and the two frame-count header fields are column
    # expressions.  No idx1 — parse_avi defaults every MJPEG frame to
    # keyframe, which is exact.  Decodes end-to-end via decode_jpeg.
    _chunk, _h0, _p1, _p2 = _avi_fixture()
    _hex0 = _h0.hex().upper()

    def _u32le(c):
        hx = F.lpad(F.hex(c.cast("long")), 8, "0")
        return F.concat(
            F.substring(hx, 7, 2), F.substring(hx, 5, 2),
            F.substring(hx, 3, 2), F.substring(hx, 1, 2),
        )

    movi_size = n_frames * len(_chunk) + 4
    riff_size = movi_size + 8 + len(_h0) + 4
    avi = F.unhex(
        F.concat(
            F.lit("52494646"), _u32le(riff_size), F.lit("41564920"),
            F.lit(_hex0[: _p1 * 2]), _u32le(n_frames),
            F.lit(_hex0[(_p1 + 4) * 2 : _p2 * 2]), _u32le(n_frames),
            F.lit(_hex0[(_p2 + 4) * 2 :]),
            F.lit("4C495354"), _u32le(movi_size), F.lit("6D6F7669"),
            F.repeat(F.lit(_chunk.hex().upper()), n_frames),
        )
    )
    is_avi = F.col("doc_id") % 12 == 2  # a slice of the %3==2 video class
    is_audio = F.col("doc_id") % 12 == 7  # a slice of the %3==1 class
    kind = F.when(is_audio, F.lit("audio")).otherwise(
        F.element_at(
            F.array(F.lit("image"), F.lit("image"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        )
    )
    content = (
        F.when(is_audio, wav)
        .when(is_avi, avi)
        .when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, jpeg)
        .otherwise(y4m)
    )
    duration = F.when(
        F.col("doc_id") % 3 == 2, (F.col("doc_id") % 10 + 1) * 1000
    ).cast("long")
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        content.alias("content"),
        F.lit(None).cast("string").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        duration.alias("duration_ms"),
    )


def multimodal_meta(spark, sf: str) -> DataFrame:
    """Registry entry (rows-only): sniff formats/dimensions via mapInPandas,
    join the digest feature — the full multimodal pipeline minus the stubbed
    codec.  Deterministic output: (media_id, kind, format, width, height,
    digest, n_frames).

    r11 (guide §5): the five decode branches each referenced
    ``media_from_documents`` — five documents scans, five runs of the
    payload-synthesis expressions.  The media relation is persisted per
    execution (released by the caller's post-materialization unpersist
    sweep), so the payload bytes are built ONCE and every branch reads the
    in-memory relation — the exact analog of the single stored media table
    a real lake would scan."""
    media = media_from_documents(spark, sf).persist()
    sniffed = with_sniffed_metadata(media)
    feats = extract_features(media).filter(F.col("feature") == "content_digest")
    frames = (
        frame_sample_plan(media)
        .groupBy("media_id")
        .agg(F.count("*").alias("n_frames"))
    )
    audio = audio_pcm_stats(media.filter(F.col("kind") == "audio")).select(
        "media_id", "sample_rate", F.round("rms", 4).alias("rms")
    )
    video = (
        video_frame_stats(media.filter(F.col("kind") == "video"))
        .groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames_dec"),
            F.round(F.avg("mean_y"), 4).alias("luma"),
        )
    )
    return (
        sniffed.select("media_id", "kind", "format", "width", "height")
        .join(feats.select("media_id", F.col("value").alias("digest")), "media_id", "left")
        .join(frames, "media_id", "left")
        .join(audio, "media_id", "left")
        .join(video, "media_id", "left")
        .orderBy("media_id")
    )


def video_kf_plan(spark, sf: str) -> DataFrame:
    """Registry entry (r11, oracle-twinned): keyframe-aware frame-sampling
    plan over the synthesized media corpus — ``parse_avi`` walks each AVI
    carve-out's RIFF container, ``video_frame_index`` emits the per-frame
    (pts/size/offset/keyframe) metadata rows, and ``keyframe_sample_plan``
    picks the latest keyframe at-or-before every 1 s grid point.  Only the
    MJPEG/AVI rows carry a chunked index (y4m is a bare stream), so the
    DuckDB twin re-derives the exact expected plan arithmetically from
    doc_id plus the deterministic encoder geometry
    (:func:`avi_fixture_geometry`) — byte offsets and sizes hash-match."""
    media = media_from_documents(spark, sf)
    return keyframe_sample_plan(media, every_ms=1000)


def video_kf_plan_sql() -> str:
    """DuckDB oracle for :func:`video_kf_plan`: every synthesized AVI frame
    is a keyframe at i·1000 ms, so the chosen frame for each grid point is
    the grid index itself (the final grid point at n·1000 ms re-selects
    frame n-1, which dedups away); byte layout is pure arithmetic on the
    fixture geometry."""
    base, stride, plen = avi_fixture_geometry()
    return f"""
SELECT doc_id AS media_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * 1000 AS BIGINT) AS pts_ms,
       CAST({base} + i * {stride} AS BIGINT) AS file_offset,
       CAST({plen} AS BIGINT) AS size_bytes,
       CAST(i * 1000 AS BIGINT) AS first_grid_ms
FROM (
    SELECT doc_id, unnest(range(0, doc_id % 10 + 1)) AS i
    FROM documents
    WHERE doc_id % 12 = 2
)
"""


# ---------------------------------------------------------------------------
# GIF codec — pure stdlib + numpy; the public GIF87a/89a spec (LZW §appendix)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-variant LZW: variable-width codes, CLEAR resets the dictionary,
    dictionary capped at 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1
    # bit reader: GIF packs codes LSB-first
    bitpos = 0

    def read_code(width: int) -> int:
        nonlocal bitpos
        v = 0
        for i in range(width):
            byte = bitpos >> 3
            if byte >= len(data):
                raise ValueError("GIF LZW stream truncated")
            v |= ((data[byte] >> (bitpos & 7)) & 1) << i
            bitpos += 1
        return v

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            table, width, prev = fresh(), min_code_size + 1, None
            continue
        if code == end:
            break
        if prev is None:
            if code not in table:
                raise ValueError("GIF LZW: first code not in table")
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[len(table) + 2] = prev + (entry[0],)
        elif code == len(table) + 2:  # the KwKwK case
            entry = prev + (prev[0],)
            table[code] = entry
        else:
            raise ValueError("GIF LZW: code out of sequence")
        out.extend(entry)
        prev = entry
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("GIF LZW: pixel data short")
    return out[:n_pixels]


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(content: bytes):
    """REAL GIF decode: header + logical screen descriptor, global/local
    color table, LZW-decompressed first image, optional interlace
    de-weave.  Returns an h×w×3 uint8 RGB ndarray (first frame; animation
    frames beyond it and transparency composition are out of scope — the
    raster math is identical per frame)."""
    import numpy as np

    if not content or content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(content) < 13:
        raise ValueError("GIF truncated")
    ls_w = int.from_bytes(content[6:8], "little")
    ls_h = int.from_bytes(content[8:10], "little")
    flags = content[10]
    bg_idx = content[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        if len(gct) < n:
            raise ValueError("GIF global color table truncated")
        pos += 3 * n
    while pos < len(content):
        block = content[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(content) and content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(content):
                raise ValueError("GIF image descriptor truncated")
            left = int.from_bytes(content[pos + 1 : pos + 3], "little")
            top = int.from_bytes(content[pos + 3 : pos + 5], "little")
            w = int.from_bytes(content[pos + 5 : pos + 7], "little")
            h = int.from_bytes(content[pos + 7 : pos + 9], "little")
            iflags = content[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    content[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image without color table")
            if pos >= len(content):
                raise ValueError("GIF pixel data missing")
            min_code = content[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(content) and content[pos] != 0:
                ln = content[pos]
                lzw += content[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(lzw), min_code, w * h)
            px = np.array(idx, dtype=np.int64).reshape(h, w)
            if int(px.max(initial=0)) >= len(table):
                raise ValueError("GIF color index out of range")
            if iflags & 0x40:  # interlaced: de-weave the 4 passes
                order = []
                for first, step in _GIF_INTERLACE_PASSES:
                    order.extend(range(first, h, step))
                dew = np.empty_like(px)
                dew[order] = px
                px = dew
            rgb = table[px].astype(np.uint8)
            if (left, top) != (0, 0) or (w, h) != (ls_w, ls_h):
                # frame is a sub-rectangle (common in optimized GIFs):
                # composite onto the logical screen at its offset so the
                # raster matches the sniffed width/height metadata
                if left + w > ls_w or top + h > ls_h:
                    raise ValueError("GIF frame exceeds logical screen")
                bg = table[bg_idx] if bg_idx < len(table) else table[0]
                canvas = np.tile(
                    bg.astype(np.uint8), (ls_h, ls_w, 1)
                )
                canvas[top : top + h, left : left + w] = rgb
                rgb = canvas
            return rgb
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"GIF unknown block 0x{block:02x}")
    raise ValueError("GIF contains no image")


def encode_gif(img, *, interlace: bool = False) -> bytes:
    """Minimal GIF89a encoder (the decoder's inverse): palettizes the RGB
    raster (≤256 distinct colors), real LZW compression with dictionary
    growth and CLEAR resets — exists so fixtures exercise the decoder
    stdlib-only."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif: >256 distinct colors")
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    tbl_n = 1 << bits
    pad = np.zeros((tbl_n - len(palette), 3), dtype=np.uint8)
    table = np.concatenate([palette, pad])
    idx = inverse.reshape(h, w)
    if interlace:
        order = []
        for first, step in _GIF_INTERLACE_PASSES:
            order.extend(range(first, h, step))
        idx = idx[order]
    seq = idx.reshape(-1).tolist()

    # LZW encode (GIF variant)
    min_code = max(2, bits)
    clear, end = 1 << min_code, (1 << min_code) + 1
    out_bits: list[int] = []

    def emit(code: int, width: int):
        for i in range(width):
            out_bits.append((code >> i) & 1)

    width = min_code + 1
    table_d = {(i,): i for i in range(clear)}
    emit(clear, width)
    prev: tuple[int, ...] = ()
    for s in seq:
        cand = prev + (s,)
        if cand in table_d:
            prev = cand
            continue
        emit(table_d[prev], width)
        table_d[cand] = len(table_d) + 2
        if len(table_d) + 2 > (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table_d = {(i,): i for i in range(clear)}
                width = min_code + 1
        prev = (s,)
    if prev:
        emit(table_d[prev], width)
    emit(end, width)
    data = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, b in enumerate(out_bits[i : i + 8]):
            byte |= b << j
        data.append(byte)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (bits - 1))  # GCT present, size 2^bits
    out += b"\x00\x00"
    out += table.tobytes()
    out += b"\x2c" + b"\x00\x00\x00\x00"  # image at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)
    out.append(min_code)
    for i in range(0, len(data), 255):
        chunk_b = data[i : i + 255]
        out.append(len(chunk_b))
        out += chunk_b
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Metadata fast paths for the codec-stubbed containers (no decode needed)
# ---------------------------------------------------------------------------


def _bmff_walk_all(buf: bytes, want: bytes) -> list[bytes]:
    """All direct children of ``buf`` with box type ``want`` (ISO BMFF,
    32-bit and 64-bit largesize layouts)."""
    out: list[bytes] = []
    pos = 0
    while pos + 8 <= len(buf):
        size = int.from_bytes(buf[pos:pos + 4], "big")
        btype = buf[pos + 4:pos + 8]
        if size == 1:  # 64-bit largesize
            if pos + 16 > len(buf):
                return out
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            body = buf[pos + 16:pos + size]
        else:
            body = buf[pos + 8:pos + size]
        if size < 8 or pos + size > len(buf):
            return out
        if btype == want:
            out.append(body)
        pos += size
    return out


def mp4_dimensions(content: bytes | None) -> tuple[int | None, int | None]:
    """Video width/height from the first trak whose ``tkhd`` carries a
    nonzero presentation size (16.16 fixed point; audio tracks are 0×0).
    Pure container metadata, like :func:`mp4_duration_ms`."""
    if not content or len(content) < 16:
        return (None, None)
    moovs = _bmff_walk_all(content, b"moov")
    if not moovs:
        return (None, None)
    for trak in _bmff_walk_all(moovs[0], b"trak"):
        for tkhd in _bmff_walk_all(trak, b"tkhd"):
            if len(tkhd) < 4:
                continue
            off = 84 if tkhd[0] == 0 else 96  # end of height: v0 vs v1
            if len(tkhd) < off:
                continue
            w = int.from_bytes(tkhd[off - 8:off - 4], "big") >> 16
            h = int.from_bytes(tkhd[off - 4:off], "big") >> 16
            if w and h:
                return (w, h)
    return (None, None)


def mp4_duration_ms(content: bytes | None) -> int | None:
    """ISO BMFF box walk → ``moov``/``mvhd`` timescale+duration (version 0
    and 1 layouts).  Pure container metadata — sample DECODE stays stubbed
    (needs a real codec), but duration/timescale is spec'd structure."""
    if not content or len(content) < 16:
        return None

    def walk(buf: bytes, want: bytes):
        boxes = _bmff_walk_all(buf, want)
        return boxes[0] if boxes else None

    moov = walk(content, b"moov")
    if moov is None:
        return None
    mvhd = walk(moov, b"mvhd")
    if mvhd is None or len(mvhd) < 4:
        return None
    version = mvhd[0]
    try:
        if version == 0 and len(mvhd) >= 20:
            timescale = int.from_bytes(mvhd[12:16], "big")
            duration = int.from_bytes(mvhd[16:20], "big")
        elif version == 1 and len(mvhd) >= 32:
            timescale = int.from_bytes(mvhd[20:24], "big")
            duration = int.from_bytes(mvhd[24:32], "big")
        else:
            return None
    except Exception:
        return None
    if not timescale:
        return None
    return duration * 1000 // timescale


# ---------------------------------------------------------------------------
# ISO BMFF sample tables (ISO/IEC 14496-12 §8.6–8.7) — the REAL per-frame
# index of an mp4: decode timestamps (stts), composition offsets (ctts),
# sample sizes (stsz), sync samples (stss), sample→chunk mapping (stsc) and
# chunk offsets (stco/co64).  This is pure container structure — no codec —
# and it is exactly what a frame-sampling pipeline needs: where every frame
# lives in the file, its PTS/DTS, and which frames are seekable keyframes.
# Pixel DECODE of the h264/h265 payload stays stubbed (declared; needs a
# real codec), but the sampling PLAN below is real and keyframe-aware.
# ---------------------------------------------------------------------------


def _bmff_first(buf: bytes, *path: bytes) -> bytes | None:
    """First box at a nested path (each step a direct child type)."""
    cur = buf
    for want in path:
        boxes = _bmff_walk_all(cur, want)
        if not boxes:
            return None
        cur = boxes[0]
    return cur


def _u32s(body: bytes, off: int, n: int) -> list[int]:
    return list(struct.unpack(f">{n}I", body[off : off + 4 * n]))


def mp4_sample_table(content: bytes | None) -> dict | None:
    """Per-sample index of the first VIDEO track (fallback: first track
    with a sample table): ``{"timescale", "dts", "pts", "size", "offset",
    "keyframe"}`` — parallel lists, one entry per sample, plus the media
    timescale.  Returns None when the file carries no usable ``stbl``.

    Layout handled: stts delta runs, optional ctts (v0 unsigned / v1
    signed composition offsets — B-frame reordering), stsz uniform or
    per-sample sizes, stss sync table (absent ⇒ every sample is a sync
    sample, per §8.6.2), stsc chunk runs, stco 32-bit or co64 64-bit
    chunk offsets.  Malformed tables return None rather than raising —
    the mapInPandas caller treats that as "not indexable", same contract
    as the other parsers here.
    """
    if not content or len(content) < 16:
        return None
    moov = _bmff_first(content, b"moov")
    if moov is None:
        return None
    traks = _bmff_walk_all(moov, b"trak")
    chosen: tuple[bytes, bytes, bytes] | None = None  # (trak, mdia, stbl)
    for trak in traks:
        mdia = _bmff_first(trak, b"mdia")
        if mdia is None:
            continue
        stbl = _bmff_first(mdia, b"minf", b"stbl")
        if stbl is None:
            continue
        hdlr = _bmff_first(mdia, b"hdlr")
        is_video = hdlr is not None and len(hdlr) >= 12 and hdlr[8:12] == b"vide"
        if is_video:
            chosen = (trak, mdia, stbl)
            break
        if chosen is None:
            chosen = (trak, mdia, stbl)
    if chosen is None:
        return None
    trak, mdia, stbl = chosen
    try:
        mdhd = _bmff_first(mdia, b"mdhd")
        if mdhd is None or len(mdhd) < 4:
            return None
        timescale = (
            int.from_bytes(mdhd[12:16], "big")
            if mdhd[0] == 0
            else int.from_bytes(mdhd[20:24], "big")
        )
        if not timescale:
            return None

        stts = _bmff_first(stbl, b"stts")
        stsz = _bmff_first(stbl, b"stsz")
        stsc = _bmff_first(stbl, b"stsc")
        if stts is None or stsz is None or stsc is None:
            return None
        stco = _bmff_first(stbl, b"stco")
        co64 = _bmff_first(stbl, b"co64")
        if stco is None and co64 is None:
            return None

        # stts → per-sample DTS (cumulative delta runs)
        (n_runs,) = struct.unpack(">I", stts[4:8])
        dts: list[int] = []
        t = 0
        for i in range(n_runs):
            cnt, delta = struct.unpack(">II", stts[8 + 8 * i : 16 + 8 * i])
            for _ in range(cnt):
                dts.append(t)
                t += delta
        n = len(dts)
        if n == 0:
            return None

        # stsz → sizes (uniform or per-sample)
        uniform, count = struct.unpack(">II", stsz[4:12])
        if count != n:
            return None
        sizes = [uniform] * n if uniform else _u32s(stsz, 12, n)

        # ctts → PTS = DTS + composition offset (signed in v1)
        pts = list(dts)
        ctts = _bmff_first(stbl, b"ctts")
        if ctts is not None:
            signed = ctts[0] == 1
            (c_runs,) = struct.unpack(">I", ctts[4:8])
            idx = 0
            for i in range(c_runs):
                cnt = struct.unpack(">I", ctts[8 + 8 * i : 12 + 8 * i])[0]
                off = struct.unpack(
                    ">i" if signed else ">I", ctts[12 + 8 * i : 16 + 8 * i]
                )[0]
                for _ in range(cnt):
                    if idx >= n:
                        break
                    pts[idx] = dts[idx] + off
                    idx += 1

        # stss → sync samples (1-based); absent ⇒ all samples sync
        stss = _bmff_first(stbl, b"stss")
        if stss is None:
            keyframe = [True] * n
        else:
            (k,) = struct.unpack(">I", stss[4:8])
            sync = set(_u32s(stss, 8, k))
            keyframe = [(i + 1) in sync for i in range(n)]

        # stsc runs + stco/co64 → per-sample file offset
        if co64 is not None:
            (n_ch,) = struct.unpack(">I", co64[4:8])
            chunk_off = list(struct.unpack(f">{n_ch}Q", co64[8 : 8 + 8 * n_ch]))
        else:
            (n_ch,) = struct.unpack(">I", stco[4:8])
            chunk_off = _u32s(stco, 8, n_ch)
        (s_runs,) = struct.unpack(">I", stsc[4:8])
        runs = [
            struct.unpack(">III", stsc[8 + 12 * i : 20 + 12 * i])
            for i in range(s_runs)
        ]  # (first_chunk 1-based, samples_per_chunk, sample_desc_idx)
        offsets: list[int] = []
        sample = 0
        for ri, (first, per_chunk, _sd) in enumerate(runs):
            last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_ch
            for ch in range(first, last + 1):
                if sample >= n:
                    break
                base = chunk_off[ch - 1]
                within = 0
                for _ in range(per_chunk):
                    if sample >= n:
                        break
                    offsets.append(base + within)
                    within += sizes[sample]
                    sample += 1
        if len(offsets) != n:
            return None
    except (struct.error, IndexError):
        return None

    # edit list (§8.6.6) → presentation-origin shift in MEDIA-timescale
    # units (applied before the ms conversion so a timescale that doesn't
    # divide 1000 can't introduce per-frame off-by-1ms).  The two patterns
    # real muxers emit: a leading EMPTY edit (media_time −1) delays the
    # track by its movie-timescale duration (converted movie→media), and
    # the first normal edit trims ``media_time`` media units off the
    # front (how encoders cancel the B-frame ctts lead so presentation
    # starts at 0).  Later segments (splices, rate ≠ 1) stop the walk —
    # the computed shift stays a correct prefix.  The elst parse has its
    # OWN error handling: a malformed/truncated edit list (or a missing/
    # truncated mvhd when an empty edit needs the movie timescale) must
    # degrade to offset 0, never discard the perfectly good sample table.
    edit_offset = 0
    try:
        elst = _bmff_first(trak, b"edts", b"elst")
        if elst is not None and len(elst) >= 8:
            mvhd = _bmff_first(moov, b"mvhd")
            movie_ts = 0
            if mvhd is not None and len(mvhd) >= 4:
                raw_ts = (
                    mvhd[12:16] if mvhd[0] == 0 else mvhd[20:24]
                )
                if len(raw_ts) == 4:
                    movie_ts = int.from_bytes(raw_ts, "big")
            ver = elst[0]
            (n_ed,) = struct.unpack(">I", elst[4:8])
            for i in range(n_ed):
                if ver == 1:
                    pos_e = 8 + 20 * i
                    dur, mt = struct.unpack(">Qq", elst[pos_e : pos_e + 16])
                else:
                    pos_e = 8 + 12 * i
                    dur, mt = struct.unpack(">Ii", elst[pos_e : pos_e + 8])
                if mt == -1:
                    if not movie_ts:
                        # empty edit but no usable movie timescale: the
                        # shift can't be interpreted — keep offset 0
                        edit_offset = 0
                        break
                    edit_offset += dur * timescale // movie_ts
                else:
                    if mt > 0:
                        edit_offset -= mt
                    break
    except (struct.error, IndexError):
        edit_offset = 0
    return {
        "timescale": timescale,
        "dts": dts,
        "pts": pts,
        "size": sizes,
        "offset": offsets,
        "keyframe": keyframe,
        "edit_offset": edit_offset,
    }


FRAME_INDEX_SCHEMA = (
    "media_id long, frame_idx int, dts_ms long, pts_ms long, "
    "size_bytes long, file_offset long, keyframe boolean"
)


def video_frame_index(df: DataFrame) -> DataFrame:
    """mapInPandas per-frame INDEX for mp4 AND avi videos: one row per
    sample with its decode/presentation timestamp (ms), byte size,
    absolute file offset, and keyframe flag — straight from the
    container's sample tables (mp4 stbl) or chunk layout + idx1 flags
    (avi), no codec.  This is the metadata layer a 100 TB video pipeline
    runs frame selection on; only the chosen frames' byte ranges are ever
    fetched (cheap ranged reads), and only they would hit a decoder.

    Scale shape: streaming Arrow batches, O(samples) per clip, no shuffle
    — identical plumbing to ``image_pixel_stats``; the binary column is
    pruned away for downstream metadata-only consumers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else None
                st = mp4_sample_table(b)
                if st is None:
                    avi = parse_avi(b)
                    if avi is None:
                        continue
                    # fixed-cadence container: dts == pts == i·scale/rate
                    ms_num = 1000 * avi["scale"]
                    for i, (off, sz, kf) in enumerate(avi["frames"]):
                        t = i * ms_num // avi["rate"]
                        rows.append((int(mid), i, t, t, sz, off, kf))
                    continue
                ts = st["timescale"]
                # pts lands on the PRESENTATION timeline: the media
                # composition time shifted by the edit-list origin IN
                # MEDIA UNITS before the ms floor-division (shifting
                # after the division is off by 1ms whenever the
                # timescale doesn't divide 1000); dts stays on the raw
                # media/decode timeline
                eoff = st.get("edit_offset", 0)
                for i in range(len(st["dts"])):
                    rows.append(
                        (
                            int(mid),
                            i,
                            st["dts"][i] * 1000 // ts,
                            (st["pts"][i] + eoff) * 1000 // ts,
                            st["size"][i],
                            st["offset"][i],
                            st["keyframe"][i],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "frame_idx",
                    "dts_ms",
                    "pts_ms",
                    "size_bytes",
                    "file_offset",
                    "keyframe",
                ],
            )

    return df.mapInPandas(run, FRAME_INDEX_SCHEMA)


def keyframe_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Keyframe-aware frame sampling over the mp4/avi index: for each grid
    point (0, every_ms, 2·every_ms, … within the clip) pick the LATEST
    keyframe at-or-before it — seek-to-sync semantics, the frame a real
    player/sampler can actually decode without reading the whole GOP.
    Emits one row per distinct chosen frame with the byte range to fetch.

    Spark shape: the index (narrow metadata rows) joins the exploded grid
    on media_id with a pts≤grid range predicate, then ``max_by`` picks the
    frame per grid point — per-clip keys, so the join never skews beyond
    one clip's frame count × grid size; the payload column never rides
    the shuffle."""
    idx = video_frame_index(df).filter(F.col("keyframe"))
    grid = frame_sample_plan(df, every_ms=every_ms)
    kf = F.struct("frame_idx", "pts_ms", "file_offset", "size_bytes")
    # latest keyframe at-or-before the grid point; grid points EARLIER
    # than the first keyframe (positive composition offset on frame 0 —
    # common without edit lists) fall back to that first keyframe, which
    # is what a real player seeking to t=0 decodes.  max_by/min_by ignore
    # NULL ordering keys, so the covered/fallback split is one aggregate.
    chosen = (
        grid.join(idx, "media_id")
        .groupBy("media_id", "frame_ts_ms")
        .agg(
            F.max_by(
                kf, F.when(F.col("pts_ms") <= F.col("frame_ts_ms"), F.col("pts_ms"))
            ).alias("_cov"),
            F.min_by(kf, "pts_ms").alias("_first"),
        )
        .select(
            "media_id",
            "frame_ts_ms",
            F.coalesce("_cov", "_first").alias("_kf"),
        )
        .select(
            "media_id",
            "frame_ts_ms",
            F.col("_kf.frame_idx").alias("frame_idx"),
            F.col("_kf.pts_ms").alias("pts_ms"),
            F.col("_kf.file_offset").alias("file_offset"),
            F.col("_kf.size_bytes").alias("size_bytes"),
        )
    )
    return (
        chosen.groupBy("media_id", "frame_idx", "pts_ms", "file_offset", "size_bytes")
        .agg(F.min("frame_ts_ms").alias("first_grid_ms"))
        .orderBy("media_id", "frame_idx")
    )


# ---------------------------------------------------------------------------
# AVI / MJPEG (RIFF): container walk + REAL compressed-video pixel decode
#
# MJPEG-in-AVI is the compressed video format the repo's own JPEG codec
# unlocks: every frame is an independent baseline/progressive JPEG inside
# a RIFF container whose layout (chunk fourcc + u32 size + even padding)
# the WAVE path already walks.  That turns the r10 "video pixel decode
# declared out of scope" boundary into "AVC/HEVC out of scope" — AVI
# clips decode end-to-end with zero new entropy-coding machinery.
#
# Parity with the mp4 path: parse_avi produces the same shape of frame
# index (offset/size/keyframe per frame) that mp4_sample_table derives
# from stbl, so video_frame_index / keyframe_sample_plan run unchanged
# over both containers; video_frame_stats decodes ONLY the grid-sampled
# frames (ranged reads at scale — never the whole clip).
# ---------------------------------------------------------------------------

#: idx1 flag marking a self-contained (seekable) frame — AVIIF_KEYFRAME
_AVIIF_KEYFRAME = 0x10


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, data_off, size) for each RIFF chunk in [pos, end);
    sizes are u32 LE and chunk data pads to even length."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        data_off = pos + 8
        if data_off + size > end:
            break  # truncated tail: keep what parsed cleanly
        yield fourcc, data_off, size
        pos = data_off + size + (size & 1)


def parse_avi(content: bytes | None) -> dict | None:
    """RIFF/AVI container walk → stream-0 video description or None:
    ``{"width", "height", "rate", "scale", "handler", "frames":
    [(abs_offset, size, keyframe), ...]}``.

    Frame layout comes from the ``movi`` LIST's ``00dc``/``00db`` chunks
    (absolute payload offsets — the byte ranges a sampler fetches);
    ``rec `` grouping LISTs are descended.  The optional ``idx1`` index
    only contributes keyframe flags, matched positionally to stream-0
    chunks (the movi walk is the authoritative layout — idx1 offsets are
    ambiguous in the wild: absolute vs movi-relative); with no idx1 (or a
    mismatched one) every frame is keyframe=True, which is exact for
    MJPEG.  Timing is dwRate/dwScale from the ``vids`` stream header
    (frame i presents at i·scale/rate seconds)."""
    b = content
    if not b or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    width = height = None
    rate = scale = None
    handler = None
    frames: list[tuple[int, int]] = []
    idx_flags: list[int] = []

    def walk_movi(off: int, end: int) -> None:
        for fcc, doff, sz in _riff_chunks(b, off, end):
            if fcc == b"LIST" and b[doff : doff + 4] == b"rec ":
                walk_movi(doff + 4, doff + sz)
            elif fcc in (b"00dc", b"00db"):
                frames.append((doff, sz))

    def walk_strl(off: int, end: int) -> None:
        nonlocal width, height, rate, scale, handler
        fcc_type = None
        for fcc, doff, sz in _riff_chunks(b, off, end):
            if fcc == b"strh" and sz >= 36:
                fcc_type = b[doff : doff + 4]
                if fcc_type == b"vids":
                    handler = b[doff + 4 : doff + 8].decode("ascii", "replace")
                    scale, rate = struct.unpack_from("<II", b, doff + 20)
            elif fcc == b"strf" and fcc_type == b"vids" and sz >= 24:
                # BITMAPINFOHEADER: biWidth/biHeight i32 at +4/+8
                bw, bh = struct.unpack_from("<ii", b, doff + 4)
                width, height = abs(bw), abs(bh)

    def walk(off: int, end: int) -> None:
        for fcc, doff, sz in _riff_chunks(b, off, end):
            if fcc == b"LIST":
                ltype = b[doff : doff + 4]
                if ltype == b"movi":
                    walk_movi(doff + 4, doff + sz)
                elif ltype == b"strl":
                    walk_strl(doff + 4, doff + sz)
                else:  # hdrl, odml, …
                    walk(doff + 4, doff + sz)
            elif fcc == b"idx1":
                for e in range(doff, doff + sz - 15, 16):
                    ckid = b[e : e + 4]
                    if ckid in (b"00dc", b"00db"):
                        (flags,) = struct.unpack_from("<I", b, e + 4)
                        idx_flags.append(flags)

    walk(12, len(b))
    if not frames or not rate or scale is None:
        return None
    if len(idx_flags) == len(frames):
        keyed = [
            (doff, sz, bool(fl & _AVIIF_KEYFRAME))
            for (doff, sz), fl in zip(frames, idx_flags)
        ]
    else:
        keyed = [(doff, sz, True) for doff, sz in frames]
    return {
        "width": width,
        "height": height,
        "rate": int(rate),
        "scale": int(scale) or 1,
        "handler": handler,
        "frames": keyed,
    }


def avi_dimensions(content: bytes | None) -> tuple[int | None, int | None]:
    p = parse_avi(content)
    return (p["width"], p["height"]) if p else (None, None)


def avi_duration_ms(content: bytes | None) -> int | None:
    p = parse_avi(content)
    if not p:
        return None
    return len(p["frames"]) * 1000 * p["scale"] // p["rate"]


def encode_avi_mjpeg(
    frames, *, rate: int = 10, scale: int = 1, quality: int = 90
) -> bytes:
    """H×W×3 uint8 RGB frames → MJPEG-in-AVI bytes (fixture/thumbnail
    encoder, like ``encode_png``/``encode_jpeg``): each frame is one
    ``encode_jpeg`` payload in a ``00dc`` chunk, with a standards-shaped
    hdrl (avih + vids strh/strf, biCompression='MJPG') and an idx1 whose
    offsets are movi-relative (offset 4 = first chunk fourcc) and whose
    every entry carries AVIIF_KEYFRAME — true by construction for MJPEG."""
    import numpy as np

    if not frames:
        raise ValueError("empty clip")
    first = np.asarray(frames[0])
    h, w = first.shape[:2]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fcc: bytes, data: bytes) -> bytes:
        return fcc + struct.pack("<I", len(data)) + data + (b"\x00" * (len(data) & 1))

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    usec_per_frame = 1_000_000 * scale // rate
    avih = struct.pack(
        "<14I",
        usec_per_frame, 0, 0, 0x10,  # dwFlags: AVIF_HASINDEX
        len(payloads), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = b"vidsMJPG" + struct.pack(
        "<IHH8I4h",
        0, 0, 0,                      # dwFlags, wPriority, wLanguage
        0, scale, rate, 0,            # dwInitialFrames..dwStart
        len(payloads), 0, 0, 0,       # dwLength, sugg, quality, sampleSize
        0, 0, w, h,                   # rcFrame
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    idx = b""
    for p in payloads:
        # movi-relative offset of this chunk's fourcc: 4 ('movi' tag) + body so far
        idx += b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME,
                                     4 + len(movi_body), len(p))
        movi_body += chunk(b"00dc", p)
    movi = lst(b"movi", movi_body)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# MPEG1 Layer III bitrate (kbps) and sample-rate tables (public ISO 11172-3)
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)

# Full MPEG-audio header tables (ISO 11172-3 / 13818-3): bitrate kbps by
# (version-group, layer); sample rates by version.  Version field: 3=MPEG1,
# 2=MPEG2, 0=MPEG2.5 (the unofficial low-rate extension, same LSF tables).
_MPA_BITRATES = {
    # MPEG1: layer 1 / 2 / 3
    (3, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (3, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (3, 3): _MP3_BITRATES,
    # MPEG2/2.5 (LSF): layer 1; layers 2 and 3 share one table
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MPA_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _mpa_frame(content: bytes, pos: int):
    """Decode one MPEG-audio frame header at ``pos``: returns (frame_bytes,
    samples_per_frame, sample_rate, bitrate_bps, layer, version, channels)
    or None if ``pos`` doesn't hold a valid header."""
    if pos + 4 > len(content):
        return None
    h = content[pos : pos + 4]
    if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    ver = (h[1] >> 3) & 0x03           # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = 4 - ((h[1] >> 1) & 0x03)   # field 3→L1, 2→L2, 1→L3
    if ver == 1 or layer == 4:
        return None  # reserved version / reserved layer
    vgrp = 3 if ver == 3 else 2
    br_idx = (h[2] >> 4) & 0x0F
    sr_idx = (h[2] >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format and reserved rates: not walkable
    bitrate = _MPA_BITRATES[(vgrp, layer)][br_idx] * 1000
    rate = _MPA_RATES[ver][sr_idx]
    pad = (h[2] >> 1) & 1
    channels = 1 if ((h[3] >> 6) & 0x03) == 3 else 2
    if layer == 1:
        samples = 384
        fbytes = (12 * bitrate // rate + pad) * 4
    else:
        # L2 always 1152; L3 is 1152 in MPEG1 but 576 in MPEG2/2.5 (LSF)
        samples = 1152 if (layer == 2 or ver == 3) else 576
        coef = 144 if (layer == 2 or ver == 3) else 72
        fbytes = coef * bitrate // rate + pad
    return (fbytes, samples, rate, bitrate, layer, ver, channels)


def _id3v2_size(content: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none)."""
    if content[:3] != b"ID3" or len(content) < 10:
        return 0
    sz = 0
    for b in content[6:10]:
        sz = (sz << 7) | (b & 0x7F)
    return 10 + sz + (10 if content[5] & 0x10 else 0)  # footer flag


def id3v2_tags(content: bytes | None) -> dict:
    """Text frames of a leading ID3v2.3/2.4 tag as ``{frame_id: text}``
    (TIT2 title, TPE1 artist, TALB album, TSSE encoder, …).  Handles the
    four spec text encodings (latin-1, utf-16 w/ BOM, utf-16be, utf-8) and
    the v2.4 syncsafe frame sizes; non-text frames are skipped.  Returns
    {} when no tag is present — pure container metadata, same contract as
    the other header parsers here."""
    if not content or content[:3] != b"ID3" or len(content) < 10:
        return {}
    major = content[3]
    end = _id3v2_size(content)
    pos = 10
    out: dict[str, str] = {}
    while pos + 10 <= min(end, len(content)):
        fid = content[pos : pos + 4]
        if not fid.strip(b"\x00"):
            break  # padding reached
        raw = content[pos + 4 : pos + 8]
        if major >= 4:  # syncsafe in v2.4
            size = 0
            for b in raw:
                size = (size << 7) | (b & 0x7F)
        else:
            size = int.from_bytes(raw, "big")
        body = content[pos + 10 : pos + 10 + size]
        pos += 10 + size
        if size == 0 or not fid.startswith(b"T") or len(body) < 1:
            continue
        enc, payload = body[0], body[1:]
        try:
            if enc == 0:
                text = payload.decode("latin-1")
            elif enc == 1:
                text = payload.decode("utf-16")
            elif enc == 2:
                text = payload.decode("utf-16-be")
            elif enc == 3:
                text = payload.decode("utf-8")
            else:
                continue
        except UnicodeDecodeError:
            continue
        out[fid.decode("ascii")] = text.rstrip("\x00")
    return out


def mp3_frame_profile(content: bytes | None) -> dict | None:
    """EXACT MPEG-audio stream profile by walking every frame header:
    frame count, sample-accurate duration, version/layer, sample rate,
    channels, min/max bitrate (CBR vs VBR), and whether a Xing/Info VBR
    header frame leads the stream.  Covers MPEG1, MPEG2 and MPEG2.5,
    Layers I–III — unlike :func:`mp3_duration_ms`'s single-header CBR
    estimate, the walk is correct for VBR files and LSF sample rates.
    Leading ID3v2 and trailing ID3v1 tags are stepped over; sample DECODE
    stays stubbed (declared) — this is container structure, the metadata a
    media lake records per object."""
    if not content or len(content) < 4:
        return None
    pos = _id3v2_size(content)
    end = len(content)
    if end >= 128 and content[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    first = _mpa_frame(content, pos)
    if first is None:
        return None
    n = 0
    samples = 0
    br_lo = br_hi = None
    xing = False
    ver = layer = rate = channels = None
    while pos + 4 <= end:
        fr = _mpa_frame(content, pos)
        if fr is None:
            break
        fbytes, smp, rate, bitrate, layer, ver, channels = fr
        if n == 0:
            # Xing/Info (VBR header) sits in the side-info region of the
            # first frame; that frame carries no audio
            probe = content[pos + 4 : pos + min(fbytes, 64)]
            xing = b"Xing" in probe or b"Info" in probe
        if not xing or n > 0:
            samples += smp
        n += 1
        br_lo = bitrate if br_lo is None else min(br_lo, bitrate)
        br_hi = bitrate if br_hi is None else max(br_hi, bitrate)
        if fbytes <= 0:
            return None
        pos += fbytes
    if n == 0 or rate is None:
        return None
    return {
        "n_frames": n,
        "duration_ms": samples * 1000 // rate,
        "version": {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[ver],
        "layer": layer,
        "sample_rate": rate,
        "channels": channels,
        "bitrate_min": br_lo,
        "bitrate_max": br_hi,
        "vbr": br_lo != br_hi,
        "xing": xing,
    }


def mp3_duration_ms(content: bytes | None) -> int | None:
    """CBR duration estimate from the first MPEG1 Layer III frame header
    (optionally behind an ID3v2 tag): duration ≈ audio_bytes·8/bitrate.
    VBR files need a Xing/VBRI walk — out of scope, returns the CBR
    estimate which is what lightweight media pipelines record."""
    if not content or len(content) < 4:
        return None
    pos = 0
    if content[:3] == b"ID3" and len(content) >= 10:
        # syncsafe 28-bit tag size
        sz = 0
        for b in content[6:10]:
            sz = (sz << 7) | (b & 0x7F)
        pos = 10 + sz
    if pos + 4 > len(content):
        return None
    h = content[pos : pos + 4]
    if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    if (h[1] >> 3) & 0x03 != 0x03 or (h[1] >> 1) & 0x03 != 0x01:
        return None  # only MPEG1 Layer III
    bitrate = _MP3_BITRATES[(h[2] >> 4) & 0x0F]
    rate_idx = (h[2] >> 2) & 0x03
    if not bitrate or rate_idx >= len(_MP3_RATES):
        return None
    audio_bytes = len(content) - pos
    return audio_bytes * 8 * 1000 // (bitrate * 1000)


# ---------------------------------------------------------------------------
# Baseline JPEG (SOF0) codec — stdlib + numpy, from the public ITU-T T.81
# spec (closes the r4 "jpeg stubbed" gap; reference parity target:
# es-core has no media handling — this is §2.12 extension surface).
#
# Scope: baseline DCT, 8-bit, huffman entropy coding, 1 or 3 components,
# integer chroma subsampling ratios (4:4:4 / 4:2:2 / 4:2:0), restart
# markers.  Progressive (SOF2), arithmetic coding, and 12-bit raise
# NotImplementedError (declared, like PNG's 16-bit path).
# ---------------------------------------------------------------------------

# zigzag position → linear index in the 8×8 block (T.81 Figure A.6)
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1/K.2 example quantization tables (row-major)
_JPEG_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32

# Annex K.3 typical huffman tables: (bits[1..16], values)
_JPEG_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_JPEG_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _jpeg_canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """(length, code) → symbol for the canonical huffman assignment
    (T.81 Annex C): codes of each length count up from the previous
    length's last code, shifted left."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_dct_matrix():
    import numpy as np

    C = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            C[k, n] = np.cos((2 * n + 1) * k * np.pi / 16)
    C *= np.sqrt(2.0 / 8.0)
    C[0, :] *= np.sqrt(0.5)
    return C


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    RST markers are consumed by ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # hit a marker mid-read (EOI after padding bits)
                    self.pos -= 1
                    raise ValueError("jpeg: marker inside entropy data")
            self.buf = b
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("jpeg: expected restart marker")


def _jpeg_decode_huffman(r: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


def _jpeg_extend(v: int, n: int) -> int:
    """receive/extend (T.81 F.2.2.1): an n-bit magnitude to a signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def jpeg_dimensions(content: bytes | None) -> tuple[int | None, int | None]:
    """Width/height from the SOFn header — metadata without decoding."""
    if not content or not content.startswith(b"\xff\xd8"):
        return (None, None)
    pos = 2
    try:
        while pos + 4 <= len(content):
            if content[pos] != 0xFF:
                return (None, None)
            marker = content[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:
                return (None, None)
            seglen = struct.unpack_from(">H", content, pos)[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack_from(">HH", content, pos + 3)
                return (w, h)
            pos += seglen
    except (struct.error, IndexError):
        pass
    return (None, None)


class _JpegScanState:
    """Per-scan entropy state: EOB run counter (progressive AC scans)."""

    def __init__(self) -> None:
        self.eobrun = 0


def _jpeg_block_baseline(r, dc_tab, ac_tab, pred, cid, coef) -> None:
    """Sequential (SOF0/1) block: DC diff + run-length AC, full precision.
    ``coef`` is the block's 64-entry ZIGZAG-order quantized buffer."""
    s = _jpeg_decode_huffman(r, dc_tab)
    pred[cid] += _jpeg_extend(r.bits(s), s)
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _jpeg_decode_huffman(r, ac_tab)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("jpeg: AC index overflow")
        coef[k] = _jpeg_extend(r.bits(s), s)
        k += 1


def _jpeg_block_dc_first(r, dc_tab, pred, cid, coef, al) -> None:
    """Progressive DC first scan (T.81 G.2): diff of the point-transformed
    DC (arithmetic >> al on encode), stored << al."""
    s = _jpeg_decode_huffman(r, dc_tab)
    pred[cid] += _jpeg_extend(r.bits(s), s)
    coef[0] = pred[cid] << al


def _jpeg_block_dc_refine(r, coef, al) -> None:
    """Progressive DC refinement: one bit ORs 1<<al into the (two's
    complement) DC value — Python's | on negatives matches C int."""
    if r.bit():
        coef[0] |= 1 << al


def _jpeg_block_ac_first(r, ac_tab, coef, ss, se, al, st) -> None:
    """Progressive AC first scan with EOB-run symbols (T.81 G.2.2)."""
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = _jpeg_decode_huffman(r, ac_tab)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            st.eobrun = (1 << rr) - 1
            if rr:
                st.eobrun += r.bits(rr)
            return
        k += rr
        if k > se:
            raise ValueError("jpeg: AC index overflow")
        coef[k] = _jpeg_extend(r.bits(s), s) << al
        k += 1


def _jpeg_block_ac_refine(r, ac_tab, coef, ss, se, al, st) -> None:
    """Progressive AC refinement (T.81 G.2.3 / libjpeg shape): correction
    bits for already-significant coefficients interleave with new ±1<<al
    placements and EOB runs."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k0: int) -> None:
        if r.bit() and (coef[k0] & p1) == 0:
            coef[k0] += p1 if coef[k0] >= 0 else m1

    k = ss
    if st.eobrun == 0:
        while k <= se:
            rs = _jpeg_decode_huffman(r, ac_tab)
            rr, s = rs >> 4, rs & 0x0F
            if s == 0:
                if rr != 15:
                    st.eobrun = 1 << rr
                    if rr:
                        st.eobrun += r.bits(rr)
                    break
                sval = 0  # ZRL: skip 16 zero-history slots
            else:
                if s != 1:
                    raise ValueError("jpeg: bad AC-refinement magnitude")
                sval = p1 if r.bit() else m1
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if k <= se and sval:
                coef[k] = sval
            k += 1
    if st.eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
        st.eobrun -= 1


def _jpeg_true_blocks(frame, c) -> tuple[int, int]:
    """Non-interleaved (single-component-scan) data-unit grid: blocks over
    the component's TRUE sample dimensions, not the MCU-padded grid."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    sw = -(-frame["w"] * c["h"] // hmax)
    sh = -(-frame["h"] * c["v"] // vmax)
    return -(-sh // 8), -(-sw // 8)


def _jpeg_decode_scan(
    data, pos, frame, scan_comps, stabs, ss, se, ah, al,
    huff, bufs, restart_interval,
) -> int:
    """Decode one entropy-coded scan into the coefficient buffers; returns
    the byte position of the next marker."""
    progressive = frame["progressive"]
    r = _JpegBitReader(data, pos)
    pred = {c["id"]: 0 for c in scan_comps}
    st = _JpegScanState()
    dc_only = ss == 0
    refining = ah != 0

    def tables(cid):
        dc = huff.get((0, stabs[cid][0]))
        ac = huff.get((1, stabs[cid][1]))
        return dc, ac

    def unit(c, by, bx):
        coef = bufs[c["id"]][by][bx]
        dc_tab, ac_tab = tables(c["id"])
        if not progressive:
            if dc_tab is None or ac_tab is None:
                raise ValueError("jpeg: missing huffman table")
            _jpeg_block_baseline(r, dc_tab, ac_tab, pred, c["id"], coef)
        elif dc_only and not refining:
            if dc_tab is None:
                raise ValueError("jpeg: missing DC huffman table")
            _jpeg_block_dc_first(r, dc_tab, pred, c["id"], coef, al)
        elif dc_only:
            _jpeg_block_dc_refine(r, coef, al)
        elif not refining:
            if ac_tab is None:
                raise ValueError("jpeg: missing AC huffman table")
            _jpeg_block_ac_first(r, ac_tab, coef, ss, se, al, st)
        else:
            if ac_tab is None:
                raise ValueError("jpeg: missing AC huffman table")
            _jpeg_block_ac_refine(r, ac_tab, coef, ss, se, al, st)

    def maybe_restart(count):
        if restart_interval and count and count % restart_interval == 0:
            r.restart()
            for cid in pred:
                pred[cid] = 0
            st.eobrun = 0

    if len(scan_comps) > 1:  # interleaved: MCU order over the padded grid
        if progressive and not dc_only:
            raise ValueError("jpeg: interleaved AC scan is illegal")
        n = 0
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                maybe_restart(n)
                n += 1
                for c in scan_comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit(c, my * c["v"] + by, mx * c["h"] + bx)
    else:  # non-interleaved: raster order over the TRUE block grid
        c = scan_comps[0]
        tby, tbx = _jpeg_true_blocks(frame, c)
        n = 0
        for by in range(tby):
            for bx in range(tbx):
                maybe_restart(n)
                n += 1
                unit(c, by, bx)

    # byte-align and locate the next marker (skip pad bits / stray RSTs)
    pos = r.pos
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return len(data)


def decode_jpeg(content: bytes):
    """Baseline (SOF0/1) and progressive (SOF2) JPEG → H×W×3 uint8 RGB
    (grayscale replicated).  Every scan accumulates into per-component
    quantized-coefficient buffers (zigzag order); dequantization + the
    float IDCT (orthonormal DCT-III, one numpy matmul pair per block) run
    once at the end, so a progressive file decodes bit-identically to the
    sequential coding of the same coefficients.  Nearest-neighbor chroma
    upsampling, ITU BT.601 YCbCr→RGB.

    Error contract: malformed/truncated input raises ValueError (or the
    declared NotImplementedError), NEVER struct.error/IndexError — the
    mapInPandas stages rely on that to SKIP corrupt rows instead of
    failing the whole job."""
    try:
        return _decode_jpeg_inner(content)
    except (struct.error, IndexError) as exc:
        # a truncated segment read mid-parse is invalid input, not a crash
        raise ValueError(f"jpeg: truncated or corrupt stream ({exc})") from None


def _decode_jpeg_inner(content: bytes):
    import numpy as np

    if not content or not content.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    data = content
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None
    restart_interval = 0
    bufs: dict[int, list] = {}
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: bad marker byte at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated segment header")
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                qt[tq] = list(seg[p:p + 64])
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p:p + 16])
                p += 16
                nvals = sum(bits)
                vals = list(seg[p:p + nvals])
                p += nvals
                huff[(tc, th)] = _jpeg_canonical_codes(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            h, w = struct.unpack_from(">HH", seg, 1)
            if not w or not h:
                raise ValueError("jpeg: zero dimensions")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax == 0 or vmax == 0:
                raise ValueError("jpeg: zero sampling factor")
            for c in comps:
                if hmax % c["h"] or vmax % c["v"]:
                    raise NotImplementedError("jpeg: non-integer sampling ratio")
            frame = {
                "w": w, "h": h, "comps": comps,
                "hmax": hmax, "vmax": vmax,
                "mcux": -(-w // (8 * hmax)), "mcuy": -(-h // (8 * vmax)),
                "progressive": marker == 0xC2,
            }
            for c in comps:
                by, bx = frame["mcuy"] * c["v"], frame["mcux"] * c["h"]
                bufs[c["id"]] = [
                    [[0] * 64 for _ in range(bx)] for _ in range(by)
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"jpeg: SOF{marker - 0xC0} unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            stabs = {}
            order = []
            for i in range(ns):
                cid = seg[1 + 2 * i]
                stabs[cid] = (seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0x0F)
                order.append(cid)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            by_id = {c["id"]: c for c in frame["comps"]}
            try:
                scan_comps = [by_id[cid] for cid in order]
            except KeyError as exc:
                raise ValueError(f"jpeg: unknown scan component {exc}") from None
            pos = _jpeg_decode_scan(
                data, pos + seglen, frame, scan_comps, stabs, ss, se, ah, al,
                huff, bufs, restart_interval,
            )
            saw_scan = True
            continue
        pos += seglen
    if frame is None or not saw_scan:
        raise ValueError("jpeg: missing SOF/SOS")

    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    C = _jpeg_dct_matrix()
    zz = _JPEG_ZIGZAG
    planes = {}
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"jpeg: missing quant table {c['tq']}")
        q = qt[c["tq"]]
        plane = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
        for by in range(mcuy * c["v"]):
            for bx in range(mcux * c["h"]):
                zcoef = bufs[c["id"]][by][bx]
                nat = np.zeros(64)
                for k in range(64):
                    if zcoef[k]:
                        nat[zz[k]] = zcoef[k] * q[k]
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    C.T @ nat.reshape(8, 8) @ C + 128.0
                )
        planes[c["id"]] = plane

    full_h, full_w = mcuy * vmax * 8, mcux * hmax * 8
    ups = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        ups.append(p[:full_h, :full_w])
    if len(comps) == 1:
        ych = np.clip(np.round(ups[0]), 0, 255)[:h, :w]
        return np.stack([ych, ych, ych], axis=-1).astype(np.uint8)
    if len(comps) != 3:
        raise NotImplementedError(f"jpeg: {len(comps)}-component images")
    Y, Cb, Cr = ups[0], ups[1] - 128.0, ups[2] - 128.0
    rgb = np.stack(
        [Y + 1.402 * Cr, Y - 0.344136 * Cb - 0.714136 * Cr, Y + 1.772 * Cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255)[:h, :w].astype(np.uint8)


def _jpeg_scaled_qt(base: list[int], quality: int) -> list[int]:
    """libjpeg quality scaling (public IJG recipe)."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(max((q * scale + 50) // 100, 1), 255) for q in base]


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        while self.n:
            self.write(1, 1)


def _jpeg_encode_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code, length), inverse of the canonical decode table."""
    return {
        sym: (code, length)
        for (length, code), sym in _jpeg_canonical_codes(bits, vals).items()
    }


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """signed value → (category, appended bits) per T.81 F.1.2.1."""
    s = 0
    a = abs(v)
    while a:
        s += 1
        a >>= 1
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _jpeg_encode_block(wtr, C, plane, y0, x0, qnat, dct, act, pred, ci):
    """FDCT → natural-order quantize → DC-diff + run-length AC huffman."""
    import numpy as np

    zz = _JPEG_ZIGZAG
    f = C @ (plane[y0:y0 + 8, x0:x0 + 8] - 128.0) @ C.T
    coefs = np.round(f.reshape(64) / np.asarray(qnat, dtype=np.float64))
    coefs = coefs.astype(int)
    diff = int(coefs[0]) - pred[ci]
    pred[ci] = int(coefs[0])
    s, mag = _jpeg_magnitude(diff)
    code, length = dct[s]
    wtr.write(code, length)
    if s:
        wtr.write(mag, s)
    run = 0
    last = 0
    for k in range(63, 0, -1):
        if coefs[zz[k]]:
            last = k
            break
    for k in range(1, last + 1):
        v = int(coefs[zz[k]])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = act[0xF0]
            wtr.write(code, length)
            run -= 16
        s, mag = _jpeg_magnitude(v)
        code, length = act[(run << 4) | s]
        wtr.write(code, length)
        wtr.write(mag, s)
        run = 0
    if last < 63:
        code, length = act[0x00]
        wtr.write(code, length)


def _jpeg_seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _jpeg_padded_planes(Y, Cb, Cr, mcux, mcuy, hs, vs, subsample):
    """Replicate-pad the YCbCr planes to the MCU grid; 4:2:0 chroma is
    2×2 box-filtered to half resolution.  Shared by the baseline and
    progressive encoders so the edge-padding rule cannot diverge."""
    import numpy as np

    def pad(plane, ph, pw):
        out = np.empty((ph, pw))
        out[: plane.shape[0], : plane.shape[1]] = plane
        out[plane.shape[0]:, : plane.shape[1]] = plane[-1:, :]
        out[:, plane.shape[1]:] = out[:, plane.shape[1] - 1:plane.shape[1]]
        return out

    Yp = pad(Y, mcuy * vs * 8, mcux * hs * 8)
    if subsample:
        che, cwe = mcuy * 8, mcux * 8
        Cbp = pad(Cb, mcuy * 16, mcux * 16).reshape(che, 2, cwe, 2).mean(axis=(1, 3))
        Crp = pad(Cr, mcuy * 16, mcux * 16).reshape(che, 2, cwe, 2).mean(axis=(1, 3))
    else:
        Cbp = pad(Cb, mcuy * 8, mcux * 8)
        Crp = pad(Cr, mcuy * 8, mcux * 8)
    return Yp, Cbp, Crp


def _encode_jpeg_gray(Y, h: int, w: int, quality: int, restart_interval: int) -> bytes:
    """Single-component (luma-only) baseline frame."""
    import numpy as np

    qly = _jpeg_scaled_qt(_JPEG_QT_LUMA, quality)
    C = _jpeg_dct_matrix()
    zz = _JPEG_ZIGZAG
    dc_l = _jpeg_encode_codes(*_JPEG_HUFF_DC_LUMA)
    ac_l = _jpeg_encode_codes(*_JPEG_HUFF_AC_LUMA)
    mcux, mcuy = -(-w // 8), -(-h // 8)
    Yp = np.empty((mcuy * 8, mcux * 8))
    Yp[:h, :w] = Y
    Yp[h:, :w] = Y[-1:, :]
    Yp[:, w:] = Yp[:, w - 1:w]
    wtr = _JpegBitWriter()
    pred = [0]
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                pred[0] = 0
            mcu_count += 1
            _jpeg_encode_block(wtr, C, Yp, my * 8, mx * 8, qly, dc_l, ac_l, pred, 0)
    wtr.flush()
    qz_l = [qly[zz[i]] for i in range(64)]
    return (
        b"\xff\xd8"
        + _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _jpeg_seg(0xDB, bytes([0]) + bytes(qz_l))
        + _jpeg_seg(
            0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
        )
        + _jpeg_seg(
            0xC4,
            bytes([0x00]) + bytes(_JPEG_HUFF_DC_LUMA[0]) + bytes(_JPEG_HUFF_DC_LUMA[1]),
        )
        + _jpeg_seg(
            0xC4,
            bytes([0x10]) + bytes(_JPEG_HUFF_AC_LUMA[0]) + bytes(_JPEG_HUFF_AC_LUMA[1]),
        )
        + (
            _jpeg_seg(0xDD, struct.pack(">H", restart_interval))
            if restart_interval
            else b""
        )
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(wtr.out)
        + b"\xff\xd9"
    )


def encode_jpeg(
    img, *, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0, grayscale: bool = False,
    progressive: bool = False,
) -> bytes:
    """H×W×3 uint8 RGB → JFIF bytes.  Baseline (SOF0, Annex K tables) by
    default; ``progressive=True`` writes SOF2 with spectral-selection +
    successive-approximation scans carrying the SAME quantized
    coefficients, so both codings decode bit-identically.
    ``subsample=True`` writes 4:2:0 (2×2 luma MCUs, averaged chroma),
    else 4:4:4.  ``restart_interval=N`` emits a DRI segment and RSTn
    markers every N MCUs (baseline only — the resync points a parallel
    decoder splits on).  ``grayscale=True`` writes a single-component
    (luma-only) frame — the decoder replicates it back to RGB."""
    import numpy as np

    if progressive:
        return _encode_jpeg_progressive(img, quality, subsample, grayscale)
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    if not h or not w:
        raise ValueError("empty image")
    R, G, B = img[..., 0], img[..., 1], img[..., 2]
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
    Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0
    if grayscale:
        return _encode_jpeg_gray(Y, h, w, quality, restart_interval)

    qly = _jpeg_scaled_qt(_JPEG_QT_LUMA, quality)
    qlc = _jpeg_scaled_qt(_JPEG_QT_CHROMA, quality)
    C = _jpeg_dct_matrix()
    zz = _JPEG_ZIGZAG
    dc_l = _jpeg_encode_codes(*_JPEG_HUFF_DC_LUMA)
    ac_l = _jpeg_encode_codes(*_JPEG_HUFF_AC_LUMA)
    dc_c = _jpeg_encode_codes(*_JPEG_HUFF_DC_CHROMA)
    ac_c = _jpeg_encode_codes(*_JPEG_HUFF_AC_CHROMA)

    hs, vs = (2, 2) if subsample else (1, 1)
    mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))

    Yp, Cbp, Crp = _jpeg_padded_planes(Y, Cb, Cr, mcux, mcuy, hs, vs, subsample)

    wtr = _JpegBitWriter()
    pred = [0, 0, 0]

    def block(plane, y0, x0, qnat, dct, act, ci):
        _jpeg_encode_block(wtr, C, plane, y0, x0, qnat, dct, act, pred, ci)

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()  # byte-align (1-padded) before the marker
                wtr.out += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                pred[0] = pred[1] = pred[2] = 0
            mcu_count += 1
            for by in range(vs):
                for bx in range(hs):
                    block(
                        Yp, (my * vs + by) * 8, (mx * hs + bx) * 8,
                        qly, dc_l, ac_l, 0,
                    )
            block(Cbp, my * 8, mx * 8, qlc, dc_c, ac_c, 1)
            block(Crp, my * 8, mx * 8, qlc, dc_c, ac_c, 2)
    wtr.flush()

    seg = _jpeg_seg

    def dqt(tid: int, q: list[int]) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(q))

    def dht(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    # DQT payloads are stored in ZIGZAG order (T.81 B.2.4.1); the decoder's
    # q[k] then lines up with the k-th zigzag coefficient
    qz_l = [qly[zz[i]] for i in range(64)]
    qz_c = [qlc[zz[i]] for i in range(64)]
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, qz_l) + dqt(1, qz_c)
        + sof
        + dht(0, 0, _JPEG_HUFF_DC_LUMA) + dht(1, 0, _JPEG_HUFF_AC_LUMA)
        + dht(0, 1, _JPEG_HUFF_DC_CHROMA) + dht(1, 1, _JPEG_HUFF_AC_CHROMA)
        + (
            seg(0xDD, struct.pack(">H", restart_interval))
            if restart_interval
            else b""
        )
        + sos
        + bytes(wtr.out)
        + b"\xff\xd9"
    )


# --- progressive (SOF2) encoder -------------------------------------------
#
# Emits spectral-selection + successive-approximation scans: DC first
# (Al=1, interleaved) → DC refine → per component AC first for bands 1-5
# and 6-63 (Al=1) → per component AC refine of the same bands (Ah=1).
# Scan symbols use FLAT 9-bit canonical huffman tables (written to DHT, so
# any decoder reads them) because the Annex K sequential tables lack the
# EOBn run symbols progressive scans need; compression ratio is not the
# point of this encoder — exercising every decode path losslessly is.
# Restart markers are not emitted in progressive mode (the baseline
# encoder covers the restart path).

def _jpeg_flat_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """All symbols at code length 9 — canonical, prefix-free (incomplete),
    capacity 512 ≥ any symbol set we use."""
    bits = [0] * 16
    bits[8] = len(symbols)
    return bits, list(symbols)


_JPEG_PROG_DC_SYMS = list(range(12))
_JPEG_PROG_AC_SYMS = sorted(
    {nb << 4 for nb in range(15)}
    | {0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)


class _JpegEncAcState:
    def __init__(self) -> None:
        self.eobrun = 0
        self.pending: list[int] = []


def _jpeg_emit_sym(wtr, enc, sym: int) -> None:
    code, length = enc[sym]
    wtr.write(code, length)


def _jpeg_flush_eobrun(wtr, enc, st) -> None:
    if st.eobrun:
        nb = st.eobrun.bit_length() - 1
        _jpeg_emit_sym(wtr, enc, nb << 4)
        if nb:
            wtr.write(st.eobrun - (1 << nb), nb)
        st.eobrun = 0
        for b in st.pending:
            wtr.write(b, 1)
        st.pending = []


def _jpeg_enc_ac_first_block(wtr, enc, coef, ss, se, al, st) -> None:
    vals = {}
    last = ss - 1
    for k in range(ss, se + 1):
        av = abs(coef[k]) >> al
        vals[k] = av if coef[k] >= 0 else -av
        if av:
            last = k
    if last < ss:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _jpeg_flush_eobrun(wtr, enc, st)
        return
    _jpeg_flush_eobrun(wtr, enc, st)
    r = 0
    for k in range(ss, last + 1):
        v = vals[k]
        if v == 0:
            r += 1
            continue
        while r > 15:
            _jpeg_emit_sym(wtr, enc, 0xF0)
            r -= 16
        s, mag = _jpeg_magnitude(v)
        _jpeg_emit_sym(wtr, enc, (r << 4) | s)
        wtr.write(mag, s)
        r = 0
    if last < se:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _jpeg_flush_eobrun(wtr, enc, st)


def _jpeg_enc_ac_refine_block(wtr, enc, coef, ss, se, al, st) -> None:
    absv = {}
    eob_k = ss - 1
    for k in range(ss, se + 1):
        t = abs(coef[k]) >> al
        absv[k] = t
        if t == 1:
            eob_k = k  # last NEWLY-significant position
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:
            _jpeg_flush_eobrun(wtr, enc, st)
            _jpeg_emit_sym(wtr, enc, 0xF0)
            r -= 16
            for b in br:
                wtr.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)  # correction bit, rides the next symbol
            continue
        _jpeg_flush_eobrun(wtr, enc, st)
        _jpeg_emit_sym(wtr, enc, (r << 4) | 1)
        wtr.write(0 if coef[k] < 0 else 1, 1)
        for b in br:
            wtr.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            _jpeg_flush_eobrun(wtr, enc, st)


def _jpeg_coef_grid(plane, qnat, C):
    """Padded plane → per-block ZIGZAG-order quantized coefficient grid."""
    import numpy as np

    zz = _JPEG_ZIGZAG
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    q = np.asarray(qnat, dtype=np.float64)
    grid = []
    for y in range(by):
        row = []
        for x in range(bx):
            f = C @ (plane[y * 8:y * 8 + 8, x * 8:x * 8 + 8] - 128.0) @ C.T
            coefs = np.round(f.reshape(64) / q).astype(int)
            row.append([int(coefs[zz[k]]) for k in range(64)])
        grid.append(row)
    return grid


def _jpeg_sos(comp_specs, ss, se, ah, al) -> bytes:
    payload = bytes([len(comp_specs)])
    for cid, td, ta in comp_specs:
        payload += bytes([cid, (td << 4) | ta])
    payload += bytes([ss, se, (ah << 4) | al])
    return _jpeg_seg(0xDA, payload)


def _encode_jpeg_progressive(img, quality, subsample, grayscale) -> bytes:
    import numpy as np

    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[:2]
    if not h or not w:
        raise ValueError("empty image")
    R, G, B = img[..., 0], img[..., 1], img[..., 2]
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
    Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0

    qly = _jpeg_scaled_qt(_JPEG_QT_LUMA, quality)
    qlc = _jpeg_scaled_qt(_JPEG_QT_CHROMA, quality)
    C = _jpeg_dct_matrix()
    hs, vs = (1, 1) if grayscale else ((2, 2) if subsample else (1, 1))
    mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))

    Yp, Cbp, Crp = _jpeg_padded_planes(Y, Cb, Cr, mcux, mcuy, hs, vs, subsample and not grayscale)
    comps = [
        {"id": 1, "h": hs, "v": vs, "tq": 0,
         "grid": _jpeg_coef_grid(Yp, qly, C)},
    ]
    if not grayscale:
        comps.append({"id": 2, "h": 1, "v": 1, "tq": 1,
                      "grid": _jpeg_coef_grid(Cbp, qlc, C)})
        comps.append({"id": 3, "h": 1, "v": 1, "tq": 1,
                      "grid": _jpeg_coef_grid(Crp, qlc, C)})

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    frame_geom = {"w": w, "h": h, "comps": comps, "hmax": hmax, "vmax": vmax}

    dc_bits, dc_vals = _jpeg_flat_table(_JPEG_PROG_DC_SYMS)
    ac_bits, ac_vals = _jpeg_flat_table(_JPEG_PROG_AC_SYMS)
    dc_enc = _jpeg_encode_codes(dc_bits, dc_vals)
    ac_enc = _jpeg_encode_codes(ac_bits, ac_vals)

    scans: list[bytes] = []

    # -- DC first (Al=1): interleaved when multi-component ------------------
    wtr = _JpegBitWriter()
    pred = {c["id"]: 0 for c in comps}
    if len(comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc = c["grid"][my * c["v"] + by][mx * c["h"] + bx][0]
                            v = dc >> 1  # arithmetic point transform
                            s, mag = _jpeg_magnitude(v - pred[c["id"]])
                            pred[c["id"]] = v
                            _jpeg_emit_sym(wtr, dc_enc, s)
                            if s:
                                wtr.write(mag, s)
    else:
        c = comps[0]
        tby, tbx = _jpeg_true_blocks(frame_geom, c)
        for by in range(tby):
            for bx in range(tbx):
                v = c["grid"][by][bx][0] >> 1
                s, mag = _jpeg_magnitude(v - pred[c["id"]])
                pred[c["id"]] = v
                _jpeg_emit_sym(wtr, dc_enc, s)
                if s:
                    wtr.write(mag, s)
    wtr.flush()
    specs = [(c["id"], 0, 0) for c in comps]
    scans.append(_jpeg_sos(specs, 0, 0, 0, 1) + bytes(wtr.out))

    # -- DC refine (Ah=1, Al=0): one bit per block --------------------------
    wtr = _JpegBitWriter()
    if len(comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc = c["grid"][my * c["v"] + by][mx * c["h"] + bx][0]
                            wtr.write(dc & 1, 1)
    else:
        c = comps[0]
        tby, tbx = _jpeg_true_blocks(frame_geom, c)
        for by in range(tby):
            for bx in range(tbx):
                wtr.write(c["grid"][by][bx][0] & 1, 1)
    wtr.flush()
    scans.append(_jpeg_sos(specs, 0, 0, 1, 0) + bytes(wtr.out))

    # -- AC scans: first (Al=1) then refine (Ah=1), bands 1-5 and 6-63 ------
    for ss, se in ((1, 5), (6, 63)):
        for c in comps:
            tby, tbx = _jpeg_true_blocks(frame_geom, c)
            wtr = _JpegBitWriter()
            st = _JpegEncAcState()
            for by in range(tby):
                for bx in range(tbx):
                    _jpeg_enc_ac_first_block(
                        wtr, ac_enc, c["grid"][by][bx], ss, se, 1, st
                    )
            _jpeg_flush_eobrun(wtr, ac_enc, st)
            wtr.flush()
            scans.append(
                _jpeg_sos([(c["id"], 0, 1)], ss, se, 0, 1) + bytes(wtr.out)
            )
    for ss, se in ((1, 5), (6, 63)):
        for c in comps:
            tby, tbx = _jpeg_true_blocks(frame_geom, c)
            wtr = _JpegBitWriter()
            st = _JpegEncAcState()
            for by in range(tby):
                for bx in range(tbx):
                    _jpeg_enc_ac_refine_block(
                        wtr, ac_enc, c["grid"][by][bx], ss, se, 0, st
                    )
            _jpeg_flush_eobrun(wtr, ac_enc, st)
            wtr.flush()
            scans.append(
                _jpeg_sos([(c["id"], 0, 1)], ss, se, 1, 0) + bytes(wtr.out)
            )

    zzo = _JPEG_ZIGZAG
    qz_l = [qly[zzo[i]] for i in range(64)]
    sof_comps = b"".join(
        bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]]) for c in comps
    )
    out = (
        b"\xff\xd8"
        + _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + _jpeg_seg(0xDB, bytes([0]) + bytes(qz_l))
    )
    if not grayscale:
        qz_c = [qlc[zzo[i]] for i in range(64)]
        out += _jpeg_seg(0xDB, bytes([1]) + bytes(qz_c))
    out += _jpeg_seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)]) + sof_comps,
    )
    out += _jpeg_seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += _jpeg_seg(0xC4, bytes([0x11]) + bytes(ac_bits) + bytes(ac_vals))
    out += b"".join(scans)
    return out + b"\xff\xd9"
