"""Multimodal column plumbing: image/audio/video as opaque BINARY + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codec libraries, so decode for png/jpeg/
gif is STUBBED (NotImplementedError as marked) — but binary NetPBM (P6)
needs no library, so for it the pipeline is REAL end-to-end: header parse,
pixel decode, nearest-neighbor resize, per-channel stats
(``decode_ppm``/``resize_nearest``/``image_pixel_stats``).  Everything
Spark-side is real for every format: schemas, the mapInPandas batch
contract, partition sizing, and the metadata fast paths (magic-byte
sniffing, header dimension parse).

Scale design: media rows are wide (MBs) — ``maxPartitionBytes`` counts bytes,
so partitions stay balanced; the decode is a mapInPandas pipeline stage that
streams Arrow batches (never materializes a partition of images in memory);
metadata-only queries never touch the binary column thanks to column pruning.
"""

from __future__ import annotations

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
    b"\x00\x00\x00": "mp4",  # ftyp boxes start with size; loose sniff
}


def sniff_format(content: bytes | None) -> str | None:
    """Magic-byte container sniffing — pure metadata, no codec needed."""
    if not content:
        return None
    for magic, fmt in _MAGIC.items():
        if content.startswith(magic):
            return fmt
    return "unknown"


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


def decode_image(content: bytes) -> "object":
    """Pixel decode dispatch: PPM decodes for real; png/jpeg/gif need a
    codec library this container doesn't ship — those stay stubbed.  The
    Spark-side contract (mapInPandas over binary) is identical either way."""
    if content and content.startswith(b"P6"):
        return decode_ppm(content)
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
            fmts, widths, heights = [], [], []
            for content in pdf["content"]:
                b = bytes(content) if content is not None else None
                fmts.append(sniff_format(b))
                w, h = png_dimensions(b)
                if w is None:
                    w, h = ppm_dimensions(b)
                widths.append(w)
                heights.append(h)
            pdf = pdf.assign(format=fmts, width=widths, height=heights)
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
                if not b or not b.startswith(b"P6"):
                    continue
                img = decode_ppm(b)
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
    the timestamps are computed JVM-side from duration metadata; the actual
    frame grab is the stubbed codec step."""
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

def media_from_documents(spark, sf: str) -> DataFrame:
    """Synthesize a deterministic media table from ``documents`` (the test
    corpus has no binary columns): content bytes are built JVM-side —
    doc_id % 3 == 0 → a real PNG header (IHDR width/height derived from
    doc_id), % 3 == 1 → jpeg magic + text bytes, % 3 == 2 → a "video" with
    duration metadata.  Everything is a codegen'd column expression; the
    binary column is exactly what a real lake would carry opaquely."""
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
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("image"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    content = (
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, jpeg)
        .otherwise(F.encode("text", "UTF-8"))
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
    digest, n_frames)."""
    media = media_from_documents(spark, sf)
    sniffed = with_sniffed_metadata(media)
    feats = extract_features(media).filter(F.col("feature") == "content_digest")
    frames = (
        frame_sample_plan(media)
        .groupBy("media_id")
        .agg(F.count("*").alias("n_frames"))
    )
    return (
        sniffed.select("media_id", "kind", "format", "width", "height")
        .join(feats.select("media_id", F.col("value").alias("digest")), "media_id", "left")
        .join(frames, "media_id", "left")
        .orderBy("media_id")
    )
