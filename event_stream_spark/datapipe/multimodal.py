"""Multimodal column plumbing: image/audio/video as opaque BINARY + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBBED
(deterministic fake or NotImplementedError as marked) — but everything
Spark-side is real and tested: schemas, the mapInPandas batch contract,
partition sizing, and the metadata fast paths (magic-byte sniffing, header
dimension parse) which need no codec at all.

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


def decode_image(content: bytes) -> "object":
    """STUB: full pixel decode requires an image codec not present in this
    container.  The Spark-side contract (mapInPandas over binary) is real."""
    raise NotImplementedError("image codec not available in this environment")


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
                widths.append(w)
                heights.append(h)
            pdf = pdf.assign(format=fmts, width=widths, height=heights)
            yield pdf

    return df.mapInPandas(sniff, schema=df.schema)


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
