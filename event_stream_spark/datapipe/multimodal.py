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
