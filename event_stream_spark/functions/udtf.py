"""User-defined TABLE function surface (§2.10).

The reference exposes no UDTF; our engine inherits Spark's Python UDTF
(SPARK-43798, `pyspark.sql.functions.udtf`) — the variable-output-rows
companion to the GROUPED_AGG UDAF in ``udaf.py``.  The worked example is
the shape UDTFs genuinely earn: an IRREGULAR binary container exploded
into rows.  ``mp3_frames`` walks an MPEG-audio stream (the same header
arithmetic as ``multimodal.mp3_frame_profile``) and yields ONE ROW PER
FRAME — offset, size, samples, bitrate — the per-frame index an audio
lake materializes for byte-range sampling, exactly like the mp4 stbl
``video_frame_index``.

Used via lateral join::

    spark.udtf.register("mp3_frames", mp3_frames)
    spark.sql("SELECT m.media_id, f.* FROM media m, "
              "LATERAL mp3_frames(m.content) f")

Scale note: a Python UDTF is row-at-a-time on the OUTER side (one eval
per media blob) — appropriate here because the per-call work (a full
frame walk) dwarfs the crossing cost and output cardinality is data-
dependent, which neither a scalar UDF (fixed arity) nor a pandas UDF
(fixed 1:1 batch shape) can express.  For per-ROW scalar math it would
be the slow path — see the udaf.py guidance.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType=(
        "frame_idx int, offset long, n_bytes int, samples int, "
        "sample_rate int, bitrate int, layer int, version string, "
        "channels int"
    )
)
class mp3_frames:
    """One row per MPEG-audio frame of ``content`` (ID3v2/v1 tags stepped
    over, walk stops at the first invalid header — the
    ``mp3_frame_profile`` contract).  Emits nothing for None/non-MPEG
    input rather than failing the query."""

    def eval(self, content):
        from event_stream_spark.datapipe.multimodal import (
            _id3v2_size,
            _mpa_frame,
        )

        if not content or len(content) < 4:
            return
        content = bytes(content)
        pos = _id3v2_size(content)
        end = len(content)
        if end >= 128 and content[end - 128 : end - 125] == b"TAG":
            end -= 128
        names = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}
        idx = 0
        while pos + 4 <= end:
            fr = _mpa_frame(content, pos)
            if fr is None:
                break
            fbytes, samples, rate, bitrate, layer, ver, channels = fr
            if fbytes <= 0:
                break
            yield (
                idx, pos, fbytes, samples, rate, bitrate, layer,
                names[ver], channels,
            )
            pos += fbytes
            idx += 1


def register(spark) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("mp3_frames", mp3_frames)
